"""Fusion-action recommendation learning (SURVEY.md §2.10).

The reference trains a liblinear linear SVM (Predictor.java:26-58;
TrainWorker.java:6-11) on sparse boolean geometry-feature buckets per
link — 25 area buckets, edge-length mean/variance buckets, type flags
(BooleanGeometryFeatures.java:24, 76-123, 228-233) — where training
rows are the canonical links join output (BatchLearning.java:60-92).

Spark-first: features are column math over the resolved links join
(areas/edges from the precomputed envelope/npoints columns — no
geometry parsing on this path), bucket ids by log-scale thresholds, and
the model is ``pyspark.ml.classification.LinearSVC`` (binary) or
``LogisticRegression`` (multinomial) over a one-hot assembly. Exact
bucket *bounds* are engine-chosen (the reference's constants are
data-set tuned); the feature *shape* (boolean buckets over area /
edge-length mean / variance / type pairing) mirrors the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_AREA_BUCKETS = 25  # BooleanGeometryFeatures.java:24


def _log_bucket(col, n_buckets: int, scale: float = 1e-6):
    """log10-spaced bucket id in [0, n_buckets): floor(log10(v/scale)),
    clamped; 0 for v <= 0 (degenerate/point geometries)."""
    b = F.floor(F.log10(col / F.lit(scale)))
    return (F.when(col <= 0, F.lit(0))
            .otherwise(F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b)))
            .cast("int"))


def geometry_features(j: DataFrame) -> DataFrame:
    """Per-link feature columns over the resolved join (a_*/b_* from
    fuse.resolve_links): envelope areas + mean edge proxy + type flags.
    All pure column math (whole-stage codegen)."""
    a_area = (F.col("a_xmax") - F.col("a_xmin")) * (F.col("a_ymax") - F.col("a_ymin"))
    b_area = (F.col("b_xmax") - F.col("b_xmin")) * (F.col("b_ymax") - F.col("b_ymin"))
    # mean edge proxy: envelope perimeter / npoints (degenerate-safe)
    a_edge = (2.0 * ((F.col("a_xmax") - F.col("a_xmin")) + (F.col("a_ymax") - F.col("a_ymin")))
              / F.greatest(F.col("a_npoints").cast("double"), F.lit(1.0)))
    b_edge = (2.0 * ((F.col("b_xmax") - F.col("b_xmin")) + (F.col("b_ymax") - F.col("b_ymin")))
              / F.greatest(F.col("b_npoints").cast("double"), F.lit(1.0)))
    return j.select(
        "node_a", "node_b",
        _log_bucket(a_area, N_AREA_BUCKETS).alias("a_area_bucket"),
        _log_bucket(b_area, N_AREA_BUCKETS).alias("b_area_bucket"),
        _log_bucket(a_edge, N_AREA_BUCKETS).alias("a_edge_bucket"),
        _log_bucket(b_edge, N_AREA_BUCKETS).alias("b_edge_bucket"),
        (F.col("a_geom_kind") == "POINT").cast("int").alias("a_is_point"),
        (F.col("b_geom_kind") == "POINT").cast("int").alias("b_is_point"),
        F.col("a_geom_kind").isin("POLYGON", "MULTIPOLYGON").cast("int").alias("a_is_poly"),
        F.col("b_geom_kind").isin("POLYGON", "MULTIPOLYGON").cast("int").alias("b_is_poly"),
        (F.col("a_npoints") >= F.col("b_npoints")).cast("int").alias("a_more_points"))

FEATURE_COLS = ("a_area_bucket", "b_area_bucket", "a_edge_bucket", "b_edge_bucket",
                "a_is_point", "b_is_point", "a_is_poly", "b_is_poly", "a_more_points")


def train_recommender(features: DataFrame, label_col: str = "label",
                      max_iter: int = 100, seed: int = 42):
    """Fit the action recommender. Binary labels -> LinearSVC (the
    liblinear analog); multiclass -> multinomial LogisticRegression."""
    from pyspark.ml.classification import LinearSVC, LogisticRegression
    from pyspark.ml.feature import OneHotEncoder, VectorAssembler
    from pyspark.ml import Pipeline

    onehot = OneHotEncoder(
        inputCols=["a_area_bucket", "b_area_bucket", "a_edge_bucket", "b_edge_bucket"],
        outputCols=["a_area_oh", "b_area_oh", "a_edge_oh", "b_edge_oh"])
    vec = VectorAssembler(
        inputCols=["a_area_oh", "b_area_oh", "a_edge_oh", "b_edge_oh",
                   "a_is_point", "b_is_point", "a_is_poly", "b_is_poly",
                   "a_more_points"],
        outputCol="features")
    n_classes = features.select(label_col).distinct().count()
    if n_classes <= 2:
        clf = LinearSVC(maxIter=max_iter, labelCol=label_col)
    else:
        clf = LogisticRegression(maxIter=max_iter, family="multinomial",
                                 labelCol=label_col)
    return Pipeline(stages=[onehot, vec, clf]).fit(features)


def predict_actions(model, features: DataFrame) -> DataFrame:
    """(node_a, node_b, predicted action id)."""
    return (model.transform(features)
            .select("node_a", "node_b", F.col("prediction").cast("int").alias("action_id")))
