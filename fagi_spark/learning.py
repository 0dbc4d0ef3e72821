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

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def owl_tag_features(j: DataFrame, meta_a: DataFrame, meta_b: DataFrame,
                     class_vocab: list[str],
                     type_pred: str = RDF_TYPE) -> DataFrame:
    """OWL-class / tag features per link, joined onto the resolved
    links frame (reference trains on these alongside geometry buckets —
    OWLFeatures.java, TagFeatures.java, BooleanVector.createOWLFeatures
    BooleanVector.java:765-805):

    - ``a_cls_i`` / ``b_cls_i``: one-hot over ``class_vocab`` of each
      side's rdf:type objects (OWLClassesParser's class->id mapping,
      OWLClassesParser.java:33-68, with an explicit vocabulary instead
      of the LGD mappings file);
    - ``a_n_classes`` / ``b_n_classes``: per-side class counts;
    - ``owl_sim_bucket``: the reference's bucketed class-count
      percentage difference, (sizeA-sizeB)/max bucketed in 0.1 steps
      over [-0.9, 0.9) (BooleanVector.java:771-805). Bucket membership
      is decided by integer cross-multiplication ((a-b)*10 >= k*max) so
      there is no float at all — bit-exact in any SQL mirror.

    Two aggregations (one per side) + two broadcastable left joins;
    class inventories are tiny relative to the links frame."""
    def side(meta, prefix, node_col):
        flags = [F.max((F.col("object") == c).cast("int")).alias(f"{prefix}cls_{i}")
                 for i, c in enumerate(class_vocab)]
        agg = (meta.filter(F.col("predicate") == type_pred)
               .groupBy("subject")
               .agg(F.countDistinct("object").alias(f"{prefix}n_classes"), *flags))
        return agg.withColumnRenamed("subject", node_col)

    out = (j.join(side(meta_a, "a_", "node_a"), "node_a", "left")
            .join(side(meta_b, "b_", "node_b"), "node_b", "left"))
    fill = {f"{p}cls_{i}": 0 for p in ("a_", "b_") for i in range(len(class_vocab))}
    fill.update({"a_n_classes": 0, "b_n_classes": 0})
    out = out.fillna(fill)
    a, b = F.col("a_n_classes"), F.col("b_n_classes")
    mx = F.greatest(a, b)
    bucket = None
    for k in range(-9, 10):
        term = ((a - b) * 10 >= F.lit(k) * mx).cast("int")
        bucket = term if bucket is None else bucket + term
    # both-zero: percentage defined as 0 (reference's sizeA==sizeB==0
    # branch) -> the zero-difference bucket, not the all-true sum
    bucket = F.when(mx == 0, F.lit(10)).otherwise(bucket)
    return out.withColumn("owl_sim_bucket", bucket)


def owl_feature_cols(n_classes: int) -> list[str]:
    return ([f"a_cls_{i}" for i in range(n_classes)]
            + [f"b_cls_{i}" for i in range(n_classes)]
            + ["a_n_classes", "b_n_classes", "owl_sim_bucket"])


def train_recommender(features: DataFrame, label_col: str = "label",
                      max_iter: int = 100, seed: int = 42,
                      extra_cols: list[str] | None = None):
    """Fit the action recommender. Binary labels -> LinearSVC (the
    liblinear analog); multiclass -> multinomial LogisticRegression.
    ``extra_cols``: additional numeric feature columns (e.g. the OWL
    class/tag features) appended to the assembled vector;
    ``owl_sim_bucket`` rides the one-hot encoder like the geometry
    buckets (the reference's vector is all boolean nodes)."""
    from pyspark.ml.classification import LinearSVC, LogisticRegression
    from pyspark.ml.feature import OneHotEncoder, VectorAssembler
    from pyspark.ml import Pipeline

    extra = list(extra_cols or [])
    bucket_cols = ["a_area_bucket", "b_area_bucket", "a_edge_bucket", "b_edge_bucket"]
    if "owl_sim_bucket" in extra:
        extra.remove("owl_sim_bucket")
        bucket_cols.append("owl_sim_bucket")
    onehot = OneHotEncoder(inputCols=bucket_cols,
                           outputCols=[c + "_oh" for c in bucket_cols])
    vec = VectorAssembler(
        inputCols=[c + "_oh" for c in bucket_cols]
                  + ["a_is_point", "b_is_point", "a_is_poly", "b_is_poly",
                     "a_more_points"] + extra,
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


# ---------------------------------------------------------------------------
# Fixed-coefficient linear scoring — the deploy shape of a trained model
# ---------------------------------------------------------------------------

def fixed_linear_score(bucket_lookups: dict, linear: dict, bias: float):
    """Score column for a FROZEN linear model: per-bucket coefficient
    lookup (the one-hot dot product collapses to ``element_at`` on an
    inlined coefficient array) plus plain linear terms plus bias. This
    is what serving a trained liblinear/LinearSVC model looks like at
    100 TB — coefficients inlined as literals, zero Python, zero
    shuffle, whole-stage codegen. Training stays in
    ``train_recommender``/``train_tag_predictor``; the sum is built in
    dict order, left-associated, so ``sql_fixed_linear_score`` mirrors
    it term for term (IEEE-identical)."""
    expr = F.lit(float(bias))
    for col, arr in bucket_lookups.items():
        look = F.element_at(F.array(*[F.lit(float(v)) for v in arr]),
                            F.col(col) + 1)
        expr = expr + look
    for col, w in linear.items():
        expr = expr + F.col(col).cast("double") * F.lit(float(w))
    return expr


def sql_fixed_linear_score(bucket_lookups: dict, linear: dict,
                           bias: float) -> str:
    """DuckDB mirror of ``fixed_linear_score`` — identical term order
    and association; floats inlined via repr() (round-trips to the same
    double)."""
    parts = [f"CAST({float(bias)!r} AS DOUBLE)"]
    for col, arr in bucket_lookups.items():
        lst = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in arr)
        parts.append(f"([{lst}])[({col}) + 1]")
    for col, w in linear.items():
        parts.append(f"(CAST({col} AS DOUBLE) * CAST({float(w)!r} AS DOUBLE))")
    return "(" + " + ".join(parts) + ")"


# ---------------------------------------------------------------------------
# Tag prediction (TagPredictor.java / TagFeatures.java / OSMRec variant)
# ---------------------------------------------------------------------------

ENTITY_FEATURE_COLS = ("area_bucket", "npoints_bucket", "is_point",
                       "is_line", "is_poly", "is_rectangle")


def entity_features(geoms: DataFrame) -> DataFrame:
    """Per-ENTITY geometry feature buckets for tag prediction
    (TagFeatures.createGeometryFeaturesA, TagFeatures.java:37-110:
    geometry-type one-hot, rectangle flag, num-points buckets, area
    buckets). Input: a prepare_geoms frame (subject, geom_kind,
    npoints, envelope). Pure column math; the rectangle flag uses the
    5-vertex axis-aligned test our WKT squares satisfy (JTS
    isRectangle's cheap necessary conditions)."""
    area = (F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin"))
    np_bucket = _log_bucket(F.col("npoints").cast("double"), 13, scale=1.0)
    return geoms.select(
        "subject",
        _log_bucket(area, N_AREA_BUCKETS).alias("area_bucket"),
        np_bucket.alias("npoints_bucket"),
        (F.col("geom_kind") == "POINT").cast("int").alias("is_point"),
        F.col("geom_kind").isin("LINESTRING", "MULTILINESTRING")
         .cast("int").alias("is_line"),
        F.col("geom_kind").isin("POLYGON", "MULTIPOLYGON")
         .cast("int").alias("is_poly"),
        ((F.col("geom_kind") == "POLYGON") & (F.col("npoints") == 5))
         .cast("int").alias("is_rectangle"))


def train_tag_predictor(features: DataFrame, vocab: list[str],
                        label_col: str = "tag", max_iter: int = 50,
                        seed: int = 42):
    """Multiclass tag model (the liblinear OSMRec model of
    TagPredictor.java:42-67): multinomial LogisticRegression over the
    per-entity buckets; labels indexed by position in ``vocab`` (the
    OWLClassesParser class->id mapping, OWLClassesParser.java:55-68,
    with an explicit vocabulary)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import OneHotEncoder, VectorAssembler

    vmap = F.array(*[F.lit(v) for v in vocab])
    data = features.withColumn(
        "_label", (F.array_position(vmap, F.col(label_col)) - 1).cast("double"))
    # array_position returns 0 for a tag absent from vocab -> label
    # -1.0, which would silently corrupt the multinomial fit; fail loud
    # instead (limit(1) keeps the guard scan cheap).
    bad = data.filter(F.col("_label") < 0).select(label_col).limit(1).collect()
    if bad:
        raise ValueError(
            f"tag {bad[0][0]!r} not in vocab ({len(vocab)} entries) — "
            "extend vocab or filter unlabeled rows before training")
    onehot = OneHotEncoder(inputCols=["area_bucket", "npoints_bucket"],
                           outputCols=["area_oh", "npoints_oh"])
    vec = VectorAssembler(
        inputCols=["area_oh", "npoints_oh", "is_point", "is_line",
                   "is_poly", "is_rectangle"], outputCol="features")
    clf = LogisticRegression(maxIter=max_iter, family="multinomial",
                             labelCol="_label")
    return Pipeline(stages=[onehot, vec, clf]).fit(data)


def predict_tags(model, features: DataFrame, vocab: list[str],
                 top_n: int = 12) -> DataFrame:
    """Ranked tag recommendations per entity — the reference emits the
    TOP-12 classes by decision score (RECOMMENDATIONS_SIZE,
    TagPredictor.java:30, 83-110). Here: posexplode the probability
    vector, window-rank per subject, map indices back through
    ``vocab``. Returns (subject, rank, tag, score)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    vmap = F.array(*[F.lit(v) for v in vocab])
    scored = (model.transform(features)
              .select("subject",
                      F.posexplode(vector_to_array("probability"))
                       .alias("_idx", "score")))
    w = Window.partitionBy("subject").orderBy(F.col("score").desc(),
                                              F.col("_idx").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select("subject", "rank",
                    F.element_at(vmap, F.col("_idx") + 1).alias("tag"),
                    "score"))
