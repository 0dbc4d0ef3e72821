"""Arrow-vectorized pandas UDF wrappers over the numpy geometry kernels.

These are the ONLY Python touchpoints on the engine's hot path; every
other expression stays JVM-side (whole-stage codegen). Batch transfer is
Arrow (`spark.sql.execution.arrow.pyspark.enabled`), never row-at-a-time
Python UDFs — the BASELINE.json input_hint requirement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from . import geom

GEOM_STATS_TYPE = StructType([
    StructField("geom_kind", StringType()),
    StructField("kind_rank", IntegerType()),
    StructField("npoints", IntegerType()),
    StructField("cx", DoubleType()),
    StructField("cy", DoubleType()),
    StructField("xmin", DoubleType()),
    StructField("ymin", DoubleType()),
    StructField("xmax", DoubleType()),
    StructField("ymax", DoubleType()),
])


@pandas_udf(GEOM_STATS_TYPE)
def wkt_stats_udf(wkt: pd.Series) -> pd.DataFrame:
    """Precompute per-geometry stats once at extraction time so fusion
    actions / guards / joins are pure column math (SURVEY.md §2.2 F6)."""
    rows = []
    for w in wkt:
        s = geom.stats(w)
        if s is None:
            rows.append((None, geom.NONE_RANK, None, None, None, None, None, None, None))
        else:
            rows.append(s)
    return pd.DataFrame(rows, columns=[f.name for f in GEOM_STATS_TYPE.fields])


@pandas_udf(StringType())
def wkt_simplify_udf(wkt: pd.Series, eps: pd.Series) -> pd.Series:
    """Douglas-Peucker simplification per geometry (geom.simplify_dp)
    — the reduction a tile server applies before shipping vectors at
    low zoom. Arrow-batched; per-batch parse, invalid WKT -> NULL."""
    out = []
    for w, e in zip(wkt, eps):
        g = geom.parse_wkt(w)
        out.append(None if g is None
                   else geom.to_wkt(geom.simplify_dp(g, float(e))))
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def wkt_translate_udf(wkt: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
    """ST_Translate(geom, dx, dy) (e.g. KeepMostPointsAndTranslate,
    reference KeepMostPointsAndTranslateTransformation.java:130-155)."""
    out = []
    for w, x, y in zip(wkt, dx, dy):
        g = geom.parse_wkt(w)
        out.append(None if g is None else geom.to_wkt(geom.translate(g, float(x), float(y))))
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def wkt_affine_udf(wkt: pd.Series, dx: pd.Series, dy: pd.Series,
                   scale: pd.Series, rot_deg: pd.Series) -> pd.Series:
    """ShiftAToB pipeline: translate -> GeomResize(scale about centroid)
    -> GeomRotate(rotate about centroid) (ShiftAToB.java:190-232,
    schema.sql:97-104)."""
    out = []
    for w, x, y, s, r in zip(wkt, dx, dy, scale, rot_deg):
        g = geom.parse_wkt(w)
        if g is None:
            out.append(None)
            continue
        g = geom.translate(g, float(x), float(y))
        if s is not None and float(s) != 1.0:
            g = geom.scale_about_centroid(g, float(s))
        if r is not None and float(r) != 0.0:
            g = geom.rotate_about_centroid(g, float(r))
        out.append(geom.to_wkt(g))
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def wkt_scale_udf(wkt: pd.Series, factor: pd.Series) -> pd.Series:
    """GeomResize(geom, f): scale about centroid (ScaleTransformation.java:115-130)."""
    out = []
    for w, f in zip(wkt, factor):
        g = geom.parse_wkt(w)
        out.append(None if g is None else geom.to_wkt(geom.scale_about_centroid(g, float(f))))
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def make_point_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    """POINT (x y) with the engine's canonical float formatting."""
    return pd.Series(
        [None if (a is None or b is None) else f"POINT ({geom._fmt(float(a))} {geom._fmt(float(b))})"
         for a, b in zip(x, y)], dtype="object")
