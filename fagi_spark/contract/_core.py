"""Shared fixtures/helpers used by more than one contract domain.

Mechanically split from the single-file contract.py registry (r4 verdict
item 8): block order, comments and strings preserved verbatim; the
public surface is re-exported unchanged through ``fagi_spark.contract``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import (cells, curation, extract, fuse, joins,  # noqa: F401
                metadata_fuse, textops, vector)
from ..discover import literal_kind_filter, tf_unique_filter  # noqa: F401

M_PER_DEG = 111195.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Derived FAGI inputs (Spark side) + mirrored DuckDB CTE text
# ---------------------------------------------------------------------------

def _fmt2(v):
    """Integer hundredths -> canonical decimal string '123.45'."""
    return F.concat(F.floor(v.cast("double") / F.lit(100.0)).cast("long").cast("string"),
                    F.lit("."), F.lpad((v % 100).cast("string"), 2, "0"))


# Shared synthetic event coordinates (cooccur / OD / emerging-hotspot
# fixtures): derived from (user_id, event_id) on the 0.01-degree grid
# so same-user activity co-locates. ONE Spark helper and ONE SQL string
# pair — six hand-kept copies of an expression that must stay
# IEEE-identical across engines would desynchronize eventually.
_EV_LON_SQL = ("CAST(user_id * 37 % 1600 AS DOUBLE) / 100.0 - 8.0"
               " + CAST(event_id * 11 % 5 AS DOUBLE) / 100.0")
_EV_LAT_SQL = ("CAST(user_id * 53 % 800 AS DOUBLE) / 100.0"
               " + CAST(event_id * 7 % 5 AS DOUBLE) / 100.0")


def _event_pts(e, *cols):
    return e.select(
        *cols,
        ((F.col("user_id") * 37 % 1600) / 100.0 - 8.0
         + (F.col("event_id") * 11 % 5) / 100.0).alias("lon"),
        ((F.col("user_id") * 53 % 800) / 100.0
         + (F.col("event_id") * 7 % 5) / 100.0).alias("lat"))


def _dlit(v) -> str:
    """A float literal DuckDB is guaranteed to parse as DOUBLE with the
    exact bits of ``v``: repr, with e0 appended when repr has no
    exponent (exponent-form tokens are typed DOUBLE directly)."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"


def _line_wkt(pts):
    """Open-path LINESTRING WKT from integer-hundredths column pairs."""
    parts = [F.lit("LINESTRING (")]
    for i, (x, y) in enumerate(pts):
        if i:
            parts.append(F.lit(", "))
        parts += [_fmt2(x), F.lit(" "), _fmt2(y)]
    parts.append(F.lit(")"))
    return F.concat(*parts)
