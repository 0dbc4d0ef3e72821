"""KMV (bottom-k / k-minimum-values) distinct-count sketch.

The distributed-sketch complement to the exact aggregates: estimate the
number of distinct values of a column from only the k smallest hash
values (Bar-Yossef et al. 2002; the estimator behind DataSketches'
theta sketch). Spark ships HLL (approx_count_distinct), but HLL
registers can't be value-checked against another engine; KMV over the
SQL-mirrored poly-of-md5 hash family is fully deterministic on both
sides, so the sketch itself — not just its error bound — is
oracle-verified in the contract (doc_kmv_distinct).

Scale shape: the hash is computed map-side; a partial-aggregate
DISTINCT dedupes hashes with map-side combine (one row per distinct
hash reaches the shuffle), and the bottom-k is a TakeOrderedAndProject
— per-partition heaps of size k merged on the driver, never a global
sort. The sketches are mergeable (kmv_merge): union the bottom-k sets,
keep the k smallest — how per-day/per-shard sketches roll up to a
warehouse total without rescanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import POLY_MOD, _poly_base_expr

# float(2^56): exactly representable; (k-1)*M below stays exact for
# k-1 a small int (<= 2^6 here), so the estimate is one IEEE division
# on both engines
_M_FLOAT = float(POLY_MOD)


def kmv_bottom_k(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The sketch itself: the k smallest distinct hash values of
    ``col``. The hash is the poly fold of the md5 hex digest — folding
    short raw strings directly leaves the value in a narrow band (see
    curation.stratified_sample)."""
    hashed = df.select(F.md5(F.col(col).cast("string")).alias("_m"))
    h = _poly_base_expr("_m")
    return (hashed.select(h.alias("h")).distinct()
            .orderBy("h").limit(k))


def kmv_estimate(sketch_df: DataFrame, k: int = 64):
    """(n_seen, h_k, est) from a bottom-k frame. With fewer than k
    distinct values the sketch is exhaustive and est is exact."""
    agg = sketch_df.agg(F.count(F.lit(1)).alias("n_seen"),
                        F.max("h").alias("h_k"))
    return agg.select(
        "n_seen", "h_k",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_M_FLOAT)
                   / F.col("h_k").cast("double")).alias("est"))


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row frame (n_seen, h_k, est) estimating countDistinct(col)."""
    return kmv_estimate(kmv_bottom_k(df, col, k), k)


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two bottom-k sketches into the sketch of the UNION of the
    underlying datasets: union the hash sets, dedupe, keep k smallest.
    Exactly equals kmv_bottom_k over the concatenated input —
    deterministic mergeability (tested), the property that lets
    per-shard sketches roll up without a rescan."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def sql_kmv_distinct(table: str, col: str, k: int = 64) -> str:
    """DuckDB mirror of kmv_distinct (value-exact, same IEEE ops)."""
    from .textops import sql_poly_base
    h = sql_poly_base(f"MD5(CAST({col} AS VARCHAR))")
    return f"""WITH hs AS (
  SELECT DISTINCT {h} AS h FROM {table}),
bk AS (SELECT h FROM hs ORDER BY h LIMIT {k}),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, MAX(h) AS h_k FROM bk)
SELECT n_seen, CAST(h_k AS BIGINT) AS h_k,
       CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE)
            ELSE {float(k - 1)!r} * {_M_FLOAT!r} / CAST(h_k AS DOUBLE)
       END AS est
FROM a"""
