"""Mergeable sketches: KMV distinct-count + count-min frequency.

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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): bounded-memory
# frequency estimation / heavy-hitter detection.
# ---------------------------------------------------------------------------
#
# The skew handling in joins.py (salting, hot-cell promotion) needs the
# hot keys first. The exact way — groupBy(key).count() — shuffles one
# row PER DISTINCT KEY, which at 10^12 urls/cells is itself a massive
# job. The count-min sketch caps that at d*w integer cells regardless
# of key cardinality: counts are partial-aggregated map-side into the
# d*w grid (the only shuffle moves <= d*w rows per partition), sketches
# from shards/days merge by cell-wise SUM, and lookups join the tiny
# grid broadcast-side. Estimates only OVER-count (min over d rows), so
# a heavy-hitter scan has guaranteed recall: every truly-hot key
# clears the threshold.
#
# Hash family: slot_j(x) = (((2j+1) * h(x) + j*1000003 + 12345)
#                           % 2^56) % w
# with h = the poly fold of md5 — the same seeded affine family MinHash
# uses (poly_seed_coeffs), formula-expressible on both engines so the
# whole sketch is value-exact in the contract.

_CMS_D = 4


def _cms_slot(h, j: int, w: int):
    a, b = _cms_coeffs(j)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(POLY_MOD)) % F.lit(w)


def _cms_coeffs(j: int) -> tuple[int, int]:
    # poly_seed_coeffs inlined (textops.py) so the SQL mirror below can
    # use the same closed form over RANGE(0, d)
    return 2 * j + 1, j * 1_000_003 + 12345


def _with_base_hash(df: DataFrame, col: str) -> DataFrame:
    hashed = df.select(F.col(col).alias("_k"),
                       F.md5(F.col(col).cast("string")).alias("_m"))
    return hashed.select("_k", _poly_base_expr("_m").alias("_h"))


def cms_build(df: DataFrame, col: str, d: int = _CMS_D,
              w: int = 256) -> DataFrame:
    """The sketch: (j, slot, cnt) — at most d*w rows. One occurrence of
    a key increments d cells; groupBy(j, slot) partial-aggregates
    map-side so the shuffle is bounded by d*w per input partition."""
    hs = _with_base_hash(df, col)
    slots = F.array(*[_cms_slot(F.col("_h"), j, w) for j in range(d)])
    return (hs.select(F.posexplode(slots).alias("j", "slot"))
            .groupBy("j", "slot").agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise SUM — the sketch of the concatenated inputs (tested
    equal to cms_build over the union)."""
    return (a.unionByName(b).groupBy("j", "slot")
            .agg(F.sum("cnt").alias("cnt")))


def cms_lookup(sketch: DataFrame, keys: DataFrame, col: str,
               d: int = _CMS_D, w: int = 256) -> DataFrame:
    """Estimated count per distinct key in ``keys``: min over the d
    cells. The sketch is tiny — broadcast equi-join on (j, slot); keys
    never seen by the build estimate as 0."""
    hs = _with_base_hash(keys.select(col).distinct(), col)
    kslots = hs.select(
        "_k", F.posexplode(F.array(*[_cms_slot(F.col("_h"), j, w)
                                     for j in range(d)])).alias("j", "slot"))
    joined = kslots.join(F.broadcast(sketch), ["j", "slot"], "left")
    return (joined.groupBy("_k")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
            .select(F.col("_k").alias(col), "est"))


def cms_heavy_hitters(df: DataFrame, col: str, threshold: int,
                      d: int = _CMS_D, w: int = 256) -> DataFrame:
    """Keys whose estimated count >= threshold. Over-counting only:
    the result is a SUPERSET of the exact heavy hitters (guaranteed
    recall) — the right contract for feeding salting/hot-cell
    promotion, where a false positive merely salts a cold key."""
    sk = cms_build(df, col, d, w)
    return (cms_lookup(sk, df, col, d, w)
            .filter(F.col("est") >= F.lit(threshold)))


def sql_cms_heavy_hitters(table_expr: str, col: str, threshold: int,
                          d: int = _CMS_D, w: int = 256) -> str:
    """DuckDB mirror of cms_heavy_hitters (value-exact: integer hash
    grid, integer counts, MIN over d). ``table_expr`` is a FROM-able
    expression yielding the key column."""
    from .textops import sql_poly_base
    h = sql_poly_base(f"MD5(CAST({col} AS VARCHAR))")
    slot = (f"((((2*j+1) * h + (j*1000003 + 12345)) % {POLY_MOD}) % {w})")
    return f"""WITH hs AS (
  SELECT {col} AS _k, {h} AS h FROM {table_expr}),
cells AS (
  SELECT j, {slot} AS slot, COUNT(*) AS cnt
  FROM hs CROSS JOIN RANGE(0, {d}) t(j) GROUP BY 1, 2),
keys AS (SELECT DISTINCT _k, h FROM hs),
kslots AS (
  SELECT _k, j, {slot} AS slot
  FROM keys CROSS JOIN RANGE(0, {d}) t(j)),
est AS (
  SELECT _k, MIN(COALESCE(cnt, 0)) AS est
  FROM kslots LEFT JOIN cells USING (j, slot) GROUP BY _k)
SELECT _k AS {col}, CAST(est AS BIGINT) AS est
FROM est WHERE est >= {threshold}"""


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
