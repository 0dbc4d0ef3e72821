"""Mergeable sketches: KMV distinct-count + count-min frequency.

The distributed-sketch complement to the exact aggregates: estimate the
number of distinct values of a column from only the k smallest hash
values (Bar-Yossef et al. 2002; the estimator behind DataSketches'
theta sketch). Spark ships HLL (approx_count_distinct), but ITS
registers can't be value-checked against another engine; this module
instead builds both KMV and a from-scratch HLL over the SQL-mirrored
poly-of-md5 hash family, fully deterministic on both sides, so the
sketches themselves — not just their error bounds — are
oracle-verified in the contract (doc_kmv_distinct, doc_hll_distinct).

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

from .textops import POLY_MOD, _poly_base_expr, sql_poly_base

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


def kmv_bottom_k_grouped(df: DataFrame, group_col: str, col: str,
                         k: int = 64) -> DataFrame:
    """Per-group bottom-k sketch: (group, h) rows, <= k per group —
    "distinct users per tile / distinct domains per language" at
    bounded memory. One distinct + one window shuffle, both on the
    group key; Spark 3.5+ plans the rank filter as WindowGroupLimit
    (per-partition top-k heaps, never a full per-group sort
    materialization). Groups with < k distinct values are exhaustive,
    so their estimate is exact."""
    hashed = df.select(F.col(group_col).alias("grp"),
                       F.md5(F.col(col).cast("string")).alias("_m"))
    hs = hashed.select("grp", _poly_base_expr("_m").alias("h")).distinct()
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy("h")
    return (hs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def kmv_estimate_grouped(sketch_df: DataFrame, k: int = 64) -> DataFrame:
    """(grp, n_seen, h_k, est) per group — same estimator and IEEE ops
    as the global kmv_estimate, value-exact cross-engine."""
    agg = sketch_df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("h_k"))
    return agg.select(
        "grp", "n_seen", "h_k",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_M_FLOAT)
                   / F.col("h_k").cast("double")).alias("est"))


def kmv_distinct_grouped(df: DataFrame, group_col: str, col: str,
                         k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate (grp, n_seen, h_k, est)."""
    return kmv_estimate_grouped(kmv_bottom_k_grouped(df, group_col,
                                                     col, k), k)


def sql_kmv_distinct_grouped(table: str, group_col: str, col: str,
                             k: int = 64) -> str:
    """DuckDB mirror of kmv_distinct_grouped (value-exact)."""
    from .textops import sql_poly_base
    h = sql_poly_base(f"MD5(CAST({col} AS VARCHAR))")
    return f"""WITH hs AS (
  SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {table}),
rk AS (SELECT grp, h,
              ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
       FROM hs),
a AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_seen,
             CAST(MAX(h) AS BIGINT) AS h_k
      FROM rk WHERE rn <= {k} GROUP BY grp)
SELECT grp, n_seen, h_k,
       CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE)
            ELSE {float(k - 1)!r} * {_M_FLOAT!r} / CAST(h_k AS DOUBLE)
       END AS est
FROM a"""


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): bounded-memory membership with NO false
# negatives — the crawl-frontier "have we seen this URL?" test.
# ---------------------------------------------------------------------------
#
# KMV answers "how many distinct", count-min answers "how often"; the
# Bloom filter answers "is this one IN the set", which is what incre-
# mental crawl/ingest dedup needs before paying a full anti-join: a
# `seen=false` verdict is certain (skip the join for the bulk of new
# keys), a `seen=true` verdict is a candidate for the exact check.
# Scale shape: the filter is (word_idx, word) — m_bits/32 rows of
# packed bits, built by one groupBy(word_idx) BIT_OR whose shuffle is
# bounded by the FILTER size per partition, never by key cardinality;
# probes broadcast-join the tiny word table. Shards/days merge by
# word-wise BIT_OR (bloom_merge, tested == build over the union).
# Hash family: pos_j(x) = affine_j(poly(md5(x))) % m_bits — the same
# seeded family as count-min, formula-expressible on both engines, so
# the packed words AND the per-key verdicts are value-exact in the
# contract. 32-bit words packed into BIGINT keep every word positive
# and shift-exact on both engines (bit < 32 -> 1<<bit < 2^31).

_BLOOM_K = 4
_WORD_BITS = 32


def _bloom_word_cols(hs: DataFrame, k: int, m_bits: int) -> DataFrame:
    """(… , pos) -> (word_idx, bitval) for each of the k positions."""
    poss = F.array(*[_cms_slot(F.col("_h"), j, m_bits) for j in range(k)])
    return (hs.select("*", F.explode(poss).alias("pos"))
            .select("*",
                    F.expr(f"CAST(pos DIV {_WORD_BITS} AS BIGINT)")
                    .alias("word_idx"),
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                           f"CAST(pos % {_WORD_BITS} AS INT))")
                    .alias("bitval")))


def bloom_build(df: DataFrame, col: str, k: int = _BLOOM_K,
                m_bits: int = 1 << 13) -> DataFrame:
    """The filter: (word_idx BIGINT, word BIGINT), <= m_bits/32 rows."""
    hs = _with_base_hash(df, col).select("_h")
    bits = _bloom_word_cols(hs, k, m_bits)
    return (bits.groupBy("word_idx")
            .agg(F.expr("bit_or(bitval)").alias("word")))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR — the filter of the concatenated inputs (tested
    equal to bloom_build over the union)."""
    return (a.unionByName(b).groupBy("word_idx")
            .agg(F.expr("bit_or(word)").alias("word")))


def bloom_probe(filter_df: DataFrame, keys: DataFrame, col: str,
                k: int = _BLOOM_K, m_bits: int = 1 << 13) -> DataFrame:
    """Per distinct key: seen = all k bits set (maybe-in-set; false
    positives possible at the designed rate, false negatives never).
    Broadcast left join on word_idx; an absent word is all-zeros."""
    hs = _with_base_hash(keys.select(col).distinct(), col)
    kbits = _bloom_word_cols(hs, k, m_bits)
    joined = kbits.join(F.broadcast(filter_df), "word_idx", "left")
    hit = (F.coalesce(F.col("word"), F.lit(0))
           .bitwiseAND(F.col("bitval")) != 0).cast("int")
    return (joined.groupBy("_k").agg(F.min(hit).alias("_all"))
            .select(F.col("_k").alias(col),
                    (F.col("_all") == 1).alias("seen")))


def sql_bloom_probe(build_expr: str, probe_expr: str, col: str,
                    k: int = _BLOOM_K, m_bits: int = 1 << 13) -> str:
    """DuckDB mirror of bloom_build + bloom_probe (value-exact: integer
    hash grid, packed-word BIT_OR, bitwise-AND verdicts). Both args are
    FROM-able expressions exposing ``col``."""
    from .textops import sql_poly_base
    h = sql_poly_base(f"MD5(CAST({col} AS VARCHAR))")
    pos = f"((((2*j+1) * h + (j*1000003 + 12345)) % {POLY_MOD}) % {m_bits})"
    shift = (f"(CAST(1 AS BIGINT) << "
             f"CAST(pos % {_WORD_BITS} AS INTEGER))")
    return f"""WITH bh AS (SELECT {h} AS h FROM {build_expr}),
bpos AS (SELECT {pos} AS pos FROM bh CROSS JOIN RANGE(0, {k}) t(j)),
words AS (
  SELECT pos // {_WORD_BITS} AS word_idx, BIT_OR({shift}) AS word
  FROM bpos GROUP BY 1),
ph AS (SELECT DISTINCT {col} AS _k, {h} AS h FROM {probe_expr}),
ppos AS (SELECT _k, {pos} AS pos FROM ph CROSS JOIN RANGE(0, {k}) t(j)),
hits AS (
  SELECT _k,
         MIN(CASE WHEN (COALESCE(word, 0) & {shift}) <> 0
                  THEN 1 ELSE 0 END) AS _all
  FROM ppos LEFT JOIN words ON ppos.pos // {_WORD_BITS} = words.word_idx
  GROUP BY _k)
SELECT _k AS {col}, (_all = 1) AS seen FROM hits"""


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


def kmv_set_ops(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """KMV set-operation estimates (Beyer et al., SIGMOD 2007): from
    two bottom-k sketches alone — no rescan of either dataset —
    estimate the union size, the Jaccard similarity and the
    intersection size. The mergeable-sketch answer to "how much do
    these two crawls overlap" when each side is 10^12 urls and only
    the k-hash sketches travel.

    rho = |merged-bottom-k present in BOTH sketches| / |merged|, a
    deterministic function of the two hash sets; union_est from the
    merged sketch's k-th min (exact when the union is exhaustive);
    jaccard_est = rho; inter_est = rho * union_est (one multiply on
    the division — fixed tree, SQL-mirrorable).

    Inputs are kmv_bottom_k frames (column h). Returns one row
    (n_merged, n_shared, union_est, jaccard_est, inter_est).
    """
    merged = kmv_merge(a, b, k)
    both = (merged.join(a, "h", "semi").join(b, "h", "semi"))
    est = kmv_estimate(merged, k).select(
        F.col("n_seen").alias("n_merged"), F.col("est").alias("union_est"))
    sh = both.agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    j = est.crossJoin(sh)
    rho = F.col("n_shared").cast("double") / F.col("n_merged").cast("double")
    return j.select(
        F.col("n_merged").cast("long").alias("n_merged"), "n_shared",
        "union_est",
        F.when(F.col("n_merged") > 0, rho).alias("jaccard_est"),
        F.when(F.col("n_merged") > 0,
               rho * F.col("union_est")).alias("inter_est"))


def sql_kmv_set_ops(table_a: str, col_a: str, table_b: str, col_b: str,
                    k: int = 64) -> str:
    """DuckDB mirror of kmv_set_ops over two raw tables (builds both
    bottom-k sketches the same way sql_kmv_distinct does)."""
    from .textops import sql_poly_base
    ha = sql_poly_base(f"MD5(CAST({col_a} AS VARCHAR))")
    hb = sql_poly_base(f"MD5(CAST({col_b} AS VARCHAR))")
    return f"""WITH sa AS MATERIALIZED (
  SELECT h FROM (SELECT DISTINCT {ha} AS h FROM {table_a})
  ORDER BY h LIMIT {k}),
sb AS MATERIALIZED (
  SELECT h FROM (SELECT DISTINCT {hb} AS h FROM {table_b})
  ORDER BY h LIMIT {k}),
merged AS MATERIALIZED (
  SELECT h FROM (SELECT DISTINCT h FROM
    (SELECT h FROM sa UNION ALL SELECT h FROM sb))
  ORDER BY h LIMIT {k}),
e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_merged, MAX(h) AS h_k
      FROM merged),
u AS (SELECT n_merged,
             CASE WHEN n_merged < {k} THEN CAST(n_merged AS DOUBLE)
                  ELSE {float(k - 1)!r} * {_M_FLOAT!r}
                       / CAST(h_k AS DOUBLE) END AS union_est
      FROM e),
sh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shared FROM merged
       WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
SELECT n_merged, n_shared, union_est,
       CASE WHEN n_merged > 0 THEN
         CAST(n_shared AS DOUBLE) / CAST(n_merged AS DOUBLE) END
         AS jaccard_est,
       CASE WHEN n_merged > 0 THEN
         (CAST(n_shared AS DOUBLE) / CAST(n_merged AS DOUBLE))
           * (CASE WHEN n_merged < {k} THEN CAST(n_merged AS DOUBLE)
                   ELSE {float(k - 1)!r} * {_M_FLOAT!r}
                        / CAST((SELECT h_k FROM e) AS DOUBLE) END) END
         AS inter_est
FROM u, sh"""


# HLL: alpha_m bias constants (Flajolet et al. 2007) for small m
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_registers(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """HyperLogLog registers over the SQL-mirrored poly-of-md5 hash
    family — disproving this module's old caveat that HLL registers
    can't be value-checked across engines: with a deterministic hash
    and rho computed as bit-length arithmetic (bin() drops leading
    zeros identically in Spark and DuckDB), every register is an
    exact integer both engines agree on.

    bucket = h mod 2^p (low p bits), rho = leading-zero run of the
    remaining 56-p bits + 1 (position of the first 1-bit; an all-zero
    remainder gives the max, W+1). One map-side-combined MAX per
    bucket; missing buckets complete to register 0 via a range(m)
    left join, so the sketch is always exactly m rows and merges by
    cell-wise MAX (hll_merge).

    Returns (bucket, register).
    """
    m = 1 << p
    w_bits = 56 - p
    hs = _with_base_hash(df, col)
    v = F.shiftright(F.col("_h"), p)
    bitlen = F.when(v == 0, F.lit(0)).otherwise(F.length(F.bin(v)))
    rho = (F.lit(w_bits) - bitlen + 1).cast("int")
    regs = (hs.select((F.col("_h") % m).alias("bucket"), rho.alias("_r"))
            .groupBy("bucket").agg(F.max("_r").alias("register")))
    full = (df.sparkSession.range(m)
            .select(F.col("id").alias("bucket")))
    return (full.join(regs, "bucket", "left")
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.coalesce("register", F.lit(0)).cast("int")
                    .alias("register")))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise MAX — the sketch of the concatenated inputs."""
    return (a.unionByName(b).groupBy("bucket")
            .agg(F.max("register").alias("register")))


def hll_estimate(regs: DataFrame, p: int = 6) -> DataFrame:
    """Raw HLL cardinality estimate E = alpha_m * m^2 / sum_j 2^-M_j.

    Exactness: 2^-M_j is 1.0 / (1 << M_j) — an exact power of two —
    the harmonic total folds in bucket order (the lang_mixture rule),
    alpha_m * m^2 is ONE Python-precomputed literal inlined on both
    sides, and the estimate is a single division. The small-range
    LinearCounting correction (m * ln(m/V)) needs a transcendental
    and is intentionally NOT applied (stated) — n_empty rides along
    so a consumer can apply it; the contract checks the raw
    estimator.

    Returns one row (m, n_empty, harmonic_sum, est_raw).
    """
    m = 1 << p
    alpha_m2 = float(_HLL_ALPHA[m] * m * m)
    term = (F.lit(1.0)
            / F.expr("shiftleft(CAST(1 AS BIGINT), register)")
            .cast("double"))
    return (regs.select("bucket", term.alias("_t"))
            .agg(F.aggregate(
                F.array_sort(F.collect_list(F.struct("bucket", "_t"))),
                F.lit(0.0), lambda acc, x: acc + x["_t"]).alias("harmonic_sum"))
            .crossJoin(regs.agg(
                F.sum(F.when(F.col("register") == 0, 1).otherwise(0))
                .cast("long").alias("n_empty")))
            .select(F.lit(m).cast("long").alias("m"), "n_empty",
                    "harmonic_sum",
                    (F.lit(alpha_m2) / F.col("harmonic_sum"))
                    .alias("est_raw")))


def hll_distinct(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    return hll_estimate(hll_registers(df, col, p), p)


def sql_hll(table: str, col: str, p: int = 6) -> str:
    """DuckDB mirror of hll_distinct: same hash, same bit arithmetic,
    same bucket-ordered fold, same inlined alpha*m^2 literal."""
    m = 1 << p
    w_bits = 56 - p
    alpha_m2 = float(_HLL_ALPHA[m] * m * m)
    lit = repr(alpha_m2)
    if "e" not in lit and "E" not in lit:
        lit += "e0"
    h = sql_poly_base(f"MD5(CAST({col} AS STRING))")
    return f"""hll_h AS (
  SELECT {h} AS h FROM {table}),
hll_r AS (
  SELECT h % {m} AS bucket,
         CAST({w_bits} - (CASE WHEN h // {1 << p} = 0 THEN 0
               ELSE LENGTH(BIN(h // {1 << p})) END) + 1 AS INT) AS r
  FROM hll_h),
hll_g AS (
  SELECT bucket, MAX(r) AS register FROM hll_r GROUP BY bucket),
hll_f AS (
  SELECT g.range AS bucket, COALESCE(register, 0) AS register
  FROM RANGE(0, {m}) g LEFT JOIN hll_g ON g.range = hll_g.bucket),
hll_e AS (
  SELECT CAST({m} AS BIGINT) AS m,
         CAST(SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(1.0 / CAST((CAST(1 AS BIGINT) << register) AS DOUBLE)
                ORDER BY bucket)),
           (acc, x) -> acc + x) AS harmonic_sum
  FROM hll_f)
SELECT m, n_empty, harmonic_sum, {lit} / harmonic_sum AS est_raw
FROM hll_e"""
