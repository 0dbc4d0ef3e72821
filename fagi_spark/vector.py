"""Similarity search over embedding columns (array<float>).

Brute-force top-k as the exactness baseline; LSH-bucketed (random
hyperplane) variant as the scale path. Dot products fold left in DOUBLE
(float32 x float32 products are exact in double; the left fold is
reproducible), keeping results bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .synth import u01


def dot_double(a, b):
    """Left-fold dot product in double of two float-array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm_double(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     metric: str = "dot") -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus,
    score every pair, window-rank per query. The corpus never shuffles —
    one broadcast + one shuffle for the top-k window partitioned by
    query id. Ties broken by neighbor id (ascending)."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("q_vec")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    score = dot_double(F.col("q_vec"), F.col("c_vec"))
    if metric == "cosine":
        den = norm_double(F.col("q_vec")) * norm_double(F.col("c_vec"))
        # zero-norm vectors are EXCLUDED from cosine ranking (under
        # ANSI mode 0/0 raises DIVIDE_BY_ZERO; pre-ANSI it silently
        # produced NaN-first ranks — neither is an answer). The GEMM
        # path applies the same rule.
        pairs = pairs.filter(den != 0)
        score = score / den
    scored = pairs.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))


def _rerank_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Shared tail of every bucketed ANN search: exact dot-product
    re-rank of candidate (q_vec, c_vec) pairs, per-query top-k, ties
    broken by ascending neighbor id."""
    scored = pairs.withColumn("score", dot_double(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))


def _hyperplane(dim: int, plane_idx: int, seed: int = 7):
    """Deterministic pseudo-random hyperplane component list."""
    comps = u01(np.arange(dim) + plane_idx * 100003, salt=900 + plane_idx, seed=seed) - 0.5
    return [float(c) for c in comps]


def with_lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8,
                    vec_col: str = "embedding", seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH: sign bits of ``n_planes`` projections pack
    into a bucket id. Same-bucket vectors are cosine-similar with high
    probability; the ANN search becomes a bucket equi-join (plus
    neighbor-bucket probes if recall matters). Pure column math."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), F.array(*[F.lit(c) for c in plane]),
                       lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket)


def ivf_centroids(corpus: DataFrame, k_centroids: int = 16,
                  sample_n: int = 2000, id_col: str = "vec_id",
                  vec_col: str = "embedding", iters: int = 10,
                  sample_mod: int = 1):
    """IVF coarse quantizer: k-means centroids trained on a
    deterministic sample (reproducible under any partitioning).
    Driver-side numpy Lloyd iterations on the small sample; the
    expensive step (assigning the full corpus) stays distributed in
    assign_ivf_cells.

    ``sample_mod``: at scale, pre-thin with a hash-of-id filter
    (xxhash64(id) % mod == 0 — a scan, pushdown-friendly) so the
    deterministic orderBy sorts only ~n/mod survivors instead of the
    whole corpus; choose mod ~ n / (2 * sample_n). mod=1 keeps every
    row (exact small-corpus behavior)."""
    import numpy as np
    src = corpus
    if sample_mod > 1:
        src = src.filter(F.xxhash64(F.col(id_col)) % sample_mod == 0)
    sample = (src.orderBy(id_col).limit(sample_n)
              .select(vec_col).toPandas()[vec_col])
    x = np.stack([np.asarray(v, dtype=np.float64) for v in sample])
    cent = x[:k_centroids].copy()  # deterministic init: first k sample rows
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k_centroids):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def assign_ivf_cells(df: DataFrame, centroids, n_probe: int = 1,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     out: str = "ivf_cell") -> DataFrame:
    """Nearest-centroid assignment (n_probe > 1 -> one row per probed
    centroid, for the query side). One vectorized Arrow pass: batch
    matrix product against the broadcast centroid matrix."""
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return (df.withColumn("_cells", probe_cells(F.col(vec_col)))
              .withColumn(out, F.explode("_cells")).drop("_cells"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int,
             k_centroids: int = 16, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_mod: int = 1) -> DataFrame:
    """IVF ANN: corpus partitioned by nearest centroid (1 cell each),
    queries probe their ``n_probe`` nearest cells; equi-join on cell
    then exact dot-product re-rank. At 100 TB the corpus assignment is
    a one-off indexing job (written as an Iceberg partition column);
    searches only touch probed partitions."""
    cent = ivf_centroids(corpus, k_centroids, id_col=id_col, vec_col=vec_col,
                         sample_mod=sample_mod)
    c = (assign_ivf_cells(corpus, cent, 1, id_col, vec_col)
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("c_vec"), "ivf_cell"))
    q = (assign_ivf_cells(queries, cent, n_probe, id_col, vec_col)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("q_vec"), "ivf_cell"))
    pairs = q.join(c, "ivf_cell").filter(F.col("query_id") != F.col("neighbor_id"))
    # no dedup: each corpus vector lives in exactly one cell, so a
    # (query, neighbor) pair joins at most once even with n_probe > 1
    return _rerank_topk(pairs, k)


def ivf_fixed_assign(df: DataFrame, centroids, vec_col: str = "embedding",
                     out: str = "ivf_cell") -> DataFrame:
    """Nearest-centroid assignment for a FIXED coarse quantizer —
    pure column math (left-fold dot products + array argmin), no
    Python: bit-exact against a SQL mirror with the centroid constants
    inlined. ||x-c||^2 compared via -2*x.c + ||c||^2 (||x||^2 constant
    per row); ties resolve to the first (lowest-index) centroid."""
    ds = []
    for c in centroids:
        arr = F.array(*[F.lit(float(v)) for v in c])
        ss = float(sum(float(v) * float(v) for v in c))
        ds.append(F.lit(-2.0) * dot_double(F.col(vec_col), arr) + F.lit(ss))
    dist_arr = F.array(*ds)
    cell = (F.array_position(dist_arr, F.array_min(dist_arr)) - 1).cast("int")
    return df.withColumn(out, cell)


def ivf_fixed_topk(queries: DataFrame, corpus: DataFrame, centroids,
                   k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """IVF ANN with a fixed quantizer, n_probe=1: same cell-equi-join +
    exact re-rank plan shape as ivf_topk, but every step is column math
    so the driver oracle value-checks it (the learned-centroid variant
    keeps its recall pytest)."""
    c = (ivf_fixed_assign(corpus, centroids, vec_col)
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("c_vec"), "ivf_cell"))
    q = (ivf_fixed_assign(queries, centroids, vec_col)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("q_vec"), "ivf_cell"))
    pairs = q.join(c, "ivf_cell").filter(F.col("query_id") != F.col("neighbor_id"))
    return _rerank_topk(pairs, k)


def cosine_neardup_pairs(df: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         dim: int | None = None, n_planes: int = 8,
                         seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold). The DEFAULT is the scale path: pairing blocked by LSH
    bucket (same-bucket equi-join — the cross product never
    materializes; recall traded for the eliminated O(n^2)). The exact
    all-pairs baseline is OPT-IN via an explicit ``n_planes=0`` and is
    for bounded inputs only (the oracle/correctness path). ``dim`` is
    inferred from the first row when omitted on the bucketed path."""
    if n_planes > 0 and dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(row["d"]) if row is not None else 0
    # norm once per ROW, not per pair — inside the pair join the
    # higher-order fold would re-run O(d) work per candidate pair
    normed = df.withColumn("_norm", norm_double(F.col(vec_col)))
    a = normed.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("va"), F.col("_norm").alias("_na"))
    b = normed.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"), F.col("_norm").alias("_nb"))
    if n_planes > 0:
        a = with_lsh_bucket(a, dim, n_planes, "va", seed)
        b = with_lsh_bucket(b, dim, n_planes, "vb", seed)
        pairs = a.join(b, "lsh_bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = dot_double(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return (pairs.withColumn("cosine", cos)
            .filter(F.col("cosine") >= F.lit(threshold))
            .select("id_a", "id_b", "cosine"))


def semantic_dedup(df: DataFrame, centroids, threshold: float,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, compare cosine pairs WITHIN a cluster only, and
    drop every row that has a near-duplicate (cosine >= threshold)
    with a smaller id in its cluster — the paper's
    keep-one-per-duplicate-pair greedy, which is a plain EXISTS
    anti-join (no transitive closure). Cross-cluster near-dups are
    missed by design: that recall/cost trade is what makes the method
    linear-ish at corpus scale (pairs form only inside cells, like the
    IVF ANN path). ``centroids`` is a fixed coarse quantizer
    (deterministic, SQL-mirrorable; plug ``ivf_centroids`` output in
    for the learned variant). Zero-norm vectors cannot be near-dups
    and survive untouched (also keeps the cosine division ANSI-safe).
    Returns the surviving rows with their cluster id appended."""
    cells_df = ivf_fixed_assign(df, centroids, vec_col)
    # norm computed ONCE per row before the self-join — inside the
    # join it would re-fold O(d) per PAIR, tripling the quadratic
    # stage's compute (review r3)
    normed = (cells_df.withColumn("_norm", norm_double(F.col(vec_col)))
              .filter(F.col("_norm") > 0))
    a = normed.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("va"),
                      F.col("_norm").alias("_na"), "ivf_cell")
    b = normed.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"),
                      F.col("_norm").alias("_nb"), "ivf_cell")
    cos = (dot_double(F.col("va"), F.col("vb"))
           / (F.col("_na") * F.col("_nb")))
    dropped = (a.join(b, "ivf_cell")
               .filter(F.col("id_a") < F.col("id_b"))
               .withColumn("cosine", cos)
               .filter(F.col("cosine") >= F.lit(threshold))
               .select(F.col("id_b").alias(id_col)).distinct())
    return cells_df.join(dropped, id_col, "left_anti")


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 7) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates: bucket equi-join
    -> exact re-rank. At 100 TB this is the shape that survives — the
    cross product never materializes; each bucket joins locally."""
    q = with_lsh_bucket(queries, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "lsh_bucket")
    c = with_lsh_bucket(corpus, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "lsh_bucket")
    pairs = q.join(c, "lsh_bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    return _rerank_topk(pairs, k)


def recall_report(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact one —
    evaluation as a first-class engine operator ("measure, don't
    guess"): one row per query (query_id, n_exact, n_hit, recall) plus
    the inner join that computes it is a broadcast-size equi-join on
    (query_id, neighbor_id). ``recall`` is n_hit/n_exact — a ratio of
    small integers, exact on any IEEE engine. Feed it lsh_topk vs
    brute_force_topk to pick n_planes from data, not folklore."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id")
    hits = (ex.join(ap, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")))
    per_q = ex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (per_q.join(hits, "query_id", "left")
            .select("query_id", "n_exact",
                    F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                    (F.coalesce("n_hit", F.lit(0)).cast("double")
                     / F.col("n_exact").cast("double")).alias("recall")))


def lsh_multiprobe_topk(queries: DataFrame, corpus: DataFrame, k: int,
                        dim: int, n_planes: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 7) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB 2007, the Hamming-1 probe
    sequence): each query probes its OWN bucket plus the ``n_planes``
    buckets with one sign bit flipped — the near-miss buckets a point
    close to a hyperplane most likely fell into. Recall rises steeply
    for (n_planes + 1)x candidate cost on the QUERY side only; the
    corpus is never replicated, stays one bucket per vector, and the
    same index serves single- and multi-probe queries.

    Probe buckets are distinct per query (distinct XOR bits), so each
    candidate pair meets at most once — no post-join dedup. Exact
    re-rank tail shared with every other ANN path (_rerank_topk)."""
    q = (with_lsh_bucket(queries, dim, n_planes, vec_col, seed)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("q_vec"),
                 F.explode(F.array(
                     F.col("lsh_bucket"),
                     *[F.col("lsh_bucket").bitwiseXOR(F.lit(1 << p))
                       for p in range(n_planes)])).alias("lsh_bucket")))
    c = with_lsh_bucket(corpus, dim, n_planes, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        "lsh_bucket")
    pairs = q.join(c, "lsh_bucket").filter(
        F.col("query_id") != F.col("neighbor_id"))
    return _rerank_topk(pairs, k)


# ---------------------------------------------------------------------------
# Product quantization (fixed codebooks) — IVF-PQ, the workhorse ANN
# layout at warehouse scale: each vector is stored as m small codes
# (here m bytes) instead of d floats, a 64x compression at d=64/m=4
# float32, and search scores candidates from the codes alone (ADC)
# without touching the original vectors. Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011.
# ---------------------------------------------------------------------------

def pq_fixed_encode(df: DataFrame, codebooks, vec_col: str = "embedding",
                    out: str = "pq_code") -> DataFrame:
    """Encode vectors against FIXED per-subspace codebooks: the vector
    is split into m contiguous subvectors; each gets the index of its
    nearest codeword (||x-c||^2 via -2*x.c + ||c||^2, ties to the
    lowest index — the ivf_fixed_assign rule per subspace). Pure
    column math, map-only, bit-exact against the SQL mirror with the
    codeword constants inlined."""
    sub = len(codebooks[0][0])
    codes = []
    for j, cws in enumerate(codebooks):
        subv = F.slice(F.col(vec_col), j * sub + 1, sub)
        ds = []
        for cw in cws:
            arr = F.array(*[F.lit(float(v)) for v in cw])
            ss = float(sum(float(v) * float(v) for v in cw))
            ds.append(F.lit(-2.0) * dot_double(subv, arr) + F.lit(ss))
        darr = F.array(*ds)
        codes.append((F.array_position(darr, F.array_min(darr)) - 1)
                     .cast("int"))
    return df.withColumn(out, F.array(*codes))


def pq_adc_score(q_vec_col, code_col, codebooks):
    """Asymmetric-distance inner product of a full query vector against
    a PQ code: sum over subspaces of dot(q_sub_j, codeword[j][code_j]).
    Per subspace the m-codeword LUT depends only on the query — at
    scale you precompute it once per query and broadcast; here it is
    inlined column math so the oracle can replay it."""
    sub = len(codebooks[0][0])
    total = None
    for j, cws in enumerate(codebooks):
        subv = F.slice(q_vec_col, j * sub + 1, sub)
        lut = F.array(*[dot_double(subv,
                                   F.array(*[F.lit(float(v)) for v in cw]))
                        for cw in cws])
        term = F.element_at(lut, F.element_at(code_col, j + 1) + 1)
        total = term if total is None else total + term
    return total


def ivfpq_fixed_topk(queries: DataFrame, corpus: DataFrame, centroids,
                     codebooks, k: int, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ search, n_probe=1: coarse cell equi-join restricts
    candidates (never all-pairs), then ADC scores them from the m-byte
    codes alone — the corpus embeddings are read once at encode time
    and never again, which is what makes 10^12-vector search feasible.
    Ties broken by ascending neighbor id, like every ANN path here."""
    c = pq_fixed_encode(ivf_fixed_assign(corpus, centroids, vec_col),
                        codebooks, vec_col)
    c = c.select(F.col(id_col).alias("neighbor_id"), "pq_code", "ivf_cell")
    q = (ivf_fixed_assign(queries, centroids, vec_col)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("q_vec"), "ivf_cell"))
    pairs = q.join(c, "ivf_cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "score", pq_adc_score(F.col("q_vec"), F.col("pq_code"), codebooks))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))


def sq8_minmax(corpus: DataFrame, vec_col: str = "embedding"):
    """Per-dimension (min, max) calibration for SQ8 scalar quantization.

    One distributed pass: posexplode -> groupBy(dim) min/max (partial
    aggregation makes the shuffle dim-sized), then a DIM-bounded
    collect — the same bounded-driver-state contract as ivf_centroids.
    min/max involve no arithmetic, so the collected doubles are exact
    corpus values an oracle recomputing them from the same data
    reproduces bit-for-bit."""
    stats = (corpus
             .select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
             .groupBy("pos")
             .agg(F.min(F.col("v").cast("double")).alias("mn"),
                  F.max(F.col("v").cast("double")).alias("mx"))
             .collect())
    dim = max(r["pos"] for r in stats) + 1
    mns, mxs = [0.0] * dim, [0.0] * dim
    for r in stats:
        mns[r["pos"]], mxs[r["pos"]] = float(r["mn"]), float(r["mx"])
    return mns, mxs


def sq8_amax(mns, mxs) -> float:
    """Global symmetric scale bound: max over dims of max(|mn|, |mx|).
    Pure comparisons on exact min/max values — no arithmetic, so any
    engine recomputing it from the same data gets the same double."""
    return max(max(abs(mn), abs(mx)) for mn, mx in zip(mns, mxs))


def sq8_encode_col(vec_col, amax: float):
    """Signed SQ8 code array: clip(floor(v * 127 / amax), -128, 127)
    per component — the SYMMETRIC zero-point scheme. A min-max
    (unsigned) zero point would shift negative components positive and
    the code inner product would rank a different function than the
    true dot (the per-neighbor cross terms don't cancel); around zero,
    cq . cc ~ (127/amax)^2 * vq . vc — a positive monotone transform,
    so ranking is preserved up to quantization error. floor, not round
    (round-half semantics differ between engines; floor is IEEE-exact
    on both). Map-only array transform, no Python."""
    if amax == 0.0:
        return F.transform(vec_col, lambda v: F.lit(0).cast("long"))
    return F.transform(
        vec_col,
        lambda v: F.greatest(
            F.lit(-128).cast("long"),
            F.least(F.lit(127).cast("long"),
                    F.floor(v.cast("double") * F.lit(127.0)
                            / F.lit(float(amax))))))


def sq8_int_score(q_code, c_code):
    """Symmetric quantized inner product: a BIGINT left fold of
    code-by-code products — EXACT integer arithmetic, so the score is
    order-independent and trivially oracle-comparable (unlike any
    float fold)."""
    return F.aggregate(
        F.zip_with(q_code, c_code, lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def sq8_fixed_topk(queries: DataFrame, corpus: DataFrame, centroids,
                   k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding", params=None) -> DataFrame:
    """IVF-SQ8 ANN: coarse cell equi-join (fixed quantizer, n_probe=1)
    + symmetric int8-code scoring — the memory-compression layout
    between raw floats (ivf_fixed_topk) and PQ codes (ivfpq_fixed_topk):
    4x smaller than float32 with far better fidelity than 4-byte PQ.
    At 10^12 vectors the corpus is stored as codes; scoring is integer
    MACs (SIMD-friendly in a real kernel, BIGINT column math here) and
    the ranking (score DESC, neighbor ASC) is exactly reproducible —
    integer scores make this the only ANN path whose SCORE needs no
    IEEE-mirroring argument at all. ``params`` = (mns, mxs) from
    sq8_minmax; omitted -> calibrated on ``corpus``."""
    mns, mxs = params if params is not None else sq8_minmax(corpus, vec_col)
    amax = sq8_amax(mns, mxs)
    enc = lambda: sq8_encode_col(F.col(vec_col), amax)  # noqa: E731
    c = (ivf_fixed_assign(corpus, centroids, vec_col)
         .select(F.col(id_col).alias("neighbor_id"),
                 enc().alias("c_code"), "ivf_cell"))
    q = (ivf_fixed_assign(queries, centroids, vec_col)
         .select(F.col(id_col).alias("query_id"),
                 enc().alias("q_code"), "ivf_cell"))
    pairs = q.join(c, "ivf_cell").filter(
        F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "score", sq8_int_score(F.col("q_code"), F.col("c_code")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score"))


def brute_force_topk_gemm(queries: DataFrame, corpus: DataFrame, k: int,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          metric: str = "dot") -> DataFrame:
    """Exact top-k via per-batch matrix multiply — the throughput form
    of brute_force_topk: the (small, same contract as the broadcast)
    query set is collected into one float64 matrix Q, and every Arrow
    batch of the corpus scores all queries at once with one BLAS GEMM
    (C @ Q.T) instead of one column-fold per (query, vector) pair.
    Each batch emits only its LOCAL top-k per query (np.argpartition),
    so at most n_queries*k rows per batch reach the final per-query
    window — the corpus itself never shuffles.

    Scores agree with brute_force_topk to floating-point accumulation
    order (GEMM sums in a different order than the left fold), so this
    path is for production throughput; the bit-exact DuckDB oracle
    stays on brute_force_topk. Ties broken by ascending neighbor id,
    same as every other top-k here.

    Measured (sf0.1, 5000x64 corpus, local[8]): GEMM is ~flat in query
    count — 0.7s/0.97s/0.96s at 5/200/1000 queries — while the fold
    path grows linearly (0.6s/1.25s/2.36s): Catalyst materializes one
    expression eval per (query, vector) pair, BLAS amortizes the whole
    block. The same asymmetry holds at cluster scale; prefer this path
    whenever the query set exceeds a handful."""
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank long, score double")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    use_cosine = metric == "cosine"

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            S = C @ Q.T  # (batch, n_queries)
            if use_cosine:
                cn = np.sqrt((C * C).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = S / (cn[:, None] * qn[None, :])
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            kk = min(k, len(ids))
            for j in range(len(qids)):
                col = S[:, j].copy()
                # zero-norm cosine scores are NaN: EXCLUDED, matching
                # the fold path's den != 0 filter
                sort_col = np.where(np.isnan(col), -np.inf, col)
                sort_col[ids == qids[j]] = -np.inf  # self-match excluded
                # local top-k, ties by ascending id (same as the window)
                idx = np.lexsort((ids, -sort_col))[:kk]
                keep = sort_col[idx] != -np.inf
                rows["query_id"].extend([qids[j]] * int(keep.sum()))
                rows["neighbor_id"].extend(ids[idx][keep].tolist())
                rows["score"].extend(col[idx][keep].tolist())
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id").asc())
    return (partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("long").alias("rank"), "score"))


def norm_report(emb: DataFrame, lo: float = 0.9, hi: float = 1.1,
                key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Embedding-table QA report: per vector its dimensionality, L2
    norm, and whether the norm falls in [lo, hi] — the sanity gate an
    ANN index build runs first (zero vectors poison cosine scores,
    mixed-norm tables mean someone skipped normalization, a stray
    dim breaks GEMM batching). Map-only; the norm is the per-row
    INDEX-ORDER left fold (norm_double), so the float is
    deterministic and SQL-mirrorable; NULL embeddings report 0 dims
    and NULL norm.

    Returns (key, n_dims, norm, in_range).
    """
    n = F.coalesce(F.size(F.col(vec)), F.lit(0))
    nn = F.when(F.col(vec).isNotNull(), norm_double(F.col(vec)))
    return emb.select(
        F.col(key),
        n.cast("long").alias("n_dims"),
        nn.alias("norm"),
        F.when(F.col(vec).isNotNull(),
               (nn >= float(lo)) & (nn <= float(hi))).alias("in_range"))


def label_centroids(emb: DataFrame, key: str = "vec_id",
                    vec: str = "embedding",
                    label: str = "label") -> DataFrame:
    """Per-class embedding centroids as SCALAR (label, dim, mean)
    rows — the class-geometry report behind "are my labels separable
    before I train" and drift checks between embedding versions.
    NULL embeddings drop (stated).

    Exactness: each (label, dim) mean folds its values in vec_id
    order (F.aggregate over the sorted (key, value) list — the
    repo's IEEE-fold rule), so the float is reproducible and
    SQL-mirrorable; the explode is one posexplode (rows x dims) with
    a single (label, dim) rollup behind it. Per-label row counts
    ride along.

    Returns (label, dim_idx, n_vecs, mean).
    """
    ex = (emb.filter(F.col(vec).isNotNull())
          .select(F.col(label).alias("_l"), F.col(key).alias("_k"),
                  F.posexplode(F.col(vec)).alias("dim_idx", "_v")))
    return (ex.groupBy("_l", "dim_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.aggregate(
                     F.array_sort(F.collect_list(
                         F.struct("_k", F.col("_v").cast("double")
                                  .alias("_d")))),
                     F.lit(0.0), lambda acc, x: acc + x["_d"])
                 .alias("_s"))
            .select(F.col("_l").alias("label"),
                    F.col("dim_idx").cast("long").alias("dim_idx"),
                    "n_vecs",
                    (F.col("_s") / F.col("n_vecs").cast("double"))
                    .alias("mean")))


def centroid_separation(centroids: DataFrame) -> DataFrame:
    """Pairwise Euclidean distances between class centroids (input =
    label_centroids output): the separability matrix — near-zero
    separation between two labels predicts confusion before any
    classifier run. Per-pair squared diffs fold in dim order (the
    same IEEE-fold rule), one sqrt.

    Returns (label_a, label_b, dist) with label_a < label_b.
    """
    a = centroids.select(F.col("label").alias("label_a"), "dim_idx",
                         F.col("mean").alias("_ma"))
    b = centroids.select(F.col("label").alias("label_b"),
                         F.col("dim_idx").alias("_d2"),
                         F.col("mean").alias("_mb"))
    j = (a.join(b, (a["dim_idx"] == b["_d2"])
                & (a["label_a"] < b["label_b"]))
         .select("label_a", "label_b", "dim_idx",
                 ((F.col("_ma") - F.col("_mb"))
                  * (F.col("_ma") - F.col("_mb"))).alias("_q")))
    return (j.groupBy("label_a", "label_b")
            .agg(F.sqrt(F.aggregate(
                F.array_sort(F.collect_list(F.struct("dim_idx", "_q"))),
                F.lit(0.0), lambda acc, x: acc + x["_q"]))
                .alias("dist")))


def class_scatter(emb: DataFrame, key: str = "vec_id",
                  vec: str = "embedding",
                  label: str = "label") -> DataFrame:
    """Within-class scatter per label — the denominator of a Fisher
    separability read (centroid_separation gives the between-class
    numerator): mean squared distance of each class's vectors to
    their own centroid. A label whose scatter rivals its separation
    from the nearest other centroid WILL confuse a classifier.

    Double-fold exactness: each vector's squared distance to its
    centroid folds the squared diffs in DIM order, and the class
    total folds those distances in vec_id order — both under the
    repo's IEEE-fold rule, so every float is SQL-mirrorable
    (nested LIST_REDUCEs on the oracle side). Two passes over the
    exploded frame (centroid rollup, then the join-back), shuffles
    keyed on (label, dim) and (label, vec).

    Returns (label, n_vecs, wss, mean_d2).
    """
    cent = label_centroids(emb, key=key, vec=vec, label=label)
    ex = (emb.filter(F.col(vec).isNotNull())
          .select(F.col(label).alias("_l"), F.col(key).alias("_k"),
                  F.posexplode(F.col(vec)).alias("dim_idx", "_v")))
    j = (ex.join(cent.select(F.col("label").alias("_l"), "dim_idx",
                             "mean"),
                 ["_l", "dim_idx"])
         .select("_l", "_k", "dim_idx",
                 ((F.col("_v").cast("double") - F.col("mean"))
                  * (F.col("_v").cast("double") - F.col("mean")))
                 .alias("_q")))
    per_vec = (j.groupBy("_l", "_k")
               .agg(F.aggregate(
                   F.array_sort(F.collect_list(F.struct("dim_idx", "_q"))),
                   F.lit(0.0), lambda acc, x: acc + x["_q"])
                   .alias("_d2")))
    return (per_vec.groupBy("_l")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.aggregate(
                     F.array_sort(F.collect_list(F.struct("_k", "_d2"))),
                     F.lit(0.0), lambda acc, x: acc + x["_d2"])
                 .alias("wss"))
            .select(F.col("_l").alias("label"), "n_vecs", "wss",
                    (F.col("wss") / F.col("n_vecs").cast("double"))
                    .alias("mean_d2")))


def _sq_dist2(vec_col, cent_col):
    """Squared Euclidean distance: per-dim squared diffs in dim order,
    folded left in double (the repo's IEEE-fold rule — mirrored by
    LIST_REDUCE(LIST_PREPEND(0.0, ...)) on the oracle side)."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col,
                   lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0), lambda acc, v: acc + v)


def kmeans_fixed_assign(emb: DataFrame, k: int = 4, n_iter: int = 2,
                        key: str = "vec_id",
                        vec: str = "embedding") -> DataFrame:
    """Fixed-iteration Lloyd k-means over an embedding column — the
    deterministic clustering twin of ivf_centroids' sampled build
    (GeoClusterer.java's EM loop is the reference's analog shape;
    here the vector-space version a curation pipeline uses to carve
    a corpus into k topical shards).

    Deterministic and value-exact by construction:
      - seeds = the embeddings of the k smallest keys (cluster id =
        seed rank), so no RNG;
      - assignment = argmin over clusters of the dim-order left-fold
        squared distance, ties broken by smaller cluster id via a
        lexicographic min(struct(dist2, cid)) — float comparisons
        only ever DECIDE here, and both sides compute bit-identical
        distances;
      - update = per-(cluster, dim) mean folding member values in
        key order (label_centroids' rule), one division.

    Scale shape: centroids are k rows — every assignment is a
    broadcast nested-loop against a k-row local array (collected
    per-iteration, O(k * dim) driver bytes, bounded by design like
    ivf_centroids); each update is one (cluster, dim) hash shuffle.
    ``n_iter`` assignment rounds with ``n_iter - 1`` updates between
    them; iterations are bounded (this is the fixed-round contract
    variant, not a convergence loop).

    Returns (key, cluster, dist2) for the final assignment.
    """
    e = (emb.filter(F.col(vec).isNotNull())
         .select(F.col(key).alias("_k"),
                 F.col(vec).cast("array<double>").alias("_v")))

    seeds = (e.orderBy("_k").limit(k)
             .select("_k", F.col("_v").alias("_c"))
             .withColumn("cid", F.row_number().over(
                 Window.orderBy("_k")) - 1)
             .select("cid", "_c"))

    def assign(frame: DataFrame, cents: DataFrame) -> DataFrame:
        j = frame.crossJoin(F.broadcast(cents)).select(
            "_k", "_v", "cid", _sq_dist2(F.col("_v"), F.col("_c")).alias("_d2"))
        return (j.groupBy("_k")
                .agg(F.min(F.struct(F.col("_d2"), F.col("cid"))).alias("_m"),
                     F.first("_v").alias("_v"))
                .select("_k", "_v", F.col("_m._d2").alias("dist2"),
                        F.col("_m.cid").alias("cluster")))

    def update(assigned: DataFrame) -> DataFrame:
        ex = assigned.select("cluster", "_k",
                             F.posexplode("_v").alias("_d", "_x"))
        dim_means = (ex.groupBy("cluster", "_d")
                     .agg((F.aggregate(
                         F.array_sort(F.collect_list(
                             F.struct("_k", F.col("_x").alias("_val")))),
                         F.lit(0.0), lambda acc, s: acc + s["_val"])
                         / F.count(F.lit(1)).cast("double")).alias("_m")))
        return (dim_means.groupBy("cluster")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("_d", "_m"))),
                    lambda s: s["_m"]).alias("_c"))
                .select(F.col("cluster").alias("cid"), "_c"))

    cents = seeds
    assigned = assign(e, cents)
    for _ in range(max(0, n_iter - 1)):
        assigned = assign(e, update(assigned))
    return assigned.select(F.col("_k").alias(key),
                           F.col("cluster").cast("long").alias("cluster"),
                           "dist2")


def pq_recon_report(df: DataFrame, codebooks, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """PQ quantization-error report: per (vector, subspace) the chosen
    codeword (pq_fixed_encode's argmin rule — ties to the lowest
    index) and the exact reconstruction error
    ||x_sub - c||^2 = (-2 x.c + ||c||^2) + ||x_sub||^2 — the index-QA
    query behind "is my codebook big enough": a subspace whose mean
    error rivals the vector norms is quantizing to noise. Map-only
    column math (no shuffle until the caller aggregates); every float
    is the dim-order left fold + one add, SQL-mirrorable with the
    codeword constants inlined.

    Returns (id_col, subspace, code, sub_err).
    """
    sub = len(codebooks[0][0])
    per_sub = []
    for j, cws in enumerate(codebooks):
        subv = F.slice(F.col(vec_col), j * sub + 1, sub)
        xx = F.aggregate(
            F.transform(subv, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)
        ds = []
        for cw in cws:
            arr = F.array(*[F.lit(float(v)) for v in cw])
            ss = float(sum(float(v) * float(v) for v in cw))
            ds.append(F.lit(-2.0) * dot_double(subv, arr) + F.lit(ss))
        darr = F.array(*ds)
        per_sub.append(F.struct(
            F.lit(j).cast("int").alias("subspace"),
            (F.array_position(darr, F.array_min(darr)) - 1)
            .cast("int").alias("code"),
            (F.array_min(darr) + xx).alias("sub_err")))
    return (df.filter(F.col(vec_col).isNotNull())
            .select(id_col, F.explode(F.array(*per_sub)).alias("_r"))
            .select(id_col, "_r.subspace", "_r.code", "_r.sub_err"))


def ivf_balance_report(corpus: DataFrame, centroids,
                       vec_col: str = "embedding") -> DataFrame:
    """IVF index-balance QA: per coarse cell its vector count, corpus
    share, and balance factor (count / ideal-uniform count) — the
    report that tells you a quantizer is funneling the corpus into
    few cells BEFORE the skewed cells become stragglers in every
    probe join. One assignment pass (ivf_fixed_assign — pure column
    math) + one k-row rollup; the k-row total broadcasts back, so no
    windows and no driver loops. Both floats are one integer-ratio
    division each (exact, SQL-mirrorable).

    Returns (ivf_cell, n_vecs, share, balance).
    """
    k = len(centroids)
    a = ivf_fixed_assign(corpus.filter(F.col(vec_col).isNotNull()),
                         centroids, vec_col=vec_col)
    g = a.groupBy("ivf_cell").agg(F.count(F.lit(1)).cast("long")
                                  .alias("n_vecs"))
    tot = g.agg(F.sum("n_vecs").cast("long").alias("_tot"))
    return (g.crossJoin(F.broadcast(tot))
            .select(F.col("ivf_cell").cast("int").alias("ivf_cell"),
                    "n_vecs",
                    (F.col("n_vecs").cast("double")
                     / F.col("_tot").cast("double")).alias("share"),
                    (F.col("n_vecs").cast("double") * float(k)
                     / F.col("_tot").cast("double")).alias("balance")))
