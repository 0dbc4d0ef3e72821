"""Embedding/ANN contract queries + oracles (embed_*, ann_*).

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

from ._core import (M_PER_DEG, _EV_LAT_SQL, _EV_LON_SQL, _dlit,  # noqa: F401
                    _event_pts, _fmt2, _line_wkt, _t)  # noqa: F401


def q_ann_topk(spark, sf_dir):
    """Brute-force dot-product top-5 for the first 5 vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.brute_force_topk(q, emb, k=5)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


O_ANN_TOPK = """WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
p AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])),
                                 x -> x[1] * x[2])) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
r AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, score
FROM r WHERE rn <= 5"""


def q_hybrid_lang_ann(spark, sf_dir):
    """Hybrid metadata+vector retrieval: restrict the ANN corpus to
    English documents (semi-join embeddings against the documents
    table on id), then exact top-3 by dot product for the first 3
    query vectors — the filtered-retrieval composition a curation/RAG
    pipeline runs. The semi-join prunes BEFORE any scoring and the
    corpus side still never shuffles (broadcast queries + window
    top-k, same shape as ann_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    en = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    sub = emb.join(en.select(F.col("doc_id").alias("vec_id")),
                   "vec_id", "leftsemi")
    q = emb.filter(F.col("vec_id") < 3)
    out = vector.brute_force_topk(q, sub, k=3)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


O_HYBRID_LANG_ANN = """WITH sub AS (
  SELECT e.* FROM embeddings e
  WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
p AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])),
                                 x -> x[1] * x[2])) AS score
  FROM q, sub e WHERE e.vec_id <> q.query_id),
r AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, score
FROM r WHERE rn <= 3"""


def q_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (scale path). The hyperplanes are deterministic
    constants, so bucket assignment AND the re-rank mirror into SQL —
    value-exact despite being the approximate path."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.lsh_topk(q, emb, k=5, dim=64, n_planes=4)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


def _o_lsh_topk(dim: int = 64, n_planes: int = 4, k: int = 5,
                seed: int = 7) -> str:
    bucket_terms = []
    for p in range(n_planes):
        plane = vector._hyperplane(dim, p, seed)
        lits = ", ".join(repr(c) for c in plane)
        proj = (f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(embedding AS DOUBLE[]), "
                f"[{lits}]), x -> x[1] * x[2]))")
        bucket_terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    return f"""WITH e AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < 5),
p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])),
                                 x -> x[1] * x[2])) AS score
  FROM q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.query_id),
r AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, score
FROM r WHERE rn <= {k}"""


O_ANN_LSH_TOPK = _o_lsh_topk()


def q_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (vector.lsh_multiprobe_topk): queries probe
    their bucket plus every Hamming-1 bucket. Same deterministic
    hyperplanes as ann_lsh_topk, so the probe expansion, candidate
    set, and re-ranked scores all mirror into SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.lsh_multiprobe_topk(q, emb, k=5, dim=64, n_planes=4)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


def _o_lsh_multiprobe(dim: int = 64, n_planes: int = 4, k: int = 5,
                      seed: int = 7) -> str:
    base = _o_lsh_topk(dim, n_planes, k, seed)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})"
                                     for p in range(n_planes)])
    old = ("q AS (SELECT vec_id AS query_id, embedding AS qv, bucket "
           "FROM e WHERE vec_id < 5),")
    new = (f"q AS (SELECT vec_id AS query_id, embedding AS qv, "
           f"UNNEST([{probes}]) AS bucket FROM e WHERE vec_id < 5),")
    assert old in base
    return base.replace(old, new)


O_ANN_LSH_MULTIPROBE = _o_lsh_multiprobe()


def q_ann_recall(spark, sf_dir):
    """In-engine ANN evaluation (vector.recall_report): recall@5 of
    the single-probe LSH path against exact brute force, per query —
    the measure-don't-guess operator. The recall float is a ratio of
    small integers, exact on both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    approx = vector.lsh_topk(q, emb, k=5, dim=64, n_planes=4)
    exact = vector.brute_force_topk(q, emb, k=5)
    return (vector.recall_report(approx, exact)
            .select(F.col("query_id").cast("long").alias("query_id"),
                    "n_exact", "n_hit", "recall"))


def _o_ann_recall() -> str:
    lsh = _o_lsh_topk()
    cut = lsh.rindex("\nSELECT CAST(query_id")
    assert lsh[:4] == "WITH"
    head = lsh[:cut]  # WITH e..., q..., p..., r AS (...)
    return f"""{head},
bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       WHERE vec_id < 5),
bp AS (
  SELECT bq.query_id, e2.vec_id AS neighbor_id,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(bq.qv AS DOUBLE[]),
                                          CAST(e2.embedding AS DOUBLE[])),
                                 x -> x[1] * x[2])) AS score
  FROM bq, embeddings e2 WHERE e2.vec_id <> bq.query_id),
br AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM bp),
exact AS (SELECT query_id, neighbor_id FROM br WHERE rn <= 5),
approx AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
hits AS (SELECT query_id, COUNT(*) AS n_hit
         FROM exact JOIN approx USING (query_id, neighbor_id)
         GROUP BY query_id),
perq AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
SELECT CAST(query_id AS BIGINT) AS query_id, n_exact,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
FROM perq LEFT JOIN hits USING (query_id)"""


O_ANN_RECALL = _o_ann_recall()


def q_ann_prefix_recall(spark, sf_dir):
    """Matryoshka prefix-dimension QA (the truncated-embedding trick:
    rank with the first 16 of 64 dims, measure what full-dim recall
    survives): brute-force top-5 over the prefix slice vs the full
    vector, per-query recall via vector.recall_report. The decision
    an index designer reads before shipping truncated vectors at
    1/4 the bytes."""
    emb = _t(spark, sf_dir, "embeddings")
    pre = emb.withColumn("embedding", F.slice("embedding", 1, 16))
    approx = vector.brute_force_topk(pre.filter(F.col("vec_id") < 5),
                                     pre, k=5)
    exact = vector.brute_force_topk(emb.filter(F.col("vec_id") < 5),
                                    emb, k=5)
    return (vector.recall_report(approx, exact)
            .select(F.col("query_id").cast("long").alias("query_id"),
                    "n_exact", "n_hit", "recall"))


_O_DOT_SQL = ("LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
              "x -> x[1] * x[2]))")

O_ANN_PREFIX_RECALL = f"""WITH pq AS (
  SELECT vec_id AS query_id,
         (CAST(embedding AS DOUBLE[]))[1:16] AS qv
  FROM embeddings WHERE vec_id < 5),
pp AS (
  SELECT pq.query_id, e2.vec_id AS neighbor_id,
         {_O_DOT_SQL.format(a='pq.qv',
                            b='(CAST(e2.embedding AS DOUBLE[]))[1:16]')}
           AS score
  FROM pq, embeddings e2 WHERE e2.vec_id <> pq.query_id),
pr AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM pp),
bq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       FROM embeddings WHERE vec_id < 5),
bp AS (
  SELECT bq.query_id, e2.vec_id AS neighbor_id,
         {_O_DOT_SQL.format(a='bq.qv',
                            b='CAST(e2.embedding AS DOUBLE[])')} AS score
  FROM bq, embeddings e2 WHERE e2.vec_id <> bq.query_id),
br AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM bp),
exact AS (SELECT query_id, neighbor_id FROM br WHERE rn <= 5),
approx AS (SELECT query_id, neighbor_id FROM pr WHERE rn <= 5),
hits AS (SELECT query_id, COUNT(*) AS n_hit
         FROM exact JOIN approx USING (query_id, neighbor_id)
         GROUP BY query_id),
perq AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
SELECT CAST(query_id AS BIGINT) AS query_id, n_exact,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
FROM perq LEFT JOIN hits USING (query_id)"""


_IVF_FIXED_CENTROIDS = [vector._hyperplane(64, j, seed=11) for j in range(4)]


def q_ivf_fixed_topk(spark, sf_dir):
    """IVF ANN with a FIXED coarse quantizer (pure column math,
    n_probe=1) — the cell-partition + re-rank plan shape of ivf_topk
    made value-exact by inlining the centroid constants in the oracle.
    The learned-centroid variant (ann_ivf_topk) stays rows-only with
    its recall pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.ivf_fixed_topk(q, emb, _IVF_FIXED_CENTROIDS, k=5)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


def _o_ivf_fixed(k: int = 5) -> str:
    dists = []
    for c in _IVF_FIXED_CENTROIDS:
        lits = ", ".join(repr(float(v)) for v in c)
        ss = repr(float(sum(float(v) * float(v) for v in c)))
        dists.append(f"(-2.0 * LIST_SUM(LIST_TRANSFORM(LIST_ZIP("
                     f"CAST(embedding AS DOUBLE[]), [{lits}]), "
                     f"x -> x[1] * x[2])) + {ss})")
    darr = "[" + ", ".join(dists) + "]"
    return f"""WITH e AS (
  SELECT vec_id, embedding,
         LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS cell
  FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM e WHERE vec_id < 5),
p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])),
                                 x -> x[1] * x[2])) AS score
  FROM q JOIN e c ON q.cell = c.cell AND c.vec_id <> q.query_id),
r AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, score
FROM r WHERE rn <= {k}"""


O_ANN_IVF_FIXED = _o_ivf_fixed()


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact baseline on a bounded
    slice; LSH-blocked variant is the scale path, recall in pytest)."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    out = vector.cosine_neardup_pairs(emb, threshold=0.35, n_planes=0)
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"), "cosine")


O_EMBED_NEARDUP = """WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 300),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.v, b.v), x -> x[1] * x[2]))
         / (SQRT(LIST_SUM(LIST_TRANSFORM(a.v, x -> x * x)))
            * SQRT(LIST_SUM(LIST_TRANSFORM(b.v, x -> x * x)))) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, cosine
FROM p WHERE cosine >= 0.35"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (vector.semantic_dedup): fixed-quantizer clusters +
    within-cluster cosine, drop rows with a smaller-id near-dup in
    their cluster. threshold 0.2 so the planted embeddings actually
    collide; survivors' ids and cells value-compare."""
    emb = _t(spark, sf_dir, "embeddings")
    out = vector.semantic_dedup(emb, _IVF_FIXED_CENTROIDS, 0.2)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("ivf_cell").cast("int").alias("ivf_cell"))


def _o_semantic_dedup(threshold: float = 0.2) -> str:
    # LIST_REDUCE left folds throughout, never LIST_SUM (CLAUDE.md
    # rule): ivf_cell is a value-compared argmin over these floats and
    # the cosine feeds a keep/drop threshold — both must be the same
    # IEEE fold F.aggregate runs
    fold = ("LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), {expr}), "
            "(acc, x) -> acc + x)")
    dists = []
    for c in _IVF_FIXED_CENTROIDS:
        dot = _sql_dot_lits("CAST(embedding AS DOUBLE[])", c)
        ss = repr(float(sum(float(v) * float(v) for v in c)))
        dists.append(f"(-2.0 * {dot} + {ss})")
    darr = "[" + ", ".join(dists) + "]"
    norm = fold.format(expr="LIST_TRANSFORM({v}, x -> x * x)")
    na = "SQRT(" + norm.format(v="a.v") + ")"
    nb = "SQRT(" + norm.format(v="b.v") + ")"
    dot_ab = fold.format(
        expr="LIST_TRANSFORM(LIST_ZIP(a.v, b.v), x -> x[1] * x[2])")
    nself = "SQRT(" + norm.format(v="v") + ")"
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS cell
  FROM embeddings),
nz AS (SELECT * FROM e WHERE {nself} > 0),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM nz a JOIN nz b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {dot_ab} / ({na} * {nb}) >= {threshold})
SELECT CAST(e.vec_id AS BIGINT) AS vec_id, CAST(cell AS INT) AS ivf_cell
FROM e ANTI JOIN dropped d ON e.vec_id = d.vec_id"""


def q_ivf_topk(spark, sf_dir):
    """IVF ANN: nearest-centroid partitioning + n_probe cell search +
    exact re-rank (numpy centroids — rows-only; recall-vs-brute-force
    in pytest, n_probe=k_centroids recovers the exact result)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return vector.ivf_topk(q, emb, k=5, k_centroids=8, n_probe=3)


# 4 subspaces x 4 codewords x 16 dims — deterministic fixed codebooks
# from the same hyperplane generator the LSH/IVF constants use
_PQ_CODEBOOKS = [[vector._hyperplane(16, 4 * j + i, seed=23)
                  for i in range(4)] for j in range(4)]


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (vector.ivfpq_fixed_topk): coarse cell equi-join +
    asymmetric-distance scoring from 4-byte PQ codes — the
    10^12-vector layout (codes instead of floats) made value-exact by
    inlining both the coarse centroids and the per-subspace codebooks
    into the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.ivfpq_fixed_topk(q, emb, _IVF_FIXED_CENTROIDS,
                                  _PQ_CODEBOOKS, k=5)
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


def _sql_dot_lits(a_expr: str, cw) -> str:
    """Sequential left-fold dot product — LIST_REDUCE, not LIST_SUM:
    LIST_SUM's summation order is not guaranteed to be the plain left
    fold, while this fold is bit-identical to F.aggregate. Every
    literal carries an ``e0`` exponent so DuckDB parses it as DOUBLE
    at the token level — a bare 17-digit literal is typed
    DECIMAL(18,17), which loses an ULP BEFORE any cast back to double
    (measured: 0.16489497914621032 parses one ULP low via DECIMAL)."""
    lits = ", ".join(_dlit(v) for v in cw)
    return (f"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
            f"LIST_TRANSFORM(LIST_ZIP({a_expr}, [{lits}]), "
            f"x -> x[1] * x[2])), (acc, v) -> acc + v)")


def _o_ivfpq(k: int = 5) -> str:
    sub = 16
    dists = []
    for c in _IVF_FIXED_CENTROIDS:
        ss = _dlit(sum(float(v) * float(v) for v in c))
        dists.append(f"(-2.0 * {_sql_dot_lits('CAST(embedding AS DOUBLE[])', c)}"
                     f" + {ss})")
    darr = "[" + ", ".join(dists) + "]"
    code_exprs = []
    for j, cws in enumerate(_PQ_CODEBOOKS):
        sl = f"(CAST(embedding AS DOUBLE[]))[{j * sub + 1}:{j * sub + sub}]"
        ds = []
        for cw in cws:
            ss = _dlit(sum(float(v) * float(v) for v in cw))
            ds.append(f"(-2.0 * {_sql_dot_lits(sl, cw)} + {ss})")
        dj = "[" + ", ".join(ds) + "]"
        code_exprs.append(f"LIST_INDEXOF({dj}, LIST_MIN({dj})) - 1")
    codes = "[" + ", ".join(code_exprs) + "]"
    terms = []
    for j, cws in enumerate(_PQ_CODEBOOKS):
        sl = f"(CAST(q.qv AS DOUBLE[]))[{j * sub + 1}:{j * sub + sub}]"
        lut = "[" + ", ".join(_sql_dot_lits(sl, cw) for cw in cws) + "]"
        terms.append(f"({lut})[c.pq_code[{j + 1}] + 1]")
    # explicit left association — bit-identical to Spark's chained `+`
    adc = terms[0]
    for t in terms[1:]:
        adc = f"({adc} + {t})"
    return f"""WITH e AS (
  SELECT vec_id, embedding,
         LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS cell,
         {codes} AS pq_code
  FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM e WHERE vec_id < 5),
p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {adc} AS score
  FROM q JOIN e c ON q.cell = c.cell AND c.vec_id <> q.query_id),
r AS (SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id ASC) AS rn
      FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, score
FROM r WHERE rn <= {k}"""


def q_ann_sq8_topk(spark, sf_dir):
    """IVF-SQ8 ANN (vector.sq8_fixed_topk): coarse cell equi-join +
    signed symmetric int8-code inner product — the 4x-compressed
    corpus layout between raw floats and PQ codes. Calibration is a
    distributed per-dim min/max pass reduced to one global |v| bound
    (comparisons only, so both engines recover the identical double
    from the data); quantization is floor-based (round-half semantics
    differ between engines, floor does not) and the score is a BIGINT
    fold — the one ANN score that needs no IEEE-mirroring argument at
    all."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = vector.sq8_fixed_topk(q, emb, _IVF_FIXED_CENTROIDS, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("score").cast("long").alias("score"))


def _o_sq8(k: int = 5) -> str:
    dists = []
    for c in _IVF_FIXED_CENTROIDS:
        ss = _dlit(sum(float(v) * float(v) for v in c))
        dists.append(f"(-2.0 * {_sql_dot_lits('CAST(embedding AS DOUBLE[])', c)}"
                     f" + {ss})")
    darr = "[" + ", ".join(dists) + "]"
    code = (
        "LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), v -> "
        "CASE WHEN amax = 0e0 THEN CAST(0 AS BIGINT) "
        "ELSE GREATEST(CAST(-128 AS BIGINT), LEAST(CAST(127 AS BIGINT), "
        "CAST(FLOOR(v * 127.0 / amax) AS BIGINT))) END)")
    return f"""WITH params AS (
  SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM (
    SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS v,
           UNNEST(RANGE(1, LEN(embedding)+1)) AS pos FROM embeddings)
  GROUP BY pos),
pl AS (SELECT MAX(GREATEST(ABS(mn), ABS(mx))) AS amax FROM params),
e AS (
  SELECT vec_id,
         LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS cell,
         {code} AS code
  FROM embeddings, pl),
q AS (SELECT vec_id AS query_id, code AS qc, cell FROM e WHERE vec_id < 5),
p AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
           LIST_TRANSFORM(LIST_ZIP(q.qc, c.code), x -> x[1] * x[2])),
           (a, v) -> a + v) AS score
  FROM q JOIN e c ON q.cell = c.cell AND c.vec_id <> q.query_id),
r AS (SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id ASC) AS rn
      FROM p)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, CAST(score AS BIGINT) AS score
FROM r WHERE rn <= {k}"""


_NORM_LO, _NORM_HI = 0.9, 1.1


def q_embed_norm_report(spark, sf_dir):
    """Embedding-table QA (vector.norm_report): per-vector dim count,
    L2 norm (index-order left fold + sqrt — deterministic, mirrored
    by LIST_REDUCE(LIST_PREPEND(0.0, ...))), and an in-[0.9, 1.1]
    normalization flag."""
    from .. import vector
    emb = _t(spark, sf_dir, "embeddings")
    return vector.norm_report(emb, _NORM_LO, _NORM_HI)


def _o_norm_report(lo: float, hi: float) -> str:
    fold = ("LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
            "LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) "
            "* CAST(x AS DOUBLE))), (acc, v) -> acc + v)")
    return f"""SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(COALESCE(LEN(embedding), 0) AS BIGINT) AS n_dims,
       CASE WHEN embedding IS NOT NULL THEN SQRT({fold}) END AS norm,
       CASE WHEN embedding IS NOT NULL THEN
         SQRT({fold}) >= {_dlit(lo)} AND SQRT({fold}) <= {_dlit(hi)}
       END AS in_range
FROM embeddings"""


O_EMBED_NORM_REPORT = _o_norm_report(_NORM_LO, _NORM_HI)


def q_embed_centroids(spark, sf_dir):
    """Per-class embedding centroids (vector.label_centroids): scalar
    (label, dim, mean) rows, each mean a vec_id-ordered IEEE fold /
    count — the class-geometry QA frame."""
    from .. import vector
    return vector.label_centroids(_t(spark, sf_dir, "embeddings"))


O_EMBED_CENTROIDS = """WITH ex AS (
  SELECT label AS l, vec_id AS k, i - 1 AS dim_idx,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM (SELECT label, vec_id, embedding,
               UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
        FROM embeddings WHERE embedding IS NOT NULL))
SELECT l AS label, CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         LIST(v ORDER BY k)), (acc, x) -> acc + x)
         / CAST(COUNT(*) AS DOUBLE) AS mean
FROM ex GROUP BY l, dim_idx"""


def q_embed_separation(spark, sf_dir):
    """Class-centroid separability matrix (vector.centroid_separation
    over label_centroids): pairwise Euclidean distances, squared
    diffs folded in dim order, one sqrt — 45 rows for the 10-label
    fixture."""
    from .. import vector
    cent = vector.label_centroids(_t(spark, sf_dir, "embeddings"))
    return vector.centroid_separation(cent)


O_EMBED_SEPARATION = f"""WITH cent AS MATERIALIZED ({O_EMBED_CENTROIDS}),
pr AS (
  SELECT a.label AS label_a, b.label AS label_b, a.dim_idx,
         (a.mean - b.mean) * (a.mean - b.mean) AS q
  FROM cent a JOIN cent b
    ON b.dim_idx = a.dim_idx AND a.label < b.label)
SELECT label_a, label_b,
       SQRT(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         LIST(q ORDER BY dim_idx)), (acc, x) -> acc + x)) AS dist
FROM pr GROUP BY label_a, label_b"""


def q_embed_scatter(spark, sf_dir):
    """Within-class scatter (vector.class_scatter): per-label mean
    squared distance to the own centroid — the Fisher-denominator
    companion to embed_label_separation; double IEEE fold (dims then
    vec_ids) mirrored by nested LIST_REDUCEs."""
    from .. import vector
    return vector.class_scatter(_t(spark, sf_dir, "embeddings"))


O_EMBED_SCATTER = f"""WITH cent AS MATERIALIZED ({O_EMBED_CENTROIDS}),
ex AS (
  SELECT label AS l, vec_id AS k, i - 1 AS dim_idx,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM (SELECT label, vec_id, embedding,
               UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
        FROM embeddings WHERE embedding IS NOT NULL)),
q AS (
  SELECT ex.l, ex.k, ex.dim_idx,
         (ex.v - cent.mean) * (ex.v - cent.mean) AS q
  FROM ex JOIN cent ON cent.label = ex.l
                   AND cent.dim_idx = ex.dim_idx),
pv AS MATERIALIZED (
  SELECT l, k,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(q ORDER BY dim_idx)), (acc, x) -> acc + x) AS d2
  FROM q GROUP BY l, k)
SELECT l AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         LIST(d2 ORDER BY k)), (acc, x) -> acc + x) AS wss,
       LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         LIST(d2 ORDER BY k)), (acc, x) -> acc + x)
         / CAST(COUNT(*) AS DOUBLE) AS mean_d2
FROM pv GROUP BY l"""


def q_embed_kmeans(spark, sf_dir):
    """Fixed-iteration Lloyd k-means (vector.kmeans_fixed_assign,
    k=4, two assignment rounds with one centroid update between
    them) — the deterministic corpus-sharding clustering
    (GeoClusterer.java:186-258 is the reference's EM analog shape).
    Seeds are the k smallest vec_ids (no RNG); every distance is the
    dim-order IEEE left fold, ties break to the smaller cluster id
    via lexicographic min(struct(dist2, cid)); centroid means fold
    member values in vec_id order (label_centroids' rule). The
    dist2 float IS value-compared."""
    from .. import vector
    out = vector.kmeans_fixed_assign(_t(spark, sf_dir, "embeddings"),
                                     k=4, n_iter=2)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "cluster", "dist2")


_KM_D2 = ("LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
          "list_transform(range(1, 1 + len(v)), "
          "i -> (v[i] - {c}[i]) * (v[i] - {c}[i]))), (acc, x) -> acc + x)")

O_EMBED_KMEANS = f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE embedding IS NOT NULL),
km_seeds AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
  FROM e ORDER BY vec_id LIMIT 4),
a0 AS MATERIALIZED (
  SELECT vec_id,
         MIN(struct_pack(d := {_KM_D2.format(c='c')}, c := cid)) AS m
  FROM e CROSS JOIN km_seeds GROUP BY vec_id),
km_m1 AS MATERIALIZED (
  SELECT m.c AS cid, LIST(v ORDER BY e.vec_id) AS vs,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM a0 JOIN e ON a0.vec_id = e.vec_id
  GROUP BY m.c),
km_c1 AS MATERIALIZED (
  SELECT cid,
         list_transform(range(1, 1 + len(vs[1])), d ->
           LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
             list_transform(vs, ve -> ve[d])), (acc, x) -> acc + x) / n) AS c
  FROM km_m1)
SELECT e.vec_id,
       CAST(MIN(struct_pack(d := {_KM_D2.format(c='c')}, c := cid)).c
            AS BIGINT) AS cluster,
       MIN(struct_pack(d := {_KM_D2.format(c='c')}, c := cid)).d AS dist2
FROM e CROSS JOIN km_c1 GROUP BY e.vec_id"""


def q_embed_pq_recon(spark, sf_dir):
    """PQ quantization-error report (vector.pq_recon_report over the
    fixed _PQ_CODEBOOKS): per (vector, subspace) the encode-rule
    codeword and the exact reconstruction error
    ||x_sub - c||^2 = (-2 x.c + ||c||^2) + ||x_sub||^2 — the
    index-QA companion to ann_ivfpq_topk, value-exact with the
    codeword constants inlined."""
    from .. import vector
    out = vector.pq_recon_report(_t(spark, sf_dir, "embeddings"),
                                 _PQ_CODEBOOKS)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "subspace", "code", "sub_err")


def _o_pq_recon() -> str:
    sub = len(_PQ_CODEBOOKS[0][0])
    parts = []
    for j, cws in enumerate(_PQ_CODEBOOKS):
        sv = (f"(CAST(embedding AS DOUBLE[]))"
              f"[{j * sub + 1}:{j * sub + sub}]")
        xx = (f"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
              f"LIST_TRANSFORM({sv}, x -> x * x)), (acc, v) -> acc + v)")
        ds = []
        for cw in cws:
            ss = _dlit(sum(float(v) * float(v) for v in cw))
            ds.append(f"(-2.0 * {_sql_dot_lits(sv, cw)} + {ss})")
        darr = "[" + ", ".join(ds) + "]"
        parts.append(
            f"SELECT CAST(vec_id AS BIGINT) AS vec_id, "
            f"CAST({j} AS INT) AS subspace, "
            f"CAST(LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS INT) AS code, "
            f"LIST_MIN({darr}) + {xx} AS sub_err "
            f"FROM embeddings WHERE embedding IS NOT NULL")
    return "\nUNION ALL\n".join(parts)


O_EMBED_PQ_RECON = _o_pq_recon()


def q_embed_ivf_balance(spark, sf_dir):
    """IVF index-balance QA (vector.ivf_balance_report over the fixed
    coarse centroids): per-cell count, share, and balance factor —
    the skew report an index build runs before committing a
    quantizer. Cell argmin mirrored with inlined centroid constants;
    both floats are single integer-ratio divisions."""
    from .. import vector
    return vector.ivf_balance_report(_t(spark, sf_dir, "embeddings"),
                                     _IVF_FIXED_CENTROIDS)


def _o_ivf_balance() -> str:
    k = len(_IVF_FIXED_CENTROIDS)
    ds = []
    for c in _IVF_FIXED_CENTROIDS:
        ss = _dlit(sum(float(v) * float(v) for v in c))
        ds.append(f"(-2.0 * "
                  f"{_sql_dot_lits('CAST(embedding AS DOUBLE[])', c)}"
                  f" + {ss})")
    darr = "[" + ", ".join(ds) + "]"
    return f"""WITH a AS (
  SELECT CAST(LIST_INDEXOF({darr}, LIST_MIN({darr})) - 1 AS INT) AS ivf_cell
  FROM embeddings WHERE embedding IS NOT NULL),
g AS (SELECT ivf_cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM a GROUP BY ivf_cell),
t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS tot FROM g)
SELECT ivf_cell, n_vecs,
       CAST(n_vecs AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
       (CAST(n_vecs AS DOUBLE) * {float(k)!r}) / CAST(tot AS DOUBLE)
         AS balance
FROM g, t"""


O_EMBED_IVF_BALANCE = _o_ivf_balance()


def q_embed_fisher(spark, sf_dir):
    """Fisher-style separability report — pure COMPOSITION of
    embed_label_separation and embed_class_scatter: per label pair,
    ratio = dist^2 / (mean_d2_a + mean_d2_b); > 1 means the classes
    sit farther apart than their own spreads. No new engine code;
    the ratio's float tree ((d*d) / (sa + sb)) is mirrored."""
    from .. import vector
    emb = _t(spark, sf_dir, "embeddings")
    cent = vector.label_centroids(emb)
    sep = vector.centroid_separation(cent)
    sc = vector.class_scatter(emb)
    sa = sc.select(F.col("label").alias("label_a"),
                   F.col("mean_d2").alias("_sa"))
    sb = sc.select(F.col("label").alias("label_b"),
                   F.col("mean_d2").alias("_sb"))
    return (sep.join(sa, "label_a").join(sb, "label_b")
            .select("label_a", "label_b", "dist",
                    ((F.col("dist") * F.col("dist"))
                     / (F.col("_sa") + F.col("_sb")))
                    .alias("fisher_ratio")))


O_EMBED_FISHER = f"""WITH sep AS MATERIALIZED ({O_EMBED_SEPARATION}),
sc AS MATERIALIZED ({O_EMBED_SCATTER})
SELECT sep.label_a, sep.label_b, sep.dist,
       (sep.dist * sep.dist) / (sa.mean_d2 + sb.mean_d2)
         AS fisher_ratio
FROM sep
JOIN sc sa ON sa.label = sep.label_a
JOIN sc sb ON sb.label = sep.label_b"""
