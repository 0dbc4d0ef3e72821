"""Keyword retrieval: BM25-style top-k over the document corpus.

FAGI's discovery stage ranks candidate links by lexical similarity
(VirtuosoImporter.java's TF filter + Jaro-Winkler scoring); the same
need — "given a few query terms, surface the best-matching documents
out of a 10^12-row corpus" — shows up in training-data curation as
keyword retrieval.  This module implements a BM25-style ranker the
Spark-first way:

* tokenization, term frequencies and document frequencies are INTEGER
  conditional aggregations (``SUM(CASE WHEN token = t ...)``) — fully
  order-independent, map-side-combinable, whole-stage-codegen;
* the corpus statistics (N, avgdl as an exact SUM/COUNT pair, per-term
  document frequencies) reduce to ONE scalar row that is
  broadcast-joined back — no second shuffle of the corpus;
* the final score is scalar per-row float math (plain + - * /), and the
  idf uses the log-free rational form ``(N - df + 0.5) / (df + 0.5)``
  so the whole score is reproducible bit-for-bit in ANSI SQL (the
  classic ``ln``-idf is a monotone transform of it per term; with the
  standard BM25 saturation this variant is the Lucene "BM25 without
  the log" simplification, chosen here so the DuckDB oracle can check
  VALUES, not just ranks);
* top-k is a global ``ORDER BY ... LIMIT k`` — Spark plans TakeOrdered
  (per-partition heaps, only k rows per partition reach the driver
  stage), which is the right physical shape at any corpus size.

Scale note: the per-term column expansion is linear in the QUERY's
term count (queries are a handful of terms), not in the vocabulary —
the corpus is scanned once, filtered to query terms before any
aggregation, so at 100 TB the shuffle carries at most
|docs containing a query term| x O(1) integer columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm_terms(terms) -> list:
    out = sorted({str(t).lower() for t in terms})
    if not out:
        raise ValueError("bm25_topk requires at least one query term")
    return out


def bm25_topk(docs: DataFrame, terms, k: int = 10,
              k1: float = 1.5, b: float = 0.75,
              key: str = "doc_id", text: str = "text") -> DataFrame:
    """Top-``k`` documents for ``terms`` under log-free BM25.

    Returns (key, rank, score) with rank 1..k, ties broken by key.
    Whitespace tokenization (the corpus token model used throughout
    textops); terms are lower-cased and deduplicated.

    Two passes over the tokenize projection by design (global df/avgdl
    stats, then scoring) — the classic TF-IDF shape. At warehouse
    scale, checkpoint the ``per_doc`` projection (key + dl + q tf
    longs, a ~50-byte row) once and let both passes read that instead
    of re-tokenizing the raw text; the resumable jobs in
    ``fagi_spark.jobs`` snapshot exactly such projections.
    """
    terms = _norm_terms(terms)
    toks = docs.select(
        F.col(key),
        F.split(F.lower(F.col(text)), " ").alias("_toks"))
    # Per-doc integer term frequencies + doc length. size() of the split
    # array counts every token (empty-string tokens from double spaces
    # included — mirrored in the SQL helper below).
    def _match(term):
        # one-arg closure (a default-arg lambda would be read by
        # pyspark as the two-arg (element, index) form)
        return lambda t: t == F.lit(term)

    tf_cols = [
        F.size(F.filter("_toks", _match(term))).cast("long").alias(f"tf_{i}")
        for i, term in enumerate(terms)]
    per_doc = toks.select(
        F.col(key),
        F.size("_toks").cast("long").alias("dl"),
        *tf_cols)
    # Keep only docs matching >= 1 term BEFORE any join (the corpus
    # statistics still need the full frame, computed next).
    hit_filter = None
    for i in range(len(terms)):
        c = F.col(f"tf_{i}") > 0
        hit_filter = c if hit_filter is None else (hit_filter | c)

    stats_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ]
    for i in range(len(terms)):
        stats_aggs.append(
            F.sum(F.when(F.col(f"tf_{i}") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias(f"df_{i}"))
    stats = per_doc.agg(*stats_aggs)

    hits = per_doc.filter(hit_filter)
    joined = hits.crossJoin(F.broadcast(stats))

    # avgdl as an explicit exact-integer SUM / COUNT division (AVG's
    # internal accumulation order is implementation-defined; this is
    # one IEEE division of two exact integers on both engines).
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score: Column | None = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        n = F.col("n_docs").cast("double")
        idf = (n - df + F.lit(0.5)) / (df + F.lit(0.5))
        denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                  + F.lit(b) * (F.col("dl").cast("double") / avgdl))
        s = idf * ((tf * F.lit(k1 + 1.0)) / denom)
        score = s if score is None else (score + s)

    scored = joined.select(F.col(key), score.alias("score"))
    top = (scored.orderBy(F.col("score").desc(), F.col(key).asc())
           .limit(k))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score").desc(), F.col(key).asc())
    return top.select(F.col(key), F.row_number().over(w).alias("rank"),
                      "score")


def sql_bm25_topk(terms, k: int = 10, k1: float = 1.5, b: float = 0.75,
                  key: str = "doc_id", text: str = "text",
                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`bm25_topk` — identical tokenization,
    identical left-associated float expression tree, rational idf.
    Constants are emitted with an ``e0`` exponent so DuckDB types them
    DOUBLE at the token level (see contract._dlit rationale)."""
    terms = _norm_terms(terms)

    def dlit(v: float) -> str:
        return repr(float(v)) + "e0"

    tf_exprs = ", ".join(
        f"CAST(LEN(LIST_FILTER(_toks, t -> t = '{term}')) AS BIGINT) AS tf_{i}"
        for i, term in enumerate(terms))
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms)))
    hit = " OR ".join(f"tf_{i} > 0" for i in range(len(terms)))
    score_terms = []
    for i in range(len(terms)):
        idf = (f"((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + {dlit(0.5)})"
               f" / (CAST(df_{i} AS DOUBLE) + {dlit(0.5)}))")
        denom = (f"(CAST(tf_{i} AS DOUBLE) + {dlit(k1)} * ({dlit(1.0)} - {dlit(b)}"
                 f" + {dlit(b)} * (CAST(dl AS DOUBLE)"
                 f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))")
        score_terms.append(
            f"({idf} * ((CAST(tf_{i} AS DOUBLE) * {dlit(k1 + 1.0)}) / {denom}))")
    # Left-associated sum, parenthesized to match Spark's fold order.
    score = score_terms[0]
    for st in score_terms[1:]:
        score = f"({score} + {st})"
    return f"""WITH toks AS (
  SELECT {key}, STR_SPLIT(LOWER({text}), ' ') AS _toks FROM {table}
), per_doc AS (
  SELECT {key}, CAST(LEN(_toks) AS BIGINT) AS dl, {tf_exprs} FROM toks
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_exprs} FROM per_doc
)
SELECT {key}, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, {key} ASC) AS BIGINT) AS rank,
       score
FROM (
  SELECT per_doc.{key}, {score} AS score
  FROM per_doc CROSS JOIN stats
  WHERE {hit}
) ORDER BY score DESC, {key} ASC LIMIT {k}"""


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, k0: int = 60,
             out_k: int = 10, key: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of two ranked retrieval lists — the standard hybrid-search combiner
    for a lexical ranker (bm25_topk) and a vector ranker (ANN top-k):

        rrf(d) = 1/(k0 + rank_a(d)) + 1/(k0 + rank_b(d))

    with a missing rank contributing 0. Rank fusion beats score fusion
    here because BM25 scores and cosine scores live on incompatible
    scales; RRF only consumes the integer ranks.

    Returns (key, rrf_score, rank) with rank 1..out_k, ties broken by
    key. The score is two exact IEEE divisions of integers plus one
    addition in a fixed order (a-term first), so a SQL oracle can check
    VALUES.

    Scale shape: both inputs are already top-k lists (bounded by their
    upstream retrievers — the expensive work), so the fusion is a join
    of two k-row frames; Spark broadcasts both sides and the final
    top-k is a TakeOrdered. Fusing FULL ranked lists instead (rare)
    would swap the outer join for a union + groupBy(key) sum — still
    one bounded shuffle — but per-group float-sum order would then be
    nondeterministic, so keep the two-list expression form wherever
    value reproducibility matters.
    """
    ra = ranked_a.select(F.col(key), F.col(rank_col).alias("_ra"))
    rb = ranked_b.select(F.col(key), F.col(rank_col).alias("_rb"))
    fused = ra.join(rb, key, "full_outer")
    sa = (F.when(F.col("_ra").isNotNull(),
                 F.lit(1.0) / (F.lit(float(k0)) + F.col("_ra").cast("double")))
          .otherwise(F.lit(0.0)))
    sb = (F.when(F.col("_rb").isNotNull(),
                 F.lit(1.0) / (F.lit(float(k0)) + F.col("_rb").cast("double")))
          .otherwise(F.lit(0.0)))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("rrf_score"), F.asc(key))
    return (fused.select(F.col(key), (sa + sb).alias("rrf_score"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= out_k))


def sql_rrf_fuse(cte_a: str, cte_b: str, k0: int = 60, out_k: int = 10,
                 key: str = "doc_id", rank_col: str = "rank") -> str:
    """DuckDB mirror of :func:`rrf_fuse`: ``cte_a``/``cte_b`` are CTE
    names exposing (key, rank). Same fixed a-then-b addition order and
    the k0 constant emitted as a DOUBLE-typed literal."""
    k0l = repr(float(k0)) + "e0"
    score = (f"(CASE WHEN _ra IS NOT NULL THEN 1.0e0 / ({k0l} + CAST(_ra AS DOUBLE)) ELSE 0.0e0 END"
             f" + CASE WHEN _rb IS NOT NULL THEN 1.0e0 / ({k0l} + CAST(_rb AS DOUBLE)) ELSE 0.0e0 END)")
    return f"""SELECT {key}, rrf_score, rank FROM (
  SELECT {key}, rrf_score,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, {key} ASC) AS BIGINT) AS rank
  FROM (
    SELECT COALESCE(a.{key}, b.{key}) AS {key}, {score} AS rrf_score
    FROM (SELECT {key}, {rank_col} AS _ra FROM {cte_a}) a
    FULL OUTER JOIN (SELECT {key}, {rank_col} AS _rb FROM {cte_b}) b
    ON a.{key} = b.{key}
  )
) WHERE rank <= {out_k}"""


def doc_keywords(docs: DataFrame, k: int = 5,
                 key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the tagging/indexing
    twin of ``bm25_topk`` (there: few terms, rank docs; here: every
    doc, rank its own terms). Same log-free rational idf
    ``(N - df + 0.5) / (df + 0.5)`` so the score is value-exact in
    ANSI SQL (sql_doc_keywords).

    Returns (key, rank, term, tf, df, score), rank 1..k per document,
    ordered by score DESC with the term string as the deterministic
    tie-break (every (doc, term) pair is unique, so the order is
    total).

    Scale shape: one explode + one groupBy(key, term) with map-side
    combine gives tf; df reduces the SAME frame by term (each row is
    already a distinct (doc, term)); N is a one-row broadcast. The
    per-doc top-k is row_number <= k, which Spark plans as
    WindowGroupLimit — only k winners per doc per partition reach the
    shuffle, never the full vocabulary of a document."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(key),
        F.explode(F.split(F.coalesce(F.col(text), F.lit("")), " "))
         .alias("term"))
    tf = toks.groupBy(key, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n))
              .withColumn(
                  "score",
                  F.col("tf").cast("double")
                  * ((F.col("n").cast("double") - F.col("df").cast("double")
                      + F.lit(0.5))
                     / (F.col("df").cast("double") + F.lit(0.5)))))
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(key), F.col("rank").cast("long").alias("rank"),
                    "term", "tf", "df", "score"))


def sql_doc_keywords(source: str, k: int = 5, key: str = "doc_id",
                     text: str = "text") -> str:
    """DuckDB mirror of doc_keywords; emits a ``keywords`` CTE."""
    return f"""toks AS (
  SELECT {key}, UNNEST(STRING_SPLIT(COALESCE({text}, ''), ' ')) AS term
  FROM {source}),
tf AS (SELECT {key}, term, COUNT(*) AS tf FROM toks GROUP BY {key}, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nn AS (SELECT COUNT(*) AS n FROM {source}),
scored AS (
  SELECT tf.{key}, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE)
         * ((CAST(n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
            / (CAST(df.df AS DOUBLE) + 0.5)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN nn),
keywords AS (
  SELECT {key}, CAST(rnk AS BIGINT) AS rank, term, tf, df, score
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {key}
                  ORDER BY score DESC, term) AS rnk FROM scored)
  WHERE rnk <= {k})"""


def phrase_search(docs: DataFrame, phrase: str, key: str = "doc_id",
                  col: str = "text") -> DataFrame:
    """Positional-inverted-index phrase query: documents containing the
    exact token sequence ``phrase``, with occurrence counts — the
    retrieval primitive BM25's bag-of-words scoring can't express
    (quoted-phrase search, boilerplate-sentence hunting, exact-quote
    contamination checks against a benchmark string).

    Plan: ONE posexplode builds the positional postings frame; the
    m-term phrase then chains m-1 equi-joins on (doc, pos - i) — each
    join keyed on the normalized start position, so candidate rows are
    only the postings of the phrase's own terms (rare terms shrink the
    join immediately; the corpus-wide token stream is scanned once).
    Overlapping matches count separately, same as the oracle's
    sliding-window definition. At 100 TB the postings frame shuffles
    on (doc, start) — uniform by construction; no per-doc state, no
    driver loops, no Python.

    Returns (doc_id, n_matches, first_pos) with first_pos 0-based.
    """
    terms = [t for t in phrase.split(" ") if t != ""]
    if not terms:
        raise ValueError("phrase_search needs a non-empty phrase")
    toks = docs.select(
        F.col(key).alias("_doc"),
        F.posexplode(F.split(F.coalesce(F.col(col), F.lit("")), " "))
        .alias("_pos", "_tok"))
    starts = (toks.filter(F.col("_tok") == terms[0])
              .select("_doc", F.col("_pos").alias("_start")))
    for i, w in enumerate(terms[1:], start=1):
        nxt = (toks.filter(F.col("_tok") == w)
               .select("_doc", (F.col("_pos") - i).alias("_start")))
        starts = starts.join(nxt, ["_doc", "_start"])
    return (starts.groupBy("_doc")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.min("_start").alias("first_pos"))
            .select(F.col("_doc").alias(key),
                    F.col("n_matches").cast("long").alias("n_matches"),
                    F.col("first_pos").cast("long").alias("first_pos")))


def kwic(df: DataFrame, term: str, width: int = 3,
         key: str = "doc_id", text: str = "text") -> DataFrame:
    """Keyword-in-context concordance: every occurrence of ``term``
    (exact whitespace-token match) with up to ``width`` tokens of
    context on each side — the corpus-linguistics view behind "show
    me how the corpus uses this word" audits (sense checking before
    building filters, slur-context review, quote verification).

    Map-only: posexplode tokens -> filter on the term -> slice the
    SAME token array for both context windows; no shuffle at all, so
    it streams over a 100 TB corpus at scan speed. Token positions
    are 0-based; context windows clip at document edges.

    Returns (key, pos, left_ctx, right_ctx) per occurrence.
    """
    w = int(width)
    toks = df.select(
        F.col(key),
        F.split(F.coalesce(F.col(text), F.lit("")), " ").alias("_t"))
    hits = (toks.select(
        F.col(key), F.col("_t"),
        F.posexplode(F.col("_t")).alias("pos", "_tok"))
        .filter(F.col("_tok") == term))
    # slice() is 1-based; left window [max(1, pos+1-w), pos], right
    # window [pos+2, pos+1+w] in 1-based terms
    left_start = F.greatest(F.lit(1), F.col("pos") + 1 - w)
    left_len = F.col("pos") + 1 - left_start
    return hits.select(
        F.col(key), F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("_t", left_start, left_len), " ")
        .alias("left_ctx"),
        F.array_join(F.slice("_t", F.col("pos") + 2, F.lit(w)), " ")
        .alias("right_ctx"))


def boolean_search(df: DataFrame, terms: list, mode: str = "and",
                   key: str = "doc_id", text: str = "text") -> DataFrame:
    """Conjunctive / disjunctive boolean retrieval over whitespace
    tokens: documents containing ALL query terms (mode="and") or ANY
    (mode="or"), with the matched-term count as the coordinate rank —
    the exact-filter complement to bm25_topk's scoring (candidate
    narrowing for contamination review, cohort selection by required
    vocabulary).

    The postings side stays distinct (doc, term) pairs filtered to
    the query terms BEFORE any shuffle (an isin literal pushed to the
    scan), then one doc rollup; AND is the classic intersection-by-
    count == |terms|. Work scales with matching postings only.

    Returns (key, n_matched) — AND rows all have n_matched ==
    len(terms).
    """
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("boolean_search needs at least one term")
    if mode not in ("and", "or"):
        raise ValueError(f"unknown mode: {mode!r}")
    toks = (df.select(
        F.col(key),
        F.explode(F.array_distinct(
            F.split(F.coalesce(F.col(text), F.lit("")), " ")))
        .alias("_t"))
        .filter(F.col("_t").isin(terms)))
    hits = (toks.groupBy(key)
            .agg(F.count(F.lit(1)).cast("long").alias("n_matched")))
    if mode == "and":
        hits = hits.filter(F.col("n_matched") == len(terms))
    return hits
