"""Document/corpus contract queries + oracles (doc_*).

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


# ---- documents / text operators ---------------------------------------------

def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup over the corpus plus a planted-duplicate slice
    (key-shifted copy of every 7th document, mirrored in the oracle
    CTE) — the driver corpus has no duplicate texts, so without the
    plant the query passes vacuously (0 == 0 rows)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plant = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return (textops.exact_duplicates(docs.unionByName(plant))
            .select("content_hash", F.col("dup_count").cast("long").alias("dup_count"),
                    F.col("keep_id").cast("long").alias("keep_id")))


O_DOC_DEDUP = """WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0)
SELECT MD5(text) AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS dup_count,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM aug GROUP BY MD5(text) HAVING COUNT(*) > 1"""


def q_doc_latest_capture(spark, sf_dir):
    """As-of dedup over repeated captures (textops.latest_capture):
    each document gets 1 + doc_id % 3 deterministic captures with
    strictly increasing warc_ts (integer micros -> timestamp), and the
    operator keeps the latest per key. The winning capture index and
    its timestamp are emitted as exact longs so the window semantics
    (not just the row count) are oracle-checked."""
    docs = _t(spark, sf_dir, "documents")
    caps = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.pmod(F.col("doc_id"), F.lit(3)))).alias("capture"))
    caps = caps.withColumn(
        "warc_ts",
        F.timestamp_micros(F.lit(1_600_000_000_000_000)
                           + F.col("doc_id") * F.lit(1_000_000)
                           + F.col("capture") * F.lit(86_400_000_000)))
    win = textops.latest_capture(caps, key="doc_id", ts="warc_ts")
    return win.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("capture").cast("long").alias("capture"),
                      F.unix_micros("warc_ts").alias("latest_ts_us"))


O_DOC_LATEST_CAPTURE = """WITH caps AS (
  SELECT doc_id, UNNEST(RANGE(0, (doc_id % 3) + 1)) AS capture FROM documents),
t AS (
  SELECT doc_id, capture,
         1600000000000000 + doc_id * 1000000 + capture * 86400000000 AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY 1600000000000000 + doc_id * 1000000
                                     + capture * 86400000000 DESC) AS rn
  FROM caps)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(capture AS BIGINT) AS capture,
       CAST(ts_us AS BIGINT) AS latest_ts_us
FROM t WHERE rn = 1"""


def q_doc_token_count(spark, sf_dir):
    """Whitespace tokens + the BPE-ish subword proxy (letter/digit runs
    and single punctuation), both value-checked."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_token_count(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_subwords").cast("long").alias("n_subwords")))


O_DOC_TOKENS = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
            AS BIGINT) AS n_subwords
FROM documents"""


def q_doc_skyline(spark, sf_dir):
    """Length-vs-richness Pareto frontier (curation.skyline_2d):
    documents not dominated on (whitespace token count, distinct
    token count) — the weighting-free "keep the frontier" selection.
    The engine's plan is groupBy(x) -> running-max window over the
    DISTINCT-x frame -> broadcast join back (never all-pairs); the
    oracle brute-forces dominance with a NOT EXISTS self-join — a
    genuinely different plan that must select the identical rows.
    All comparisons integer/exact."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.coalesce("text", F.lit("")), " ")
    m = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.size(toks).cast("long").alias("n_tok"),
                    F.size(F.array_distinct(toks)).cast("long")
                    .alias("n_distinct"))
    return curation.skyline_2d(m, "n_tok", "n_distinct").select(
        "doc_id", "n_tok", "n_distinct")


O_DOC_SKYLINE = """WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tok,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(COALESCE(text, ''), ' ')))
           AS BIGINT) AS n_distinct
  FROM documents)
SELECT doc_id, n_tok, n_distinct FROM m q
WHERE NOT EXISTS (
  SELECT 1 FROM m p
  WHERE p.n_tok >= q.n_tok AND p.n_distinct >= q.n_distinct
    AND (p.n_tok > q.n_tok OR p.n_distinct > q.n_distinct))"""


def q_doc_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_quality(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("n_chars").cast("long").alias("n_chars"),
                    F.col("n_words").cast("long").alias("n_words"),
                    "mean_word_len", "stopword_ratio"))


_STOP_SQL = "('" + "','".join(textops.STOPWORDS) + "')"
O_DOC_QUALITY = f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
       CASE WHEN LEN(STRING_SPLIT(text, ' ')) > 0
            THEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
            ELSE 0.0 END AS mean_word_len,
       CASE WHEN LEN(STRING_SPLIT(text, ' ')) > 0
            THEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LOWER(x) IN {_STOP_SQL})) AS DOUBLE)
                 / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
            ELSE 0.0 END AS stopword_ratio
FROM documents"""


def q_doc_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_fingerprint(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "fingerprint"))


O_DOC_FINGERPRINT = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       MD5(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g'))) AS fingerprint
FROM documents"""


def q_doc_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash fingerprint — pure column fold, SQL-exact."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_rolling_fingerprint(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("rolling_hash").cast("long").alias("rolling_hash")))


O_DOC_ROLLING_HASH = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
    + textops.sql_rolling_fingerprint("text")
    + " AS rolling_hash FROM documents")


def q_doc_winnow(spark, sf_dir):
    """Winnowing fingerprints (textops.winnow_fingerprints, MOSS
    k=5/w=4): per selected k-gram its position and poly hash — the
    guaranteed-local-coverage dedup fingerprint (any shared substring
    >= k+w-1 chars shares a fingerprint), all whole-stage-codegen
    array math, rightmost-tie rule mirrored exactly. Thinned to every
    20th doc to keep the compare frame bounded."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return textops.winnow_fingerprints(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text"))


O_DOC_WINNOW = f"""WITH docs20 AS (
  SELECT * FROM documents WHERE doc_id % 20 = 0),
{textops.sql_winnow().replace("FROM documents", "FROM docs20")}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(pos AS BIGINT) AS pos, fp
FROM wn_s"""


def q_doc_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (textops.cdc_chunks, k=8, 5 mask
    bits): boundary-by-hash chunk spans + per-chunk poly hashes —
    the insertion-robust chunk-level dedup layout (rsync/LBFS rule).
    Map-only array math; every column integer-exact."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return textops.cdc_chunks(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text"))


O_DOC_CDC_CHUNKS = f"""WITH docs10 AS (
  SELECT * FROM documents WHERE doc_id % 10 = 0),
{textops.sql_cdc_chunks(src="docs10")}
SELECT CAST(doc_id AS BIGINT) AS doc_id, c.chunk_idx AS chunk_idx,
       c.start AS start, c.length AS length, c.chash AS chash
FROM cdc_c"""


def q_doc_cdc_dedup(spark, sf_dir):
    """Chunk-level dedup report over cdc_chunks: per doc its chunk
    count, how many of its chunks also appear elsewhere in the corpus
    (same content-defined chunk hash), and the duplicated fraction —
    the measurement CDC chunking exists for (storage-level dedup
    yield). One corpus-wide chunk-hash rollup + one join back; the
    fraction is a single mirrored division."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    ch = textops.cdc_chunks(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    freq = (ch.groupBy("chash")
            .agg(F.countDistinct("doc_id").alias("_nd")))
    per = (ch.join(freq, "chash")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
                .cast("long").alias("n_dup_chunks")))
    return per.select("doc_id", "n_chunks", "n_dup_chunks",
                      (F.col("n_dup_chunks").cast("double")
                       / F.col("n_chunks").cast("double")).alias("dup_frac"))


O_DOC_CDC_DEDUP = f"""WITH docs10 AS (
  SELECT * FROM documents WHERE doc_id % 10 = 0),
{textops.sql_cdc_chunks(src="docs10")},
ch AS (
  SELECT doc_id, c.chash AS chash FROM cdc_c),
freq AS (
  SELECT chash, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chash),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks
  FROM ch JOIN freq USING (chash) GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chunks, n_dup_chunks,
       CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS dup_frac
FROM per"""


def q_doc_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_lang_id(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "lang_pred"))


def _lang_hits_sql(markers):
    arr = "('" + "','".join(markers) + "')"
    return (f"LEN(LIST_FILTER(STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' '), "
            f"x -> x IN {arr}))")


O_DOC_LANG = f"""WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {_lang_hits_sql(textops.LANG_MARKERS['en'])} AS h_en,
         {_lang_hits_sql(textops.LANG_MARKERS['de'])} AS h_de,
         {_lang_hits_sql(textops.LANG_MARKERS['fr'])} AS h_fr,
         {_lang_hits_sql(textops.LANG_MARKERS['es'])} AS h_es
  FROM documents)
SELECT doc_id,
       CASE WHEN GREATEST(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr >= h_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM s"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs within the same source block."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.ngram_jaccard_pairs(docs, block="source", k=3, threshold=0.2)
            .select(F.col("id_a").cast("long").alias("id_a"),
                    F.col("id_b").cast("long").alias("id_b"), "jaccard"))


O_NGRAM_JACCARD = """WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ') AS ws
  FROM documents),
idx AS (
  SELECT doc_id, source, ws,
         UNNEST(range(0, GREATEST(LEN(ws) - 3, 0) + 1)) AS i
  FROM toks),
sh AS (
  SELECT DISTINCT doc_id, source,
         CASE WHEN LEN(ws) >= 3 THEN CONCAT_WS(' ', ws[i+1], ws[i+2], ws[i+3])
              ELSE ARRAY_TO_STRING(ws, ' ') END AS shingle
  FROM idx),
n AS (SELECT doc_id, COUNT(DISTINCT shingle) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source
  WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.2"""


def q_ngram_containment(spark, sf_dir):
    """Directed word-3-gram containment (subset-absorption dedup:
    |src ∩ dst| / |src| — the asymmetric score that flags a quote
    embedded in a long article where Jaccard stays tiny). Same shingle
    plan as doc_ngram_jaccard; both directions emit from one joined
    frame."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.ngram_containment_pairs(docs, block="source", k=3,
                                            threshold=0.3)
            .select(F.col("id_src").cast("long").alias("id_src"),
                    F.col("id_dst").cast("long").alias("id_dst"),
                    "containment"))


O_NGRAM_CONTAINMENT = """WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ') AS ws
  FROM documents),
idx AS (
  SELECT doc_id, source, ws,
         UNNEST(range(0, GREATEST(LEN(ws) - 3, 0) + 1)) AS i
  FROM toks),
sh AS (
  SELECT DISTINCT doc_id, source,
         CASE WHEN LEN(ws) >= 3 THEN CONCAT_WS(' ', ws[i+1], ws[i+2], ws[i+3])
              ELSE ARRAY_TO_STRING(ws, ' ') END AS shingle
  FROM idx),
n AS (SELECT doc_id, COUNT(DISTINCT shingle) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source = b.source
  WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id),
j AS (SELECT id_a, id_b, n_inter, na.n_sh AS n_a, nb.n_sh AS n_b
      FROM inter JOIN n na ON na.doc_id = id_a
                 JOIN n nb ON nb.doc_id = id_b),
d AS (
  SELECT id_a AS id_src, id_b AS id_dst,
         CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
  FROM j
  UNION ALL
  SELECT id_b, id_a, CAST(n_inter AS DOUBLE) / CAST(n_b AS DOUBLE) FROM j)
SELECT CAST(id_src AS BIGINT) AS id_src, CAST(id_dst AS BIGINT) AS id_dst,
       containment
FROM d WHERE containment >= 0.3"""


def q_jaccard_prefix(spark, sf_dir):
    """Prefix-filtered Jaccard pairs (textops.ngram_jaccard_prefix_pairs,
    the AllPairs/PPJoin candidate reduction): IDENTICAL output to the
    naive shingle join at dyadic threshold 0.25, so the oracle is the
    doc_ngram_jaccard SQL with the threshold swapped — the value-exact
    proof that the prefix filter loses no pair."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.ngram_jaccard_prefix_pairs(docs, block="source", k=3,
                                               threshold=0.25)
            .select(F.col("id_a").cast("long").alias("id_a"),
                    F.col("id_b").cast("long").alias("id_b"), "jaccard"))


# same brute-force oracle as doc_ngram_jaccard, dyadic threshold 0.25
# (the prefix filter is lossless, so the naive SQL IS the spec)
O_JACCARD_PREFIX = O_NGRAM_JACCARD.replace(">= 0.2", ">= 0.25")
assert O_JACCARD_PREFIX != O_NGRAM_JACCARD


def q_edit_dist_join(spark, sf_dir):
    """Edit-distance similarity join (textops.edit_distance_join,
    Ed-Join q-gram prefix filtering — Xiao et al. VLDB'08) over short
    title strings (first three words of each document) plus a planted
    1-substitution variant of every 7th title, so true near-matches
    exist by construction. The blocking is lossless, so the oracle is
    the naive all-pairs ``levenshtein(a,b) <= 2`` join — the strongest
    possible check: any false negative from the q-gram prefix filter
    would hash-mismatch."""
    docs = _t(spark, sf_dir, "documents")
    title = F.array_join(F.slice(F.split(F.coalesce("text", F.lit("")),
                                         " "), 1, 3), " ")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       title.alias("title"))
    plant = (base.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.concat(F.lit("x"), F.substring("title", 2, 100000))
                     .alias("title")))
    aug = base.unionByName(plant)
    out = textops.edit_distance_join(aug, d=2, q=2, key="doc_id",
                                     col="title")
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"),
                      F.col("dist").cast("long").alias("dist"))


O_EDIT_DIST_JOIN = """WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         ARRAY_TO_STRING((STRING_SPLIT(COALESCE(text, ''), ' '))[1:3], ' ') AS title
  FROM documents),
aug AS (
  SELECT doc_id, title FROM base
  UNION ALL
  SELECT doc_id + 100000, 'x' || SUBSTRING(title, 2) FROM base WHERE doc_id % 7 = 0)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(LEVENSHTEIN(a.title, b.title) AS BIGINT) AS dist
FROM aug a JOIN aug b
  ON a.doc_id < b.doc_id
 AND ABS(LENGTH(a.title) - LENGTH(b.title)) <= 2
WHERE LEVENSHTEIN(a.title, b.title) <= 2"""


def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition signals: duplicate-word fraction +
    top-bigram fraction per document (textops.with_repetition)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    return (textops.with_repetition(docs)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "dup_word_frac", "top_bigram_frac"))


O_DOC_REPETITION = """WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents),
toks AS (
  SELECT doc_id,
         STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ') AS ws
  FROM d),
bg AS (
  SELECT doc_id, CONCAT_WS(' ', ws[i+1], ws[i+2]) AS bg
  FROM (SELECT doc_id, ws,
               UNNEST(range(0, GREATEST(LEN(ws) - 1, 0))) AS i
        FROM toks WHERE LEN(ws) >= 2)),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
top AS (SELECT doc_id, MAX(c) AS t, SUM(c) AS tot FROM cnt GROUP BY doc_id)
SELECT CAST(k.doc_id AS BIGINT) AS doc_id,
       CASE WHEN LEN(k.ws) > 0
            THEN 1.0 - CAST(LEN(LIST_DISTINCT(k.ws)) AS DOUBLE)
                       / CAST(LEN(k.ws) AS DOUBLE)
            ELSE 0.0 END AS dup_word_frac,
       COALESCE(CAST(top.t AS DOUBLE) / CAST(top.tot AS DOUBLE), 0.0)
         AS top_bigram_frac
FROM toks k LEFT JOIN top ON top.doc_id = k.doc_id"""


# planted rows so the too_short / weird_words branches fire (the synth
# corpus has no short or long-word documents); mirrored in the oracle
_FILTER_PLANT = [(900001, "tiny doc here"),
                 (900002, " ".join(["abcdefghijklmnopqrs"] * 12))]


def q_doc_filter_decision(spark, sf_dir):
    """C4/Gopher-style composite keep/drop decision with the first
    failed rule as the reason (textops.with_filter_decision) — the
    per-rule attrition report of a corpus curation pass. Two planted
    rows exercise the too_short and weird_words branches."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plant = spark.createDataFrame(_FILTER_PLANT, "doc_id long, text string")
    return (textops.with_filter_decision(docs.unionByName(plant))
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "filter_reason",
                    F.col("keep").cast("long").alias("keep")))


_FILTER_PLANT_SQL = " UNION ALL ".join(
    f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in _FILTER_PLANT)

O_DOC_FILTER_DECISION = f"""WITH documents_aug AS (
  SELECT doc_id, text FROM documents UNION ALL {_FILTER_PLANT_SQL}),
q AS (
  SELECT doc_id,
         LEN(STRING_SPLIT(text, ' ')) AS n_words,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) > 0
              THEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                   / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
              ELSE 0.0 END AS mwl,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) > 0
              THEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LOWER(x) IN {{stops}})) AS DOUBLE)
                   / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
              ELSE 0.0 END AS swr
  FROM documents_aug),
toks AS (
  SELECT doc_id,
         STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ') AS ws
  FROM documents_aug),
dup AS (
  SELECT doc_id,
         CASE WHEN LEN(ws) > 0
              THEN 1.0 - CAST(LEN(LIST_DISTINCT(ws)) AS DOUBLE)
                         / CAST(LEN(ws) AS DOUBLE)
              ELSE 0.0 END AS dwf
  FROM toks),
dec AS (
  SELECT q.doc_id,
         CASE WHEN q.n_words < 10 THEN 'too_short'
              WHEN q.mwl > 12.0 THEN 'weird_words'
              WHEN q.swr < 0.05 THEN 'low_stopwords'
              WHEN dup.dwf > 0.5 THEN 'repetitive'
              ELSE 'keep' END AS filter_reason
  FROM q JOIN dup ON dup.doc_id = q.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, filter_reason,
       CAST(filter_reason = 'keep' AS BIGINT) AS keep
FROM dec""".replace("{stops}", _STOP_SQL)


def q_corpus_vocab(spark, sf_dir):
    """Per-language top-20 vocabulary (textops.corpus_vocab):
    explode -> two-level count with map-side combine -> WindowGroupLimit
    top-k, ties broken by word for a deterministic cut."""
    docs = _t(spark, sf_dir, "documents").select("lang", "text")
    return textops.corpus_vocab(docs, k=20)


O_CORPUS_VOCAB = """WITH w AS (
  SELECT lang,
         UNNEST(STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ')) AS word
  FROM documents),
c AS (SELECT lang, word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY lang, word),
r AS (SELECT lang, word, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rank
      FROM c)
SELECT lang, word, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 20"""


def q_corpus_stats(spark, sf_dir):
    """Corpus composition report: per (lang, source, word-count decile
    bucket) — row counts, char totals, exact median word count. The
    one-pass reporting rollup a training-data pipeline runs before and
    after every filter stage (one shuffle on the group key; percentile
    is Spark's exact percentile, mirrored by DuckDB's
    PERCENTILE_CONT on the same integer inputs)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.coalesce("text", F.lit("")).alias("text"))
    n_words = F.size(F.split(F.col("text"), " "))
    bucket = F.floor(n_words / F.lit(10)).cast("long")
    return (docs.withColumn("_nw", n_words).withColumn("bucket", bucket)
            .groupBy("lang", "source", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).cast("long").alias("total_chars"),
                 F.expr("percentile(_nw, 0.5)").alias("median_words")))


O_CORPUS_STATS = """WITH d AS (
  SELECT doc_id, lang, source, COALESCE(text, '') AS text FROM documents),
w AS (
  SELECT lang, source, text,
         LEN(STRING_SPLIT(text, ' ')) AS nw
  FROM d)
SELECT lang, source,
       CAST(FLOOR(nw / 10) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY nw) AS median_words
FROM w GROUP BY lang, source, FLOOR(nw / 10)"""


# ---- near-dup / ANN with SQL-mirrored hash family ---------------------------

def q_minhash_candidates(spark, sf_dir):
    """MinHash+LSH near-dup candidates with planted duplicates (a
    word-swapped copy of every 9th document) so banding actually fires.
    Uses the poly hash family (textops.POLY_MOD fold) so every stage —
    shingles, 32 min-hashes, 8 band keys, the band equi-join — is
    value-mirrored in DuckDB. xxhash64 stays the scale default
    (pytest-covered). Text is null-coalesced on BOTH sides: Spark's
    empty-shingle path and DuckDB's UNNEST-drop diverge on NULL text,
    so normalize before the operator."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.concat(F.col("text"), F.lit(" extra tail")).alias("text")))
    aug = docs.unionByName(plant)
    out = textops.minhash_candidates(aug, num_hashes=32, bands=8,
                                     hash_family="poly")
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"))


_SHINGLE_CTES = """toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ') AS ws
  FROM aug),
idx AS (
  SELECT doc_id, ws, UNNEST(range(0, GREATEST(LEN(ws) - 3, 0) + 1)) AS i
  FROM toks),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN LEN(ws) >= 3 THEN CONCAT_WS(' ', ws[i+1], ws[i+2], ws[i+3])
              ELSE ARRAY_TO_STRING(ws, ' ') END AS shingle
  FROM idx)"""


def _o_minhash() -> str:
    m = textops.POLY_MOD
    sig_cols = []
    for i in range(32):
        a, b = textops.poly_seed_coeffs(i)
        sig_cols.append(f"MIN((h * {a} + {b}) % {m}) AS h{i}")
    band_cases = []
    for band in range(8):
        cols = ", ".join(f"h{band * 4 + j}" for j in range(4))
        band_cases.append(f"WHEN {band} THEN CONCAT_WS(',', {cols})")
    return f"""WITH aug AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 100000, COALESCE(text, '') || ' extra tail'
  FROM documents WHERE doc_id % 9 = 0),
{_SHINGLE_CTES},
hb AS (SELECT doc_id, {textops.sql_poly_base('shingle')} AS h FROM sh),
sig AS (SELECT doc_id, {', '.join(sig_cols)} FROM hb GROUP BY doc_id),
banded AS (
  SELECT doc_id, g.band,
         CASE g.band {' '.join(band_cases)} END AS band_key
  FROM sig, (SELECT UNNEST(RANGE(0, 8)) AS band) g)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id"""


O_MINHASH_CANDIDATES = _o_minhash()


_SPAN_PLANT = ("all rights reserved this page is part of "
               "the example archive collection")


def q_doc_duplicate_spans(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2022 suffix-array
    dedup, Spark-shaped: k-gram posexplode -> count -> run-merge): a
    shared 12-word boilerplate sentence is planted at the tail of every
    6th document (key-shifted copies, mirrored in the oracle CTE) so
    cross-document verbatim spans exist; any natural corpus repeats are
    found identically on both sides. Poly hash family for the oracle;
    xxhash64 stays the scale default (pytest-covered)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    plant = (docs.filter(F.col("doc_id") % 6 == 0)
             .select((F.col("doc_id") + 200000).alias("doc_id"),
                     F.concat(F.col("text"),
                              F.lit(" " + _SPAN_PLANT)).alias("text")))
    out = textops.duplicate_spans(docs.unionByName(plant), k=8,
                                  min_count=2, hash_family="poly")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "span_start", "span_end",
                      F.col("n_grams").cast("long").alias("n_grams"))


O_DOC_DUPLICATE_SPANS = f"""WITH aug AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 200000, COALESCE(text, '') || ' {_SPAN_PLANT}'
  FROM documents WHERE doc_id % 6 = 0),
{textops.sql_duplicate_spans('aug', k=8, min_count=2)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
       CAST(MAX(p) + 7 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM runs GROUP BY doc_id, grp"""


def q_doc_strip_spans(spark, sf_dir):
    """ExactSubstr DELETION (Lee et al. 2022 §4.2): every duplicated
    span found by duplicate_spans is removed from the normalized token
    stream; clean documents pass through (normalized) unchanged. Same
    planted boilerplate as doc_duplicate_spans so the deletion path is
    exercised on real cross-document repeats. Output is projected to
    (doc_id, kept_words, text_md5) — scalar columns, md5 keeps the
    compared frame small while still value-exact on the full text."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    plant = (docs.filter(F.col("doc_id") % 6 == 0)
             .select((F.col("doc_id") + 200000).alias("doc_id"),
                     F.concat(F.col("text"),
                              F.lit(" " + _SPAN_PLANT)).alias("text")))
    out = textops.strip_duplicate_spans(docs.unionByName(plant), k=8,
                                        min_count=2, hash_family="poly")
    kept = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), " ")))
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      kept.cast("long").alias("kept_words"),
                      F.md5("text").alias("text_md5"))


O_DOC_STRIP_SPANS = f"""WITH aug AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
  UNION ALL
  SELECT doc_id + 200000, COALESCE(text, '') || ' {_SPAN_PLANT}'
  FROM documents WHERE doc_id % 6 = 0),
{textops.sql_duplicate_spans('aug', k=8, min_count=2)},
spans AS (
  SELECT doc_id, grp, MIN(p) AS s, MAX(p) + 7 AS e
  FROM runs GROUP BY doc_id, grp),
tok AS (
  SELECT doc_id, UNNEST(ws) AS w, UNNEST(range(0, LEN(ws))) AS i
  FROM toks),
kept AS (
  SELECT t.doc_id, t.i, t.w FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = t.doc_id AND t.i BETWEEN s.s AND s.e)),
agg AS (
  SELECT doc_id, STRING_AGG(w, ' ' ORDER BY i) AS text,
         COUNT(*) AS kept_words
  FROM kept GROUP BY doc_id)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN COALESCE(a.text, '') = '' THEN 0
                 ELSE a.kept_words END AS BIGINT) AS kept_words,
       MD5(COALESCE(a.text, '')) AS text_md5
FROM toks t LEFT JOIN agg a USING (doc_id)"""


def q_neardup_clusters(spark, sf_dir):
    """End-to-end near-dup CLUSTERING: LSH candidates (poly family) ->
    exact shingle-Jaccard verify (>= 0.5) -> alternating large-star/
    small-star connected components (components.py) -> every document
    labeled with its component id (min doc_id reachable; singletons
    label themselves). The oracle computes the same edge set in SQL and
    closes it with a recursive CTE — the iterative Spark algorithm and
    the declarative closure must agree exactly."""
    from .. import components

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.concat(F.col("text"), F.lit(" extra tail")).alias("text")))
    aug = docs.unionByName(plant)
    out = components.neardup_clusters(aug, num_hashes=32, bands=8,
                                      threshold=0.5, hash_family="poly")
    return out.select(F.col("node").cast("long").alias("node"),
                      F.col("component").cast("long").alias("component"))


def _o_neardup_clusters() -> str:
    cand = O_MINHASH_CANDIDATES
    # reuse the full candidate query as a CTE body (strip its WITH)
    assert cand.startswith("WITH ")
    head, select = cand.rsplit("\nSELECT DISTINCT", 1)
    head = "WITH RECURSIVE " + head[len("WITH "):]
    return f"""{head},
cand AS (SELECT DISTINCT{select}),
n AS (SELECT doc_id, COUNT(DISTINCT shingle) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.5),
und AS (SELECT id_a AS u, id_b AS v FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM aug
  UNION
  SELECT r.src, u.v FROM reach r JOIN und u ON u.u = r.dst)
SELECT CAST(src AS BIGINT) AS node, CAST(MIN(dst) AS BIGINT) AS component
FROM reach GROUP BY src"""


O_NEARDUP_CLUSTERS = _o_neardup_clusters()


def q_neardup_keep(spark, sf_dir):
    """Canonical-document selection per near-dup cluster (the keep-one
    step that turns clustering into dedup): policy "longest" keeps the
    member with the most normalized words, ties broken by min doc_id.
    The %9 plant appends " extra tail" to copies, so the PLANTED
    (higher-id, longer) document wins its cluster — distinguishing this
    policy from min_key and making the query non-vacuous. Output is
    the surviving corpus projected to (doc_id, n_words)."""
    from .. import components

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.concat(F.col("text"), F.lit(" extra tail")).alias("text")))
    aug = docs.unionByName(plant)
    out = components.dedup_near(aug, policy="longest", num_hashes=32,
                                bands=8, threshold=0.5, hash_family="poly")
    n_words = F.size(F.split(textops.normalize_text(F.col("text")), " "))
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      n_words.cast("long").alias("n_words"))


def _o_neardup_keep() -> str:
    base = O_NEARDUP_CLUSTERS
    head, select = base.rsplit("\nSELECT ", 1)
    return f"""{head},
comp AS (SELECT {select}),
nw AS (SELECT doc_id,
       LEN(STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ')) AS n_words
       FROM aug),
ranked AS (
  SELECT c.node, nw.n_words,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY nw.n_words DESC, c.node ASC) AS r
  FROM comp c JOIN nw ON nw.doc_id = c.node)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(n_words AS BIGINT) AS n_words
FROM ranked WHERE r = 1"""


O_NEARDUP_KEEP = _o_neardup_keep()


def q_simhash(spark, sf_dir):
    """SimHash fingerprints — poly hash family (56 bits) so the packed
    signature is value-exact against the DuckDB mirror; the xxhash64
    64-bit variant is the scale default (pytest hamming ordering)."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.with_simhash(docs, hash_family="poly", bits=56)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("simhash").cast("long").alias("simhash")))


def _o_simhash(bits: int = 56, src: str = "documents") -> str:
    m = textops.POLY_MOD
    osums = ", ".join(f"SUM((hv >> {b}) & 1) AS o{b}" for b in range(bits))
    packed = " + ".join(
        f"(CASE WHEN 2*o{b} >= n THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits))
    return f"""WITH tok AS (
  SELECT DISTINCT doc_id,
         UNNEST(STRING_SPLIT(LOWER(REGEXP_REPLACE(text, ' +', ' ', 'g')), ' ')) AS w
  FROM {src}),
h AS (SELECT doc_id, {textops.sql_poly_base('w', m)} AS hv FROM tok),
agg AS (SELECT doc_id, COUNT(*) AS n, {osums} FROM h GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN d.text IS NULL THEN {(1 << bits) - 1}
            ELSE ({packed}) END AS BIGINT) AS simhash
FROM {src} d LEFT JOIN agg ON d.doc_id = agg.doc_id"""


O_SIMHASH = _o_simhash()


# ---------------------------------------------------------------------------
# Corpus curation (fagi_spark/curation.py): the crawl->training hygiene
# stages — PII scrub, per-domain caps, decontamination, boilerplate
# removal, stratified sampling — each value-exact vs DuckDB.
# ---------------------------------------------------------------------------

def q_doc_pii_scrub(spark, sf_dir):
    """PII redaction (curation.with_pii_scrub): an email + phone pair is
    planted on doc_id % 5 == 0 so the scrub is non-vacuous; redaction
    counts and the scrubbed text are value-checked. Regexes restricted
    to Java==RE2 syntax."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com or +12-345-6789")))
        .otherwise(F.col("text")))
    return (curation.with_pii_scrub(aug)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("n_emails").cast("long").alias("n_emails"),
                    F.col("n_phones").cast("long").alias("n_phones"),
                    "text_clean"))


_PII_SQL = curation.sql_pii_scrub("text")
O_DOC_PII_SCRUB = f"""WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or +12-345-6789'
              ELSE text END AS text
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({_PII_SQL['n_emails']} AS BIGINT) AS n_emails,
       CAST({_PII_SQL['n_phones']} AS BIGINT) AS n_phones,
       {_PII_SQL['text_clean']} AS text_clean
FROM aug"""


def q_doc_domain_cap(spark, sf_dir):
    """Per-domain volume cap (curation.domain_cap, k=5, lowest doc_id
    wins): the WindowGroupLimit shape means each map task forwards at
    most k rows per domain into the shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return (curation.domain_cap(docs, domain="source", key="doc_id", k=5)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "source",
                    F.col("rank_in_domain").cast("long")
                    .alias("rank_in_domain")))


O_DOC_DOMAIN_CAP = """WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(rn AS BIGINT) AS rank_in_domain
FROM r WHERE rn <= 5"""


def q_doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination (curation.decontaminate, 8-gram
    overlap): the eval set is the first 8 tokens of every doc_id % 50
    document, so each source doc (and any 8-gram collision) is flagged
    with its distinct shared-shingle count."""
    docs = _t(spark, sf_dir, "documents")
    ev = (docs.filter(F.col("doc_id") % 50 == 0)
          .filter(F.size(F.split("text", " ")) >= 8)
          .select(F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
                  .alias("text")))
    return (curation.decontaminate(docs, ev, n=8)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("n_shared").cast("long").alias("n_shared")))


O_DOC_DECONTAMINATE = """WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
g AS (SELECT doc_id, t, UNNEST(RANGE(1, GREATEST(LEN(t) - 6, 1))) AS i
      FROM toks),
grams AS (SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+7], ' ') AS shingle
          FROM g),
ev AS (SELECT DISTINCT
         ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:8], ' ') AS shingle
       FROM documents
       WHERE doc_id % 50 = 0 AND LEN(STRING_SPLIT(text, ' ')) >= 8)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(DISTINCT grams.shingle) AS BIGINT) AS n_shared
FROM grams JOIN ev USING (shingle)
GROUP BY doc_id"""


def q_doc_para_dedup(spark, sf_dir):
    """Corpus-level paragraph dedup (curation.dedup_paragraphs): a
    promo paragraph planted on doc_id % 7 == 0 and a newsletter footer
    on % 5 == 0 each survive exactly once corpus-wide (smallest
    (doc_id, pos) wins); every document's own body paragraph is unique
    and stays. Attrition is visible in n_paras vs n_kept."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("shared promo paragraph call now\n\n"))
             .otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit("\n\nsubscribe to our newsletter today"))
             .otherwise(F.lit(""))))
    return (curation.dedup_paragraphs(aug)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "text_dedup", "n_paras", "n_kept"))


O_DOC_PARA_DEDUP = f"""WITH aug AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 7 = 0
               THEN 'shared promo paragraph call now' || CHR(10) || CHR(10)
               ELSE '' END)
         || text ||
         (CASE WHEN doc_id % 5 = 0
               THEN CHR(10) || CHR(10) || 'subscribe to our newsletter today'
               ELSE '' END) AS text
  FROM documents),
{curation.sql_dedup_paragraphs("aug")}
SELECT CAST(doc_id AS BIGINT) AS doc_id, text_dedup,
       CAST(n_paras AS BIGINT) AS n_paras, n_kept
FROM para_dedup"""


def q_doc_strip_boilerplate(spark, sf_dir):
    """Boilerplate line removal (curation.strip_boilerplate): a cookie
    banner and a footer line are planted on doc_id % 4 == 0; lines in
    more than 3 distinct docs are dropped and the remainder reassembled
    in original order."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("we use cookies accept all\n"), F.col("text"),
                        F.lit("\ncopyright footer 2020")))
        .otherwise(F.col("text")))
    return (curation.strip_boilerplate(aug, max_docs=3)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    "text_clean"))


O_DOC_STRIP_BOILERPLATE = """WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN 'we use cookies accept all' || CHR(10) || text
                   || CHR(10) || 'copyright footer 2020'
              ELSE text END AS text
  FROM documents),
ls AS (SELECT doc_id, STRING_SPLIT(text, CHR(10)) AS lst FROM aug),
e AS (SELECT doc_id, lst, UNNEST(RANGE(1, LEN(lst) + 1)) AS pos FROM ls),
lines AS (SELECT doc_id, pos, lst[pos] AS line FROM e),
bp AS (SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) > 3),
kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM bp))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       STRING_AGG(line, CHR(10) ORDER BY pos) AS text_clean
FROM kept GROUP BY doc_id"""


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (curation.stratified_sample):
    en kept at 25%, de at 50%, everything else at 75%, decided by the
    poly fold of md5(doc_id) — partition-independent and exactly
    mirrored in SQL."""
    docs = _t(spark, sf_dir, "documents")
    return (curation.stratified_sample(docs, {"en": 0.25, "de": 0.5},
                                       default_rate=0.75)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "lang"))


_SAMP_BUCKET = textops.sql_poly_base("MD5(CAST(doc_id AS VARCHAR))") + " % 100000"
O_DOC_STRATIFIED_SAMPLE = f"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE ({_SAMP_BUCKET}) < CASE WHEN lang = 'de' THEN 50000
                              WHEN lang = 'en' THEN 25000
                              ELSE 75000 END"""


def q_doc_token_stats_by_lang(spark, sf_dir):
    """Tokenizer-fertility report: per language, document count, total
    whitespace tokens, total BPE-ish subwords, and the corpus-level
    subwords-per-token ratio — the number a tokenizer budget planner
    reads per language. One partial-agg shuffle keyed on lang."""
    docs = _t(spark, sf_dir, "documents")
    t = textops.with_token_count(docs)
    return (t.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.sum("n_subwords").cast("long").alias("total_subwords"))
            .withColumn("subwords_per_token",
                        F.col("total_subwords").cast("double")
                        / F.col("total_tokens").cast("double")))


O_DOC_TOKEN_STATS_BY_LANG = """WITH t AS (
  SELECT lang,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
           AS n_subwords
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
       CAST(SUM(n_subwords) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
         AS subwords_per_token
FROM t GROUP BY lang"""


def q_doc_url_parts(spark, sf_dir):
    """URL structure extraction (curation.with_url_parts): urls are
    planted deterministically per doc (three path shapes + a non-URL
    row per 97 docs to exercise the empty-parts path)."""
    docs = _t(spark, sf_dir, "documents")
    url = (F.when(F.col("doc_id") % 97 == 0, F.lit("not a url"))
           .otherwise(F.concat(
               F.lit("https://www."), F.col("source"),
               F.lit(".example.org"),
               F.element_at(F.array(F.lit("/a/b/c"), F.lit("/p"), F.lit("")),
                            (F.col("doc_id") % 3 + 1).cast("int")))))
    aug = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      url.alias("url"))
    return (curation.with_url_parts(aug)
            .select("doc_id", "scheme", "host", "registered_domain",
                    F.col("path_depth").cast("long").alias("path_depth")))


_URL_SQL = curation.sql_url_parts("url")
O_DOC_URL_PARTS = f"""WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN doc_id % 97 = 0 THEN 'not a url'
              ELSE 'https://www.' || source || '.example.org' ||
                   (['/a/b/c', '/p', ''])[CAST(doc_id % 3 AS INT) + 1]
         END AS url
  FROM documents)
SELECT doc_id, {_URL_SQL['scheme']} AS scheme, {_URL_SQL['host']} AS host,
       {_URL_SQL['registered_domain']} AS registered_domain,
       CAST({_URL_SQL['path_depth']} AS BIGINT) AS path_depth
FROM aug"""


def q_doc_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (curation.pack_sequences):
    documents laid end-to-end in doc_id order, cut into 128-token
    packs, one row per (doc, pack) segment. The Spark side computes
    the global prefix sum with the distributed quantile-bucket
    two-pass plan; the oracle is the declarative one-window form —
    both must emit identical int64 segment geometry."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n_tokens"))
    out = curation.pack_sequences(docs, ctx=128, buckets=32)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "pack_id", "doc_offset", "pack_offset", "seg_len")


O_DOC_PACK_SEQUENCES = f"""WITH pk_t AS (
  SELECT doc_id, LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS n_tokens
  FROM documents),
{curation.sql_pack_sequences('pk_t', ctx=128)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(pack_id AS BIGINT) AS pack_id,
       CAST(GREATEST(pack_id * 128, st) - st AS BIGINT) AS doc_offset,
       CAST(GREATEST(pack_id * 128, st) - pack_id * 128 AS BIGINT) AS pack_offset,
       CAST(LEAST((pack_id + 1) * 128, cum) - GREATEST(pack_id * 128, st)
            AS BIGINT) AS seg_len
FROM pk_seg"""


def q_doc_chunk_overlap(spark, sf_dir):
    """RAG-style overlapping chunking (curation.chunk_docs): 48-token
    windows, 8-token overlap; chunk text projected to md5 so the
    compared frame stays scalar and small. Map-only on the Spark side
    — the one Generate is the whole plan."""
    docs = _t(spark, sf_dir, "documents")
    out = curation.chunk_docs(docs, size=48, overlap=8)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "chunk_id", "chunk_start", "chunk_len",
                      F.md5("chunk_text").alias("chunk_md5"))


O_DOC_CHUNK_OVERLAP = f"""WITH {curation.sql_chunk_docs(
    'documents', size=48, overlap=8)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, chunk_id, chunk_start, chunk_len,
       MD5(chunk_text) AS chunk_md5
FROM ch"""


def q_doc_canonical_url(spark, sf_dir):
    """URL canonicalization (curation.with_canonical_url): planted
    URLs cycle through mixed-case hosts, default/explicit ports,
    tracking params, out-of-order params, fragments, and a non-URL
    row — every branch of the canonicalizer fires."""
    docs = _t(spark, sf_dir, "documents")
    url = (F.when(F.col("doc_id") % 7 == 0, F.lit("not a url at all"))
           .otherwise(F.concat(
               F.element_at(F.array(F.lit("HTTP://"), F.lit("https://"),
                                    F.lit("http://")),
                            (F.col("doc_id") % 3 + 1).cast("int")),
               F.when(F.col("doc_id") % 11 == 0, F.lit("User:Pw@"))
               .otherwise(F.lit("")),
               F.when(F.col("doc_id") % 13 == 0, F.lit("[2001:DB8::1]"))
               .otherwise(F.concat(
                   F.lit("WWW.Example"),
                   (F.col("doc_id") % 5).cast("string"),
                   F.lit(".ORG"))),
               F.element_at(F.array(F.lit(":80"), F.lit(":443"),
                                    F.lit(":8080"), F.lit("")),
                            (F.col("doc_id") % 4 + 1).cast("int")),
               F.element_at(F.array(F.lit("/A/b"), F.lit("")),
                            (F.col("doc_id") % 2 + 1).cast("int")),
               F.lit("?z=2&utm_source=x&a=1&fbclid=y#frag"))))
    aug = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      url.alias("url"))
    return (curation.with_canonical_url(aug)
            .select("doc_id", "url", "canonical_url"))


O_DOC_CANONICAL_URL = f"""WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'not a url at all'
              ELSE (['HTTP://', 'https://', 'http://'])[CAST(doc_id % 3 AS INT) + 1]
                   || (CASE WHEN doc_id % 11 = 0 THEN 'User:Pw@' ELSE '' END)
                   || (CASE WHEN doc_id % 13 = 0 THEN '[2001:DB8::1]'
                            ELSE 'WWW.Example' || CAST(doc_id % 5 AS VARCHAR) || '.ORG' END)
                   || ([':80', ':443', ':8080', ''])[CAST(doc_id % 4 AS INT) + 1]
                   || (['/A/b', ''])[CAST(doc_id % 2 AS INT) + 1]
                   || '?z=2&utm_source=x&a=1&fbclid=y#frag'
         END AS url
  FROM documents)
SELECT doc_id, url, {curation.sql_canonical_url('url')} AS canonical_url
FROM aug"""


def q_doc_quality_learned(spark, sf_dir):
    """Learned fastText-style quality filter (curation.train_quality_
    classifier + predict_quality): trained on a planted prose-vs-
    gibberish sample derived from the documents table, then scored
    over every document. pyspark.ml path (hashed features + LBFGS
    logistic fit) — rows-only; classification accuracy on held-out
    planted classes is pinned in tests/test_curation.py."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    gib = F.concat_ws(" ", F.array(*[
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(f"_{i}"))), 1, 9)
        for i in range(8)]))
    labeled = (docs.filter(F.col("doc_id") % 2 == 0)
               .select("text", F.lit(1.0).alias("label"))
               .unionByName(docs.filter(F.col("doc_id") % 2 == 1)
                            .select(gib.alias("text"),
                                    F.lit(0.0).alias("label"))))
    model = curation.train_quality_classifier(labeled)
    out = curation.predict_quality(model, docs)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("quality_keep").cast("long").alias("keep"))


def q_doc_bpe_encode(spark, sf_dir):
    """Learned-BPE encoding (bpe.train_bpe + apply_bpe, Sennrich et
    al. 2016): 20 merges trained ON the documents table, then every
    doc encoded. Deterministic (lexicographic tie-breaks) but the
    training loop is iterative argmax — not SQL-expressible, so this
    is a rows-only query; exact parity with a pure-Python reference
    implementation is pinned in tests/test_bpe.py."""
    from .. import bpe

    docs = _t(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, n_merges=20)
    out = bpe.apply_bpe(docs, merges)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"))


_BPE_FIXED = [("t", "h"), ("th", "e"), ("e", "r"), ("a", "t"),
              ("o", "w"), ("l", "ow"), ("s", "t"), ("d", "a"),
              ("da", "t"), ("dat", "a"), ("the", "</w>")]


def q_doc_bpe_fixed(spark, sf_dir):
    """BPE ENCODING with a fixed, well-formed merge table
    (bpe.apply_bpe) — the value-exact twin of doc_bpe_encode (whose
    iterative TRAINING stays rows-only + pytest, like
    ann_ivf_fixed_topk vs ann_ivf_topk). The full encoded token string
    per doc is value-compared. The oracle re-derives the encoding with
    a recursive CTE that merges ONE leftmost occurrence of the
    lowest-rank pair per step — equivalent to apply_bpe's
    full-pass-per-rank rule for any well-formed table (a pair created
    by a merge always has a higher rank than the merge that created
    its symbols; equivalence pinned in tests/test_bpe.py)."""
    from .. import bpe

    docs = _t(spark, sf_dir, "documents")
    out = bpe.apply_bpe(docs, _BPE_FIXED)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.array_join("bpe_tokens", " ").alias("bpe_text"))


def _o_bpe_fixed() -> str:
    ranks = ", ".join(f"('{a}', '{b}', {i})"
                      for i, (a, b) in enumerate(_BPE_FIXED))
    return f"""WITH RECURSIVE branks(a, b, rk) AS (
  SELECT * FROM (VALUES {ranks})),
bdocs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(LOWER(regexp_replace(COALESCE(text, ''), ' +', ' ', 'g')), ' ') AS words
  FROM documents),
bdw AS (
  SELECT DISTINCT w FROM (SELECT unnest(words) AS w FROM bdocs)
  WHERE w <> ''),
benc AS (
  SELECT w, list_append(string_split(w, ''), '</w>') AS seq FROM bdw
  UNION ALL
  SELECT w,
    -- bi is never NULL here (the WHERE below guarantees a learned
    -- pair exists); the CASE is shape-only
    CASE WHEN bi IS NULL THEN seq
         ELSE list_concat(list_concat(
                list_slice(seq, 1, bi - 1),
                [seq[bi] || seq[bi + 1]]),
                list_slice(seq, bi + 2, len(seq))) END
  FROM (
    SELECT w, seq,
      (SELECT MIN(i) FROM (
         SELECT unnest(generate_series(1, len(seq) - 1)) AS i) t
       WHERE (SELECT MIN(rk) FROM branks r2
              WHERE EXISTS (SELECT 1 FROM (
                SELECT unnest(generate_series(1, len(seq) - 1)) AS j) u
                WHERE r2.a = seq[j] AND r2.b = seq[j + 1]))
             = (SELECT rk FROM branks r3
                WHERE r3.a = seq[i] AND r3.b = seq[i + 1])) AS bi
    FROM benc
    WHERE EXISTS (SELECT 1 FROM branks r
                  JOIN (SELECT unnest(generate_series(1, len(seq) - 1)) AS j) s
                  ON r.a = seq[j] AND r.b = seq[j + 1])) x),
bfinal AS (
  SELECT w, seq FROM benc e
  WHERE NOT EXISTS (SELECT 1 FROM branks r
                    JOIN (SELECT unnest(generate_series(1, len(e.seq) - 1)) AS j) s
                    ON r.a = e.seq[j] AND r.b = e.seq[j + 1])),
bjoined AS (
  SELECT d.doc_id, t.i, f.seq
  FROM bdocs d,
       UNNEST(generate_series(1, len(d.words))) AS t(i)
  JOIN bfinal f ON f.w = d.words[t.i]
  WHERE d.words[t.i] <> ''),
bagg AS (
  SELECT doc_id, CAST(SUM(len(seq)) AS BIGINT) AS n_bpe_tokens,
         string_agg(array_to_string(seq, ' '), ' ' ORDER BY i) AS bpe_text
  FROM bjoined GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       COALESCE(a.bpe_text, '') AS bpe_text
FROM (SELECT DISTINCT doc_id FROM bdocs) d
LEFT JOIN bagg a ON a.doc_id = d.doc_id"""


O_DOC_BPE_FIXED = _o_bpe_fixed()


def q_doc_temperature_sample(spark, sf_dir):
    """Temperature resampling (curation.temperature_sample): the
    mixture weights applied as per-language keep thresholds
    floor(min(1, T*w_l/c_l) * mod) — integer thresholds derived from
    the same IEEE double sequence on both engines, keep decisions by
    the stratified_sample poly-of-md5 mechanism. T=10000 forces real
    subsampling of the high-resource languages at sf0.01 while rare
    languages keep rate 1.0."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("lang", F.lit("und")).alias("lang"),
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n_tokens"))
    out = curation.temperature_sample(docs, target_tokens=10_000)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


_MD5_POLY = textops.sql_poly_base("MD5(CAST(doc_id AS VARCHAR))")
O_DOC_TEMPERATURE_SAMPLE = f"""WITH lm_src AS (
  SELECT doc_id, COALESCE(lang, 'und') AS lang,
         LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS n_tokens
  FROM documents),
{curation.sql_lang_mixture('lm_src')},
ts_thr AS (
  SELECT lang,
         CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
               (CAST(10000.0 AS DOUBLE) * (SQRT(CAST(n_tokens AS DOUBLE)) / den))
               / CAST(n_tokens AS DOUBLE)) * CAST(100000.0 AS DOUBLE))
           AS BIGINT) AS thr
  FROM lm_lc, lm_tot)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.lang,
       CAST(s.n_tokens AS BIGINT) AS n_tokens
FROM lm_src s JOIN ts_thr t ON s.lang = t.lang
WHERE {_MD5_POLY} % 100000 < t.thr"""


def q_doc_surprisal(spark, sf_dir):
    """Unigram corpus-surprisal quality score (textops.with_surprisal)
    — the CCNet-perplexity analog made integer-exact: the per-token
    bucket floor(log10(total/count)) is the digit count of an integer
    quotient, so sums and centibucket means are value-comparable with
    zero float ops."""
    docs = _t(spark, sf_dir, "documents")
    out = textops.with_surprisal(docs)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "surp_sum", "n_scored", "surp_centi")


O_DOC_SURPRISAL = f"""WITH {textops.sql_surprisal('documents')}
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(a.surp_sum, 0) AS BIGINT) AS surp_sum,
       CAST(COALESCE(a.n_scored, 0) AS BIGINT) AS n_scored,
       CAST(CASE WHEN COALESCE(a.n_scored, 0) > 0
                 THEN (100 * a.surp_sum) // a.n_scored
                 ELSE 0 END AS BIGINT) AS surp_centi
FROM documents d LEFT JOIN sp_agg a ON d.doc_id = a.doc_id"""


def q_doc_pagerank(spark, sf_dir):
    """Link-graph centrality quality prior (components.pagerank,
    2 iterations, deterministic fold mode): a synthetic out-degree-2
    web graph over the documents table (dst = (31*id+7) % N and
    (17*id+3) % N — every node has out-edges, so no dangling leak in
    the planted graph). The float ranks ARE value-compared: both
    engines fold each target's contributions in src-sorted order
    (F.aggregate vs LIST_REDUCE(LIST_PREPEND(0.0, LIST(.. ORDER BY
    src)))) and apply the same base + damping * S sequence. The scale
    path (plain SUM, no per-node arrays) is pytest-pinned equal on a
    dangling-free graph."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 31 + 7) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 17 + 3) % n).alias("dst"))
    out = components.pagerank(e1.unionByName(e2), iters=2,
                              deterministic=True,
                              nodes=docs, node_col="doc_id")
    return out.select("node", "rank")


def _o_pagerank(iters: int = 2, damping: float = 0.85) -> str:
    base = f"({_dlit(1.0 - damping)} / CAST(n AS DOUBLE))"
    parts = [f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e AS (
  SELECT node AS src, (node * 31 + 7) % n AS dst FROM nd, nn
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % n AS dst FROM nd, nn),
od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / CAST(n AS DOUBLE) AS rank
       FROM nd, nn)"""]
    for i in range(iters):
        parts.append(f"""c{i + 1} AS (
  SELECT e.dst, e.src, r.rank / od.odeg AS c
  FROM e JOIN od USING (src) JOIN r{i} r ON r.node = e.src),
s{i + 1} AS (
  SELECT dst, LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(c ORDER BY src)), (acc, v) -> acc + v) AS s
  FROM c{i + 1} GROUP BY dst),
r{i + 1} AS (
  SELECT b.node, {base} + {_dlit(damping)} * COALESCE(s, CAST(0.0 AS DOUBLE))
           AS rank
  FROM (SELECT node, n FROM nd, nn) b
  LEFT JOIN s{i + 1} ON s{i + 1}.dst = b.node)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM r{iters}")


def q_doc_hits(spark, sf_dir):
    """HITS hubs & authorities (components.hits, 2 iterations,
    deterministic fold mode, L1 normalization) over the same planted
    out-degree-2 web graph as doc_pagerank. Both floats ARE
    value-compared: per-node half-step sums fold in neighbor-sorted
    order and the normalization totals fold the node-sorted score
    list, mirrored by LIST_REDUCE(LIST_PREPEND(0.0, LIST(..
    ORDER BY ..))) on both the group and global folds. The scale
    path (plain SUMs) is pytest-pinned proportional on the same
    fixture."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 31 + 7) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 17 + 3) % n).alias("dst"))
    out = components.hits(e1.unionByName(e2), iters=2,
                          deterministic=True,
                          nodes=docs, node_col="doc_id")
    return out.select("node", "hub", "auth")


def _o_hits(iters: int = 2) -> str:
    z = "CAST(0.0 AS DOUBLE)"
    parts = [f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e AS (
  SELECT node AS src, (node * 31 + 7) % n AS dst FROM nd, nn
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % n AS dst FROM nd, nn),
h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nd)"""]
    for i in range(1, iters + 1):
        parts.append(f"""ar{i} AS (
  SELECT b.node, COALESCE(s.s, {z}) AS v
  FROM nd b LEFT JOIN (
    SELECT e.dst, LIST_REDUCE(LIST_PREPEND({z},
             LIST(h.hub ORDER BY e.src)), (acc, v) -> acc + v) AS s
    FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst) s
  ON s.dst = b.node),
at{i} AS (SELECT LIST_REDUCE(LIST_PREPEND({z},
            LIST(v ORDER BY node)), (acc, v) -> acc + v) AS tot FROM ar{i}),
a{i} AS (SELECT node, CASE WHEN tot <> 0.0 THEN v / tot ELSE {z} END AS auth
         FROM ar{i}, at{i}),
hr{i} AS (
  SELECT b.node, COALESCE(s.s, {z}) AS v
  FROM nd b LEFT JOIN (
    SELECT e.src, LIST_REDUCE(LIST_PREPEND({z},
             LIST(a.auth ORDER BY e.dst)), (acc, v) -> acc + v) AS s
    FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src) s
  ON s.src = b.node),
ht{i} AS (SELECT LIST_REDUCE(LIST_PREPEND({z},
            LIST(v ORDER BY node)), (acc, v) -> acc + v) AS tot FROM hr{i}),
h{i} AS (SELECT node, CASE WHEN tot <> 0.0 THEN v / tot ELSE {z} END AS hub
         FROM hr{i}, ht{i})""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT h.node, h.hub, a.auth"
            + f"\nFROM h{iters} h JOIN a{iters} a USING (node)")


def q_doc_triangles(spark, sf_dir):
    """Per-node triangle counts + local clustering coefficient
    (components.triangle_count, degree-ordered node-iterator) over a
    planted ring+chords web graph: edges (i, i+1), (i, i+2) and
    (i, 7i+3) mod n — the ring/chord pair guarantees a dense triangle
    population and the multiplicative family creates rank-crossing
    hubs that exercise the (deg, id) orientation. degree/triangles
    are BIGINT-exact; lcc is 2*tri / (deg*(deg-1)) — integer numerator
    and denominator with one mirrored IEEE division, value-compared.
    The oracle replays the same canonicalize/orient/wedge/close steps
    in SQL over the identical planted edge list."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    fams = [lambda c: (c + 1) % n, lambda c: (c + 2) % n,
            lambda c: (c * 7 + 3) % n]
    e = None
    for f in fams:
        part = docs.select(F.col("doc_id").alias("src"),
                           f(F.col("doc_id")).alias("dst"))
        e = part if e is None else e.unionByName(part)
    out = components.triangle_count(e, nodes=docs, node_col="doc_id")
    return out.select("node", "degree", "triangles", "lcc")


O_DOC_TRIANGLES = """WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e0 AS (
  SELECT node AS s, (node + 1) % n AS d FROM nd, nn
  UNION ALL SELECT node, (node + 2) % n FROM nd, nn
  UNION ALL SELECT node, (node * 7 + 3) % n FROM nd, nn),
e AS (SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
      FROM e0 WHERE s <> d),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node),
o AS (SELECT CASE WHEN da.deg <= db.deg THEN e.a ELSE e.b END AS u,
             CASE WHEN da.deg <= db.deg THEN e.b ELSE e.a END AS v
      FROM e JOIN deg da ON da.node = e.a
             JOIN deg db ON db.node = e.b),
w AS (SELECT x.u AS u, x.v AS v1, y.v AS v2
      FROM o x JOIN o y ON x.u = y.u AND x.v < y.v),
tri AS (SELECT u, v1, v2 FROM w JOIN e ON e.a = w.v1 AND e.b = w.v2),
per AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
          SELECT u AS node FROM tri
          UNION ALL SELECT v1 FROM tri
          UNION ALL SELECT v2 FROM tri) GROUP BY node)
SELECT nd.node,
       COALESCE(deg.deg, 0) AS degree,
       COALESCE(per.triangles, 0) AS triangles,
       CASE WHEN COALESCE(deg.deg, 0) >= 2
            THEN (2.0 * COALESCE(per.triangles, 0))
                 / (deg.deg * (deg.deg - 1))
            ELSE CAST(0.0 AS DOUBLE) END AS lcc
FROM nd LEFT JOIN deg ON deg.node = nd.node
        LEFT JOIN per ON per.node = nd.node"""


def q_doc_lang_mixture(spark, sf_dir):
    """Temperature-based language-mixture weights (alpha=0.5, the
    XLM-R sampling rule): per-language token totals -> sqrt-amplified
    shares. The float weight IS value-compared: both sides fold the
    lang-sorted sqrt list left-associatively (F.aggregate vs
    LIST_REDUCE(LIST_PREPEND(0.0, LIST(.. ORDER BY lang)))) and apply
    the same sqrt/divide sequence per row, per the repo's
    IEEE-determinism rules."""
    docs = _t(spark, sf_dir, "documents").select(
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n_tokens"))
    out = curation.lang_mixture_weights(docs, alpha=0.5)
    return out.select("lang", F.col("n_tokens").cast("long").alias("n_tokens"),
                      "raw_share", "weight", "boost")


O_DOC_LANG_MIXTURE = f"""WITH lm_src AS (
  SELECT COALESCE(lang, 'und') AS lang,
         LEN(STRING_SPLIT(COALESCE(text, ''), ' ')) AS n_tokens
  FROM documents),
{curation.sql_lang_mixture('lm_src')}
SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS raw_share,
       SQRT(CAST(n_tokens AS DOUBLE)) / den AS weight,
       (SQRT(CAST(n_tokens AS DOUBLE)) / den)
         / (CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) AS boost
FROM lm_lc, lm_tot"""


def q_doc_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct-count sketch (fagi_spark/sketch.py): the
    ESTIMATE itself is value-checked, not just bounded — the poly-of-
    md5 hash family and the single IEEE division are identical on both
    engines. k=64 over the document texts."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    return (sketch.kmv_distinct(docs, "text", k=64)
            .select(F.col("n_seen").cast("long").alias("n_seen"),
                    F.col("h_k").cast("long").alias("h_k"), "est"))


def _o_kmv():
    from .. import sketch
    return sketch.sql_kmv_distinct("documents", "text", k=64)


def q_doc_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-token estimate (sketch.hll_distinct,
    p=6/m=64) — the registers AND the raw estimator are value-exact:
    deterministic poly-of-md5 hash, rho via bin()-length arithmetic
    (identical leading-zero semantics both engines), bucket-ordered
    harmonic fold, one inlined alpha*m^2 literal, one division. The
    LinearCounting small-range correction is intentionally absent
    (transcendental); n_empty rides along."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(
                F.split(F.coalesce("text", F.lit("")), " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    return sketch.hll_distinct(toks, "tok", p=6)


def _o_hll():
    from .. import sketch
    body = sketch.sql_hll("hll_toks", "tok", p=6)
    return f"""WITH hll_toks AS (
  SELECT tok FROM (
    SELECT UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS tok
    FROM documents) WHERE tok != ''),
{body}"""


def q_doc_kmv_by_lang(spark, sf_dir):
    """Per-group KMV distinct-count (sketch.kmv_distinct_grouped):
    distinct texts per language at bounded per-group memory — the
    "distinct users per tile" shape. k=16 forces the ESTIMATION branch
    for the large language groups while small groups stay exhaustive-
    exact, so both estimator paths are value-checked; the bottom-k
    rank filter plans as WindowGroupLimit (per-partition heaps)."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    return (sketch.kmv_distinct_grouped(docs, "lang", "text", k=16)
            .select(F.col("grp").alias("lang"),
                    F.col("n_seen").cast("long").alias("n_seen"),
                    F.col("h_k").cast("long").alias("h_k"), "est"))


def _o_kmv_grouped():
    from .. import sketch
    inner = sketch.sql_kmv_distinct_grouped("documents", "lang", "text",
                                            k=16)
    return (f"SELECT grp AS lang, n_seen, h_k, est FROM ({inner}) g")


def q_doc_bloom_probe(spark, sf_dir):
    """Bloom-filter membership (fagi_spark/sketch.py): the crawl-
    frontier "seen URL?" test that gates incremental ingest before any
    exact anti-join. The filter is built over the urls of even doc_ids
    (the already-crawled half) and probed with every url; m_bits=1024
    against ~250 build keys forces real false positives, so BOTH
    verdict paths are exercised and value-checked — packed 32-bit
    words, affine bit positions and bitwise-AND verdicts are identical
    integer math on both engines. False negatives are impossible by
    construction (pytest pins that plus mergeability)."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat_ws("/", F.col("source"),
                    F.col("doc_id").cast("string")).alias("url"),
        "doc_id")
    built = sketch.bloom_build(urls.filter(F.col("doc_id") % 2 == 0),
                               "url", m_bits=1024)
    return sketch.bloom_probe(built, urls, "url", m_bits=1024)


def _o_bloom():
    from .. import sketch
    urls = ("(SELECT source || '/' || CAST(doc_id AS VARCHAR) AS url, "
            "doc_id FROM documents)")
    return sketch.sql_bloom_probe(
        f"(SELECT url FROM {urls} u WHERE doc_id % 2 = 0)",
        f"(SELECT url FROM {urls} u)", "url", m_bits=1024)


def q_doc_collocations(spark, sf_dir):
    """Top bigram collocations by PMI (textops.collocations): the
    phrase-mining pass before tokenizer training. Ranking by
    lift = n_ab*T/(n_a*n_b) IS PMI ranking (log monotone), and lift
    stays one IEEE division of sub-2^53 integers — value-exact incl.
    the float, same log-free-rational trick as doc_bm25_topk. One
    token explode feeds pair + unigram counts; min_pair prunes before
    the vocabulary-sized broadcast joins."""
    from .. import textops
    docs = _t(spark, sf_dir, "documents")
    return textops.collocations(docs, min_pair=5, topk=30)


def _o_collocations():
    from .. import textops
    return textops.sql_collocations("documents", min_pair=5, topk=30)


def q_doc_heavy_tokens(spark, sf_dir):
    """Count-min heavy hitters (fagi_spark/sketch.py): the bounded-
    memory hot-key detector behind salting / hot-cell promotion. w=16
    forces real slot collisions over the 31-token vocabulary, so the
    over-counting path (min over d=4 rows) is exercised, and the whole
    grid is still value-exact integer math on both engines."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
    out = sketch.cms_heavy_hitters(toks, "tok", threshold=900, w=16)
    return out.select("tok", F.col("est").cast("long").alias("est"))


def _o_cms():
    from .. import sketch
    return sketch.sql_cms_heavy_hitters(
        "(SELECT UNNEST(STR_SPLIT(LOWER(text), ' ')) AS tok FROM documents)",
        "tok", threshold=900, w=16)


_BM25_TERMS = ("spark", "vector", "customer")


def q_doc_bm25_topk(spark, sf_dir):
    """BM25-style keyword retrieval (fagi_spark/retrieval.py): integer
    conditional-agg term/doc frequencies, one broadcast scalar-stats
    row, log-free rational idf so the SCORE is value-exact, TakeOrdered
    top-k. Retrieval twin of FAGI's lexical candidate ranking
    (VirtuosoImporter.java TF filter feeding JW scoring)."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents")
    out = retrieval.bm25_topk(docs, _BM25_TERMS, k=20)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("rank").cast("long").alias("rank"), "score")


def _o_bm25():
    from .. import retrieval
    return retrieval.sql_bm25_topk(_BM25_TERMS, k=20)


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+vector retrieval via reciprocal-rank fusion
    (retrieval.rrf_fuse; Cormack et al. SIGIR'09): BM25 top-20 for the
    fixed query terms fused with the exact ANN top-20 for query vector
    0 (embeddings.vec_id aligns with documents.doc_id). The RRF score
    is two exact integer-rank reciprocals added in a fixed order, so
    the whole hybrid stack — BM25 stats, dot products, both rank
    windows, the fusion — is value-checked end to end. Scale shape:
    the two retrievers bound the inputs to k rows each; the fusion
    join broadcasts."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = (retrieval.bm25_topk(docs, _BM25_TERMS, k=20)
          .select(F.col("doc_id").cast("long").alias("doc_id"), "rank"))
    qv = emb.filter(F.col("vec_id") == 0)
    ann = (vector.brute_force_topk(qv, emb, k=20)
           .select(F.col("neighbor_id").cast("long").alias("doc_id"), "rank"))
    out = retrieval.rrf_fuse(bm, ann, k0=60, out_k=10)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "rrf_score", F.col("rank").cast("long").alias("rank"))


def _o_hybrid_rrf():
    from .. import retrieval
    bm = retrieval.sql_bm25_topk(_BM25_TERMS, k=20)
    fuse = retrieval.sql_rrf_fuse("bm", "ann", k0=60, out_k=10)
    return f"""WITH bm AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, rank FROM ({bm})
), ann AS (
  SELECT CAST(neighbor_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rank FROM (
    SELECT e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (ORDER BY
             LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])),
                                     x -> x[1] * x[2])) DESC, e.vec_id ASC) AS rn
    FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id = 0) q,
         embeddings e WHERE e.vec_id <> q.query_id
  ) WHERE rn <= 20
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, rrf_score, rank FROM ({fuse})"""


def q_doc_keywords(spark, sf_dir):
    """Per-document top-5 TF-IDF keywords (retrieval.doc_keywords):
    the tagging twin of BM25 retrieval — WindowGroupLimit top-k per
    doc over the rational-idf score, term string as the total-order
    tie-break. Score float value-compared."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents")
    out = retrieval.doc_keywords(docs, k=5)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "rank", "term", "tf", "df", "score")


def _o_doc_keywords():
    from .. import retrieval
    return (f"WITH {retrieval.sql_doc_keywords('documents', k=5)}\n"
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, rank, term, tf, df, "
            "score FROM keywords")


_SCRIPT_PLANTS = [
    (1000001, "Привет мир как дела"),
    (1000002, "你好 世界 数据 处理"),
    (1000003, "مرحبا بالعالم"),
    (1000004, "Γεια σου κόσμε"),
    (1000005, "mixed Привет data 2024 你好"),
    (1000006, "12345 67890"),
    (1000007, "!!! ... ???"),
]


def q_doc_script_mix(spark, sf_dir):
    """Unicode-script mixture router (textops.with_script_mix): per-doc
    script character counts + dominant script — the stage that runs
    BEFORE Latin-assuming language ID in a multilingual pipeline. The
    driver corpus is ASCII-only, so non-vacuousness comes from planted
    Cyrillic/CJK/Arabic/Greek/mixed/digit/punct rows unioned in by the
    query (same literals inlined into the oracle)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    plants = spark.createDataFrame(_SCRIPT_PLANTS,
                                   "doc_id long, text string")
    out = textops.with_script_mix(docs.unionByName(plants))
    return out.select("doc_id", "n_arabic", "n_cjk", "n_cyrillic",
                      "n_digit", "n_greek", "n_latin", "dominant_script")


_O_SCRIPT_PLANTS = "\n  UNION ALL\n  ".join(
    f"SELECT CAST({i} AS BIGINT), '{t}'" for i, t in _SCRIPT_PLANTS)
O_DOC_SCRIPT_MIX = f"""WITH alldocs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  {_O_SCRIPT_PLANTS}
)
SELECT doc_id, {', '.join(textops.sql_script_mix('text'))} FROM alldocs"""


def q_doc_labelprop(spark, sf_dir):
    """Fixed-round synchronous label propagation
    (components.label_propagation, 3 rounds) over a planted-community
    graph on the documents table: dense blocks of 20 (two intra-block
    out-edges per node) plus a sparse inter-block bridge on every 13th
    node — communities the pure-reachability components operator would
    (wrongly, for this purpose) merge. The oracle unrolls the same
    three synchronous rounds declaratively (count -> ROW_NUMBER argmax
    -> COALESCE carry), proving the iterative join loop equals the
    textbook definition."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    blk = F.floor(F.col("doc_id") / 20) * 20
    e1 = docs.select(F.col("doc_id").alias("src"),
                     (blk + (F.col("doc_id") * 7 + 1) % 20).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     (blk + (F.col("doc_id") * 3 + 2) % 20).alias("dst"))
    e3 = (docs.filter(F.col("doc_id") % 13 == 0)
          .select(F.col("doc_id").alias("src"),
                  ((F.col("doc_id") * 31 + 5) % n).alias("dst")))
    edges = e1.unionByName(e2).unionByName(e3).filter(F.col("dst") < n)
    out = components.label_propagation(edges, iters=3, nodes=docs,
                                       node_col="doc_id")
    return out.select("node", "label")


def _o_labelprop(iters: int = 3) -> str:
    parts = [f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e0 AS (
  SELECT node AS src,
         (node // 20) * 20 + (node * 7 + 1) % 20 AS dst FROM nd
  UNION ALL
  SELECT node AS src,
         (node // 20) * 20 + (node * 3 + 2) % 20 AS dst FROM nd
  UNION ALL
  SELECT node AS src, (node * 31 + 5) % n AS dst FROM nd, nn
  WHERE node % 13 = 0),
e AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM e0, nn WHERE dst < n
    UNION
    SELECT dst AS src, src AS dst FROM e0, nn WHERE dst < n)
  WHERE src <> dst),
l0 AS (SELECT node AS id, node AS lbl FROM nd)"""]
    for i in range(iters):
        parts.append(f"""c{i + 1} AS (
  SELECT e.dst AS id, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
  FROM e JOIN l{i} l ON l.id = e.src GROUP BY 1, 2),
b{i + 1} AS (
  SELECT id, lbl FROM (
    SELECT id, lbl,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
    FROM c{i + 1}) WHERE rn = 1),
l{i + 1} AS (
  SELECT p.id, COALESCE(b{i + 1}.lbl, p.lbl) AS lbl
  FROM l{i} p LEFT JOIN b{i + 1} USING (id))""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id AS node, lbl AS label FROM l{iters}")


O_DOC_LABELPROP = _o_labelprop()


_QUANTILES = [0.25, 0.5, 0.75, 0.9, 1.0]


def q_doc_length_quantiles(spark, sf_dir):
    """Exact per-language token-count quantiles by distributed
    selection (textops.grouped_quantiles; type-1 ceil(q*n)
    definition): the deterministic sibling of approx_percentile, and
    the length-budget audit a packing/truncation stage reads. The
    cumulative window runs over the (lang, value) AGGREGATE — distinct
    values per group, never the raw table."""
    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        "lang",
        F.size(F.split(F.coalesce("text", F.lit("")), " "))
        .cast("long").alias("n_tokens"))
    out = textops.grouped_quantiles(v, "n_tokens", _QUANTILES, by="lang")
    return out.select("lang", "q", F.col("n").cast("long").alias("n"),
                      F.col("q_value").cast("long").alias("q_value"))


def _o_length_quantiles() -> str:
    qvals = ", ".join(f"({_dlit(q)})" for q in _QUANTILES)
    return f"""WITH v AS (
  SELECT lang,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (SELECT lang, n_tokens, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2),
cum AS (
  SELECT lang, n_tokens,
         SUM(c) OVER (PARTITION BY lang ORDER BY n_tokens
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM c),
n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
q(q) AS (VALUES {qvals}),
thr AS (SELECT lang, q, n,
               CAST(CEIL(q * CAST(n AS DOUBLE)) AS BIGINT) AS thr
        FROM n, q)
SELECT t.lang, t.q, t.n, CAST(MIN(cum.n_tokens) AS BIGINT) AS q_value
FROM thr t JOIN cum ON cum.lang = t.lang AND cum.cum >= t.thr
GROUP BY 1, 2, 3"""


O_DOC_LENGTH_QUANTILES = _o_length_quantiles()


def q_doc_simpson(spark, sf_dir):
    """Simpson / Gini-Simpson token-diversity index per language
    (textops.simpson_diversity): the transcendental-free concentration
    gauge — sum of squared counts is an exact BIGINT, then two
    mirrored IEEE ops."""
    return textops.simpson_diversity(_t(spark, sf_dir, "documents"),
                                     by="lang")


O_DOC_SIMPSON = """WITH toks AS (
  SELECT lang, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents),
c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
g AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * c) AS BIGINT) AS sum_c2
      FROM c GROUP BY lang)
SELECT lang, n_tokens, n_distinct, sum_c2,
       CAST(sum_c2 AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
         AS simpson,
       1.0e0 - CAST(sum_c2 AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
         AS gini_simpson
FROM g"""


def q_doc_source_jaccard(spark, sf_dir):
    """Pairwise vocabulary-Jaccard matrix between sources
    (textops.source_jaccard_matrix): distinct (source, token) ->
    token equi-join across pairs -> inclusion-exclusion — the
    dataset-overlap audit."""
    return textops.source_jaccard_matrix(_t(spark, sf_dir, "documents"),
                                         by="source")


O_DOC_SOURCE_JACCARD = """WITH v AS (
  SELECT DISTINCT source AS s,
         unnest(string_split(COALESCE(text, ''), ' ')) AS tok
  FROM documents),
sz AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS nv FROM v GROUP BY s),
i AS (SELECT a.s AS src_a, b.s AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM v a JOIN v b ON a.tok = b.tok AND a.s < b.s
      GROUP BY 1, 2)
SELECT i.src_a, i.src_b, i.n_inter,
       sa.nv AS n_a, sb.nv AS n_b,
       CAST(i.n_inter AS DOUBLE)
         / CAST(sa.nv + sb.nv - i.n_inter AS DOUBLE) AS jaccard
FROM i JOIN sz sa ON sa.s = i.src_a JOIN sz sb ON sb.s = i.src_b"""


_PHRASE = "stream table hash"


def q_phrase_search(spark, sf_dir):
    """Exact phrase query over the positional token stream
    (retrieval.phrase_search): one posexplode + m-1 equi-joins on
    (doc, pos - i); the oracle slides a window over each document's
    token list — every start position, overlapping matches included."""
    from .. import retrieval
    return retrieval.phrase_search(_t(spark, sf_dir, "documents"), _PHRASE)


def _o_phrase_search() -> str:
    terms = _PHRASE.split(" ")
    m = len(terms)
    conds = " AND ".join(
        f"w[i + {i}] = '{t}'" if i else f"w[i] = '{t}'"
        for i, t in enumerate(terms))
    return f"""WITH t AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
  FROM documents),
m AS (
  SELECT doc_id,
         list_filter(range(1, len(w) - {m} + 2), i -> {conds}) AS hits
  FROM t)
SELECT doc_id,
       CAST(len(hits) AS BIGINT) AS n_matches,
       CAST(list_min(hits) - 1 AS BIGINT) AS first_pos
FROM m WHERE len(hits) > 0"""


O_PHRASE_SEARCH = _o_phrase_search()


def q_doc_global_rank(spark, sf_dir):
    """Exact global dense ROW_NUMBER over (token_count, doc_id)
    via the two-pass distributed rank (textops.global_rank):
    range-bucket by exact selection boundaries, rank inside each
    bucket's PARTITIONED window, add the broadcast prefix offset —
    never the one-partition global window."""
    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.coalesce("text", F.lit("")), " "))
        .cast("long").alias("n_tokens"))
    return textops.global_rank(v, "n_tokens", key="doc_id",
                               n_buckets=16)


O_DOC_GLOBAL_RANK = """WITH v AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
         AS rank
FROM v"""


_SNM_WINDOW = 4


def q_doc_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernandez-Stolfo): candidate
    pairs within `window` positions of each other in the global
    (token_count, doc_id) order (textops.sorted_neighborhood_pairs).
    Rank is the two-pass distributed rank; pairs come from a
    rank-block equi-join (blocks of size window-1, each row probing
    its own and the previous block) — never a global sort or
    self-cross-join."""
    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.coalesce("text", F.lit("")), " "))
        .cast("long").alias("n_tokens"))
    return textops.sorted_neighborhood_pairs(
        v, "n_tokens", key="doc_id", window=_SNM_WINDOW, n_buckets=16)


O_DOC_SORTED_NEIGHBORHOOD = f"""WITH v AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
           AS rank
  FROM v)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       a.rank AS rank_a, b.rank AS rank_b
FROM r a JOIN r b
  ON b.rank - a.rank >= 1 AND b.rank - a.rank <= {_SNM_WINDOW - 1}"""


_KCORE_K = 4
_KCORE_ITERS = 4


def q_doc_kcore(spark, sf_dir):
    """Fixed-round k-core peel (components.k_core, k=4, 4 rounds)
    over a planted link graph on the documents table: a 20-node
    clique (the guaranteed surviving core) plus two pseudorandom
    out-edges per node whose sparse fringe peels away round by
    round. The oracle unrolls the identical synchronous rounds
    (degree rollup -> alive filter -> induced-edge filter)."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 7 + 3) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 13 + 5) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    edges = e1.unionByName(e2).unionByName(cl)
    return components.k_core(edges, k=_KCORE_K, iters=_KCORE_ITERS)


def _o_kcore(k: int, iters: int) -> str:
    parts = [f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) * 7 + 3) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) * 13 + 5) % (SELECT n FROM nn)
  FROM documents
  UNION ALL
  SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT)
  FROM documents a JOIN documents b
    ON a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id),
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst)"""]
    # each round's CTEs are referenced 2-3x downstream; without
    # MATERIALIZED DuckDB inlines them and the unrolled peel
    # recomputes its predecessor exponentially (measured 117s -> <1s)
    for i in range(1, iters + 1):
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS c FROM (
    SELECT a AS node FROM e{i - 1}
    UNION ALL SELECT b FROM e{i - 1}) GROUP BY 1),
a{i} AS (SELECT node FROM d{i} WHERE c >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN a{i} x ON x.node = e.a JOIN a{i} y ON y.node = e.b)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
  SELECT a AS node FROM e{iters} UNION ALL SELECT b FROM e{iters})
GROUP BY 1""")


O_DOC_KCORE = _o_kcore(_KCORE_K, _KCORE_ITERS)


_FS_ATTRS = [("lang", "lang"), ("source", "source"),
             ("len_b", "n_chars // 16")]


def q_doc_fs_weights(spark, sf_dir):
    """Fellegi-Sunter m/u agreement weights (discover.fs_weights)
    over an even/odd split of the documents table with (even, even+1)
    truth links: per attribute (lang, source, n_chars-bucket), the
    match-side agreement count from the links and the all-pairs
    agreement census via the counts-product rollup — never the cross
    product. m, u and the likelihood ratio w = m/u are fixed IEEE
    division trees over exact BIGINTs."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source",
        F.expr("n_chars DIV 16").alias("len_b"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    links = (a.select(F.col("doc_id").alias("id_a"),
                      (F.col("doc_id") + 1).alias("id_b"))
             .join(b.select(F.col("doc_id").alias("id_b")),
                   "id_b", "semi"))
    from .. import discover as disc
    return disc.fs_weights(a, b, links, [n for n, _ in _FS_ATTRS],
                           key="doc_id")


def _fs_ctes() -> str:
    """Shared WITH-body for the FS fixtures: a/b split, truth links,
    per-attribute census (per) and probability frame (f) — used by
    both the weights oracle and the pair-scoring oracle so the two
    can never desynchronize."""
    blocks = []
    for name, expr in _FS_ATTRS:
        blocks.append(f"""SELECT '{name}' AS attr,
  CAST((SELECT COUNT(*) FROM a) * (SELECT COUNT(*) FROM b) AS BIGINT)
    AS n_pairs,
  CAST((SELECT COUNT(*) FROM l) AS BIGINT) AS n_matched,
  CAST((SELECT COUNT(*) FROM l
        JOIN a ON a.id = l.ia JOIN b ON b.id = l.ib
        WHERE a.{name} = b.{name}) AS BIGINT) AS agree_m,
  CAST((SELECT COALESCE(SUM(ca.c * cb.c), 0) FROM
          (SELECT {name} AS v, COUNT(*) AS c FROM a
           WHERE {name} IS NOT NULL GROUP BY 1) ca
        JOIN
          (SELECT {name} AS v, COUNT(*) AS c FROM b
           WHERE {name} IS NOT NULL GROUP BY 1) cb
        USING (v)) AS BIGINT) AS agree_all""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""a AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS id, lang, source,
         CAST(n_chars // 16 AS BIGINT) AS len_b
  FROM documents WHERE doc_id % 2 = 0),
b AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS id, lang, source,
         CAST(n_chars // 16 AS BIGINT) AS len_b
  FROM documents WHERE doc_id % 2 = 1),
l AS MATERIALIZED (SELECT a.id AS ia, a.id + 1 AS ib
      FROM a JOIN b ON b.id = a.id + 1),
per AS ({body}),
f AS MATERIALIZED (
  SELECT attr, n_pairs, n_matched, agree_m, agree_all,
         CAST(agree_all - agree_m AS BIGINT) AS agree_u,
         CAST(agree_m AS DOUBLE) / CAST(n_matched AS DOUBLE) AS m_prob,
         CAST(agree_all - agree_m AS DOUBLE)
           / CAST(n_pairs - n_matched AS DOUBLE) AS u_prob
  FROM per)"""


O_DOC_FS_WEIGHTS = f"""WITH {_fs_ctes()}
SELECT attr, n_pairs, n_matched, agree_m, agree_all, agree_u,
       m_prob, u_prob,
       CASE WHEN u_prob > 0 THEN m_prob / u_prob END AS w_agree
FROM f"""


def q_doc_fs_score(spark, sf_dir):
    """Fellegi-Sunter pair scoring (discover.fs_score_pairs): the
    verify-stage likelihood ratio prod(m/u | agree, (1-m)/(1-u) |
    disagree) over (lang, source, len_b) in listed order, weights
    from fs_weights on the even/odd split. Candidates = the truth
    links (high scores) + a shifted decoy pairing (i, i+7) (mostly
    disagreements). The ratio product is left-associative and the
    oracle parenthesizes identically."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source",
        F.expr("n_chars DIV 16").alias("len_b"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    bids = b.select(F.col("doc_id").alias("id_b"))
    links = (a.select(F.col("doc_id").alias("id_a"),
                      (F.col("doc_id") + 1).alias("id_b"))
             .join(bids, "id_b", "semi"))
    decoys = (a.select(F.col("doc_id").alias("id_a"),
                       (F.col("doc_id") + 7).alias("id_b"))
              .join(bids, "id_b", "semi"))
    cand = links.unionByName(decoys)
    from .. import discover as disc
    w = disc.fs_weights(a, b, links, [n for n, _ in _FS_ATTRS],
                        key="doc_id")
    return disc.fs_score_pairs(cand, a, b, w, [n for n, _ in _FS_ATTRS],
                               key="doc_id")


def _o_fs_score() -> str:
    ratios = []
    for name, _ in _FS_ATTRS:
        ratios.append(f"""CASE WHEN w{name}.u_prob > 0 AND w{name}.u_prob < 1 THEN
    CASE WHEN av.{name} IS NOT NULL AND bv.{name} IS NOT NULL
              AND av.{name} = bv.{name}
         THEN w{name}.m_prob / w{name}.u_prob
         ELSE (1.0e0 - w{name}.m_prob) / (1.0e0 - w{name}.u_prob) END
  END""")
    prod = ratios[0]
    for r in ratios[1:]:
        prod = f"({prod}) * ({r})"
    agrees = " + ".join(
        f"""CASE WHEN av.{name} IS NOT NULL AND bv.{name} IS NOT NULL
              AND av.{name} = bv.{name} THEN 1 ELSE 0 END"""
        for name, _ in _FS_ATTRS)
    wjoins = "\n".join(
        f"JOIN f w{name} ON w{name}.attr = '{name}'"
        for name, _ in _FS_ATTRS)
    return f"""WITH {_fs_ctes()},
cand AS (
  SELECT ia AS id_a, ib AS id_b FROM l
  UNION ALL
  SELECT a.id, a.id + 7 FROM a JOIN b ON b.id = a.id + 7)
SELECT cand.id_a, cand.id_b,
       CAST({agrees} AS BIGINT) AS n_agree,
       {prod} AS fs_score
FROM cand
JOIN a av ON av.id = cand.id_a
JOIN b bv ON bv.id = cand.id_b
{wjoins}"""


O_DOC_FS_SCORE = _o_fs_score()


def q_doc_blocking_quality(spark, sf_dir):
    """Blocking audit (discover.blocking_quality): pair completeness
    and reduction ratio of sorted-neighborhood blocking on token
    count (window 4) against the planted exact-duplicate truth pairs
    (md5 groups over the doc_exact_dedup augmented corpus). One
    row of counts plus two mirrored IEEE divisions."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plant = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    aug = docs.unionByName(plant).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    n = aug.count()
    v = aug.select(
        "doc_id",
        F.size(F.split(F.coalesce("text", F.lit("")), " "))
        .cast("long").alias("n_tokens"))
    cand = textops.sorted_neighborhood_pairs(
        v, "n_tokens", key="doc_id", window=_SNM_WINDOW, n_buckets=16)
    h = aug.select("doc_id",
                   F.md5(F.coalesce("text", F.lit(""))).alias("_h"))
    x, y = h.alias("x"), h.alias("y")
    truth = x.join(
        y, (F.col("x._h") == F.col("y._h"))
        & (F.col("x.doc_id") < F.col("y.doc_id"))).select(
        F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
    from .. import discover as disc
    return disc.blocking_quality(cand, truth, n)


O_DOC_BLOCKING_QUALITY = f"""WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 100000 AS BIGINT), text FROM documents
  WHERE doc_id % 7 = 0),
v AS (
  SELECT doc_id,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM aug),
r AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
           AS rank
  FROM v),
cand AS (
  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS lo,
         GREATEST(a.doc_id, b.doc_id) AS hi
  FROM r a JOIN r b
    ON b.rank - a.rank >= 1 AND b.rank - a.rank <= {_SNM_WINDOW - 1}),
h AS (SELECT doc_id, MD5(COALESCE(text, '')) AS hh FROM aug),
truth AS (
  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
  FROM h a JOIN h b ON a.hh = b.hh AND a.doc_id < b.doc_id),
c AS (
  SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
         CAST((SELECT COUNT(*) FROM cand JOIN truth USING (lo, hi))
              AS BIGINT) AS n_hit,
         CAST((SELECT COUNT(*) FROM aug) AS BIGINT) AS n)
SELECT n_candidates, n_truth, n_hit,
       CASE WHEN n_truth > 0 THEN
         CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) END
         AS pair_completeness,
       1.0e0 - CAST(n_candidates AS DOUBLE)
         / CAST(n * (n - 1) // 2 AS DOUBLE) AS reduction_ratio
FROM c"""

_VOCAB_TOPS = [10, 100, 1000]


def q_doc_vocab_coverage(spark, sf_dir):
    """Vocabulary-coverage ladder (textops.vocab_coverage, N = 10/
    100/1000): token mass covered by the N most frequent types, tie
    order (freq DESC, token ASC) mirrored; one TakeOrderedAndProject
    of max(N) rows, never a full-vocab sort."""
    docs = _t(spark, sf_dir, "documents")
    return textops.vocab_coverage(docs, _VOCAB_TOPS)


def _o_vocab_coverage(tops: list) -> str:
    tops = sorted(tops)
    arms = []
    for t in tops:
        arms.append(f"""SELECT CAST({t} AS BIGINT) AS top_n,
  (SELECT n_types_total FROM st) AS n_types_total,
  (SELECT total_tokens FROM st) AS total_tokens,
  (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM head
   WHERE r <= {t}) AS covered_tokens""")
    body = "\nUNION ALL\n".join(arms)
    return f"""WITH toks AS (
  SELECT t FROM (
    SELECT UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
freq AS MATERIALIZED (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types_total,
              CAST(SUM(c) AS BIGINT) AS total_tokens FROM freq),
head AS MATERIALIZED (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t ASC) AS BIGINT)
    AS r
  FROM freq ORDER BY c DESC, t ASC LIMIT {tops[-1]}),
arms AS ({body})
SELECT top_n, n_types_total, total_tokens, covered_tokens,
       CASE WHEN total_tokens > 0 THEN
         CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
       END AS covered_frac
FROM arms"""


O_DOC_VOCAB_COVERAGE = _o_vocab_coverage(_VOCAB_TOPS)

_TREND_PERIODS = 8
_TREND_MIN = 50


def q_doc_trending(spark, sf_dir):
    """Term-burst detection across synthetic crawl snapshots
    (textops.trending_terms, period = doc_id % 8, min_count 50):
    per-(token, period) z-score against the token's zero-completed
    history — exact BIGINTs inside, one division + one sqrt."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "snap", F.col("doc_id") % _TREND_PERIODS)
    return textops.trending_terms(docs, "snap", min_count=_TREND_MIN)


def _o_doc_trending(nper: int, min_count: int) -> str:
    return f"""WITH toks AS (
  SELECT p, t FROM (
    SELECT CAST(doc_id % {nper} AS BIGINT) AS p,
           UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
keep AS MATERIALIZED (
  SELECT t FROM toks GROUP BY t HAVING COUNT(*) >= {min_count}),
cnt AS MATERIALIZED (
  SELECT toks.t, p, CAST(COUNT(*) AS BIGINT) AS x
  FROM toks JOIN keep USING (t) GROUP BY toks.t, p),
rng AS (SELECT MIN(p) AS pmin, MAX(p) AS pmax FROM cnt),
series AS MATERIALIZED (
  SELECT c.t, g.p, CAST(COALESCE(cnt.x, 0) AS BIGINT) AS x
  FROM (SELECT DISTINCT t FROM cnt) c
  CROSS JOIN (SELECT UNNEST(RANGE(pmin, pmax + 1)) AS p FROM rng) g
  LEFT JOIN cnt ON cnt.t = c.t AND cnt.p = g.p),
st AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS BIGINT) AS s,
              CAST(SUM(x * x) AS BIGINT) AS q
       FROM series GROUP BY t)
SELECT series.t AS token, CAST(series.p AS BIGINT) AS period,
       series.x AS cnt, st.n AS n_periods,
       CASE WHEN st.n * st.q - st.s * st.s > 0 THEN
         CAST(st.n * series.x - st.s AS DOUBLE)
           / SQRT(CAST(st.n * st.q - st.s * st.s AS DOUBLE)) END
         AS z_score
FROM series JOIN st ON st.t = series.t"""


O_DOC_TRENDING = _o_doc_trending(_TREND_PERIODS, _TREND_MIN)


def q_doc_simhash_pairs(spark, sf_dir):
    """Banded SimHash near-dup join (textops.simhash_pairs, poly
    family 56 bits, 4 x 14-bit bands, hamming <= 3) over the corpus
    plus planted copies (doc_id % 9 -> +100000 twins, hamming 0).
    The oracle BRUTE-FORCES every pair's bit_count(xor) — a
    different algorithm whose agreement proves the pigeonhole
    banding is lossless at max_hamming < n_bands."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    aug = docs.unionByName(plant)
    return textops.simhash_pairs(aug, max_hamming=3, bits=56,
                                 n_bands=4, hash_family="poly")


def _o_simhash_pairs(bits: int = 56, max_h: int = 3) -> str:
    sig = _o_simhash(bits, src="aug")
    return f"""WITH aug AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 100000 AS BIGINT), text FROM documents
  WHERE doc_id % 9 = 0),
sig AS MATERIALIZED ({sig})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_h}"""


O_DOC_SIMHASH_PAIRS = _o_simhash_pairs()


def q_doc_source_rollup(spark, sf_dir):
    """Per-source corpus-health mart (textops.source_rollup): counts,
    volume, language spread and exact-duplicate fraction (planted
    +100000 md5 twins on doc_id % 9 make dup_frac non-zero); ratios
    are single mirrored divisions."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang",
        "source")
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text",
                     "lang", "source"))
    return textops.source_rollup(docs.unionByName(plant))


O_DOC_SOURCE_ROLLUP = """WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source
  FROM documents
  UNION ALL
  SELECT CAST(doc_id + 100000 AS BIGINT), text, lang, source
  FROM documents WHERE doc_id % 9 = 0),
base AS (
  SELECT source AS g, doc_id, lang,
         CAST(LEN(COALESCE(text, '')) AS BIGINT) AS l,
         MD5(COALESCE(text, '')) AS h
  FROM aug),
ph AS (SELECT g, h, COUNT(*) AS c FROM base GROUP BY 1, 2),
dups AS (SELECT g, CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           AS n_dup_docs FROM ph GROUP BY 1),
agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(l) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM base GROUP BY 1)
SELECT agg.g AS source, n_docs, total_chars,
       CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_chars,
       n_langs, n_dup_docs,
       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac
FROM agg JOIN dups ON dups.g = agg.g"""


def q_doc_mirror_sources(spark, sf_dir):
    """Mirror-site detection as a pure COMPOSITION of existing
    operators: sources linked by the exact-duplicate documents they
    share = components.bipartite_project over (md5(text), source)
    incidence on the planted-duplicates corpus — the doc_source_rollup
    dup signal turned into a who-mirrors-whom graph, no new engine
    code."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source")
    plant = (docs.filter(F.col("doc_id") % 9 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"), "text",
                     F.concat(F.lit("mirror-of-"), F.col("source"))
                     .alias("source")))
    aug = docs.unionByName(plant)
    inc = aug.select(F.md5(F.coalesce("text", F.lit(""))).alias("h"),
                     "source")
    return components.bipartite_project(inc, left="h", right="source",
                                        min_shared=1)


O_DOC_MIRROR_SOURCES = """WITH aug AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT text, 'mirror-of-' || source FROM documents WHERE doc_id % 9 = 0),
v AS MATERIALIZED (
  SELECT DISTINCT MD5(COALESCE(text, '')) AS l, source AS r FROM aug)
SELECT a.r AS item_a, b.r AS item_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM v a JOIN v b ON a.l = b.l AND a.r < b.r
GROUP BY 1, 2 HAVING COUNT(*) >= 1"""


def q_doc_kmv_overlap(spark, sf_dir):
    """KMV set-operation estimates (sketch.kmv_set_ops, Beyer 2007):
    union / Jaccard / intersection of two overlapping corpus slices
    estimated from the two bottom-64 sketches ALONE — the mergeable
    crawl-overlap report; every number a deterministic function of
    the hash sets, mirrored."""
    from .. import sketch
    docs = _t(spark, sf_dir, "documents")
    a = sketch.kmv_bottom_k(docs.filter(F.col("doc_id") % 3 != 0),
                            "text", k=64)
    b = sketch.kmv_bottom_k(docs.filter(F.col("doc_id") % 2 != 0),
                            "text", k=64)
    return sketch.kmv_set_ops(a, b, k=64)


def _o_kmv_overlap() -> str:
    from .. import sketch
    return sketch.sql_kmv_set_ops(
        "(SELECT text FROM documents WHERE doc_id % 3 <> 0)", "text",
        "(SELECT text FROM documents WHERE doc_id % 2 <> 0)", "text",
        k=64)


O_DOC_KMV_OVERLAP = _o_kmv_overlap()


def q_doc_kappa(spark, sf_dir):
    """Cohen's kappa (textops.cohens_kappa) between the corpus lang
    label and a synthetic 80%-agreement second annotator (doc_id % 5
    relabeled 'xx'): confusion rollup + margins, the single-division
    identity (n*diag - Σ ma*mb)/(n² - Σ ma*mb)."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.when(F.col("doc_id") % 5 == 0, F.lit("xx"))
        .otherwise(F.col("lang")).alias("lang2"))
    return textops.cohens_kappa(docs, "lang", "lang2")


O_DOC_KAPPA = """WITH base AS (
  SELECT lang AS a,
         CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS b
  FROM documents
  WHERE lang IS NOT NULL),
conf AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
ma AS (SELECT a, SUM(c) AS m FROM conf GROUP BY 1),
mb AS (SELECT b AS a, SUM(c) AS m FROM conf GROUP BY 1),
ch AS (SELECT CAST(COALESCE(SUM(ma.m * mb.m), 0) AS BIGINT)
         AS chance_pairs
       FROM ma JOIN mb USING (a)),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM conf)
SELECT n_rows, n_agree, chance_pairs,
       CASE WHEN n_rows * n_rows - chance_pairs <> 0 THEN
         CAST(n_rows * n_agree - chance_pairs AS DOUBLE)
           / CAST(n_rows * n_rows - chance_pairs AS DOUBLE) END AS kappa
FROM t, ch"""


_BOOL_TERMS = ["join", "hash", "window"]


def q_doc_bool_search(spark, sf_dir):
    """Conjunctive boolean retrieval (retrieval.boolean_search,
    mode='and'): documents containing ALL of {join, hash, window} —
    postings filtered to the query terms before any shuffle, then
    the count==|terms| intersection."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents")
    out = retrieval.boolean_search(docs, _BOOL_TERMS, mode="and")
    return out.withColumn("doc_id", F.col("doc_id").cast("long"))


def _o_bool_search(terms: list) -> str:
    lits = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""WITH toks AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id,
           UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS t
    FROM documents)
  WHERE t IN ({lits}))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matched
FROM toks GROUP BY doc_id
HAVING COUNT(*) = {len(set(terms))}"""


O_DOC_BOOL_SEARCH = _o_bool_search(_BOOL_TERMS)

_NEG_PER_NODE = 2
_NEG_PROBES = 6


def q_doc_negative_edges(spark, sf_dir):
    """Deterministic link-prediction negative sampling
    (components.negative_edges) on the planted out-degree-2 web
    graph: affine probe candidates, ONE anti-join verification
    against the canonical edge set, first per_node=2 by probe
    index — bit-identical on every run, no RNG."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 31 + 7) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 17 + 3) % n).alias("dst"))
    return components.negative_edges(e1.unionByName(e2), n,
                                     per_node=_NEG_PER_NODE,
                                     probes=_NEG_PROBES)


def _o_negative_edges(per_node: int, probes: int) -> str:
    return f"""WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
raw AS (
  SELECT node AS src, (node * 31 + 7) % n AS dst FROM nd, nn
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % n AS dst FROM nd, nn),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
cand AS MATERIALIZED (
  SELECT DISTINCT i, LEAST(u, v) AS a, GREATEST(u, v) AS b, u AS owner
  FROM (
    SELECT uu.u, ii.i, (uu.u * (2 * ii.i + 3) + 7 * ii.i + 1) % nn.n AS v
    FROM (SELECT UNNEST(RANGE(0, (SELECT n FROM nn))) AS u) uu,
         (SELECT UNNEST(RANGE(0, {probes})) AS i) ii, nn) q
  WHERE u <> v),
neg AS (SELECT cand.* FROM cand
        LEFT JOIN e ON e.a = cand.a AND e.b = cand.b
        WHERE e.a IS NULL)
SELECT a AS src, b AS dst, CAST(i AS BIGINT) AS probe
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY owner ORDER BY i) AS rk
      FROM neg)
WHERE rk <= {per_node}"""


O_DOC_NEGATIVE_EDGES = _o_negative_edges(_NEG_PER_NODE, _NEG_PROBES)


_DRIFT_TOP = 60


def q_doc_vocab_drift(spark, sf_dir):
    """Cross-snapshot vocabulary drift (textops.vocab_drift, top-60
    per snapshot, period = doc_id % 8): adjacent-snapshot Jaccard of
    the deterministic head vocabularies — inclusion-exclusion over
    exact BIGINTs, one division."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "snap", F.col("doc_id") % _TREND_PERIODS)
    return textops.vocab_drift(docs, "snap", top_n=_DRIFT_TOP)


def _o_vocab_drift(nper: int, top_n: int) -> str:
    return f"""WITH toks AS (
  SELECT p, t FROM (
    SELECT CAST(doc_id % {nper} AS BIGINT) AS p,
           UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
freq AS (SELECT p, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
head AS MATERIALIZED (
  SELECT p, t FROM (
    SELECT p, t, ROW_NUMBER() OVER (PARTITION BY p
             ORDER BY c DESC, t ASC) AS rk
    FROM freq)
  WHERE rk <= {top_n}),
sz AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM head GROUP BY 1),
sh AS (SELECT a.p AS pa, CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM head a JOIN head b ON b.p = a.p + 1 AND b.t = a.t
       GROUP BY 1)
SELECT na.p AS period_a, CAST(na.p + 1 AS BIGINT) AS period_b,
       na.n AS n_a, nb.n AS n_b,
       COALESCE(sh.n_shared, 0) AS n_shared,
       CAST(COALESCE(sh.n_shared, 0) AS DOUBLE)
         / CAST(na.n + nb.n - COALESCE(sh.n_shared, 0) AS DOUBLE)
         AS jaccard
FROM sz na JOIN sz nb ON nb.p = na.p + 1
LEFT JOIN sh ON sh.pa = na.p"""


O_DOC_VOCAB_DRIFT = _o_vocab_drift(_TREND_PERIODS, _DRIFT_TOP)


def q_doc_graph_summary(spark, sf_dir):
    """One-row graph overview (components.graph_summary) of the
    ring+chords+clique planted graph: counts, max degree, and the
    avg-degree/density single divisions."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 2) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    return components.graph_summary(e1.unionByName(e2).unionByName(cl))


_GRAPH_E_CTE = """nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) + 1) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) + 2) % (SELECT n FROM nn)
  FROM documents
  UNION ALL
  SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT)
  FROM documents a JOIN documents b
    ON a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)"""


O_DOC_GRAPH_SUMMARY = f"""WITH {_GRAPH_E_CTE},
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(MAX(deg) AS BIGINT) AS max_degree FROM deg)
SELECT n_nodes, n_edges, max_degree,
       CASE WHEN n_nodes > 0 THEN
         CAST(2 * n_edges AS DOUBLE) / CAST(n_nodes AS DOUBLE) END
         AS avg_degree,
       CASE WHEN n_nodes >= 2 THEN
         CAST(2 * n_edges AS DOUBLE)
           / CAST(n_nodes * (n_nodes - 1) AS DOUBLE) END AS density
FROM d, m"""


def q_doc_degree_dist(spark, sf_dir):
    """Degree histogram (components.degree_distribution) of the same
    planted graph — pure-integer two-rollup chain."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 2) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    return components.degree_distribution(
        e1.unionByName(e2).unionByName(cl))


O_DOC_DEGREE_DIST = f"""WITH {_GRAPH_E_CTE}
SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1"""


_RICH_KS = [2, 3, 4, 5, 20]


def q_doc_rich_club(spark, sf_dir):
    """Rich-club coefficient ladder (components.rich_club) over the
    planted ring+chords+clique graph: per threshold, N_k/E_k as
    conditional BIGINT sums over one edge-degree join; phi one
    mirrored division."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 2) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    return components.rich_club(e1.unionByName(e2).unionByName(cl),
                                _RICH_KS)


def _o_rich_club(ks: list) -> str:
    arms = []
    for k in sorted(ks):
        arms.append(f"""SELECT CAST({k} AS BIGINT) AS k,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE deg > {k}) AS n_nodes,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ej
   WHERE da > {k} AND db > {k}) AS n_edges""")
    body = "\nUNION ALL\n".join(arms)
    return f"""WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) + 1) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) + 2) % (SELECT n FROM nn)
  FROM documents
  UNION ALL
  SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT)
  FROM documents a JOIN documents b
    ON a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
ej AS MATERIALIZED (
  SELECT da.deg AS da, db.deg AS db
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
r AS ({body})
SELECT k, n_nodes, n_edges,
       CASE WHEN n_nodes >= 2 THEN
         CAST(2 * n_edges AS DOUBLE)
           / CAST(n_nodes * (n_nodes - 1) AS DOUBLE) END AS phi
FROM r"""


O_DOC_RICH_CLUB = _o_rich_club(_RICH_KS)

_KWIC_TERM = "join"
_KWIC_WIDTH = 3


def q_doc_kwic(spark, sf_dir):
    """Keyword-in-context concordance (retrieval.kwic, term 'join',
    width 3): map-only posexplode + two slices of the same token
    array; the oracle mirrors the 1-based slice arithmetic with
    DuckDB list slicing (both clamp at document edges)."""
    from .. import retrieval
    docs = _t(spark, sf_dir, "documents")
    out = retrieval.kwic(docs, _KWIC_TERM, width=_KWIC_WIDTH)
    return out.withColumn("doc_id", F.col("doc_id").cast("long"))


def _o_kwic(term: str, w: int) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, STRING_SPLIT(COALESCE(text, ''), ' ') AS t
  FROM documents),
g AS (SELECT doc_id, t, UNNEST(RANGE(1, LEN(t) + 1)) AS i FROM toks)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       COALESCE(ARRAY_TO_STRING(t[GREATEST(1, i - {w}):i - 1], ' '), '')
         AS left_ctx,
       COALESCE(ARRAY_TO_STRING(t[i + 1:i + {w}], ' '), '') AS right_ctx
FROM g WHERE t[i] = '{term}'"""


O_DOC_KWIC = _o_kwic(_KWIC_TERM, _KWIC_WIDTH)


def q_doc_contamination(spark, sf_dir):
    """Graded contamination fraction (curation.contamination_score,
    8-grams, same eval fixture as doc_decontaminate): every doc
    reports its distinct-shingle count, shared count and the one-
    division fraction — clean docs 0, short docs NULL frac."""
    docs = _t(spark, sf_dir, "documents")
    ev = (docs.filter(F.col("doc_id") % 50 == 0)
          .filter(F.size(F.split("text", " ")) >= 8)
          .select(F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
                  .alias("text")))
    out = curation.contamination_score(docs, ev, n=8)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "n_grams", "n_shared", "contamination_frac")


O_DOC_CONTAMINATION = """WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
g AS (SELECT doc_id, t, UNNEST(RANGE(1, GREATEST(LEN(t) - 6, 1))) AS i
      FROM toks),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+7], ' ') AS shingle
  FROM g),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM grams GROUP BY 1),
ev AS (SELECT DISTINCT
         ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:8], ' ') AS shingle
       FROM documents
       WHERE doc_id % 50 = 0 AND LEN(STRING_SPLIT(text, ' ')) >= 8),
hit AS (SELECT doc_id, CAST(COUNT(DISTINCT grams.shingle) AS BIGINT)
          AS n_shared
        FROM grams JOIN ev USING (shingle) GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(tot.n_grams, 0) AS n_grams,
       COALESCE(hit.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(tot.n_grams, 0) > 0 THEN
         CAST(COALESCE(hit.n_shared, 0) AS DOUBLE)
           / CAST(tot.n_grams AS DOUBLE) END AS contamination_frac
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN hit ON hit.doc_id = d.doc_id"""


def q_doc_lexical_richness(spark, sf_dir):
    """Lexical-richness profile (textops.lexical_richness): token /
    type / hapax counts + TTR and hapax fraction per document —
    exact BIGINT rollups, two mirrored single divisions."""
    docs = _t(spark, sf_dir, "documents")
    return (textops.lexical_richness(docs)
            .withColumn("doc_id", F.col("doc_id").cast("long")))


O_DOC_LEXICAL_RICHNESS = """WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(STRING_SPLIT(COALESCE(text, ''), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
per AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
agg AS (SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax
        FROM per GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_types, 0) AS n_types,
       COALESCE(a.n_hapax, 0) AS n_hapax,
       CASE WHEN COALESCE(a.n_tokens, 0) > 0 THEN
         CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) END
         AS ttr,
       CASE WHEN COALESCE(a.n_tokens, 0) > 0 THEN
         CAST(a.n_hapax AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) END
         AS hapax_frac
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"""


_KTRUSS_K = 4
_KTRUSS_ITERS = 3


def q_doc_ktruss(spark, sf_dir):
    """Fixed-round k-truss peel (components.k_truss, k=4, 3 rounds)
    over a planted ring+chords+clique graph on the documents table:
    ring (i,i+1) and chord (i,i+2) edges give every edge support 1-2,
    so the thr=2 peel strips chords in round 1 and the bare ring in
    round 2, leaving the 20-clique (support 18) — one edge cohort
    peels per synchronous round. The oracle unrolls identical rounds
    (a<b<c triangle enumeration -> member-edge support -> left-join
    filter) over MATERIALIZED CTEs."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 2) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    edges = e1.unionByName(e2).unionByName(cl)
    return components.k_truss(edges, k=_KTRUSS_K, iters=_KTRUSS_ITERS)


def _o_ktruss(k: int, iters: int) -> str:
    thr = k - 2
    parts = ["""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) + 1) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) + 2) % (SELECT n FROM nn)
  FROM documents
  UNION ALL
  SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT)
  FROM documents a JOIN documents b
    ON a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id),
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst)"""]
    step = """t{i} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e{p} e1 JOIN e{p} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e{p} e3 ON e3.a = e1.b AND e3.b = e2.b),
s{i} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS sup FROM (
    SELECT x AS a, y AS b FROM t{i}
    UNION ALL SELECT x, z FROM t{i}
    UNION ALL SELECT y, z FROM t{i}) GROUP BY 1, 2)"""
    for i in range(1, iters + 1):
        parts.append(step.format(i=i, p=i - 1))
        parts.append(f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e LEFT JOIN s{i} s USING (a, b)
  WHERE COALESCE(s.sup, 0) >= {thr})""")
    f = iters + 1
    parts.append(step.format(i=f, p=iters))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT e.a AS node_a, e.b AS node_b,
       CAST(COALESCE(s.sup, 0) AS BIGINT) AS support
FROM e{iters} e LEFT JOIN s{f} s USING (a, b)""")


O_DOC_KTRUSS = _o_ktruss(_KTRUSS_K, _KTRUSS_ITERS)


def q_doc_modularity(spark, sf_dir):
    """Newman-Girvan modularity (components.modularity) of the
    contiguous-block partition (label = node DIV 50) over the planted
    ring+chords+clique graph: Q collapses to
    (4m*intra - sum_c d_c^2)/(4m^2) — exact BIGINT terms, no float
    accumulation over communities, ONE mirrored division."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 2) % n).alias("dst"))
    c = docs.filter(F.col("doc_id") < 20)
    cl = (c.select(F.col("doc_id").alias("src"))
          .join(c.select(F.col("doc_id").alias("dst")),
                F.col("src") < F.col("dst")))
    edges = e1.unionByName(e2).unionByName(cl)
    labels = docs.select(F.col("doc_id").alias("node"),
                         F.expr("doc_id DIV 50").alias("label"))
    return components.modularity(edges, labels)


O_DOC_MODULARITY = """WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) + 1) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) + 2) % (SELECT n FROM nn)
  FROM documents
  UNION ALL
  SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT)
  FROM documents a JOIN documents b
    ON a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
lab AS (SELECT CAST(doc_id AS BIGINT) AS node,
               CAST(doc_id AS BIGINT) // 50 AS l
        FROM documents),
ej AS MATERIALIZED (
  SELECT e.a, e.b, la.l AS la, lb.l AS lb
  FROM e JOIN lab la ON la.node = e.a JOIN lab lb ON lb.node = e.b),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
             CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               AS intra_edges
      FROM ej),
adj AS (SELECT la AS l FROM ej UNION ALL SELECT lb FROM ej),
dc AS (SELECT CAST(SUM(d * d) AS BIGINT) AS sum_dc2 FROM (
         SELECT l, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY l)),
j AS (SELECT m_edges, intra_edges, COALESCE(sum_dc2, 0) AS sum_dc2
      FROM m, dc)
SELECT m_edges, intra_edges, sum_dc2,
       CASE WHEN m_edges > 0 THEN
         CAST(4 * m_edges * intra_edges - sum_dc2 AS DOUBLE)
           / CAST(4 * m_edges * m_edges AS DOUBLE) END AS modularity
FROM j"""


_PPR_ITERS = 2
_PPR_DAMPING = 0.85


def q_doc_ppr(spark, sf_dir):
    """Personalized PageRank (components.personalized_pagerank,
    2 iterations, deterministic fold, seeds = doc_id % 97 == 0) over
    the planted out-degree-2 web graph: teleport mass returns to the
    seed set only — the TrustRank/crawl-frontier shape. Float ranks
    ARE value-compared via the same src-sorted IEEE fold as
    doc_pagerank."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 31 + 7) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 17 + 3) % n).alias("dst"))
    seeds = docs.filter(F.col("doc_id") % 97 == 0) \
        .select(F.col("doc_id").alias("node"))
    return components.personalized_pagerank(
        e1.unionByName(e2), seeds, iters=_PPR_ITERS,
        damping=_PPR_DAMPING, deterministic=True)


def _o_ppr(iters: int, damping: float) -> str:
    base = f"(CASE WHEN b.s THEN {_dlit(1.0 - damping)} " \
           f"/ CAST(ns AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
    parts = [f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e AS (
  SELECT node AS src, (node * 31 + 7) % n AS dst FROM nd, nn
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % n AS dst FROM nd, nn),
sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM nd
       WHERE node % 97 = 0),
isd AS MATERIALIZED (
  SELECT node, node % 97 = 0 AS s FROM nd),
od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
r0 AS (SELECT node,
              CASE WHEN s THEN CAST(1.0 AS DOUBLE) / CAST(ns AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE) END AS rank
       FROM isd, sn)"""]
    for i in range(iters):
        parts.append(f"""c{i + 1} AS (
  SELECT e.dst, e.src, r.rank / od.odeg AS c
  FROM e JOIN od USING (src) JOIN r{i} r ON r.node = e.src),
s{i + 1} AS (
  SELECT dst, LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(c ORDER BY src)), (acc, v) -> acc + v) AS s
  FROM c{i + 1} GROUP BY dst),
r{i + 1} AS (
  SELECT b.node, {base} + {_dlit(damping)} * COALESCE(s{i + 1}.s,
           CAST(0.0 AS DOUBLE)) AS rank
  FROM (SELECT node, s, ns FROM isd, sn) b
  LEFT JOIN s{i + 1} ON s{i + 1}.dst = b.node)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM r{iters}")


O_DOC_PPR = _o_ppr(_PPR_ITERS, _PPR_DAMPING)


def q_doc_assortativity(spark, sf_dir):
    """Degree assortativity coefficient (components.
    degree_assortativity) of the planted out-degree-2 web graph
    (dst = 31i+7 and 17i+3 mod n): Pearson correlation of endpoint
    degrees over symmetrized stubs, collapsed to ONE division of
    exact BIGINT sums (the two sqrt denominators are equal by stub
    symmetry — no transcendentals)."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 31 + 7) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 17 + 3) % n).alias("dst"))
    return components.degree_assortativity(e1.unionByName(e2))


O_DOC_ASSORTATIVITY = """WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) * 31 + 7) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) * 17 + 3) % (SELECT n FROM nn)
  FROM documents),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
adj AS MATERIALIZED (
  SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS MATERIALIZED (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(dj.deg) AS BIGINT) AS sum_j,
         CAST(SUM(dj.deg * dk.deg) AS BIGINT) AS sum_jk,
         CAST(SUM(dj.deg * dj.deg) AS BIGINT) AS sum_j2
  FROM adj JOIN deg dj ON dj.a = adj.a JOIN deg dk ON dk.a = adj.b)
SELECT m2, sum_j, sum_jk, sum_j2,
       CASE WHEN m2 * sum_j2 - sum_j * sum_j <> 0 THEN
         CAST(m2 * sum_jk - sum_j * sum_j AS DOUBLE)
           / CAST(m2 * sum_j2 - sum_j * sum_j AS DOUBLE) END
         AS assortativity
FROM s"""


def q_doc_reciprocity(spark, sf_dir):
    """Directed-edge reciprocity (components.reciprocity) over a
    planted half-reciprocated crawl graph: every node links forward
    (i -> i+13 mod n), every third node links back (i -> i-13 mod n),
    plus periodic self-loops that must drop. n_edges/n_reciprocated
    are BIGINT-exact; the ratio is one mirrored IEEE division."""
    from .. import components
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") + 13) % n).alias("dst"))
    e2 = (docs.filter(F.col("doc_id") % 3 == 0)
          .select(F.col("doc_id").alias("src"),
                  ((F.col("doc_id") - 13 + n) % n).alias("dst")))
    e3 = (docs.filter(F.col("doc_id") % 50 == 0)
          .select(F.col("doc_id").alias("src"),
                  F.col("doc_id").alias("dst")))
    return components.reciprocity(e1.unionByName(e2).unionByName(e3))


O_DOC_RECIPROCITY = """WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) + 13) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT),
         (CAST(doc_id AS BIGINT) - 13 + (SELECT n FROM nn))
           % (SELECT n FROM nn)
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT)
  FROM documents WHERE doc_id % 50 = 0),
e AS MATERIALIZED (
  SELECT DISTINCT src AS a, dst AS b FROM raw WHERE src <> dst),
c AS (
  SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
         CAST((SELECT COUNT(*) FROM e
               WHERE EXISTS (SELECT 1 FROM e r
                             WHERE r.a = e.b AND r.b = e.a))
              AS BIGINT) AS n_reciprocated)
SELECT n_edges, n_reciprocated,
       CASE WHEN n_edges > 0 THEN
         CAST(n_reciprocated AS DOUBLE) / CAST(n_edges AS DOUBLE) END
         AS reciprocity
FROM c"""
