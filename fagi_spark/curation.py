"""Corpus-curation operators for a web-scale training-data pipeline.

Beyond the FAGI operator surface (SURVEY.md §2), these are the stages a
100 TB crawl->training pipeline runs over the `(url, warc_ts, html,
text, lang)` page table after extraction and dedup: PII redaction,
per-domain volume caps, benchmark decontamination, boilerplate line
removal (CCNet-style line-frequency filter), and deterministic
stratified sampling. Every operator is a pure DataFrame plan — no
Python on the hot path — and each has a value-exact DuckDB oracle in
the contract (fagi_spark/contract/) built from the same string/int
ops on both sides.

Scale notes per operator are in the docstrings; none performs an
all-pairs comparison, collects to the driver, or shuffles more than
the data it must (the boilerplate filter broadcasts only the small
high-frequency line set back against the corpus).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import _poly_base_expr

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
#
# Patterns are deliberately restricted to syntax with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
# greedy +/{m,}, literal escapes — no backrefs or lookaround.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def with_pii_scrub(df: DataFrame, text: str = "text") -> DataFrame:
    """Redact emails then phone numbers from `text`, appending
    `n_emails`, `n_phones`, `text_clean`.

    Phones are counted/replaced on the email-scrubbed string so the
    two passes compose deterministically (mirrored as nested
    REGEXP_REPLACE in the oracle). Pure codegen'd string ops — scales
    as a map-only stage, no shuffle.
    """
    c = F.col(text)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return (df
            .withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_RE)))
            .withColumn("n_phones",
                        F.regexp_count(after_email, F.lit(PHONE_RE)))
            .withColumn("text_clean",
                        F.regexp_replace(after_email, PHONE_RE, "<PHONE>")))


def sql_pii_scrub(text_expr: str) -> dict[str, str]:
    """DuckDB twins of with_pii_scrub's three output columns."""
    after_email = f"REGEXP_REPLACE({text_expr}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return {
        "n_emails": f"LEN(REGEXP_EXTRACT_ALL({text_expr}, '{EMAIL_RE}'))",
        "n_phones": f"LEN(REGEXP_EXTRACT_ALL({after_email}, '{PHONE_RE}'))",
        "text_clean":
            f"REGEXP_REPLACE({after_email}, '{PHONE_RE}', '<PHONE>', 'g')",
    }


# ---------------------------------------------------------------------------
# Per-domain volume cap
# ---------------------------------------------------------------------------

def domain_cap(df: DataFrame, domain: str = "source", key: str = "doc_id",
               k: int = 10) -> DataFrame:
    """Keep at most `k` documents per domain, deterministically (lowest
    key wins), appending `rank_in_domain` (1-based).

    Common-Crawl curation caps over-represented hosts so one template
    farm can't dominate the training mix. The row_number-<=k filter
    compiles to WindowGroupLimit: each map task forwards only its
    local top-k per domain into the shuffle, so a domain with 10^9
    pages moves k rows per input partition, not 10^9.
    """
    w = Window.partitionBy(domain).orderBy(F.col(key).asc())
    return (df.withColumn("rank_in_domain", F.row_number().over(w))
            .filter(F.col("rank_in_domain") <= k))


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def word_ngrams(colname: str, n: int):
    """Array column of word n-grams of a space-tokenized text column.

    Guarded so texts shorter than n tokens yield an empty array
    (sequence(0, -1) would otherwise count DOWN in Spark).
    """
    toks = f"split({colname}, ' ')"
    return F.expr(
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) END")


def decontaminate(df: DataFrame, eval_df: DataFrame, key: str = "doc_id",
                  text: str = "text", eval_text: str = "text",
                  n: int = 8) -> DataFrame:
    """Flag training documents sharing any word n-gram with an
    evaluation set: returns (key, n_shared) for contaminated docs,
    n_shared = number of DISTINCT eval n-grams the doc contains.

    The standard pre-training hygiene step (n-gram overlap against
    benchmark suites). Plan: distinct doc shingles exploded ->
    equi-join against the distinct eval-shingle set -> count per doc.
    The eval set is benchmarks (thousands of rows), so its shingle
    side broadcasts; the corpus side streams map-only through the
    broadcast join and only matched (doc, shingle) pairs — a tiny
    fraction — reach the aggregation shuffle. No all-pairs anywhere.
    """
    doc_sh = df.select(
        F.col(key),
        F.explode(F.array_distinct(word_ngrams(text, n))).alias("shingle"))
    eval_sh = (eval_df
               .select(F.explode(F.array_distinct(word_ngrams(eval_text, n)))
                       .alias("shingle"))
               .distinct())
    return (doc_sh.join(F.broadcast(eval_sh), "shingle")
            .groupBy(key)
            .agg(F.count_distinct("shingle").alias("n_shared")))


# ---------------------------------------------------------------------------
# Boilerplate line removal (CCNet-style line-frequency filter)
# ---------------------------------------------------------------------------

def boilerplate_lines(df: DataFrame, key: str = "doc_id",
                      text: str = "text", max_docs: int = 3) -> DataFrame:
    """Lines occurring in more than `max_docs` distinct documents —
    cookie banners, nav menus, footers. One shuffle (groupBy line)."""
    lines = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(text), "\n")).alias("pos", "line"))
    return (lines.groupBy("line")
            .agg(F.count_distinct(key).alias("n_docs"))
            .filter(F.col("n_docs") > max_docs))


def strip_boilerplate(df: DataFrame, key: str = "doc_id",
                      text: str = "text", max_docs: int = 3,
                      hint_broadcast: bool = True) -> DataFrame:
    """Remove high-document-frequency lines from every document and
    reassemble the remainder in original line order as `text_clean`.

    Documents whose every line is boilerplate drop out of the result
    (there is nothing left to train on). The high-frequency line set
    is usually small (only lines repeated across >max_docs docs), so
    the anti-join broadcasts it; the corpus pays one explode + one
    groupBy-per-doc shuffle. Within-doc duplicate lines and ordering
    are preserved via posexplode + sort on pos.

    Scale caveat: on a template-farm-heavy crawl the boilerplate set
    itself can exceed broadcast size (10^8+ distinct lines each in >
    max_docs docs). There, pass ``hint_broadcast=False`` so the
    anti-join plans as a shuffle join on the line hash instead of
    forcing a driver-side build.
    """
    lines = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(text), "\n")).alias("pos", "line"))
    bp = boilerplate_lines(df, key=key, text=text, max_docs=max_docs)
    bp_side = bp.select("line")
    if hint_broadcast:
        bp_side = F.broadcast(bp_side)
    kept = lines.join(bp_side, "line", "left_anti")
    return (kept.groupBy(key)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"]),
                "\n").alias("text_clean")))


def dedup_paragraphs(df: DataFrame, key: str = "doc_id",
                     text: str = "text", sep: str = "\n\n",
                     pos_bits: int = 20) -> DataFrame:
    """Corpus-level paragraph dedup (the RefinedWeb/CCNet granularity
    between exact-doc dedup and line stripping): each distinct
    paragraph survives exactly ONCE corpus-wide — at its first
    occurrence, i.e. the smallest ``(key, position)`` — and every
    other occurrence (including repeats inside one document) is
    dropped; the remainder reassembles in original order.

    Requires integer ``key`` values unique per row (the same
    precondition as with_minhash) and documents shorter than
    ``2^pos_bits`` paragraphs: the winner is MIN(key << pos_bits |
    pos), a single-BIGINT composite both engines order identically
    (mirror: sql_dedup_paragraphs). Docs losing every paragraph stay
    in the result with ``text_dedup = ''`` (n_kept 0), so attrition is
    countable downstream.

    Scale shape: one explode, then a groupBy on MD5(paragraph) whose
    aggregate is a single BIGINT MIN — map-side combine collapses each
    partition's occurrences before the shuffle, and the paragraph
    text itself crosses the wire once (inside the kept-join), never in
    the aggregate. Reassembly is the strip_boilerplate groupBy-per-doc
    shape."""
    import re as _re

    paras = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(text), _re.escape(sep)))
         .alias("pos", "para"))
    packed = (F.col(key).cast("long") * F.lit(1 << pos_bits)
              + F.col("pos"))
    tagged = paras.withColumn("_h", F.md5(F.col("para"))).withColumn(
        "_at", packed)
    win = tagged.groupBy("_h").agg(F.min("_at").alias("_w"))
    kept = (tagged.join(win, "_h")
            .filter(F.col("_at") == F.col("_w")))
    rebuilt = (kept.groupBy(key)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "para"))),
                            lambda s: s["para"]),
                        sep).alias("text_dedup"),
                    F.count(F.lit(1)).alias("n_kept")))
    totals = paras.groupBy(key).agg(F.count(F.lit(1)).alias("n_paras"))
    return (totals.join(rebuilt, key, "left")
            .select(F.col(key),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
                    "n_paras",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                     .alias("n_kept")))


def sql_dedup_paragraphs(source: str, key: str = "doc_id",
                         text: str = "text", sep: str = "\n\n",
                         pos_bits: int = 20) -> str:
    """DuckDB mirror of dedup_paragraphs (1-based list positions are
    shifted to posexplode's 0-based before packing)."""
    parts = [("CHR(10)" if ch == "\n" else "'" + ch.replace("'", "''") + "'")
             for ch in sep]
    sep_sql = "(" + " || ".join(parts) + ")" if parts else "''"
    return f"""ls AS (SELECT {key}, STRING_SPLIT({text}, {sep_sql}) AS lst
      FROM {source}),
e AS (SELECT {key}, lst, UNNEST(RANGE(1, LEN(lst) + 1)) AS pos1 FROM ls),
paras AS (SELECT {key}, pos1 - 1 AS pos, lst[pos1] AS para FROM e),
tagged AS (SELECT {key}, pos, para, MD5(para) AS h,
                  CAST({key} AS BIGINT) * {1 << pos_bits} + pos AS at
           FROM paras),
win AS (SELECT h, MIN(at) AS w FROM tagged GROUP BY h),
kept AS (SELECT t.* FROM tagged t JOIN win ON win.h = t.h AND t.at = win.w),
rebuilt AS (SELECT {key},
                   STRING_AGG(para, {sep_sql} ORDER BY pos) AS text_dedup,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY {key}),
totals AS (SELECT {key}, COUNT(*) AS n_paras FROM paras GROUP BY {key}),
para_dedup AS (SELECT t.{key},
       COALESCE(r.text_dedup, '') AS text_dedup,
       t.n_paras,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN rebuilt r USING ({key}))"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(df: DataFrame, rates: dict[str, float],
                      default_rate: float = 1.0, key: str = "doc_id",
                      strata: str = "lang", mod: int = 100_000) -> DataFrame:
    """Keep each row iff poly_hash(md5(str(key))) % mod < rate[stratum]*mod.

    Deterministic (re-runs and resumes pick the same rows — no RNG
    state), partition-independent (the hash depends only on the key),
    and exactly reproducible in SQL via textops.sql_poly_base over
    MD5(CAST(key AS VARCHAR)). The poly fold runs over the 32-char md5
    hex digest, not the raw key: folding short numeric ids directly
    leaves the bucket in a narrow band (3-digit ids all land below
    57k of 100k — measured), while the digest is uniform. A pure
    filter: no shuffle, fully pushed into the scan stage. This is the
    language/quality re-weighting step of a training-mix builder.
    """
    thresholds = {s: int(round(r * mod)) for s, r in rates.items()}
    default_thr = int(round(default_rate * mod))
    df2 = df.withColumn("_sample_key", F.md5(F.col(key).cast("string")))
    bucket = _poly_base_expr("_sample_key") % F.lit(mod)
    thr = F.lit(default_thr)
    for s, t in thresholds.items():
        thr = F.when(F.col(strata) == F.lit(s), F.lit(t)).otherwise(thr)
    return df2.filter(bucket < thr).drop("_sample_key")


# ---------------------------------------------------------------------------
# URL structure
# ---------------------------------------------------------------------------
#
# One capture-group regex, Java==RE2-safe, applied three times — the
# scan stays map-only and codegen'd. Group 1 scheme, 2 host, 3 path.

URL_RE = r"^([a-z][a-z0-9+.-]*)://([^/?#]+)([^?#]*)"


def with_url_parts(df: DataFrame, url: str = "url") -> DataFrame:
    """Split a crawl URL into scheme / host / registered domain /
    path_depth — the keys per-host curation groups on (domain caps,
    blocklists, host-level quality rollups).

    ``registered_domain`` is the last two host labels (example.co.uk
    style public-suffix lists are a lookup-table refinement on top;
    the two-label rule is the deterministic, oracle-mirrorable core).
    Non-matching strings yield empty parts, never errors.
    """
    c = F.col(url)
    host = F.regexp_extract(c, URL_RE, 2)
    path = F.regexp_extract(c, URL_RE, 3)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    reg = F.when(n >= 2,
                 F.concat_ws(".", F.element_at(labels, n - 1),
                             F.element_at(labels, n))).otherwise(host)
    return (df.withColumn("scheme", F.regexp_extract(c, URL_RE, 1))
            .withColumn("host", host)
            .withColumn("registered_domain", reg)
            .withColumn("path_depth",
                        F.size(F.filter(F.split(path, "/"),
                                        lambda x: x != ""))))


def sql_url_parts(url_expr: str) -> dict[str, str]:
    """DuckDB twins of with_url_parts' four output columns."""
    host = f"REGEXP_EXTRACT({url_expr}, '{URL_RE}', 2)"
    path = f"REGEXP_EXTRACT({url_expr}, '{URL_RE}', 3)"
    labels = f"STRING_SPLIT({host}, '.')"
    return {
        "scheme": f"REGEXP_EXTRACT({url_expr}, '{URL_RE}', 1)",
        "host": host,
        "registered_domain":
            f"CASE WHEN LEN({labels}) >= 2 THEN "
            f"({labels})[LEN({labels}) - 1] || '.' || ({labels})[LEN({labels})] "
            f"ELSE {host} END",
        "path_depth":
            f"LEN(LIST_FILTER(STRING_SPLIT({path}, '/'), x -> x <> ''))",
    }


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pack_sequences(df: DataFrame, key: str = "doc_id",
                   tokens: str = "n_tokens", ctx: int = 2048,
                   buckets: int = 256) -> DataFrame:
    """Pack documents into fixed-length training sequences — the
    concat-and-chunk packing GPT-style pretraining uses: lay the
    documents end-to-end in ``key`` order into one virtual token
    stream, cut the stream into consecutive ``ctx``-token windows
    ("packs"), and emit one row per (document, pack) SEGMENT:

      (key, pack_id, doc_offset, pack_offset, seg_len)

    — document slice [doc_offset, doc_offset+seg_len) lands in pack
    ``pack_id`` at position ``pack_offset``. A long document spans
    several packs; several short documents share one pack. Rows with
    ``tokens <= 0`` contribute nothing. ``key`` must be numeric and
    unique (same precondition as minhash/simhash — the total order
    must be well-defined).

    The only global dependency is an EXCLUSIVE PREFIX SUM of token
    counts in key order. A naive ``SUM() OVER (ORDER BY key)`` plans a
    single-partition window — one reducer sees the whole corpus, the
    classic scale killer. Instead, the prefix sum is computed in two
    distributed passes over order-compatible buckets:

      1. ``buckets-1`` key quantile boundaries are collected ONCE on
         the driver (percentile_approx — one tiny aggregate job) and
         inlined as a literal array; every row's bucket is the count
         of boundaries below its key — a pure codegen expression, so
         the row->bucket map is IDENTICAL in every pass by
         construction. (An earlier design used repartitionByRange +
         spark_partition_id, but range-boundary sampling reseeds per
         query execution, so pids are not guaranteed stable across the
         totals pass and the window pass — a silent-corruption
         hazard.)
      2. one token total per bucket (map-side combine; O(buckets)
         scalars to the driver) becomes the bucket's exclusive offset,
         broadcast-joined back;
      3. a per-bucket cumulative window (partitionBy bucket — never a
         global window) plus the bucket offset.

    The result depends only on the total key order, never on where
    bucket boundaries fall (prefix sums are associative) —
    tests/test_curation.py proves bucket-count independence. All
    arithmetic is int64 (exact to 2^63 total tokens; 100 TB of text is
    ~2.5e13 tokens), so the DuckDB oracle matches bit-for-bit.
    """
    # NULL keys have no place in a total order — dropped with the
    # zero-token rows rather than silently landing in bucket 0
    d = (df.select(F.col(key).alias("_k"),
                   F.col(tokens).cast("long").alias("_n"))
         .filter((F.col("_n") > 0) & F.col("_k").isNotNull()))
    qs = [i / buckets for i in range(1, buckets)]
    row = d.select(F.percentile_approx("_k", qs).alias("b")).first()
    bounds = sorted(set(row["b"] or [])) if row is not None else []
    spark = df.sparkSession
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col("_k")))
    else:
        bucket = F.lit(0)
    d = d.withColumn("_b", bucket)
    # stats pass stays O(buckets): one total per bucket, map-side
    # combined (a count_distinct dup check here would shuffle one row
    # per corpus key — the movement this function exists to avoid)
    bucket_totals = {r["_b"]: r["_t"] for r in
                     d.groupBy("_b").agg(F.sum("_n").alias("_t")).collect()}
    running, offsets = 0, []
    for b in sorted(bucket_totals):
        offsets.append((b, running))
        running += bucket_totals[b]
    if not offsets:
        offsets = [(0, 0)]  # empty input: join matches nothing anyway
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_b int, _off long"))
    w = Window.partitionBy("_b").orderBy("_k")
    # tie guard, zero extra shuffle: a duplicated key would hand BOTH
    # rows the combined running sum (RANGE window frame) — silently
    # overlapping segments. At 64-bit hash-key scale (~2.5e10 docs)
    # birthday ties are EXPECTED; fail loudly inside the window pass
    # itself (lag rides the same sort). _guard feeds _cum so Catalyst
    # cannot prune the check away.
    not_tied = F.coalesce(F.lag("_k").over(w) != F.col("_k"), F.lit(True))
    guard = F.when(not_tied, F.lit(0)).otherwise(F.raise_error(F.lit(
        "pack_sequences requires unique keys; found a duplicated key "
        "(dedup or widen the key)"))).cast("long")
    c = (d.join(off_df, "_b")
         .withColumn("_cum", F.sum("_n").over(w) + F.col("_off") + guard)
         .withColumn("_st", F.col("_cum") - F.col("_n"))
         .withColumnRenamed("_k", key))
    first = F.expr(f"_st div {ctx}")
    last = F.expr(f"(_cum - 1) div {ctx}")
    seg = c.withColumn("pack_id", F.explode(F.sequence(first, last)))
    seg_start = F.greatest(F.col("pack_id") * ctx, F.col("_st"))
    seg_end = F.least((F.col("pack_id") + 1) * ctx, F.col("_cum"))
    return seg.select(
        F.col(key),
        F.col("pack_id").cast("long").alias("pack_id"),
        (seg_start - F.col("_st")).cast("long").alias("doc_offset"),
        (seg_start - F.col("pack_id") * ctx).cast("long").alias("pack_offset"),
        (seg_end - seg_start).cast("long").alias("seg_len"))


def sql_pack_sequences(source: str, key: str = "doc_id",
                       tokens: str = "n_tokens", ctx: int = 2048) -> str:
    """DuckDB mirror of ``pack_sequences`` over table/CTE ``source``
    (which must expose ``key`` and ``tokens``): the declarative
    one-window form — the distributed two-pass Spark plan must produce
    exactly these integers."""
    return f"""pk_c AS (
  SELECT {key}, CAST({tokens} AS BIGINT) AS n,
         CAST(SUM(CAST({tokens} AS BIGINT)) OVER (ORDER BY {key})
              AS BIGINT) AS cum
  FROM {source} WHERE {tokens} > 0),
pk_seg AS (
  SELECT {key}, n, cum, cum - n AS st,
         UNNEST(range((cum - n) // {ctx}, (cum - 1) // {ctx} + 1)) AS pack_id
  FROM pk_c)"""


# ---------------------------------------------------------------------------
# Language-mixture rebalancing (temperature sampling weights)
# ---------------------------------------------------------------------------


def lang_mixture_weights(df: DataFrame, lang: str = "lang",
                         tokens: str = "n_tokens",
                         alpha: float = 0.5) -> DataFrame:
    """Temperature-based corpus rebalancing weights (the multilingual
    sampling rule of XLM-R / mT5: sample language l with probability
    proportional to c_l^alpha, alpha < 1 up-weighting low-resource
    languages). Returns one row per language:

      (lang, n_tokens, raw_share, weight, boost)

    where weight = c^alpha / sum_l c^alpha, raw_share = c / total, and
    boost = weight / raw_share (how much the language is over- or
    under-sampled vs its natural share).

    One partial-agg shuffle to (lang) — the grouped frame is
    O(#languages) rows, so the normalizing sum is computed by folding
    a LANG-SORTED array with F.aggregate: the fold order is part of
    the operator's contract, making the float denominator reproducible
    run-to-run AND mirrorable into the DuckDB oracle
    (LIST_REDUCE(LIST_PREPEND(0.0, LIST(... ORDER BY lang)))), per the
    repo's IEEE-determinism rules. alpha=0.5 uses sqrt (a correctly-
    rounded IEEE op on both engines); alpha=1.0 is the identity.
    Other alphas fall back to pow(), which is NOT guaranteed
    identically rounded across engines — use them for production runs,
    not oracle-compared queries."""
    if alpha == 0.5:
        def amp(c):
            return F.sqrt(c.cast("double"))
    elif alpha == 1.0:
        def amp(c):
            return c.cast("double")
    else:
        def amp(c):
            return F.pow(c.cast("double"), F.lit(float(alpha)))
    lc = (df.groupBy(F.col(lang).alias("lang"))
          .agg(F.sum(F.col(tokens).cast("long")).alias("n_tokens")))
    totals = lc.agg(
        F.sum("n_tokens").alias("_tot"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("lang", "n_tokens"))),
                lambda x: amp(x["n_tokens"])),
            F.lit(0.0), lambda acc, v: acc + v).alias("_den"))
    return (lc.crossJoin(F.broadcast(totals))
            .select("lang", "n_tokens",
                    (F.col("n_tokens").cast("double")
                     / F.col("_tot").cast("double")).alias("raw_share"),
                    (amp(F.col("n_tokens")) / F.col("_den")).alias("weight"),
                    ((amp(F.col("n_tokens")) / F.col("_den"))
                     / (F.col("n_tokens").cast("double")
                        / F.col("_tot").cast("double"))).alias("boost")))


def sql_lang_mixture(source: str, lang: str = "lang",
                     tokens: str = "n_tokens") -> str:
    """DuckDB mirror of lang_mixture_weights(alpha=0.5) over
    table/CTE ``source``: same lang-sorted left-associative fold for
    the denominator, same sqrt/divide sequence per row."""
    return f"""lm_lc AS (
  SELECT {lang} AS lang, CAST(SUM(CAST({tokens} AS BIGINT)) AS BIGINT) AS n_tokens
  FROM {source} GROUP BY {lang}),
lm_tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
         LIST_REDUCE(
           LIST_PREPEND(CAST(0.0 AS DOUBLE),
                        LIST(SQRT(CAST(n_tokens AS DOUBLE)) ORDER BY lang)),
           (acc, v) -> acc + v) AS den
  FROM lm_lc)"""


# ---------------------------------------------------------------------------
# Overlapping chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------


def chunk_docs(df: DataFrame, key: str = "doc_id", text: str = "text",
               size: int = 256, overlap: int = 32) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    retrieval/embedding prep step (RAG chunking): chunk i starts at
    token ``i * (size - overlap)`` and covers up to ``size`` tokens of
    the whitespace token stream. A start is emitted only if it is 0 or
    the previous chunk did not already reach the document end (no
    fully-contained tail chunks). Emits one row per chunk:

      (key, chunk_id, chunk_start, chunk_len, chunk_text)

    Map-only — a Generate over a per-row integer sequence; no shuffle,
    no Python. Unlike pack_sequences (corpus-global concat-and-chunk
    for pretraining), chunking is per-document and embarrassingly
    parallel."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    ws = F.split(F.coalesce(F.col(text), F.lit("")), " ")
    n = F.size(ws)
    upper = F.greatest(F.lit(1), n - size + stride)
    starts = F.sequence(F.lit(0), upper - 1, F.lit(stride))
    d = df.select(F.col(key), ws.alias("_ws"), n.alias("_n"),
                  F.posexplode(starts).alias("chunk_id", "_s"))
    chunk_len = F.least(F.lit(size), F.col("_n") - F.col("_s"))
    return d.select(
        F.col(key),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("_s").cast("long").alias("chunk_start"),
        chunk_len.cast("long").alias("chunk_len"),
        F.array_join(F.slice("_ws", F.col("_s") + 1, chunk_len), " ")
        .alias("chunk_text"))


def sql_chunk_docs(source: str, key: str = "doc_id", text: str = "text",
                   size: int = 256, overlap: int = 32) -> str:
    """DuckDB mirror of chunk_docs over table/CTE ``source``."""
    stride = size - overlap
    return f"""ch_t AS (
  SELECT {key}, STRING_SPLIT(COALESCE({text}, ''), ' ') AS ws
  FROM {source}),
ch_s AS (
  SELECT {key}, ws, LEN(ws) AS n,
         UNNEST(range(0, GREATEST(1, LEN(ws) - {size} + {stride}), {stride}))
           AS s
  FROM ch_t),
ch AS (
  SELECT {key}, CAST(s // {stride} AS BIGINT) AS chunk_id,
         CAST(s AS BIGINT) AS chunk_start,
         CAST(LEAST({size}, n - s) AS BIGINT) AS chunk_len,
         ARRAY_TO_STRING(ws[s + 1:s + {size}], ' ') AS chunk_text
  FROM ch_s)"""


def temperature_sample(df: DataFrame, target_tokens: int,
                       key: str = "doc_id", lang: str = "lang",
                       tokens: str = "n_tokens", alpha: float = 0.5,
                       mod: int = 100_000) -> DataFrame:
    """Apply temperature rebalancing to the corpus: sample language l
    at rate min(1, target_tokens * w_l / c_l) where w_l is the
    alpha-temperature mixture weight (lang_mixture_weights) and c_l
    the language's token total — i.e. resize the corpus toward
    ``target_tokens`` while shifting mass to low-resource languages.
    Keep decisions reuse the stratified_sample mechanism (poly hash of
    md5(key) vs an integer threshold) so the sample is deterministic,
    partition-independent, and resumable; thresholds are
    floor(rate * mod) computed from the same IEEE double sequence on
    both engines, making the whole op value-exact despite the float
    rates. The per-language threshold table is O(#languages) and
    broadcast — one map-only filter over the corpus."""
    w = lang_mixture_weights(df, lang, tokens, alpha)
    rate = F.least(F.lit(1.0),
                   (F.lit(float(target_tokens)) * F.col("weight"))
                   / F.col("n_tokens").cast("double"))
    dims = w.select(F.col("lang").alias("_lg"),
                    F.floor(rate * F.lit(float(mod))).cast("long")
                    .alias("_thr"))
    df2 = df.withColumn("_sample_key", F.md5(F.col(key).cast("string")))
    bucket = _poly_base_expr("_sample_key") % F.lit(mod)
    # eqNullSafe: a NULL-language group gets its own mixture weight and
    # threshold; a plain == join would silently drop every NULL-lang
    # row while still counting its tokens in the denominator
    return (df2.join(F.broadcast(dims),
                     F.col(lang).eqNullSafe(F.col("_lg")))
            .filter(bucket < F.col("_thr"))
            .drop("_sample_key", "_lg", "_thr"))


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------
#
# One Java==RE2-safe regex; the same crawl-dedup-key normalization every
# warehouse applies before grouping by url: lowercase scheme/host, strip
# default ports, drop fragments, drop tracking params, sort the rest.

CANON_RE = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*@)?"
            r"(\[[^\]]*\]|[^/?#:@]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?")
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)="


def with_canonical_url(df: DataFrame, url: str = "url") -> DataFrame:
    """Append ``canonical_url``: lowercase scheme and host, default
    port stripped (http:80 / https:443), fragment dropped, tracking
    query params (utm_*/fbclid/gclid/msclkid) removed, remaining
    params sorted, empty path normalized to '/'. Userinfo
    (``user:pw@``, delimited by the LAST '@' before the path — the
    greedy group) passes through case-preserved; bracketed IPv6 hosts
    are lowercased whole (RFC 5952 canonical hex is lowercase) and
    keep default-port stripping. Rows that do not parse as absolute
    URLs pass through unchanged. Map-only codegen'd string/array ops —
    no shuffle, no Python."""
    u = F.col(url)
    scheme = F.lower(F.regexp_extract(u, CANON_RE, 1))
    userinfo = F.regexp_extract(u, CANON_RE, 2)
    host = F.lower(F.regexp_extract(u, CANON_RE, 3))
    port = F.regexp_extract(u, CANON_RE, 4)
    path = F.regexp_extract(u, CANON_RE, 5)
    rawq = F.regexp_extract(u, CANON_RE, 6)
    port_kept = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")), F.lit("")
    ).otherwise(port)
    params = F.array_sort(F.filter(
        F.split(F.substring(rawq, 2, 1 << 20), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE)))
    q = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), userinfo, host, port_kept,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return df.withColumn(
        "canonical_url", F.when(scheme == "", u).otherwise(canon))


def sql_canonical_url(url_expr: str) -> str:
    """DuckDB twin of with_canonical_url's output column."""
    scheme = f"LOWER(REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 1))"
    userinfo = f"REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 2)"
    host = f"LOWER(REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 3))"
    port = f"REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 4)"
    path = f"REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 5)"
    rawq = f"REGEXP_EXTRACT({url_expr}, '{CANON_RE}', 6)"
    port_kept = (f"CASE WHEN ({scheme} = 'http' AND {port} = ':80') OR "
                 f"({scheme} = 'https' AND {port} = ':443') "
                 f"THEN '' ELSE {port} END")
    params = (f"LIST_SORT(LIST_FILTER(STRING_SPLIT(SUBSTRING({rawq}, 2), "
              f"'&'), p -> p <> '' AND NOT REGEXP_MATCHES(p, "
              f"'{TRACKING_RE}')))")
    q = f"ARRAY_TO_STRING({params}, '&')"
    canon = (f"{scheme} || '://' || {userinfo} || {host} || {port_kept} || "
             f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
             f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)")
    return f"CASE WHEN {scheme} = '' THEN {url_expr} ELSE {canon} END"


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2D Pareto frontier (maximize both columns): rows not dominated
    by any other row, where p dominates q iff p.x >= q.x and
    p.y >= q.y with at least one strict — the curation shape for
    "keep every document on the length-vs-richness frontier" style
    selection without committing to a weighting of the two metrics.
    Duplicates of a frontier point all survive (neither dominates
    the other).

    Never all-pairs: a point q is dominated iff
      max{ gm(x') : x' > q.x } >= q.y        (strictly longer, as rich)
      or gm(q.x) > q.y                       (same length, richer)
    where gm(x) = max y within the x group. So the plan is ONE
    map-side-combined groupBy(x) -> a running-max window over the
    DISTINCT-x frame (cardinality = distinct metric values, e.g.
    bounded by the max token count — thousands, not corpus-sized;
    the only single-partition step runs on that tiny frame) -> a
    broadcast join back on x. All comparisons are integer/exact;
    works for any orderable numeric columns."""
    gm = df.groupBy(x).agg(F.max(y).alias("_gm"))
    w = (Window.orderBy(F.col(x).desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    rm = gm.withColumn("_rm", F.max("_gm").over(w))
    dominated = ((F.col("_rm").isNotNull() & (F.col("_rm") >= F.col(y)))
                 | (F.col("_gm") > F.col(y)))
    return (df.join(F.broadcast(rm), x)
            .filter(~dominated)
            .drop("_gm", "_rm"))


# ---------------------------------------------------------------------------
# Learned quality classifier (fastText-style)
# ---------------------------------------------------------------------------


def quality_features(df: DataFrame, text: str = "text",
                     n_features: int = 4096) -> DataFrame:
    """Hashed bag-of-words+bigrams feature vector (the fastText linear
    recipe: unigram + bigram hash buckets) appended as ``features``.
    Built from pyspark.ml's Tokenizer-free column ops + HashingTF —
    one map-only stage, no vocabulary collection, so the featurizer
    itself needs no fit and scales as a pure map."""
    from pyspark.ml.feature import HashingTF

    words = F.split(F.lower(F.coalesce(F.col(text), F.lit(""))), " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(words) - 2),
                    lambda i: F.concat_ws(
                        "_", F.element_at(words, i + 1),
                        F.element_at(words, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    toks = df.withColumn("_toks", F.concat(words, bigrams))
    tf = HashingTF(inputCol="_toks", outputCol="features",
                   numFeatures=n_features)
    return tf.transform(toks).drop("_toks")


def train_quality_classifier(labeled: DataFrame, text: str = "text",
                             label: str = "label",
                             n_features: int = 4096, max_iter: int = 50):
    """Fit the fastText-style quality filter: hashed unigram+bigram
    features -> binary LogisticRegression (label 1.0 = keep-worthy
    prose, 0.0 = reject). This is the learned stage of a production
    quality pipeline (a 'wiki-like' classifier) sitting downstream of
    the rule-based with_filter_decision; training input is a LABELED
    SAMPLE (thousands of rows — driver-side cost is the lr fit), while
    prediction is a distributed map over the full corpus."""
    from pyspark.ml.classification import LogisticRegression

    feats = quality_features(labeled, text, n_features)
    lr = LogisticRegression(maxIter=max_iter, labelCol=label,
                            featuresCol="features")
    return lr.fit(feats.select("features", F.col(label).cast("double")
                               .alias(label)))


def predict_quality(model, df: DataFrame, text: str = "text",
                    n_features: int = 4096,
                    threshold: float = 0.5) -> DataFrame:
    """Score the corpus with a trained quality classifier: appends
    ``quality_prob`` (P(keep)) and ``quality_keep``. Model weights
    ride the broadcast closure; scoring is map-only."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(df, text, n_features)
    scored = model.transform(feats)
    prob = F.element_at(vector_to_array("probability"), 2)
    return (scored.withColumn("quality_prob", prob)
            .withColumn("quality_keep", prob >= F.lit(threshold))
            .drop("features", "rawPrediction", "probability", "prediction"))


def contamination_score(df: DataFrame, eval_df: DataFrame,
                        key: str = "doc_id", text: str = "text",
                        eval_text: str = "text", n: int = 8) -> DataFrame:
    """Graded contamination report — where ``decontaminate`` flags any
    overlap, this scores it: per document, the FRACTION of its
    distinct word n-grams that appear in the evaluation set, so a
    policy can distinguish a quoted benchmark sentence (frac ~0.01,
    keep) from a pasted benchmark item (frac ~1, drop) instead of
    binary-dropping both. Every document reports (clean docs score
    0), which is what threshold-tuning audits need.

    Same scale shape as decontaminate (the eval shingle set
    broadcasts; only matched pairs reach the shuffle) plus one
    map-side distinct-shingle count per doc; contamination_frac is
    one IEEE division of exact BIGINTs; docs shorter than n tokens
    have zero n-grams -> NULL frac (no 0/0).

    Returns (key, n_grams, n_shared, contamination_frac).
    """
    doc_sh = df.select(
        F.col(key),
        F.explode(F.array_distinct(word_ngrams(text, n))).alias("shingle"))
    tot = doc_sh.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"))
    eval_sh = (eval_df
               .select(F.explode(F.array_distinct(
                   word_ngrams(eval_text, n))).alias("shingle"))
               .distinct())
    hit = (doc_sh.join(F.broadcast(eval_sh), "shingle")
           .groupBy(key)
           .agg(F.count_distinct("shingle").cast("long").alias("n_shared")))
    return (df.select(F.col(key))
            .join(tot, key, "left").join(hit, key, "left")
            .select(F.col(key),
                    F.coalesce("n_grams", F.lit(0).cast("long"))
                    .alias("n_grams"),
                    F.coalesce("n_shared", F.lit(0).cast("long"))
                    .alias("n_shared"))
            .withColumn("contamination_frac",
                        F.when(F.col("n_grams") > 0,
                               F.col("n_shared").cast("double")
                               / F.col("n_grams").cast("double"))))
