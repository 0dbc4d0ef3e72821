"""Training-data text operators over the ``documents`` table.

Large-scale pipeline staples the reference lacks but a 100 TB web-text
engine needs (task brief): exact + near dedup, language ID, quality
scoring, token counting, fingerprinting. Everything here is built-in
column functions (JVM, codegen) except nothing — no Python on these
paths at all; MinHash/SimHash use xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

# crude per-language stopword markers for the n-gram/lexicon heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def normalize_text(col):
    """Whitespace-collapse + lowercase — the canonical form used for
    fingerprints and dedup keys."""
    return F.lower(F.regexp_replace(col, " +", " "))


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text."""
    return df.withColumn("fingerprint", F.md5(normalize_text(F.col(text))))


def with_rolling_fingerprint(df: DataFrame, text: str = "text",
                             out: str = "rolling_hash",
                             mod: int = 1_000_000_007) -> DataFrame:
    """Polynomial rolling hash of the raw text (acc = (acc*31 + byte)
    % mod, left fold over character codes) — entirely column
    expressions, so it rides whole-stage codegen and mirrors exactly
    into SQL for the oracle. Unlike the md5 fingerprint this is
    incrementally updatable (the property rolling hashes exist for)."""
    e = (f"CASE WHEN {text} IS NULL THEN NULL ELSE "
         f"aggregate(transform(sequence(1, length({text})), "
         f"i -> ascii(substr({text}, i, 1))), 0L, "
         f"(acc, c) -> (acc * 31 + c) % {mod}) END")
    return df.withColumn(out, F.expr(e))


def sql_rolling_fingerprint(text: str = "text", mod: int = 1_000_000_007) -> str:
    """DuckDB mirror of with_rolling_fingerprint (same fold, same mod)."""
    return (f"CASE WHEN {text} IS NULL THEN NULL ELSE "
            f"CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"LIST_TRANSFORM(RANGE(1, LENGTH({text})+1), "
            f"i -> CAST(ASCII({text}[i]) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {mod}) AS BIGINT) END")


# ---------------------------------------------------------------------------
# Seeded polynomial hash family (the SQL-mirrored alternative to xxhash64)
# ---------------------------------------------------------------------------
#
# xxhash64 has no DuckDB twin, so MinHash/SimHash built on it can only be
# rows-checked by the driver. The poly family below is the same rolling
# fold as with_rolling_fingerprint, reduced mod 2^56 (so the per-seed
# affine step (2i+1)*h + b_i never overflows int64: 63 * 2^56 < 2^63),
# and mirrors token-for-token into DuckDB SQL — enabling value-exact
# oracles for the near-dup operators. xxhash64 stays the scale default
# (single JVM intrinsic vs a per-character fold).

POLY_MOD = 1 << 56


def _poly_base_expr(colname: str, mod: int = POLY_MOD):
    """Column expr: rolling poly hash of a (non-null) string column."""
    return F.expr(
        f"aggregate(transform(sequence(1, length({colname})), "
        f"i -> ascii(substr({colname}, i, 1))), 0L, "
        f"(acc, c) -> (acc * 31 + c) % {mod})")


def sql_poly_base(expr: str, mod: int = POLY_MOD) -> str:
    """DuckDB mirror of _poly_base_expr over an arbitrary SQL expr."""
    return (f"CAST(LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"LIST_TRANSFORM(RANGE(1, LENGTH({expr})+1), "
            f"i -> CAST(ASCII({expr}[i]) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {mod}) AS BIGINT)")


def poly_seed_coeffs(i: int) -> tuple[int, int]:
    """(a_i, b_i) of the affine seed step h_i = (a_i*h + b_i) % POLY_MOD."""
    return 2 * i + 1, i * 1_000_003 + 12345


def exact_duplicates(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact dedup by content hash: groups with >1 member, keeping the
    min key as the canonical representative."""
    return (df.select(F.md5(F.col(text)).alias("content_hash"), F.col(key))
            .groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("dup_count"), F.min(key).alias("keep_id"))
            .filter(F.col("dup_count") > 1))


def dedup_exact(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Keep one row per distinct text (min key wins) — the scalable
    hash-groupBy dedup (map-side combine; one shuffle on the hash)."""
    w_min = (df.groupBy(F.md5(F.col(text)).alias("content_hash"))
             .agg(F.min(key).alias(key)))
    return df.join(w_min, key, "leftsemi")


def with_filter_decision(df: DataFrame, key: str = "doc_id",
                         text: str = "text", min_words: int = 10,
                         max_mean_word_len: float = 12.0,
                         min_stopword_ratio: float = 0.05,
                         max_dup_word_frac: float = 0.5,
                         repetition_mode: str = "agg") -> DataFrame:
    """C4/Gopher-style composite keep/drop decision: the quality and
    repetition signals folded into one ``keep`` boolean plus the FIRST
    failed rule as ``filter_reason`` (the per-rule attrition a corpus
    curation report needs). Rule order: too_short -> weird_words ->
    low_stopwords -> repetitive -> keep. All comparisons run on ratios
    produced by the same IEEE ops as the SQL oracle, so the decision
    is value-exact; the underlying signals stay available via
    ``with_quality`` / ``with_repetition``."""
    r = with_repetition(with_quality(df, text), key, text,
                        mode=repetition_mode)
    reason = (F.when(F.col("n_words") < min_words, F.lit("too_short"))
              .when(F.col("mean_word_len") > max_mean_word_len,
                    F.lit("weird_words"))
              .when(F.col("stopword_ratio") < min_stopword_ratio,
                    F.lit("low_stopwords"))
              .when(F.col("dup_word_frac") > max_dup_word_frac,
                    F.lit("repetitive"))
              .otherwise(F.lit("keep")))
    return (r.withColumn("filter_reason", reason)
             .withColumn("keep", F.col("filter_reason") == "keep"))


def corpus_vocab(df: DataFrame, lang: str = "lang", text: str = "text",
                 k: int = 20) -> DataFrame:
    """Per-language vocabulary: the top-``k`` normalized words by
    document-corpus frequency (ties broken by word order so the cut is
    deterministic). Shape at scale: explode -> groupBy(lang, word)
    with map-side combine (the wide shuffle carries one row per
    distinct word per partition, not one per token), then the top-k
    window compiles to WindowGroupLimit — only per-partition
    candidates reach the final shuffle."""
    from pyspark.sql import Window
    words = (df.select(F.col(lang),
                       F.explode(F.split(normalize_text(F.col(text)), " "))
                       .alias("word"))
             .filter(F.col("word") != ""))
    counts = words.groupBy(lang, "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(lang).orderBy(F.col("n").desc(), F.col("word").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(lang, "word", "n", F.col("rank").cast("long").alias("rank")))


def latest_capture(df: DataFrame, key: str = "url", ts: str = "warc_ts",
                   tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """As-of dedup over repeated captures: keep the most recent row per
    ``key`` (Common-Crawl semantics — the same url is re-crawled every
    snapshot; "latest revision wins"). Pass ``tiebreak`` columns for a
    deterministic winner when two captures share a timestamp.

    Scale shape: the ``row_number() == 1`` filter compiles to
    WindowGroupLimit (Spark 3.5+), so each map partition forwards only
    its per-key winner into the single shuffle — the same plan
    ``extract.dedup_precedence`` rides. No groupBy+self-join, no
    collect."""
    from pyspark.sql import Window
    order = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def with_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (runs of letters / digits / single punctuation)."""
    return (df.withColumn("n_tokens", F.size(F.split(F.col(text), " ")))
              .withColumn("n_subwords",
                          F.size(F.regexp_extract_all(
                              F.col(text),
                              F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"),
                              # idx=0 (whole match): the pattern has no
                              # capture groups and Spark's default idx=1
                              # raises REGEX_GROUP_INDEX at eval time
                              0))))


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality features: char count, word count, mean word length,
    stopword ratio — all pure column math.

    The stopword count folds the word array against a constant map
    (O(1) lookup per word) instead of an array_contains scan per word
    (O(|STOPWORDS|) each) — same membership semantics, measured ~30%
    faster on the 100k-page bench corpus."""
    words = F.split(F.col(text), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col(text))
    alpha_chars = F.length(F.regexp_replace(F.col(text), " ", ""))
    stop_map = F.create_map(*[x for s in STOPWORDS
                              for x in (F.lit(s), F.lit(1))])
    n_stop = F.aggregate(words, F.lit(0),
                         lambda acc, w: acc + F.coalesce(stop_map[F.lower(w)],
                                                         F.lit(0)))
    return (df.withColumn("n_chars", n_chars)
              .withColumn("n_words", n_words)
              .withColumn("mean_word_len",
                          F.when(n_words > 0, alpha_chars.cast("double") / n_words.cast("double"))
                           .otherwise(F.lit(0.0)))
              .withColumn("stopword_ratio",
                          F.when(n_words > 0, n_stop.cast("double") / n_words.cast("double"))
                           .otherwise(F.lit(0.0))))


def with_repetition(df: DataFrame, key: str = "doc_id",
                    text: str = "text", mode: str = "agg") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1 of the
    Gopher paper — published repetition heuristics for web-corpus
    cleaning): per document,

    - ``dup_word_frac``: 1 - distinct words / words (pure array math);
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams.

    ``mode="agg"`` (default): explode + two-level groupBy — the per-doc
    mode never materializes a per-row map; one shuffle keyed on
    (doc, bigram) then (doc) with map-side combine, scaling to
    documents of any length (a single pathological 1 GB page's bigrams
    distribute across reducers). ``mode="local"``: the same number from
    pure array math on the row — sort the bigram array, then the max
    multiplicity is the longest run of equal adjacent elements
    (array_sort + one aggregate fold: O(n log n) per row, all
    whole-stage codegen). No shuffle, no join back of the wide text
    frame, and streaming-legal (no aggregation) — the right trade for
    bounded web pages, and what the bench curation chain uses. Both
    modes produce identical values (tested).

    Degenerate docs (<2 words, so no bigrams) score 0.0 on
    ``top_bigram_frac``; empty text scores 0.0 on both."""
    w = F.split(normalize_text(F.col(text)), " ")
    n = F.size(w)
    dup_word = F.when(n > 0,
                      1.0 - F.size(F.array_distinct(w)).cast("double")
                      / n.cast("double")).otherwise(F.lit(0.0))
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)))).otherwise(
            F.array().cast("array<string>"))
    if mode == "local":
        bg = F.array_sort(F.col("_bgs"))
        # longest equal-adjacent run in the sorted array == max bigram
        # multiplicity. State (prev, run, best); init prev="" is safe:
        # every bigram contains its separator space, so it never
        # equals "". Runs entirely in whole-stage codegen.
        def _step(acc, x):
            run = (F.when(x == acc["prev"], acc["run"] + F.lit(1))
                   .otherwise(F.lit(1)))
            return F.struct(x.alias("prev"), run.alias("run"),
                            F.greatest(acc["best"], run).alias("best"))
        top = F.aggregate(
            bg,
            F.struct(F.lit("").alias("prev"), F.lit(1).alias("run"),
                     F.lit(0).alias("best")),
            _step, lambda acc: acc["best"])
        frac = (F.when(F.size(F.col("_bgs")) > 0,
                       top.cast("double")
                       / F.size(F.col("_bgs")).cast("double"))
                .otherwise(F.lit(0.0)))
        return (df.withColumn("_bgs", bigrams)
                .withColumn("dup_word_frac", dup_word)
                .withColumn("top_bigram_frac", frac)
                .drop("_bgs"))
    ex = df.select(F.col(key), F.explode(bigrams).alias("_bg"))
    cnt = ex.groupBy(key, "_bg").agg(F.count(F.lit(1)).alias("_c"))
    top = cnt.groupBy(key).agg(F.max("_c").alias("_top"),
                               F.sum("_c").alias("_tot"))
    return (df.join(top, key, "left")
            .withColumn("dup_word_frac", dup_word)
            .withColumn("top_bigram_frac",
                        F.coalesce(F.col("_top").cast("double")
                                   / F.col("_tot").cast("double"),
                                   F.lit(0.0)))
            .drop("_top", "_tot"))


def with_lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-token hits;
    'und' when nothing matches. Deterministic tie-break by language code
    order en < de < fr < es (greatest(struct) picks the max hit count,
    ties broken by the later struct field — we encode priority)."""
    words = F.split(normalize_text(F.col(text)), " ")
    scores = []
    # priority: earlier entry wins ties (encoded as descending tiebreak)
    for i, (lang, markers) in enumerate(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(words, lambda w: F.array_contains(marr, w)))
        scores.append(F.struct(hits.alias("hits"),
                               F.lit(len(LANG_MARKERS) - i).alias("prio"),
                               F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return df.withColumn("lang_pred",
                         F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


SCRIPT_RANGES = (
    # explicit codepoint ranges, NOT \p{script=...} classes: Java and
    # RE2 ship different Unicode script tables, ranges are engine-proof
    ("arabic", "؀-ۿ"),
    ("cjk", "一-鿿"),
    ("cyrillic", "Ѐ-ӿ"),
    ("digit", "0-9"),
    ("greek", "Ͱ-Ͽ"),
    ("latin", "A-Za-z"),
)


def with_script_mix(df: DataFrame, text: str = "text") -> DataFrame:
    """Unicode-script mixture per document: per-script character counts
    (strip-and-diff: len(s) - len(regexp_replace(s, class, ''))) and
    the dominant script — the multilingual-corpus router that runs
    BEFORE word-marker language ID (with_lang_id assumes Latin text;
    this decides which alphabet you are even in). Pure column math:
    one regexp_replace per script class over the scan, no shuffle.

    Dominant = lexicographic max of (count, name) structs — identical
    struct ordering on both engines, so the label is oracle-exact;
    'none' when no class matches (e.g. punctuation-only text)."""
    col = F.col(text)
    counts = {name: (F.length(col)
                     - F.length(F.regexp_replace(col, f"[{rng}]", "")))
              for name, rng in SCRIPT_RANGES}
    cand = [F.struct(c.alias("n"), F.lit(name).alias("script"))
            for name, c in counts.items()]
    best = F.greatest(*cand)
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c.cast("long"))
    return out.withColumn(
        "dominant_script",
        F.when(best["n"] > 0, best["script"]).otherwise(F.lit("none")))


def sql_script_mix(text: str = "text") -> list[str]:
    """DuckDB mirror: the per-script count expressions + dominant pick,
    as SELECT-list fragments (same ranges, same strip-and-diff, same
    (n, script) struct max)."""
    frags = []
    for name, rng in SCRIPT_RANGES:
        frags.append(
            f"CAST(LENGTH({text}) - LENGTH(regexp_replace({text}, "
            f"'[{rng}]', '', 'g')) AS BIGINT) AS n_{name}")
    structs = ", ".join(
        f"struct_pack(n := LENGTH({text}) - LENGTH(regexp_replace({text}, "
        f"'[{rng}]', '', 'g')), script := '{name}')"
        for name, rng in SCRIPT_RANGES)
    frags.append(
        f"CASE WHEN list_max([{structs}]).n > 0 "
        f"THEN list_max([{structs}]).script ELSE 'none' END "
        f"AS dominant_script")
    return frags


# ---------------------------------------------------------------------------
# Near-duplicate detection: MinHash + LSH, SimHash, n-gram Jaccard
# ---------------------------------------------------------------------------

def _shingles(text_col, k: int = 3):
    """Word k-gram shingles of the normalized text (distinct)."""
    words = F.split(normalize_text(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", words))))


def minhash_signatures(df: DataFrame, key: str = "doc_id", text: str = "text",
                       num_hashes: int = 32, shingle_k: int = 3,
                       hash_family: str = "xxhash") -> DataFrame:
    """(key, minhash array<long>) — for each of ``num_hashes`` seeded
    hash functions, the min hash over the document's shingle set.

    Shape: explode shingles -> one groupBy with ``num_hashes`` MIN
    aggregates (map-side partial agg, one shuffle on ``key``). A single
    wide projection of 32 x array_min(transform(shingles)) is avoided
    deliberately: it re-evaluates the shingle construction per hash and
    blows up whole-stage codegen (~100x slower measured at sf0.01); the
    explode/agg form streams and scales to arbitrarily long documents.

    ``hash_family``: "xxhash" (JVM intrinsic — the scale default) or
    "poly" (rolling fold mod 2^56 + per-seed affine step — mirrors
    exactly into DuckDB SQL, used by the driver-oracle contract query)."""
    sh = df.select(F.col(key), F.explode(_shingles(F.col(text), shingle_k)).alias("_sh"))
    if hash_family == "poly":
        sh = sh.withColumn("_hb", _poly_base_expr("_sh"))
        aggs = []
        for i in range(num_hashes):
            a, b = poly_seed_coeffs(i)
            aggs.append(F.min((F.col("_hb") * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD))
                        .alias(f"_h{i}"))
    else:
        aggs = [F.min(F.xxhash64("_sh", F.lit(i))).alias(f"_h{i}")
                for i in range(num_hashes)]
    agg = sh.groupBy(key).agg(*aggs)
    sig = F.array(*[F.col(f"_h{i}") for i in range(num_hashes)])
    return agg.select(F.col(key), sig.alias("minhash"))


def with_minhash(df: DataFrame, text: str = "text", num_hashes: int = 32,
                 shingle_k: int = 3, key: str = "doc_id") -> DataFrame:
    """MinHash signature appended to ``df`` (join back on ``key``).

    Precondition: ``key`` must be unique in ``df`` — the signature side
    is one row per key by construction (groupBy), so duplicate keys in
    ``df`` itself would multiply rows through the join. Raw crawl
    corpora with repeated doc ids should be keyed by a fresh
    ``monotonically_increasing_id`` (or deduped) first."""
    return df.join(minhash_signatures(df, key, text, num_hashes, shingle_k), key)


def minhash_bands(df: DataFrame, key: str = "doc_id", text: str = "text",
                  num_hashes: int = 32, bands: int = 8, shingle_k: int = 3,
                  hash_family: str = "xxhash") -> DataFrame:
    """The banded LSH rows (key, band, band_hash) — the PERSISTENT
    near-dup index of a crawl warehouse: write it once per corpus
    (``io.write_bucketed(..., "band_hash")`` makes later probe joins
    shuffle-free on the index side) and let each day's crawl increment
    probe it via ``minhash_probe`` instead of recomputing signatures
    for the whole corpus."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, key, text, num_hashes, shingle_k, hash_family)
    band_slice = F.concat_ws(",", F.transform(
        F.slice("minhash", F.col("band") * rows_per_band + 1, rows_per_band),
        lambda x: x.cast("string")))
    band_key = (band_slice if hash_family == "poly"
                else F.xxhash64(band_slice, F.col("band")))
    return (sig.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
            .withColumn("band_hash", band_key)
            .select(key, "band", "band_hash"))


def minhash_probe(new_df: DataFrame, index: DataFrame,
                  key: str = "doc_id", text: str = "text",
                  num_hashes: int = 32, bands: int = 8, shingle_k: int = 3,
                  hash_family: str = "xxhash",
                  max_bucket: int | None = None,
                  new_bands: DataFrame | None = None) -> DataFrame:
    """Incremental near-dup candidates: band the NEW documents with
    the same parameters as the stored index (``minhash_bands`` output;
    keys must be disjoint from the increment's) and equi-join — every
    pair involving at least one new document, including new-new pairs,
    as (id_a < id_b) DISTINCT. Cost is O(increment) signature work
    plus one band equi-join against the index; the existing corpus is
    never re-read for shingling. With the index written bucketed on
    band_hash, the probe side alone shuffles.

    ``max_bucket`` is the same hot-bucket star guard as
    ``minhash_candidates`` (the batch path): a boilerplate bucket of m
    index members hit by n increment members would emit O(m*n) pairs
    unguarded; over the cap the bucket emits star edges
    (min-key representative -> member) restricted to edges touching at
    least one new document — old-old structure was already emitted by
    the original corpus run.

    ``new_bands`` (pre-computed ``minhash_bands`` output for the
    increment) gives the caller control of materialization lifetime:
    when None, the increment is banded here and materialized once
    (it feeds both the probe side and the union, and union branches do
    not reuse exchanges — the measured tile_pyramid finding) via
    reliable ``checkpoint()`` when the session has a checkpoint dir,
    else ``localCheckpoint()``. A long-lived driver issuing repeated
    probes should pass its own persisted ``new_bands`` and unpersist
    after the probe's sink action, so blocks never outlive the call."""
    if new_bands is not None:
        bn = new_bands
    else:
        bn = minhash_bands(new_df, key, text, num_hashes, bands, shingle_k,
                           hash_family)
        # localCheckpoint truncates lineage with non-replicated blocks:
        # fine in local mode, but on a cluster an executor loss kills
        # the query. Prefer the reliable checkpoint when configured.
        sc = new_df.sparkSession.sparkContext
        ckdir = sc.getCheckpointDir()
        bn = bn.checkpoint(eager=True) if ckdir else bn.localCheckpoint()
    if max_bucket is None:
        both = index.unionByName(bn)
        a = bn.select(F.col(key).alias("_ka"), "band", "band_hash")
        b = both.select(F.col(key).alias("_kb"), "band", "band_hash")
        j = (a.join(b, ["band", "band_hash"])
             .filter(F.col("_ka") != F.col("_kb")))
        return (j.select(F.least("_ka", "_kb").alias("id_a"),
                         F.greatest("_ka", "_kb").alias("id_b"))
                .distinct())
    both = (index.withColumn("_new", F.lit(False))
            .unionByName(bn.withColumn("_new", F.lit(True))))
    stats = (both.groupBy("band", "band_hash")
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.min(F.struct(key, "_new")).alias("_reps")))
    tagged = both.join(stats, ["band", "band_hash"])
    small = tagged.filter(F.col("_n") <= max_bucket)
    a = small.select(F.col(key).alias("id_a"),
                     F.col("_new").alias("_new_a"), "band", "band_hash")
    b = small.select(F.col(key).alias("id_b"),
                     F.col("_new").alias("_new_b"), "band", "band_hash")
    dense = (a.join(b, ["band", "band_hash"])
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.col("_new_a") | F.col("_new_b")))
             .select("id_a", "id_b"))
    star = (tagged.filter((F.col("_n") > max_bucket)
                          & (F.col(key) != F.col("_reps")[key])
                          & (F.col("_new") | F.col("_reps")["_new"]))
            .select(F.col("_reps")[key].alias("id_a"),
                    F.col(key).alias("id_b")))
    return (dense.unionByName(star)
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"))
            .distinct())


def minhash_candidates(df: DataFrame, key: str = "doc_id", text: str = "text",
                       num_hashes: int = 32, bands: int = 8,
                       shingle_k: int = 3,
                       hash_family: str = "xxhash",
                       max_bucket: int | None = None) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows-per-band
    groups, hash each band, self-join on (band_idx, band_hash) ->
    candidate near-duplicate pairs (a < b). The join is an equi-join on
    the band key — shuffle-partitioned, no cartesian. In "poly" mode the
    band key is the comma-joined signature slice itself (injective —
    what the SQL oracle compares); "xxhash" compresses it to a long.

    ``max_bucket`` is the hot-bucket guard for warehouse scale: a
    boilerplate mirror cluster of m identical pages puts m rows in one
    band bucket and the self-join emits m^2/2 pairs — at m=10^6 that
    is 5*10^11 pairs from ONE bucket. Buckets larger than the cap emit
    STAR edges instead (min-key representative -> every other member):
    linear in m, and connected-components downstream sees the same
    components, which is all near-dup clustering consumes. Buckets at
    or under the cap keep the exhaustive pairs. None = no guard
    (exact oracle mode)."""
    banded = minhash_bands(df, key, text, num_hashes, bands, shingle_k,
                           hash_family)
    return band_pairs(banded, key, max_bucket)


def band_pairs(banded: DataFrame, key: str = "doc_id",
               max_bucket: int | None = None) -> DataFrame:
    """(id_a < id_b) DISTINCT candidate pairs from ``minhash_bands``
    rows — the band self-join shared by ``minhash_candidates`` (which
    bands and pairs in one call) and jobs that pair a COMMITTED band
    index (jobs/dedup.py stage 3). ``max_bucket`` is the hot-bucket
    star guard documented on ``minhash_candidates``."""
    if max_bucket is not None:
        stats = (banded.groupBy("band", "band_hash")
                 .agg(F.count(F.lit(1)).alias("_n"), F.min(key).alias("_rep")))
        tagged = banded.join(stats, ["band", "band_hash"])
        small = tagged.filter(F.col("_n") <= max_bucket)
        left = small.select(F.col(key).alias("id_a"), "band", "band_hash")
        right = small.select(F.col(key).alias("id_b"), "band", "band_hash")
        dense = (left.join(right, ["band", "band_hash"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b"))
        star = (tagged.filter((F.col("_n") > max_bucket)
                              & (F.col(key) != F.col("_rep")))
                .select(F.col("_rep").alias("id_a"),
                        F.col(key).alias("id_b")))
        return dense.unionByName(star).distinct()
    left = banded.select(F.col(key).alias("id_a"), "band", "band_hash")
    right = banded.select(F.col(key).alias("id_b"), "band", "band_hash")
    return (left.join(right, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def ngram_jaccard_pairs(df: DataFrame, key: str = "doc_id", text: str = "text",
                        block: str | None = None, k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact word-k-gram Jaccard over candidate pairs. ``block`` limits
    pairing to equal-block rows (never a global cartesian). Jaccard via
    explode + groupBy — all JVM."""
    sh = df.select(F.col(key), *( [F.col(block)] if block else [] ),
                   F.explode(_shingles(F.col(text), k)).alias("shingle"))
    n_sh = sh.groupBy(key).agg(F.countDistinct("shingle").alias("n_sh"))
    join_keys = ["shingle"] + ([block] if block else [])
    a = sh.select(*([F.col(key).alias("id_a"), F.col("shingle")]
                    + ([F.col(block)] if block else [])))
    b = sh.select(*([F.col(key).alias("id_b"), F.col("shingle")]
                    + ([F.col(block)] if block else [])))
    inter = (a.join(b, join_keys).filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    na = n_sh.select(F.col(key).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = n_sh.select(F.col(key).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (inter.join(na, "id_a").join(nb, "id_b")
           .withColumn("jaccard",
                       F.col("n_inter").cast("double")
                       / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")))
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def duplicate_spans(df: DataFrame, key: str = "doc_id", text: str = "text",
                    k: int = 8, min_count: int = 2,
                    hash_family: str = "xxhash",
                    hint_broadcast: bool = True) -> DataFrame:
    """EXACT-substring duplicate spans — the Spark re-expression of the
    suffix-array dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): maximal runs of word positions whose
    k-gram occurs >= ``min_count`` times corpus-wide (any second
    occurrence counts, including within the same document, matching the
    paper's any-repeat criterion). Distinct from the MinHash/SimHash
    NEAR-dup family: this finds verbatim repeated passages (boilerplate,
    licence blocks, quoted chunks) inside otherwise-unique documents.

    Shape (no suffix array needed at this granularity): posexplode the
    sliding word k-grams (rows ~ total corpus words — the same cost
    class as the shingle explode in minhash_signatures) -> groupBy gram
    hash with COUNT (map-side combine, one shuffle) -> equi-join
    positions back to the >=min_count hashes -> per-doc window merge of
    consecutive duplicated positions (pos - row_number run grouping)
    into maximal spans. Documents shorter than ``k`` words contribute
    nothing. ``hash_family``: "xxhash" (scale default) or "poly"
    (SQL-mirrored, used by the driver oracle).

    Returns (key, span_start, span_end, n_grams): inclusive word
    indices into the NORMALIZED (lowercased, space-collapsed) token
    sequence; span_end covers the last word of the last duplicated
    k-gram.

    Deliberate trade-off: the gram-position lineage is EVALUATED TWICE
    (once aggregated into the duplicated-hash set, once as the probe
    side of the semi-join) — Catalyst does not reuse an exchange
    across the two branches. The alternative single-scan shape (a
    COUNT window over Window.partitionBy(gh)) shuffles every
    (key, pos, gh) row corpus-wide with no map-side combine; here the
    only wide data movement is the narrow (gh, partial-count) shuffle
    plus the semi-join, whose duplicated-hash build side is usually
    small (``hint_broadcast=True`` pins it to a broadcast so the probe
    stays map-only; disable on boilerplate-saturated crawls where the
    duplicated-gram set itself is huge). Re-running the explode is
    embarrassingly parallel CPU — the cheaper currency at 100 TB."""
    words = F.split(normalize_text(F.col(text)), " ")
    grams = F.when(
        F.size(words) >= k,
        F.transform(F.sequence(F.lit(0), F.size(words) - k),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    ).otherwise(F.array().cast("array<string>"))
    pos = df.select(F.col(key), F.posexplode(grams).alias("pos", "_gram"))
    if hash_family == "poly":
        pos = pos.withColumn("gh", _poly_base_expr("_gram")).drop("_gram")
    else:
        pos = pos.withColumn("gh", F.xxhash64("_gram")).drop("_gram")
    dup = (pos.groupBy("gh").agg(F.count(F.lit(1)).alias("_c"))
           .filter(F.col("_c") >= min_count).select("gh"))
    hit = pos.join(F.broadcast(dup) if hint_broadcast else dup,
                   "gh", "leftsemi")
    w = Window.partitionBy(key).orderBy("pos")
    runs = hit.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    return (runs.groupBy(key, "_grp")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
                 F.count(F.lit(1)).alias("n_grams"))
            .drop("_grp"))


def sql_duplicate_spans(source: str, key: str = "doc_id", text: str = "text",
                        k: int = 8, min_count: int = 2) -> str:
    """DuckDB mirror of duplicate_spans(hash_family="poly") over the CTE
    or table named ``source`` — same normalization, same poly gram hash,
    same run-merge window."""
    gram = f"ARRAY_TO_STRING(ws[p+1:p+{k}], ' ')"
    return f"""toks AS (
  SELECT {key}, STRING_SPLIT(LOWER(REGEXP_REPLACE({text}, ' +', ' ', 'g')), ' ') AS ws
  FROM {source}),
g AS (
  SELECT {key}, UNNEST(range(0, LEN(ws) - {k} + 1)) AS p, ws
  FROM toks WHERE LEN(ws) >= {k}),
gh AS (SELECT {key}, p, {sql_poly_base(gram)} AS h FROM g),
dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= {min_count}),
hit AS (SELECT {key}, p FROM gh WHERE h IN (SELECT h FROM dup)),
runs AS (
  SELECT {key}, p,
         p - ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY p) AS grp
  FROM hit)"""


def strip_duplicate_spans(df: DataFrame, key: str = "doc_id",
                          text: str = "text", k: int = 8,
                          min_count: int = 2,
                          hash_family: str = "xxhash",
                          hint_broadcast: bool = True) -> DataFrame:
    """Remove every duplicated span found by ``duplicate_spans`` from
    the normalized token stream (Lee et al.'s ExactSubstr deletion).
    Per-doc span lists are collected into one array column — size is
    O(words in the doc), the same per-row bound as the token array
    itself, never corpus-sized. Documents with no duplicated span pass
    through unchanged (normalized). Output: (key, text) with covered
    words dropped."""
    spans = (duplicate_spans(df, key, text, k, min_count, hash_family,
                             hint_broadcast=hint_broadcast)
             .groupBy(key)
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("_spans")))
    words = F.split(normalize_text(F.col(text)), " ")
    out = (df.select(F.col(key), words.alias("_ws"))
           .join(spans, key, "left")
           .withColumn("_spans", F.coalesce(
               "_spans", F.array().cast(
                   "array<struct<span_start:long,span_end:long>>")))
           .withColumn("_kept", F.filter(
               "_ws",
               lambda wd, i: ~F.exists(
                   "_spans",
                   lambda s: (s["span_start"] <= i) & (i <= s["span_end"])))))
    return out.select(F.col(key), F.concat_ws(" ", "_kept").alias(text))


def with_simhash(df: DataFrame, text: str = "text", bits: int = 64,
                 key: str = "doc_id", hash_family: str = "xxhash") -> DataFrame:
    """SimHash: majority vote of per-token hash bits, packed into one
    long (bit set when >= half the distinct tokens have it set; b63 is
    the sign bit). Explode tokens -> one groupBy with ``bits`` SUM
    aggregates (map-side combine, one shuffle) — the same
    codegen-friendly shape as ``minhash_signatures``; a 64-wide
    array-filter projection re-evaluates the token hashing per bit.
    Empty documents (no tokens) get all bits set (vacuous majority).

    Precondition: ``key`` unique in ``df`` (see with_minhash).
    ``hash_family="poly"`` (bits <= 56) uses the SQL-mirrored rolling
    fold so the driver oracle can value-check the signature."""
    words = F.array_distinct(F.split(normalize_text(F.col(text)), " "))
    if hash_family == "poly":
        assert bits <= 56, "poly family yields 56 hash bits"
        tok = (df.select(F.col(key), F.explode(words).alias("_w"))
               .withColumn("_h", _poly_base_expr("_w")))
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1))).alias(f"_o{b}")
            for b in range(bits)]
        agg = tok.groupBy(key).agg(*aggs)
        packed = None
        for b in range(bits):
            bit = F.when(F.col(f"_o{b}") * 2 >= F.col("_n"), F.lit(1)).otherwise(F.lit(0))
            term = bit.cast("long") * F.lit(1 << b)
            packed = term if packed is None else packed + term
        sig = agg.select(F.col(key), packed.alias("simhash"))
        fill = F.lit((1 << bits) - 1).cast("long")
        return (df.join(sig, key, "left")
                  .withColumn("simhash", F.coalesce(F.col("simhash"), fill)))
    tok = (df.select(F.col(key), F.explode(words).alias("_w"))
             .withColumn("_h", F.xxhash64("_w")))
    masks = [(1 << b) if b < 63 else -(2 ** 63) for b in range(bits)]
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(F.col("_h").bitwiseAND(F.lit(masks[b])) != 0, 1).otherwise(0)).alias(f"_o{b}")
        for b in range(bits)]
    agg = tok.groupBy(key).agg(*aggs)
    packed = None
    for b in range(bits):
        bit = F.when(F.col(f"_o{b}") * 2 >= F.col("_n"), F.lit(1)).otherwise(F.lit(0))
        term = bit.cast("long") * F.lit(masks[b])
        packed = term if packed is None else packed + term
    sig = agg.select(F.col(key), packed.alias("simhash"))
    # left join keeps token-less docs; vacuous majority = all bits = -1
    return (df.join(sig, key, "left")
              .withColumn("simhash", F.coalesce(F.col("simhash"), F.lit(-1).cast("long"))))


def simhash_hamming(col_a, col_b):
    """Hamming distance between two packed simhash longs."""
    x = col_a.bitwiseXOR(col_b)
    return F.bit_count(x)


def with_surprisal(df: DataFrame, key: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """Unigram corpus-surprisal quality score — the integer-exact
    stand-in for CCNet's LM-perplexity filter: rare-token-heavy
    (gibberish, boilerplate-hash, OCR-noise) documents score HIGH,
    common-word prose scores LOW. Per token, the surprisal bucket is

        sb(w) = floor(log10(N_total / count(w)))

    computed EXACTLY as ``length(str(N_total div count(w))) - 1`` —
    the digit count of an integer quotient, pure int/string ops, so
    the score is value-comparable across engines with no
    transcendental in sight (the repo's IEEE rules). Appends per doc:

      surp_sum   — sum of per-token surprisal buckets (int64)
      n_scored   — tokens scored (non-empty normalized tokens)
      surp_centi — mean bucket in centibuckets: (100*surp_sum) div n

    Plan: explode normalized tokens -> token-frequency groupBy
    (map-side combine; stop-word heads are exactly the keys AQE's
    skew handling splits) -> equi-join tokens to their counts -> one
    per-doc SUM. The corpus-total N is a broadcast one-row aggregate,
    the same scalar pattern as fusion_scores. Two narrow shuffles
    (token, then key); document text never shuffles."""
    tok = df.select(
        F.col(key),
        F.explode(F.split(normalize_text(F.coalesce(F.col(text),
                                                    F.lit(""))), " "))
        .alias("_w")).filter(F.col("_w") != "")
    freq = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = freq.agg(F.sum("_c").alias("_tot"))
    scored = (tok.join(freq, "_w")
              .crossJoin(F.broadcast(total))
              .withColumn("_sb", F.length(F.expr(
                  "CAST(_tot DIV _c AS STRING)")) - 1))
    agg = (scored.groupBy(key)
           .agg(F.sum("_sb").cast("long").alias("surp_sum"),
                F.count(F.lit(1)).cast("long").alias("n_scored")))
    out = (df.join(agg, key, "left")
           .withColumn("surp_sum", F.coalesce("surp_sum", F.lit(0)))
           .withColumn("n_scored", F.coalesce("n_scored", F.lit(0))))
    return out.withColumn(
        "surp_centi",
        F.when(F.col("n_scored") > 0,
               F.expr("CAST(100 * surp_sum AS BIGINT) DIV n_scored"))
        .otherwise(F.lit(0)).cast("long"))


def sql_surprisal(source: str, key: str = "doc_id",
                  text: str = "text") -> str:
    """DuckDB mirror of with_surprisal over table/CTE ``source``: same
    normalization, same digit-count integer-quotient bucket."""
    norm = f"LOWER(REGEXP_REPLACE({text}, ' +', ' ', 'g'))"
    return f"""sp_tok AS (
  SELECT {key}, UNNEST(STRING_SPLIT({norm}, ' ')) AS w
  FROM {source} WHERE {text} IS NOT NULL),
sp_tok2 AS (SELECT {key}, w FROM sp_tok WHERE w <> ''),
sp_freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM sp_tok2 GROUP BY w),
sp_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM sp_freq),
sp_scored AS (
  SELECT t.{key}, LENGTH(CAST(tot // c AS VARCHAR)) - 1 AS sb
  FROM sp_tok2 t JOIN sp_freq f ON t.w = f.w, sp_tot),
sp_agg AS (
  SELECT {key}, CAST(SUM(sb) AS BIGINT) AS surp_sum,
         CAST(COUNT(*) AS BIGINT) AS n_scored
  FROM sp_scored GROUP BY {key})"""


def collocations(df: DataFrame, text: str = "text", min_pair: int = 5,
                 topk: int = 30) -> DataFrame:
    """Top bigram collocations by PMI over the corpus — the
    phrase-mining pass of a training-data pipeline (finds multiword
    units like "new york" worth atomic treatment before tokenizer
    training). Returns (a, b, n_ab, n_a, n_b, total_tokens, lift)
    where lift = n_ab * T / (n_a * n_b), the PMI argument: ranking by
    lift IS ranking by PMI (log is monotonic), and the score stays a
    single IEEE division of two sub-2^53 integers — value-exact on
    any engine, the same log-free-rational trick as BM25's idf
    (retrieval.py).

    Scale shape: one token explode feeds BOTH counts (adjacent-pair
    transform + unigram groupBy, each with map-side combine); the
    ``min_pair`` filter prunes the pair table BEFORE any join; the
    unigram table is vocabulary-sized, so both enrichment joins
    broadcast; T is one broadcast scalar row. TakeOrdered top-k with
    a full (lift desc, a, b) tie-break keeps the limit deterministic.
    """
    toks = (df.select(F.split(F.lower(F.col(text)), " ").alias("_toks"))
              .filter(F.size("_toks") >= 2))
    pairs = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(_toks) - 1), "
        "i -> struct(element_at(_toks, i) AS a, "
        "element_at(_toks, i + 1) AS b))")).alias("p")).select("p.a", "p.b")
    n_ab = (pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
                 .filter(F.col("n_ab") >= min_pair))
    uni = (toks.select(F.explode("_toks").alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("n")))
    tot = uni.agg(F.sum("n").cast("long").alias("total_tokens"))
    out = (n_ab
           .join(F.broadcast(uni.select(F.col("w").alias("a"),
                                        F.col("n").alias("n_a"))), "a")
           .join(F.broadcast(uni.select(F.col("w").alias("b"),
                                        F.col("n").alias("n_b"))), "b")
           .crossJoin(F.broadcast(tot)))
    return (out.select("a", "b", "n_ab", "n_a", "n_b", "total_tokens",
                       ((F.col("n_ab") * F.col("total_tokens"))
                        / (F.col("n_a") * F.col("n_b"))).alias("lift"))
               .orderBy(F.desc("lift"), "a", "b").limit(topk))


def sql_collocations(source: str, text: str = "text", min_pair: int = 5,
                     topk: int = 30) -> str:
    """DuckDB mirror of ``collocations`` (1-indexed lists; range(1, n)
    is exclusive of n, matching sequence(1, n-1))."""
    return f"""WITH co_tok AS (
  SELECT STR_SPLIT(LOWER({text}), ' ') AS toks FROM {source}
  WHERE LEN(STR_SPLIT(LOWER({text}), ' ')) >= 2),
co_pairs AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM co_tok, UNNEST(range(1, LEN(toks))) AS r(i)),
co_nab AS (
  SELECT a, b, COUNT(*) AS n_ab FROM co_pairs GROUP BY a, b
  HAVING COUNT(*) >= {min_pair}),
co_uni AS (
  SELECT w, COUNT(*) AS n
  FROM (SELECT UNNEST(toks) AS w FROM co_tok) GROUP BY w),
co_tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM co_uni)
SELECT p.a, p.b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
       t.total_tokens,
       (CAST(p.n_ab AS BIGINT) * t.total_tokens)
         / CAST(CAST(ua.n AS BIGINT) * CAST(ub.n AS BIGINT) AS DOUBLE)
         AS lift
FROM co_nab p
JOIN co_uni ua ON p.a = ua.w
JOIN co_uni ub ON p.b = ub.w
CROSS JOIN co_tot t
ORDER BY lift DESC, p.a, p.b LIMIT {topk}"""


def ngram_containment_pairs(df: DataFrame, key: str = "doc_id",
                            text: str = "text", block: str | None = None,
                            k: int = 3,
                            threshold: float = 0.8) -> DataFrame:
    """DIRECTED word-k-gram containment -> (id_src, id_dst,
    containment = |src ∩ dst| / |src|): how much of SRC's shingle set
    appears in DST — the asymmetric near-dup test Jaccard misses. A
    short quote embedded in a long article scores containment ~1.0
    (quote -> article) while its Jaccard is tiny; this is the
    subset-absorption rule ("drop the fragment, keep the superset")
    real dedup pipelines apply after symmetric near-dup.

    Same plan as ngram_jaccard_pairs (one shingle explode, one
    equi-join with ``block`` limiting candidates — never a cartesian,
    one map-side-combined intersection count); both directions of each
    undirected intersection row emit from the SAME joined frame, so
    the asymmetric scores cost no extra shuffle."""
    sh = df.select(F.col(key), *([F.col(block)] if block else []),
                   F.explode(_shingles(F.col(text), k)).alias("shingle"))
    n_sh = sh.groupBy(key).agg(F.countDistinct("shingle").alias("n_sh"))
    join_keys = ["shingle"] + ([block] if block else [])
    a = sh.select(*([F.col(key).alias("id_a"), F.col("shingle")]
                    + ([F.col(block)] if block else [])))
    b = sh.select(*([F.col(key).alias("id_b"), F.col("shingle")]
                    + ([F.col(block)] if block else [])))
    inter = (a.join(b, join_keys).filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    na = n_sh.select(F.col(key).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = n_sh.select(F.col(key).alias("id_b"), F.col("n_sh").alias("n_b"))
    j = inter.join(na, "id_a").join(nb, "id_b")
    d1 = j.select(F.col("id_a").alias("id_src"),
                  F.col("id_b").alias("id_dst"),
                  (F.col("n_inter").cast("double")
                   / F.col("n_a").cast("double")).alias("containment"))
    d2 = j.select(F.col("id_b").alias("id_src"),
                  F.col("id_a").alias("id_dst"),
                  (F.col("n_inter").cast("double")
                   / F.col("n_b").cast("double")).alias("containment"))
    return (d1.unionByName(d2)
            .filter(F.col("containment") >= threshold))


def ngram_jaccard_prefix_pairs(df: DataFrame, key: str = "doc_id",
                               text: str = "text", k: int = 3,
                               threshold: float = 0.5,
                               block: str | None = None) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs — the AllPairs/PPJoin
    candidate reduction (Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW 2007; Chaudhuri et al.'s prefix filter —
    published literature): identical OUTPUT to ``ngram_jaccard_pairs``
    at the same threshold, from a plan that joins only each document's
    PREFIX shingles instead of all of them.

    Prefix filter: order every document's shingles by ascending global
    document frequency (ties by the shingle string — a strict total
    order), keep the first ``n - ceil(t*n) + 1``; any pair with
    Jaccard >= t must share at least one prefix token, so the prefix
    self-join loses no true pair. Because prefixes hold each
    document's RAREST shingles, the boilerplate shingle shared by a
    million pages (the quadratic blow-up of the naive shingle join)
    almost never reaches the join — at 100 TB this is the difference
    between candidates ~ sum of rare-token df^2 and candidates ~ df^2
    of "click here to subscribe".

    Plan: one shingle explode -> global df rollup (map-side combine)
    -> per-doc WindowGroupLimit prefix -> prefix self-join (candidate
    pairs, distinct) -> exact verification joining the candidates back
    to the FULL shingle sets -> the same final Jaccard filter
    expression as the naive operator, so equality is bit-for-bit.
    Use a dyadic ``threshold`` (0.5, 0.25, 0.75) when mirroring in an
    oracle so ceil(t*n) is float-exact.

    Measured (r4, local[32], honesty note): at sandbox scale the two
    plans are comparable — 7.3s vs 8.8s on the 5k-doc sf0.1 table, and
    a planted-boilerplate 2k-doc corpus (13 shingles with df=2000,
    i.e. ~52M naive intersect rows) ran dead even, because Spark chews
    50M cheap rows in seconds while the prefix plan pays a ranking
    window plus a verify join back. The filter's value is asymptotic:
    naive candidates grow with sum(df^2) over COMMON shingles (one
    df=10M boilerplate line is 10^14 intersect rows — unpayable),
    prefix candidates with df^2 over each doc's RAREST shingles.
    Below ~10^5 docs per block, prefer the naive operator's simpler
    plan."""
    from pyspark.sql.window import Window

    sh = df.select(F.col(key), *([F.col(block)] if block else []),
                   F.explode(_shingles(F.col(text), k)).alias("shingle"))
    n_sh = sh.groupBy(key).agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(key).orderBy("_df", "shingle")
    ranked = (sh.join(dfreq, "shingle")
              .withColumn("_pos", F.row_number().over(w))
              .join(n_sh, key))
    plen = (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1)
    prefix = ranked.filter(F.col("_pos") <= plen)
    pa = prefix.select(*([F.col(key).alias("id_a"), F.col("shingle")]
                         + ([F.col(block)] if block else [])))
    pb = prefix.select(*([F.col(key).alias("id_b"), F.col("shingle")]
                         + ([F.col(block)] if block else [])))
    jk = ["shingle"] + ([block] if block else [])
    cand = (pa.join(pb, jk).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    # exact verification on candidates only: count the full-set
    # intersection per surviving pair
    full_a = sh.select(F.col(key).alias("id_a"), F.col("shingle"))
    full_b = sh.select(F.col(key).alias("id_b"), F.col("shingle"))
    inter = (cand.join(full_a, "id_a").join(full_b, ["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    na = n_sh.select(F.col(key).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = n_sh.select(F.col(key).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (inter.join(na, "id_a").join(nb, "id_b")
           .withColumn("jaccard",
                       F.col("n_inter").cast("double")
                       / (F.col("n_a") + F.col("n_b")
                          - F.col("n_inter")).cast("double")))
    return (out.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def edit_distance_join(df: DataFrame, d: int = 2, q: int = 2,
                       key: str = "doc_id", col: str = "title") -> DataFrame:
    """Edit-distance similarity join: all pairs with
    ``levenshtein(a, b) <= d``, found without the all-pairs cross join
    via q-gram prefix filtering (Ed-Join — Xiao, Wang & Lin, VLDB'08;
    published literature). The title/URL near-match dedup FAGI's
    Jaro-Winkler discovery stage approximates, here with a hard
    guarantee: blocking has NO false negatives, so the OUTPUT equals
    the naive all-pairs join and an oracle can check it without
    mirroring the blocking at all.

    Filter theory: pad each string with q-1 sentinel chars on both
    ends, take its distinct positional q-grams; one edit destroys at
    most q grams, so ed(a,b) <= d implies at most q*d of a's distinct
    grams are missing from b's set — overlap >= max(|Ga|,|Gb|) - q*d,
    and by the prefix-filter theorem the first q*d+1 grams of each
    (ordered by ascending global document frequency, ties by the gram
    string — a strict total order) must intersect — provided the
    longer string has len > q*(d-1)+1 so the overlap bound is >= 1.
    Pairs where BOTH strings are shorter than that are found by a
    separate bounded side (see the short-string block below); padding
    alone does not close that hole.

    Plan shape (the same skeleton as ngram_jaccard_prefix_pairs): one
    gram explode -> global df rollup (map-side combine) -> per-key
    WindowGroupLimit prefix -> prefix self-join on the gram -> distinct
    candidate pairs -> length filter |len_a - len_b| <= d -> exact
    JVM ``levenshtein`` verify. Prefixes hold each string's RAREST
    grams, so the boilerplate gram shared by millions of titles never
    reaches the join; candidates grow with rare-gram df^2, not corpus^2.

    Returns (id_a, id_b, dist) with id_a < id_b, dist <= d.
    """
    if q < 2:
        raise ValueError("edit_distance_join needs q >= 2 (padding math)")
    pad_l = "\x01" * (q - 1)
    pad_r = "\x02" * (q - 1)
    s = df.select(F.col(key).alias("_id"), F.col(col).alias("_s"),
                  F.concat(F.lit(pad_l), F.coalesce(F.col(col), F.lit("")),
                           F.lit(pad_r)).alias("_p"))
    # expr form: substring's pos argument must be the lambda variable,
    # which the Python DSL's F.substring does not accept
    grams = s.select(
        "_id",
        F.explode(F.array_distinct(F.expr(
            f"transform(sequence(1, length(_p) - {q - 1}), "
            f"i -> substring(_p, i, {q}))"))).alias("gram"))
    from pyspark.sql.window import Window
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "gram")
    prefix = (grams.join(dfreq, "gram")
              .withColumn("_pos", F.row_number().over(w))
              .filter(F.col("_pos") <= q * d + 1))
    pa = prefix.select(F.col("_id").alias("id_a"), "gram")
    pb = prefix.select(F.col("_id").alias("id_b"), "gram")
    cand = (pa.join(pb, "gram").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b"))
    # Short-string hole: the overlap bound max(|Ga|,|Gb|) - q*d goes
    # vacuous when BOTH strings have len <= q*(d-1)+1 (gram sets can be
    # fully disjoint at ed <= d, e.g. '' vs 'a' at q=2). Those pairs
    # come from a dedicated side: distinct short VALUES (a bounded
    # universe — at most |alphabet|^(q*(d-1)+1) strings exist that
    # short) cross-paired, then mapped back to ids. The main prefix
    # join stays the scale path for everything else.
    short_len = q * (d - 1) + 1
    shorts = (s.filter(F.length(F.coalesce("_s", F.lit(""))) <= short_len)
              .select("_id", F.coalesce("_s", F.lit("")).alias("_v")))
    sv = shorts.select("_v").distinct()
    vpairs = (sv.select(F.col("_v").alias("_va"))
              .crossJoin(F.broadcast(sv.select(F.col("_v").alias("_vb"))))
              .filter(F.levenshtein("_va", "_vb") <= d))
    cand_short = (shorts.select(F.col("_id").alias("id_a"),
                                F.col("_v").alias("_va"))
                  .join(vpairs, "_va")
                  .join(shorts.select(F.col("_id").alias("id_b"),
                                      F.col("_v").alias("_vb")), "_vb")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b"))
    cand = cand.unionByName(cand_short).distinct()
    sa = s.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    sb = s.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .filter(F.abs(F.length("_sa") - F.length("_sb")) <= d)
            .withColumn("dist", F.levenshtein("_sa", "_sb").cast("long"))
            .filter(F.col("dist") <= d)
            .select("id_a", "id_b", "dist"))


def grouped_quantiles(df: DataFrame, col: str, qs,
                      by: str = "lang") -> DataFrame:
    """Exact per-group quantiles by distributed selection (type-1 /
    lower-step definition: the smallest value v whose cumulative count
    reaches ceil(q*n)) — the deterministic, SQL-mirrorable alternative
    to approx_percentile for corpus length audits (p50/p90 token
    counts per language drive truncation and packing budgets).

    Scale shape: ONE rollup to (group, value, count) — cardinality is
    distinct VALUES per group, not rows — then a cumulative window
    over that aggregate (stencil-after-aggregate, the cells.py
    principle), a broadcast-sized (group x q) threshold frame, and a
    min-per-(group,q) reduce. Never a window over the raw table, never
    a global sort. ceil(q*n) is the only float op and both engines
    compute it identically.

    Returns (by, q, n, q_value).
    """
    from pyspark.sql.window import Window

    qs = [float(q) for q in qs]
    if not qs or any(q <= 0 or q > 1 for q in qs):
        raise ValueError("grouped_quantiles needs quantiles in (0, 1]")
    cnt = df.groupBy(by, col).agg(F.count(F.lit(1)).alias("_c"))
    w = (Window.partitionBy(by).orderBy(col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = cnt.withColumn("_cum", F.sum("_c").over(w))
    tot = df.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
    qdf = (tot.sparkSession
           .createDataFrame([(q,) for q in qs], "q double"))
    thr = (tot.crossJoin(F.broadcast(qdf))
           .withColumn("_thr",
                       F.ceil(F.col("q") * F.col("n").cast("double"))
                       .cast("long")))
    return (cum.join(thr, by)
            .filter(F.col("_cum") >= F.col("_thr"))
            .groupBy(by, "q", "n")
            .agg(F.min(col).alias("q_value")))


def simpson_diversity(df: DataFrame, by: str = "lang", key: str = "doc_id",
                      text: str = "text") -> DataFrame:
    """Simpson diversity of the token distribution per group — the
    transcendental-free concentration/diversity index (entropy's
    rational cousin): simpson = sum_i c_i^2 / N^2 is the probability
    two random tokens coincide; gini_simpson = 1 - simpson. A corpus
    health gauge (template-flooded sources spike simpson) that stays
    value-exact because the c_i^2 sum is an exact BIGINT
    (order-independent) and the rest is two mirrored IEEE ops.

    One explode -> (group, token) rollup -> per-group sum of squared
    counts, all map-side combinable. Integer domain: exact while the
    squared counts sum below 2^63 (count a 100-TB token stream in
    per-shard buckets first).

    Returns (by, n_tokens, n_distinct, sum_c2, simpson, gini_simpson).
    """
    toks = df.select(
        F.col(by),
        F.explode(F.split(F.coalesce(F.col(text), F.lit("")), " "))
        .alias("_tok"))
    cnt = toks.groupBy(by, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    g = (cnt.groupBy(by)
         .agg(F.sum("_c").alias("n_tokens"),
              F.count(F.lit(1)).alias("n_distinct"),
              F.sum(F.col("_c") * F.col("_c")).alias("sum_c2")))
    simpson = (F.col("sum_c2").cast("double")
               / (F.col("n_tokens") * F.col("n_tokens")).cast("double"))
    return g.select(by, "n_tokens", "n_distinct", "sum_c2",
                    simpson.alias("simpson"),
                    (F.lit(1.0) - simpson).alias("gini_simpson"))


def source_jaccard_matrix(df: DataFrame, by: str = "source",
                          text: str = "text") -> DataFrame:
    """Pairwise vocabulary-overlap (Jaccard) matrix between corpus
    slices — the dataset-audit view that catches two "different"
    sources serving the same mirrored content before dedup even runs.

    Distinct (slice, token) -> per-slice vocab sizes -> token
    equi-join across slice pairs (a < b) -> inclusion-exclusion
    Jaccard. The join key is the TOKEN, so work scales with shared
    vocabulary, never |slices|^2 x corpus; slice count itself is
    assumed dimension-sized (sources, languages, shards).

    Returns (src_a, src_b, n_inter, n_a, n_b, jaccard).
    """
    vocab = (df.select(F.col(by).alias("_s"),
                       F.explode(F.split(F.coalesce(F.col(text), F.lit("")),
                                         " ")).alias("_tok"))
             .distinct())
    sizes = vocab.groupBy("_s").agg(F.count(F.lit(1)).alias("_nv"))
    a = vocab.select(F.col("_s").alias("src_a"), "_tok")
    b = vocab.select(F.col("_s").alias("src_b"), "_tok")
    inter = (a.join(b, "_tok")
             .filter(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    out = (inter
           .join(F.broadcast(sizes.select(F.col("_s").alias("src_a"),
                                          F.col("_nv").alias("n_a"))),
                 "src_a")
           .join(F.broadcast(sizes.select(F.col("_s").alias("src_b"),
                                          F.col("_nv").alias("n_b"))),
                 "src_b"))
    return out.select(
        "src_a", "src_b", "n_inter", "n_a", "n_b",
        (F.col("n_inter").cast("double")
         / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"))
        .alias("jaccard"))


def global_rank(df: DataFrame, sort_col: str, key: str = "doc_id",
                n_buckets: int = 64) -> DataFrame:
    """Exact dense global ROW_NUMBER over (sort_col, key) WITHOUT the
    one-partition window anti-pattern: the classic two-pass
    distributed rank. Pass 1 derives ``n_buckets`` range boundaries by
    exact distributed selection (grouped_quantiles — deterministic, no
    sampling) and counts rows per bucket; pass 2 ranks inside each
    bucket (a PARTITIONED window) and adds the broadcast prefix
    offset. Equal sort values always land in one bucket (strict
    boundary comparison), so within-bucket (sort, key) order IS global
    order. The only driver materialization is the boundary list
    (n_buckets-1 values, bounded by design).

    Skew note: a single sort value holding a huge fraction of rows
    makes one hot bucket — the same hot-key caveat as any rank; salt
    upstream if the key domain allows.

    Returns df plus a 1-based ``rank`` column.
    """
    from pyspark.sql.window import Window

    qs = [i / n_buckets for i in range(1, n_buckets)]
    bsrc = df.select(F.lit(0).alias("_g"), F.col(sort_col).alias("_v"))
    bnds = sorted(
        r["q_value"]
        for r in grouped_quantiles(bsrc, "_v", qs, by="_g").collect())
    bucket = sum(
        (F.col(sort_col) > F.lit(b)).cast("long") for b in bnds) \
        if bnds else F.lit(0).cast("long")
    t = df.withColumn("_bkt", bucket)
    per = t.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    # one-group window over the per-bucket COUNTS frame only —
    # O(n_buckets) rows by construction, never the raw table
    wb = (Window.partitionBy(F.lit(0)).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = per.withColumn("_off", F.coalesce(F.sum("_c").over(wb),
                                            F.lit(0)))
    wl = Window.partitionBy("_bkt").orderBy(sort_col, key)
    return (t.withColumn("_lr", F.row_number().over(wl))
            .join(F.broadcast(off.select("_bkt", "_off")), "_bkt")
            .withColumn("rank", (F.col("_off") + F.col("_lr")).cast("long"))
            .drop("_bkt", "_lr", "_off"))


def sorted_neighborhood_pairs(df: DataFrame, sort_col: str,
                              key: str = "doc_id",
                              window: int = 5,
                              n_buckets: int = 64) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo SIGMOD'95):
    candidate pairs are rows within ``window`` positions of each other
    in the global (sort_col, key) order — the third classic ER
    blocking paradigm beside LSH bands and grid cells, best when
    similarity correlates with a sortable key (titles, URLs,
    timestamps).

    Built on ``global_rank`` (two-pass, no global window); pairs then
    come from a rank-block equi-join: with d = window - 1, row at
    rank r joins blocks r//d and r//d + 1, so every pair within
    distance d co-locates in at least one block and the filter
    1 <= rb - ra <= d keeps each exactly once (pairs at distance in
    (0, d] appear in exactly one shared block... both blocks can hold
    the pair only when equal, which the strict inequality excludes;
    a DISTINCT guards the double-block overlap regardless).

    Returns (id_a, id_b, rank_a, rank_b) with rank_a < rank_b.
    """
    d = int(window) - 1
    if d < 1:
        raise ValueError("sorted_neighborhood_pairs needs window >= 2")
    r = global_rank(df, sort_col, key=key, n_buckets=n_buckets) \
        .select(F.col(key).alias("_id"), "rank")
    probe = r.select(F.col("_id").alias("id_a"),
                     F.col("rank").alias("rank_a"),
                     ((F.col("rank") - 1) / d).cast("long").alias("_blk"))
    bld = r.select(F.col("_id").alias("id_b"),
                   F.col("rank").alias("rank_b"),
                   F.explode(F.array(
                       ((F.col("rank") - 1) / d).cast("long"),
                       ((F.col("rank") - 1) / d).cast("long") - 1))
                   .alias("_blk"))
    return (probe.join(bld, "_blk")
            .filter((F.col("rank_b") - F.col("rank_a") >= 1)
                    & (F.col("rank_b") - F.col("rank_a") <= d))
            .select("id_a", "id_b", "rank_a", "rank_b")
            .distinct())


def lexical_richness(df: DataFrame, key: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """Per-document lexical-richness profile: whitespace token count,
    distinct types, hapax legomena (frequency-1 tokens), type-token
    ratio and hapax fraction — the vocabulary-diversity half of a
    quality panel (template/spam pages repeat a tiny vocabulary:
    low TTR; generated keyword-stuffing is all hapax: TTR ~ 1), the
    concentration complement of ``simpson_diversity``.

    One explode + one (doc, token) rollup + one doc rollup — both
    map-side combinable; ratios are single IEEE divisions of exact
    BIGINTs. Empty/NULL text reports 0 counts and NULL ratios.

    Returns (key, n_tokens, n_types, n_hapax, ttr, hapax_frac).
    """
    toks = df.select(
        F.col(key),
        F.explode(F.filter(F.split(F.coalesce(F.col(text), F.lit("")), " "),
                           lambda t: t != "")).alias("_t"))
    per = (toks.groupBy(key, "_t")
           .agg(F.count(F.lit(1)).alias("_c")))
    agg = (per.groupBy(key)
           .agg(F.sum("_c").cast("long").alias("n_tokens"),
                F.count(F.lit(1)).cast("long").alias("n_types"),
                F.sum((F.col("_c") == 1).cast("long")).cast("long")
                .alias("n_hapax")))
    return (df.select(F.col(key))
            .join(agg, key, "left")
            .select(F.col(key),
                    F.coalesce("n_tokens", F.lit(0).cast("long"))
                    .alias("n_tokens"),
                    F.coalesce("n_types", F.lit(0).cast("long"))
                    .alias("n_types"),
                    F.coalesce("n_hapax", F.lit(0).cast("long"))
                    .alias("n_hapax"))
            .withColumn("ttr", F.when(
                F.col("n_tokens") > 0,
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")))
            .withColumn("hapax_frac", F.when(
                F.col("n_tokens") > 0,
                F.col("n_hapax").cast("double")
                / F.col("n_tokens").cast("double"))))


def vocab_coverage(df: DataFrame, tops: list, text: str = "text") -> DataFrame:
    """Vocabulary-coverage ladder: for each candidate vocabulary size
    N, the fraction of total token MASS covered by the N most
    frequent types — the Zipf-head report that sizes a tokenizer
    vocab or a stop list ("the top 50k types cover 98.2% of tokens").

    One corpus token-frequency rollup (map-side combinable), then ONE
    TakeOrderedAndProject of max(tops) (type, freq) rows — never a
    global sort of the full vocabulary — broadcast back as a literal
    aggregate. Ties at the boundary break by (freq DESC, token ASC),
    stated so the oracle can mirror the exact cutoff. Counts are
    exact BIGINTs; covered_frac is one division per row.

    Returns (top_n, n_types_total, total_tokens, covered_tokens,
    covered_frac) — one row per requested N.
    """
    tops = sorted(int(t) for t in tops)
    if not tops or tops[0] <= 0:
        raise ValueError("vocab_coverage needs positive top-N sizes")
    toks = df.select(
        F.explode(F.filter(F.split(F.coalesce(F.col(text), F.lit("")), " "),
                           lambda t: t != "")).alias("_t"))
    freq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    stats = freq.agg(F.count(F.lit(1)).cast("long").alias("n_types_total"),
                     F.sum("_c").cast("long").alias("total_tokens"))
    head = (freq.orderBy(F.col("_c").desc(), F.col("_t").asc())
            .limit(tops[-1])
            .withColumn("_r", F.row_number().over(
                Window.orderBy(F.col("_c").desc(), F.col("_t").asc()))))
    cov = head.agg(*[
        F.sum(F.when(F.col("_r") <= t, F.col("_c")).otherwise(0))
        .cast("long").alias(f"_cov{i}") for i, t in enumerate(tops)])
    j = cov.crossJoin(F.broadcast(stats))
    stacked = j.select(
        F.explode(F.array(*[
            F.struct(F.lit(t).cast("long").alias("top_n"),
                     F.col("n_types_total"), F.col("total_tokens"),
                     F.coalesce(F.col(f"_cov{i}"), F.lit(0)).cast("long")
                     .alias("covered_tokens"))
            for i, t in enumerate(tops)])).alias("s")).select("s.*")
    return stacked.withColumn(
        "covered_frac",
        F.when(F.col("total_tokens") > 0,
               F.col("covered_tokens").cast("double")
               / F.col("total_tokens").cast("double")))


def trending_terms(df: DataFrame, period_col: str, min_count: int = 10,
                   text: str = "text") -> DataFrame:
    """Term-burst detection across corpus snapshots: per (token,
    period) z-score of the token's count against its own zero-
    completed period history — "which words spiked in THIS crawl"
    (breaking-news vocabulary, spam campaign onsets, dataset drift
    between dumps). The token-axis twin of events.cell_burst_scores.

    Scale guard: only tokens with total count >= ``min_count`` enter
    the zero-completion (vocab x T explodes otherwise) — a broadcast
    semi-join of the frequency rollup; completion then runs on
    qualifying-tokens x T rows over the global [pmin, pmax] period
    range. z = (n*x - S)/sqrt(n*Q - S^2): exact BIGINTs inside, one
    division + one sanctioned sqrt; NULL for constant series.

    Returns (token, period, cnt, n_periods, z_score).
    """
    toks = df.select(
        F.col(period_col).cast("long").alias("_p"),
        F.explode(F.filter(F.split(F.coalesce(F.col(text), F.lit("")), " "),
                           lambda t: t != "")).alias("_t"))
    keep = (toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_tot"))
            .filter(F.col("_tot") >= int(min_count)).select("_t"))
    toks = toks.join(F.broadcast(keep), "_t")
    cnt = toks.groupBy("_t", "_p").agg(F.count(F.lit(1)).alias("_x"))
    rng = cnt.agg(F.min("_p").alias("_pmin"), F.max("_p").alias("_pmax"))
    series = (cnt.select("_t").distinct()
              .crossJoin(F.broadcast(rng))
              .select("_t", F.explode(F.sequence("_pmin", "_pmax"))
                      .alias("_p"))
              .join(cnt, ["_t", "_p"], "left")
              .select("_t", "_p",
                      F.coalesce("_x", F.lit(0)).cast("long").alias("_x")))
    stats = (series.groupBy("_t")
             .agg(F.count(F.lit(1)).cast("long").alias("_n"),
                  F.sum("_x").cast("long").alias("_s"),
                  F.sum(F.col("_x") * F.col("_x")).cast("long")
                  .alias("_q")))
    j = series.join(stats, "_t")
    num = F.col("_n") * F.col("_x") - F.col("_s")
    den = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    return j.select(
        F.col("_t").alias("token"), F.col("_p").alias("period"),
        F.col("_x").alias("cnt"), F.col("_n").alias("n_periods"),
        F.when(den > 0, num.cast("double") / F.sqrt(den.cast("double")))
        .alias("z_score"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3, bits: int = 64,
                  n_bands: int = 4, key: str = "doc_id",
                  text: str = "text",
                  hash_family: str = "xxhash") -> DataFrame:
    """SimHash near-duplicate candidate JOIN — the banded companion
    to ``with_simhash``'s fingerprints: pairs whose signatures agree
    on at least one of ``n_bands`` equal bit-slices, verified by
    exact Hamming distance <= ``max_hamming``. By pigeonhole the
    blocking is LOSSLESS whenever max_hamming < n_bands (a pair with
    h < n_bands differing bits cannot differ in every band), so this
    is exact near-dup at corpus scale with NO all-pairs stage: one
    band posexplode + one equi-join on (band index, band value) + a
    bit_count filter — the Manku/Jain/Sarma WWW'07 deployment shape.

    Hot-band caveat: a degenerate band value (e.g. all-zero slices
    from empty docs) concentrates a bucket; upstream length filters
    are the guard, same as minhash's max_bucket note.

    Returns distinct (id_a, id_b, hamming) with id_a < id_b.
    """
    if not (0 <= int(max_hamming) < int(n_bands)):
        raise ValueError("lossless banding needs max_hamming < n_bands")
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    width = bits // n_bands
    mask = (1 << width) - 1
    sig = with_simhash(df, text=text, bits=bits, key=key,
                       hash_family=hash_family).select(
        F.col(key).alias("_id"), "simhash")
    bands = sig.select(
        "_id", "simhash",
        F.posexplode(F.array(*[
            (F.shiftrightunsigned("simhash", b * width)
             .bitwiseAND(F.lit(mask))).cast("long")
            for b in range(n_bands)])).alias("band_idx", "band_val"))
    a = bands.select(F.col("_id").alias("id_a"),
                     F.col("simhash").alias("_sa"),
                     "band_idx", "band_val")
    b = bands.select(F.col("_id").alias("id_b"),
                     F.col("simhash").alias("_sb"),
                     "band_idx", "band_val")
    h = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (a.join(b, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(h <= int(max_hamming))
            .select("id_a", "id_b", h.cast("long").alias("hamming"))
            .distinct())


def source_rollup(df: DataFrame, group: str = "source",
                  key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-source corpus-health mart: document count, byte volume,
    mean length, language spread, and the exact-duplicate fraction —
    the one-screen rollup a crawl operator reads to decide which
    feeds to throttle or re-fetch (a source whose dup_frac jumps is
    re-serving cached pages; one whose lang spread explodes changed
    its boilerplate).

    Duplicate fraction: md5-per-doc -> per-(source, md5) counts ->
    docs in groups of size > 1, all one rollup chain with map-side
    combine; ratios are single IEEE divisions of exact BIGINTs.

    Returns (source, n_docs, total_chars, mean_chars, n_langs,
    n_dup_docs, dup_frac).
    """
    base = df.select(
        F.col(group).alias("_g"), F.col(key),
        F.col("lang"),
        F.length(F.coalesce(F.col(text), F.lit(""))).cast("long")
        .alias("_len"),
        F.md5(F.coalesce(F.col(text), F.lit(""))).alias("_h"))
    per_hash = (base.groupBy("_g", "_h")
                .agg(F.count(F.lit(1)).alias("_c")))
    dups = (per_hash.groupBy("_g")
            .agg(F.sum(F.when(F.col("_c") > 1, F.col("_c"))
                       .otherwise(0)).cast("long").alias("n_dup_docs")))
    agg = (base.groupBy("_g")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("_len").cast("long").alias("total_chars"),
                F.count_distinct("lang").cast("long").alias("n_langs")))
    return (agg.join(dups, "_g")
            .select(F.col("_g").alias("source"), "n_docs", "total_chars",
                    (F.col("total_chars").cast("double")
                     / F.col("n_docs").cast("double")).alias("mean_chars"),
                    "n_langs", "n_dup_docs",
                    (F.col("n_dup_docs").cast("double")
                     / F.col("n_docs").cast("double")).alias("dup_frac")))


def gini_concentration(df: DataFrame, value: str, key: str,
                       n_buckets: int = 64) -> DataFrame:
    """Gini coefficient of an integer value distribution (traffic per
    cell, documents per host, tokens per author): 0 = perfectly even,
    -> 1 = one key hogs everything — THE inequality scalar a capacity
    planner reads next to heavy-hitter lists (a Gini jump says the
    corpus is concentrating even when the top-k names look stable).

    Exact and distributed: values rank by the two-pass global_rank
    (no one-partition window), then the textbook identity
    G = (2*S_r - (n+1)*S) / (n*S) with S_r = sum(rank_i * x_i) and
    S = sum(x_i) over exact BIGINTs — one mirrored division. Ties
    rank deterministically by (value, key), under which the identity
    still holds because tied values are interchangeable in S_r's sum.
    Domain: rank * value sums must stay inside int64.

    Returns one row (n_keys, sum_values, sum_rank_value, gini);
    gini NULL when S = 0 or n < 2.
    """
    ranked = global_rank(df.select(F.col(key).alias("_k"),
                                   F.col(value).cast("long").alias("_v")),
                         "_v", key="_k", n_buckets=n_buckets)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_v").cast("long").alias("sum_values"),
        F.sum(F.col("rank") * F.col("_v")).cast("long")
        .alias("sum_rank_value"))
    g = (F.lit(2) * F.col("sum_rank_value")
         - (F.col("n_keys") + 1) * F.col("sum_values")).cast("double") \
        / (F.col("n_keys") * F.col("sum_values")).cast("double")
    return agg.select(
        "n_keys", "sum_values", "sum_rank_value",
        F.when((F.col("sum_values") > 0) & (F.col("n_keys") >= 2), g)
        .alias("gini"))


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement between two label
    columns — the number that separates "our two quality classifiers
    agree 90%" from "they agree no better than chance" (po vs pe),
    the standard gate before trusting auto-labels as training signal.
    Rows where either label is NULL drop (stated).

    One (a, b) confusion rollup; po from the diagonal, pe from the
    margin products via the counts identity
    kappa = (n*sum_diag - sum_c ma_c*mb_c) / (n^2 - sum_c ma_c*mb_c)
    — exact BIGINTs, ONE mirrored division (the po/pe form divides
    twice; this algebraic form divides once).

    Returns one row (n_rows, n_agree, chance_pairs, kappa); kappa
    NULL when the denominator is 0 (degenerate single-label data).
    """
    base = (df.select(F.col(rater_a).alias("_a"),
                      F.col(rater_b).alias("_b"))
            .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull()))
    conf = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    ma = conf.groupBy("_a").agg(F.sum("_c").alias("_ma"))
    mb = conf.groupBy(F.col("_b").alias("_a")).agg(F.sum("_c").alias("_mb"))
    chance = (ma.join(mb, "_a")
              .agg(F.coalesce(F.sum(F.col("_ma") * F.col("_mb")),
                              F.lit(0)).cast("long").alias("chance_pairs")))
    tot = conf.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c"))
              .otherwise(0)).cast("long").alias("n_agree"))
    j = tot.crossJoin(chance)
    den = F.col("n_rows") * F.col("n_rows") - F.col("chance_pairs")
    kappa = (F.col("n_rows") * F.col("n_agree")
             - F.col("chance_pairs")).cast("double") / den.cast("double")
    return j.select("n_rows", "n_agree", "chance_pairs",
                    F.when(den != 0, kappa).alias("kappa"))


def vocab_drift(df: DataFrame, period_col: str, top_n: int = 100,
                text: str = "text") -> DataFrame:
    """Cross-snapshot vocabulary drift: Jaccard overlap of the top-N
    token vocabularies of ADJACENT corpus snapshots — the one-line
    answer to "did dump 42 change character" before any model sees it
    (a drifting crawl shifts its head vocabulary; trending_terms says
    WHICH tokens, this says HOW MUCH overall).

    Per period the top-N is deterministic ((freq DESC, token ASC) —
    the vocab_coverage cutoff rule) via a PARTITIONED window over the
    per-period frequency rollup; adjacent periods meet in a token
    equi-join and Jaccard is inclusion-exclusion over exact BIGINTs,
    one division. Periods shorter than N tokens use their full
    vocabulary (sizes reported).

    Returns (period_a, period_b, n_a, n_b, n_shared, jaccard) for
    each adjacent (p, p+1) pair present in the data.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(period_col).cast("long").alias("_p"),
        F.explode(F.filter(F.split(F.coalesce(F.col(text), F.lit("")), " "),
                           lambda t: t != "")).alias("_t"))
    freq = toks.groupBy("_p", "_t").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy("_p").orderBy(F.col("_c").desc(),
                                         F.col("_t").asc())
    head = (freq.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= int(top_n))
            .select("_p", "_t"))
    sizes = head.groupBy("_p").agg(F.count(F.lit(1)).alias("_n"))
    a = head.select(F.col("_p").alias("period_a"), "_t")
    b = head.select((F.col("_p") - 1).alias("period_a"),
                    F.col("_t").alias("_t2"))
    shared = (a.join(b, (a["period_a"] == b["period_a"])
                     & (a["_t"] == b["_t2"]))
              .groupBy(a["period_a"])
              .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    na = sizes.select(F.col("_p").alias("period_a"),
                      F.col("_n").alias("n_a"))
    nb = sizes.select((F.col("_p") - 1).alias("period_a"),
                      F.col("_n").alias("n_b"))
    return (na.join(nb, "period_a")
            .join(shared, "period_a", "left")
            .select(F.col("period_a").cast("long"),
                    (F.col("period_a") + 1).cast("long").alias("period_b"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.coalesce("n_shared", F.lit(0).cast("long"))
                    .alias("n_shared"))
            .withColumn("jaccard",
                        F.col("n_shared").cast("double")
                        / (F.col("n_a") + F.col("n_b")
                           - F.col("n_shared")).cast("double")))


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        id_col: str = "doc_id", text: str = "text",
                        mod: int = POLY_MOD) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram,
    slide a w-window over the hash sequence, keep each window's
    minimum (ties to the RIGHTMOST position), dedupe. Guarantees any
    shared substring of length >= k + w - 1 contributes a shared
    fingerprint — the local-dedup complement to MinHash (which
    samples globally per doc).

    Everything is column expressions on the poly-hash family
    (SQL-mirrorable like with_rolling_fingerprint): the k-gram hash
    array, the per-window argmin, and the distinct selection all run
    inside whole-stage codegen, map-only — no shuffle, no Python, no
    window functions (the w-window is an array slice, so no
    per-doc-ordered shuffle either). Cost is O(len * (k + w)) per doc
    in exchange for oracle exactness; an Arrow kernel with a true
    rolling hash + monotone deque is the O(len) swap-in at 100 TB.
    Docs shorter than k + w - 1 chars yield no fingerprints (no full
    window — stated).

    Returns (id_col, pos, fp) — pos is the 1-based k-gram start.
    """
    gram = (f"aggregate(transform(sequence(p, p + {k} - 1), "
            f"i -> ascii(substr({text}, i, 1))), 0L, "
            f"(acc, c) -> (acc * 31 + c) % {mod})")
    hs = (f"transform(sequence(1, length({text}) - {k} + 1), "
          f"p -> {gram})")
    sel = (f"array_distinct(transform(sequence(1, size(_hs) - {w} + 1), "
           f"i -> named_struct("
           f"'pos', i + {w} - array_position(reverse(slice(_hs, i, {w})), "
           f"array_min(slice(_hs, i, {w}))), "
           f"'fp', array_min(slice(_hs, i, {w})))))")
    return (df.filter(F.col(text).isNotNull()
                      & (F.length(text) >= k + w - 1))
            .select(id_col, F.expr(hs).alias("_hs"))
            .select(id_col, F.explode(F.expr(sel)).alias("_s"))
            .select(id_col, F.col("_s.pos").cast("long").alias("pos"),
                    F.col("_s.fp").alias("fp")))


def sql_winnow(k: int = 5, w: int = 4, id_expr: str = "doc_id",
               text: str = "text", mod: int = POLY_MOD) -> str:
    """DuckDB mirror of winnow_fingerprints (same fold, same
    rightmost-tie rule). Yields CTEs ``wn_h``/``wn_s``; select from
    ``wn_s``."""
    gram = (f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"LIST_TRANSFORM(RANGE(p, p + {k}), "
            f"i -> CAST(ASCII({text}[i]) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {mod})")
    sl = f"hs[i:i + {w} - 1]"
    return f"""wn_h AS (
  SELECT {id_expr} AS doc_id,
         LIST_TRANSFORM(RANGE(1, LENGTH({text}) - {k} + 2),
                        p -> {gram}) AS hs
  FROM documents
  WHERE {text} IS NOT NULL AND LENGTH({text}) >= {k} + {w} - 1),
wn_s AS (
  SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM (
    SELECT doc_id, UNNEST(LIST_TRANSFORM(
             RANGE(1, LEN(hs) - {w} + 2),
             i -> struct_pack(
               pos := i + {w} - LIST_POSITION(LIST_REVERSE({sl}),
                                              LIST_MIN({sl})),
               fp := LIST_MIN({sl})))) AS s
    FROM wn_h))"""


def cdc_chunks(df: DataFrame, k: int = 8, mask_bits: int = 5,
               id_col: str = "doc_id", text: str = "text",
               mod: int = POLY_MOD) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS boundary rule): a
    chunk ends at position p when the poly hash of the k-gram ending
    at p has its low ``mask_bits`` bits zero (expected chunk length
    2^mask_bits). Because boundaries depend only on local content,
    the same text chunked anywhere in the corpus yields the same
    chunks — the property that makes chunk-hash dedup robust to
    insertions (a byte edit only reshapes its own chunk, unlike
    fixed-width splitting where everything downstream shifts).

    Plain gear-free CDC: no min/max chunk clamp (the clamp is a
    sequential suppression rule — it would serialize the per-doc
    scan; stated). The final partial chunk always closes at
    end-of-text. All column/array expressions (k-gram hash array ->
    filtered boundary list -> per-chunk substring hash), map-only,
    whole-stage codegen, SQL-mirrorable.

    Returns (id_col, chunk_idx, start, length, chash) — start is
    1-based, chunk_idx 1-based in document order.
    """
    mask = (1 << mask_bits) - 1
    t = "_t"
    gram = (f"aggregate(transform(sequence(p - {k} + 1, p), "
            f"i -> ascii(substr({t}, i, 1))), 0L, "
            f"(acc, c) -> (acc * 31 + c) % {mod})")
    # Guard docs shorter than k: Spark's sequence(k, length) DESCENDS
    # (default step -1) when length < k, scanning positions past
    # end-of-text (ascii('') = 0) and fabricating boundaries where the
    # DuckDB mirror's RANGE(k, length + 1) is simply empty. Short docs
    # must yield exactly one whole-text chunk on both sides.
    ends = (f"array_sort(array_distinct(concat("
            f"CASE WHEN length({t}) >= {k} THEN "
            f"filter(transform(sequence({k}, length({t})), p -> "
            f"CASE WHEN {gram} % {mask + 1} = 0 THEN p ELSE -1 END), "
            f"p -> p > 0) ELSE CAST(array() AS ARRAY<INT>) END, "
            f"array(length({t})))))")
    chash = (f"aggregate(transform(sequence("
             f"CASE WHEN j = 1 THEN 1 ELSE element_at(_ends, j - 1) + 1 END, "
             f"element_at(_ends, j)), "
             f"i -> ascii(substr({t}, i, 1))), 0L, "
             f"(acc, c) -> (acc * 31 + c) % {mod})")
    chunks = (f"transform(sequence(1, size(_ends)), j -> named_struct("
              f"'chunk_idx', CAST(j AS BIGINT), "
              f"'start', CAST(CASE WHEN j = 1 THEN 1 "
              f"ELSE element_at(_ends, j - 1) + 1 END AS BIGINT), "
              f"'length', CAST(element_at(_ends, j) - CASE WHEN j = 1 "
              f"THEN 0 ELSE element_at(_ends, j - 1) END AS BIGINT), "
              f"'chash', {chash}))")
    return (df.filter(F.col(text).isNotNull() & (F.length(text) > 0))
            .select(id_col, F.col(text).alias("_t"))
            .withColumn("_ends", F.expr(ends))
            .select(id_col, F.explode(F.expr(chunks)).alias("_c"))
            .select(id_col, "_c.chunk_idx", "_c.start", "_c.length",
                    "_c.chash"))


def sql_cdc_chunks(k: int = 8, mask_bits: int = 5,
                   id_expr: str = "doc_id", text: str = "text",
                   src: str = "documents", mod: int = POLY_MOD) -> str:
    """DuckDB mirror of cdc_chunks. Yields CTEs ``cdc_e``/``cdc_c``;
    select doc_id, (c).* from ``cdc_c``."""
    mask = (1 << mask_bits) - 1
    gram = (f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"LIST_TRANSFORM(RANGE(p - {k} + 1, p + 1), "
            f"i -> CAST(ASCII({text}[i]) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {mod})")
    chash = (f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
             f"LIST_TRANSFORM(RANGE(CASE WHEN j = 1 THEN 1 "
             f"ELSE ends[j - 1] + 1 END, ends[j] + 1), "
             f"i -> CAST(ASCII(t[i]) AS BIGINT))), "
             f"(acc, c) -> (acc * 31 + c) % {mod})")
    return f"""cdc_e AS (
  SELECT {id_expr} AS doc_id, {text} AS t,
         LIST_SORT(LIST_DISTINCT(
           LIST_FILTER(LIST_TRANSFORM(RANGE({k}, LENGTH({text}) + 1),
             p -> CASE WHEN {gram} % {mask + 1} = 0 THEN p ELSE -1 END),
             p -> p > 0)
           || [LENGTH({text})])) AS ends
  FROM {src}
  WHERE {text} IS NOT NULL AND LENGTH({text}) > 0),
cdc_c AS (
  SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ends) + 1),
    j -> struct_pack(
      chunk_idx := CAST(j AS BIGINT),
      start := CAST(CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END
                    AS BIGINT),
      length := CAST(ends[j] - CASE WHEN j = 1 THEN 0
                     ELSE ends[j - 1] END AS BIGINT),
      chash := {chash}))) AS c
  FROM cdc_e)"""
