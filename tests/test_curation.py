"""Corpus-curation operators (fagi_spark/curation.py): PII scrub,
domain caps, decontamination, boilerplate removal, stratified sampling.
The contract queries value-check each against DuckDB; these tests pin
the semantic corners (ordering, within-doc duplicates, partition
independence, plan shape) that the hash compare can't isolate."""
import pytest
from pyspark.sql import functions as F

from fagi_spark import curation


def test_pii_scrub_counts_and_text(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b-c@x-y.org and d@e.io now"),
         (1, "call +1-555-1234 or +99-123-4567"),
         (2, "clean text no pii"),
         (3, "edge a@b.c not an email (tld too short)")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in curation.with_pii_scrub(df).collect()}
    assert (rows[0].n_emails, rows[0].n_phones) == (2, 0)
    assert rows[0].text_clean == "mail <EMAIL> and <EMAIL> now"
    assert (rows[1].n_emails, rows[1].n_phones) == (0, 2)
    assert rows[1].text_clean == "call <PHONE> or <PHONE>"
    assert rows[2].text_clean == "clean text no pii"
    # {2,} floor: single-letter TLD is not redacted
    assert rows[3].n_emails == 0 and "a@b.c" in rows[3].text_clean


def test_domain_cap_deterministic_and_plan(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(30)], "doc_id long, source string")
    out = curation.domain_cap(df, k=4).collect()
    assert len(out) == 12
    for r in out:
        # lowest doc_ids win within each domain
        assert r.doc_id < 12 and 1 <= r.rank_in_domain <= 4
    plan = curation.domain_cap(df, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_decontaminate_overlap(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f"),      # contains eval gram "a b c"
         (1, "x a b c d y"),      # contains it mid-string
         (2, "c b a d e f"),      # same tokens, wrong order -> clean
         (3, "a b")],             # shorter than n -> clean
        "doc_id long, text string")
    ev = spark.createDataFrame([("a b c",), ("q r s",)], "text string")
    got = {r.doc_id: r.n_shared
           for r in curation.decontaminate(train, ev, n=3).collect()}
    assert got == {0: 1, 1: 1}


def test_decontaminate_counts_distinct_eval_grams(spark):
    train = spark.createDataFrame(
        [(0, "a b c a b c q r s")], "doc_id long, text string")
    ev = spark.createDataFrame([("a b c",), ("q r s",)], "text string")
    [r] = curation.decontaminate(train, ev, n=3).collect()
    assert r.n_shared == 2  # repeated "a b c" counted once


def test_strip_boilerplate_order_and_within_doc_dups(spark):
    bp = "accept cookies"
    rows = [(i, f"{bp}\nbody {i}\nmid\nbody {i}\n{bp}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text_clean
           for r in curation.strip_boilerplate(df, max_docs=4).collect()}
    # "accept cookies" (5 docs) and "mid" (5 docs) are boilerplate;
    # the duplicated per-doc body line survives twice, in order
    assert out[2] == "body 2\nbody 2"


def test_strip_boilerplate_all_boilerplate_doc_drops(spark):
    df = spark.createDataFrame(
        [(i, "same line") for i in range(4)] + [(9, "same line\nunique")],
        "doc_id long, text string")
    out = {r.doc_id: r.text_clean
           for r in curation.strip_boilerplate(df, max_docs=3).collect()}
    assert out == {9: "unique"}


def test_stratified_sample_rates_and_partition_independence(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(4000)],
        "doc_id long, lang string")
    out = curation.stratified_sample(df, {"en": 0.2, "de": 0.8})
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 2000 - 0.2) < 0.05
    assert abs(by_lang["de"] / 2000 - 0.8) < 0.05
    # the decision depends only on the key: repartitioning changes nothing
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id for r in
        curation.stratified_sample(df.repartition(13), {"en": 0.2, "de": 0.8})
        .select("doc_id").collect())
    assert ids == ids2


def test_url_parts(spark):
    from fagi_spark import curation
    df = spark.createDataFrame(
        [(0, "https://www.news.example.co/a/b/c?q=1#frag"),
         (1, "http://example.org"),
         (2, "not a url"),
         (3, "ftp://files.archive.example.net/data/")],
        "doc_id long, url string")
    rows = {r.doc_id: r for r in curation.with_url_parts(df).collect()}
    assert (rows[0].scheme, rows[0].host, rows[0].registered_domain,
            rows[0].path_depth) == ("https", "www.news.example.co",
                                    "example.co", 3)
    assert (rows[1].host, rows[1].registered_domain, rows[1].path_depth) == \
        ("example.org", "example.org", 0)
    assert (rows[2].scheme, rows[2].host, rows[2].path_depth) == ("", "", 0)
    assert (rows[3].scheme, rows[3].registered_domain,
            rows[3].path_depth) == ("ftp", "example.net", 1)


def test_pii_scrub_idempotent_random(spark):
    """Scrubbing a scrubbed corpus is a no-op (random payloads)."""
    import random
    rng = random.Random(7)
    words = ["alpha", "beta", "x9", "mail", "www", "-", "+12-345-6789",
             "bob@example.com", "a.b@c-d.org", "@", "no@tld", "t.io"]
    rows = [(i, " ".join(rng.choices(words, k=rng.randint(0, 12))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = (curation.with_pii_scrub(df).drop("text")
            .withColumnRenamed("text_clean", "text"))
    twice = curation.with_pii_scrub(once)
    assert twice.filter("n_emails != 0 OR n_phones != 0").count() == 0
    assert twice.filter("text_clean != text").count() == 0


def test_strip_boilerplate_random_parity(spark):
    """Random multi-line docs vs a pure-python reference."""
    import random
    rng = random.Random(13)
    pool = [f"line{i}" for i in range(6)]  # small pool -> real collisions
    rows = [(d, "\n".join(rng.choices(pool, k=rng.randint(1, 6))))
            for d in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    max_docs = 8
    got = {r.doc_id: r.text_clean
           for r in curation.strip_boilerplate(df, max_docs=max_docs).collect()}
    # python reference
    from collections import defaultdict
    docs_per_line = defaultdict(set)
    for d, t in rows:
        for ln in t.split("\n"):
            docs_per_line[ln].add(d)
    bp = {ln for ln, ds in docs_per_line.items() if len(ds) > max_docs}
    want = {}
    for d, t in rows:
        kept = [ln for ln in t.split("\n") if ln not in bp]
        if kept:
            want[d] = "\n".join(kept)
    assert got == want


def _pack_reference(rows, ctx):
    """Driver-side concat-and-chunk reference for pack_sequences."""
    out, cum = [], 0
    for k, n in sorted(rows):
        if n <= 0:
            continue
        st, cum = cum, cum + n
        p = st // ctx
        while p * ctx < cum:
            s, e = max(p * ctx, st), min((p + 1) * ctx, cum)
            out.append((k, p, s - st, s - p * ctx, e - s))
            p += 1
    return sorted(out)


def test_pack_sequences_parity_and_bucket_independence(spark):
    """The distributed quantile-bucket prefix sum equals the
    sequential concat-and-chunk reference for every bucket count —
    the output is a pure function of (key order, token counts), never
    of bucket boundaries. Covers docs spanning multiple packs (n>ctx),
    zero-token drops, and pack-sharing short docs."""
    import random
    rnd = random.Random(11)
    rows = [(i, rnd.choice([0, 1, 3, 17, 64, 200])) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = _pack_reference(rows, 64)
    assert any(n > 64 for _, n in rows)  # multi-pack spans exercised
    for buckets in (1, 5, 64):
        got = sorted(map(tuple, curation.pack_sequences(
            df, ctx=64, buckets=buckets).collect()))
        assert got == want, f"buckets={buckets}"
    # segment geometry invariants: packs are exactly full except the last
    by_pack = {}
    for _, p, _, po, sl in want:
        by_pack.setdefault(p, []).append((po, sl))
    last = max(by_pack)
    for p, segs in by_pack.items():
        segs.sort()
        covered = sum(s for _, s in segs)
        assert covered == 64 or (p == last and covered <= 64)
        pos = 0
        for po, sl in segs:  # contiguous, no overlap, no gap
            assert po == pos
            pos += sl


def test_pack_sequences_empty_and_zero(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert curation.pack_sequences(empty, ctx=64).count() == 0
    zeros = spark.createDataFrame([(1, 0), (2, -3)],
                                  "doc_id long, n_tokens long")
    assert curation.pack_sequences(zeros, ctx=64).count() == 0


def test_lang_mixture_weights(spark):
    """alpha=0.5 up-weights low-resource langs (boost > 1 iff below
    the mean share), weights sum to ~1, alpha=1.0 reproduces raw
    shares exactly, and the result is partition-independent."""
    import math
    rows = [("en", 1000), ("de", 100), ("fr", 10)]
    df = spark.createDataFrame(
        [(l, n) for l, n in rows for _ in range(1)],
        "lang string, n_tokens long")
    out = {r.lang: r for r in curation.lang_mixture_weights(df).collect()}
    den = sum(math.sqrt(n) for _, n in sorted(rows))
    for l, n in rows:
        assert out[l].n_tokens == n
        assert out[l].weight == math.sqrt(n) / den
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-12
    assert out["fr"].boost > 1.0 > out["en"].boost
    # alpha=1: weight == raw_share bit-for-bit
    for r in curation.lang_mixture_weights(df, alpha=1.0).collect():
        assert r.weight == r.raw_share and r.boost == 1.0
    # partition independence
    a = sorted(map(tuple, curation.lang_mixture_weights(df).collect()))
    b = sorted(map(tuple, curation.lang_mixture_weights(
        df.repartition(7)).collect()))
    assert a == b


def test_chunk_docs_windows(spark):
    """Overlap chunking: short docs yield one chunk; long docs tile
    with stride size-overlap; no tail chunk is fully contained in its
    predecessor; reassembling stride-prefixes reproduces the doc."""
    words = " ".join(f"w{i}" for i in range(25))
    rows = [(1, words), (2, "tiny doc"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(map(tuple, curation.chunk_docs(
        df, size=10, overlap=4).collect()))
    by_doc = {}
    for k, cid, st, ln, txt in out:
        by_doc.setdefault(k, []).append((cid, st, ln, txt))
    # doc1: 25 words, stride 6 -> starts 0,6,12,18 (24 would be inside
    # [18,25) reach? prev end=28>=25 -> stop): 4 chunks
    assert [c[1] for c in by_doc[1]] == [0, 6, 12, 18]
    assert by_doc[1][0][3].startswith("w0 w1")
    assert by_doc[1][-1] == (3, 18, 7, " ".join(f"w{i}" for i in range(18, 25)))
    # every consecutive pair overlaps by exactly 4 words
    toks = words.split(" ")
    for cid, st, ln, txt in by_doc[1]:
        assert txt == " ".join(toks[st:st + ln])
    assert by_doc[2] == [(0, 0, 2, "tiny doc")]
    assert by_doc[3] == [(0, 0, 1, "")]
    import pytest as _p
    with _p.raises(ValueError):
        curation.chunk_docs(df, size=10, overlap=10)


def test_temperature_sample_rebalances(spark):
    """Low-resource languages keep everything (rate clamps at 1);
    the high-resource language is subsampled toward the temperature
    mix; the keep set is deterministic and partition-independent."""
    rows = ([(i, "en", 100) for i in range(400)]
            + [(1000 + i, "fr", 100) for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = curation.temperature_sample(df, target_tokens=20_000)
    kept = {(r.doc_id, r.lang) for r in out.collect()}
    n_fr = sum(1 for _, l in kept if l == "fr")
    n_en = sum(1 for _, l in kept if l == "en")
    assert n_fr == 20           # rate 1.0: every fr row survives
    # en rate = 20000 * w_en / 40000 < 1 -> genuine subsample
    assert 0 < n_en < 400
    again = {(r.doc_id, r.lang) for r in curation.temperature_sample(
        df.repartition(9), target_tokens=20_000).collect()}
    assert again == kept


def test_temperature_sample_null_lang_not_dropped(spark):
    """NULL-language rows form their own mixture group and survive at
    rate 1.0 when the budget allows — a plain == join would silently
    drop them all (review finding r3)."""
    rows = ([(i, "en", 100) for i in range(50)]
            + [(100 + i, None, 100) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    kept = curation.temperature_sample(df, target_tokens=1_000_000)
    assert kept.count() == 60  # rate clamps to 1.0 everywhere
    assert kept.filter(F.col("lang").isNull()).count() == 10


def test_pack_sequences_rejects_duplicate_keys(spark):
    """Tied keys would hand both rows the combined running sum (RANGE
    window frame) — silently overlapping segments. The guard rides the
    window pass itself (zero extra shuffle), so it fires at action
    time as a raised Spark error."""
    df = spark.createDataFrame([(1, 5), (1, 7), (2, 3)],
                               "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="unique keys"):
        curation.pack_sequences(df, ctx=8).count()


def test_pack_sequences_null_key_dropped_not_flagged(spark):
    """A NULL key has no place in the total order: the row is dropped
    with the zero-token rows — it must neither corrupt bucket 0 nor
    trip the duplicate-key guard."""
    df = spark.createDataFrame([(None, 5), (1, 5), (2, 3)],
                               "doc_id long, n_tokens long")
    out = sorted(map(tuple, curation.pack_sequences(df, ctx=8).collect()))
    assert out == _pack_reference([(1, 5), (2, 3)], 8)


def test_canonical_url_hand_cases(spark):
    cases = [
        ("HTTP://WWW.Ex.ORG:80/A/b?z=2&utm_source=x&a=1#f",
         "http://www.ex.org/A/b?a=1&z=2"),
        ("https://Host.com:443", "https://host.com/"),
        ("https://host.com:8080/p?fbclid=q", "https://host.com:8080/p"),
        ("http://h.io:443/x", "http://h.io:443/x"),  # not http's default
        ("not a url", "not a url"),                   # pass-through
        ("ftp://Files.net/a", "ftp://files.net/a"),
        # userinfo: case-preserved, host after the LAST '@' still
        # lowercased + default-port stripped (r3 review fix: the old
        # host group stopped at ':' so 'User:Pw' swallowed the host)
        ("http://User:Pw@HOST.com:80/a", "http://User:Pw@host.com/a"),
        ("http://a@b@C.io/x", "http://a@b@c.io/x"),
        # bracketed IPv6: lowercased whole, default port stripped
        ("https://[2001:DB8::1]:443/x", "https://[2001:db8::1]/x"),
        ("https://[2001:DB8::1]:8443/x", "https://[2001:db8::1]:8443/x"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r.i: r.canonical_url
           for r in curation.with_canonical_url(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


# ---- pack/chunk properties (hypothesis) -----------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=300), min_size=0,
                max_size=60),
       st.sampled_from([16, 64, 257]))
def test_pack_sequences_properties(spark, token_counts, ctx):
    """For ANY corpus shape: (1) token conservation — every token of
    every doc lands in exactly one segment; (2) segments tile each doc
    contiguously from 0; (3) every pack except the last is exactly
    full; (4) pack offsets tile each pack contiguously."""
    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long") \
        if rows else spark.createDataFrame([], "doc_id long, n_tokens long")
    segs = [tuple(r) for r in curation.pack_sequences(df, ctx=ctx,
                                                      buckets=5).collect()]
    by_doc, by_pack = {}, {}
    for k, p, do, po, sl in segs:
        assert sl > 0
        by_doc.setdefault(k, []).append((do, sl))
        by_pack.setdefault(p, []).append((po, sl))
    for i, n in rows:
        got = sorted(by_doc.get(i, []))
        want_total = n if n > 0 else 0
        assert sum(s for _, s in got) == want_total
        pos = 0
        for do, sl in got:
            assert do == pos
            pos += sl
    if by_pack:
        last = max(by_pack)
        for p, ss in by_pack.items():
            ss.sort()
            covered = sum(s for _, s in ss)
            assert covered == ctx or (p == last and covered <= ctx)
            pos = 0
            for po, sl in ss:
                assert po == pos
                pos += sl


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=12),
       st.sampled_from([(10, 0), (10, 4), (7, 6)]))
def test_chunk_docs_properties(spark, word_counts, size_overlap):
    """For ANY doc lengths: chunk starts advance by stride, every
    chunk slice matches the source tokens, the final chunk reaches the
    document end, and no chunk is contained in its predecessor."""
    size, overlap = size_overlap
    stride = size - overlap
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n)))
            for i, n in enumerate(word_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.chunk_docs(df, size=size, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in rows:
        toks = t.split(" ")  # '' -> [''] matches operator semantics
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert chunks[0].chunk_start == 0
        for j, c in enumerate(chunks):
            assert c.chunk_start == j * stride
            assert c.chunk_text == " ".join(
                toks[c.chunk_start:c.chunk_start + c.chunk_len])
        assert chunks[-1].chunk_start + chunks[-1].chunk_len == len(toks)
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur.chunk_start + cur.chunk_len \
                > prev.chunk_start + prev.chunk_len


def test_quality_classifier_separates_planted_classes(spark):
    """fastText-style learned filter: clean prose vs keyboard-mash
    gibberish, trained on one half, evaluated on a held-out half —
    high accuracy both ways, deterministic scoring, and the scored
    frame keeps its original columns."""
    import random
    rnd = random.Random(5)
    prose_words = ("the quick brown fox jumps over a lazy dog near the "
                   "old stone bridge by the river bank at dawn").split()
    rows = []
    for i in range(120):
        good = " ".join(rnd.choices(prose_words, k=20))
        bad = " ".join("".join(rnd.choices("qwxzjv", k=7)) for _ in range(8))
        rows.append((2 * i, good, 1.0))
        rows.append((2 * i + 1, bad, 0.0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = df.filter("doc_id % 4 < 2")
    test = df.filter("doc_id % 4 >= 2")
    model = curation.train_quality_classifier(train)
    scored = curation.predict_quality(model, test)
    ok = scored.filter(
        (F.col("quality_keep") & (F.col("label") == 1.0))
        | (~F.col("quality_keep") & (F.col("label") == 0.0))).count()
    n = test.count()
    assert ok / n >= 0.95
    assert set(scored.columns) >= {"doc_id", "text", "label",
                                   "quality_prob", "quality_keep"}
    again = curation.predict_quality(model, test)
    a = sorted((r.doc_id, r.quality_prob) for r in scored.collect())
    b = sorted((r.doc_id, r.quality_prob) for r in again.collect())
    assert a == b


def test_dedup_paragraphs_keep_first_semantics(spark):
    """Cross-doc dup kept only at the smallest (doc, pos); within-doc
    repeats collapse to the first; a doc of nothing-but-dups rebuilds
    to '' with n_kept 0; unique paragraphs are untouched."""
    rows = [
        (1, "alpha\n\nshared one\n\nshared one"),   # self-repeat too
        (2, "shared one\n\nbeta"),
        (3, "shared one"),                          # loses everything
        (4, "gamma\n\ndelta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curation.dedup_paragraphs(docs).collect()}
    assert out[1].text_dedup == "alpha\n\nshared one"
    assert (out[1].n_paras, out[1].n_kept) == (3, 2)
    assert out[2].text_dedup == "beta"
    assert out[3].text_dedup == "" and out[3].n_kept == 0
    assert out[4].text_dedup == "gamma\n\ndelta" and out[4].n_kept == 2


def test_dedup_paragraphs_partition_invariance_and_order(spark):
    """Winner choice is global (not partition-local) and surviving
    paragraphs keep original relative order."""
    rows = [(i, f"u{i}\n\ncommon tail\n\nv{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, curation.dedup_paragraphs(docs).collect()))
    b = sorted(map(tuple,
                   curation.dedup_paragraphs(docs.repartition(17)).collect()))
    assert a == b
    out = {r.doc_id: r.text_dedup
           for r in curation.dedup_paragraphs(docs).collect()}
    assert out[0] == "u0\n\ncommon tail\n\nv0"
    assert all(out[i] == f"u{i}\n\nv{i}" for i in range(1, 40))


def test_skyline_2d_matches_bruteforce(spark):
    """The window-based frontier equals an all-pairs dominance
    brute force on a fixture with ties, duplicates, and a dominated
    diagonal; duplicate frontier points all survive."""
    from fagi_spark import curation

    pts = [(0, 5, 1), (1, 4, 2), (2, 4, 2), (3, 3, 3), (4, 2, 2),
           (5, 1, 5), (6, 5, 1), (7, 3, 1), (8, 1, 1), (9, 2, 3)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted((r.id, r.x, r.y) for r in
                 curation.skyline_2d(df, "x", "y").collect())

    def dominated(q):
        return any(p[1] >= q[1] and p[2] >= q[2]
                   and (p[1] > q[1] or p[2] > q[2]) for p in pts)

    want = sorted(p for p in pts if not dominated(p))
    assert got == want
    # duplicates (0,5,1) and (6,5,1) both on the frontier
    ids = {i for i, _, _ in got}
    assert {0, 6} <= ids
    # single row is trivially the frontier; empty in -> empty out
    one = spark.createDataFrame([(0, 1, 1)], "id long, x long, y long")
    assert curation.skyline_2d(one, "x", "y").count() == 1
    empty = spark.createDataFrame([], "id long, x long, y long")
    assert curation.skyline_2d(empty, "x", "y").count() == 0


def test_contamination_score_fractions(spark):
    from fagi_spark import curation

    eval_df = spark.createDataFrame(
        [("the secret benchmark answer is forty two exactly",)], "text string")
    docs = spark.createDataFrame([
        # doc 0: the full eval text verbatim + nothing else -> frac 1.0
        (0, "the secret benchmark answer is forty two exactly"),
        # doc 1: eval text embedded in 8 extra leading tokens:
        # 16 tokens -> 9 distinct 8-grams, 1 shared
        (1, "a b c d e f g h the secret benchmark answer is forty two exactly"),
        # doc 2: clean, same length
        (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
        # doc 3: too short for an 8-gram -> NULL frac
        (3, "tiny doc"),
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in
           curation.contamination_score(docs, eval_df, n=8).collect()}
    assert (got[0].n_grams, got[0].n_shared) == (1, 1)
    assert got[0].contamination_frac == 1.0
    assert (got[1].n_grams, got[1].n_shared) == (9, 1)
    assert got[1].contamination_frac == 1.0 / 9.0
    assert (got[2].n_shared, got[2].contamination_frac) == (0, 0.0)
    assert got[3].n_grams == 0 and got[3].contamination_frac is None


def test_lexical_richness_handcase(spark):
    from fagi_spark import textops

    docs = spark.createDataFrame([
        (0, "a a a b b c"),       # 6 tokens, 3 types, 1 hapax (c)
        (1, "w x y z"),           # all hapax -> ttr 1
        (2, ""),                  # empty
        (3, None),                # null
        (4, "dup  dup"),          # double space -> empty token dropped
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in textops.lexical_richness(docs).collect()}
    assert (got[0].n_tokens, got[0].n_types, got[0].n_hapax) == (6, 3, 1)
    assert got[0].ttr == 3.0 / 6.0 and got[0].hapax_frac == 1.0 / 6.0
    assert got[1].ttr == 1.0 and got[1].hapax_frac == 1.0
    assert got[2].n_tokens == 0 and got[2].ttr is None
    assert got[3].n_tokens == 0 and got[3].ttr is None
    assert (got[4].n_tokens, got[4].n_types, got[4].n_hapax) == (2, 1, 0)
