"""Vector search (brute/LSH/IVF) + text dedup operators."""

import pytest
from pyspark.sql import functions as F

from fagi_spark import textops, vector

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    return vector.brute_force_topk(q, emb, k=5).cache()


def _recall(approx_rows, exact_rows):
    ex = {}
    ap = {}
    for r in exact_rows:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx_rows:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    return hits / total


def test_ivf_topk_recall(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 10)
    approx = vector.ivf_topk(q, emb, k=5, k_centroids=8, n_probe=4)
    rec = _recall(approx.collect(), exact_topk.collect())
    assert rec >= 0.5  # 64-dim uniform vectors: coarse cells still recover half
    # more probes -> monotonically better recall
    approx_all = vector.ivf_topk(q, emb, k=5, k_centroids=8, n_probe=8)
    assert _recall(approx_all.collect(), exact_topk.collect()) >= rec
    # probing every cell == exhaustive search
    assert _recall(approx_all.collect(), exact_topk.collect()) == 1.0


def test_lsh_topk_subset_of_brute(spark, emb, exact_topk):
    q = emb.filter(F.col("vec_id") < 10)
    approx = vector.lsh_topk(q, emb, k=5, dim=64, n_planes=2)
    # every approx hit must score identically to the exact computation
    ex = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact_topk.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in ex:
            assert abs(ex[key] - r["score"]) == 0.0


def test_cosine_neardup_lsh_is_subset(spark, emb):
    sub = emb.filter(F.col("vec_id") < 200)
    exact = {(r["id_a"], r["id_b"]) for r in
             vector.cosine_neardup_pairs(sub, 0.3, n_planes=0).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           vector.cosine_neardup_pairs(sub, 0.3, dim=64, n_planes=2).collect()}
    assert lsh.issubset(exact)
    assert len(lsh) > 0
    # the DEFAULT is the bucketed scale path (n_planes=8, dim inferred
    # from the data) — exact all-pairs is opt-in via n_planes=0
    dflt = {(r["id_a"], r["id_b"]) for r in
            vector.cosine_neardup_pairs(sub, 0.3).collect()}
    assert dflt.issubset(exact)


def test_minhash_finds_planted_near_dups(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the old stone bridge tonight")
    rows = [(i, base) for i in range(3)]                       # exact dups
    rows += [(3, base.replace("stone", "wooden"))]             # near dup
    rows += [(i, f"completely different text number {i} with unrelated words "
                 f"about spaceships satellite orbits and launch pad {i}")
             for i in range(4, 10)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    cands = {(r["id_a"], r["id_b"]) for r in
             textops.minhash_candidates(docs, num_hashes=32, bands=16).collect()}
    assert (0, 1) in cands and (0, 2) in cands and (1, 2) in cands
    assert (0, 3) in cands  # near dup caught with 16 bands
    assert not any((a >= 4 or b >= 4) and a != b for a, b in cands
                   if (a >= 4) != (b >= 4))  # no cross-group false positives


def test_minhash_poly_family_matches_xxhash_behavior(spark):
    """The SQL-mirrored poly family is a drop-in hash family: same
    planted dups caught, same no-false-positive property."""
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the old stone bridge tonight")
    rows = [(i, base) for i in range(3)]
    rows += [(3, base.replace("stone", "wooden"))]
    rows += [(i, f"completely different text number {i} with unrelated words "
                 f"about spaceships satellite orbits and launch pad {i}")
             for i in range(4, 10)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    cands = {(r["id_a"], r["id_b"]) for r in
             textops.minhash_candidates(docs, num_hashes=32, bands=16,
                                        hash_family="poly").collect()}
    assert {(0, 1), (0, 2), (1, 2), (0, 3)}.issubset(cands)
    assert not any((a >= 4) != (b >= 4) for a, b in cands)


def test_simhash_poly_bits_bounded(spark):
    docs = spark.createDataFrame([(0, "alpha beta gamma"), (1, None)],
                                 "doc_id int, text string")
    out = {r["doc_id"]: r["simhash"] for r in
           textops.with_simhash(docs, hash_family="poly", bits=56).collect()}
    assert 0 <= out[0] < (1 << 56)
    assert out[1] == (1 << 56) - 1  # null text -> vacuous all-bits fill


def test_simhash_hamming_orders_similarity(spark):
    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
            (2, "totally unrelated words about engines pistons brakes wheels")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    sh = {r["doc_id"]: r["simhash"] for r in textops.with_simhash(docs).collect()}
    d = docs.sparkSession.createDataFrame(
        [(sh[0], sh[1]), (sh[0], sh[2])], "a long, b long")
    h01, h02 = [r[0] for r in d.select(textops.simhash_hamming(F.col("a"), F.col("b"))).collect()]
    assert h01 < h02


def test_dedup_exact_keeps_min_key(spark):
    docs = spark.createDataFrame(
        [(5, "same text"), (2, "same text"), (9, "other text")],
        "doc_id int, text string")
    kept = sorted(r["doc_id"] for r in textops.dedup_exact(docs).collect())
    assert kept == [2, 9]


def test_repetition_signals(spark):
    """Gopher repetition signals: exact fractions on hand-computable
    docs, 0.0 on degenerate inputs."""
    docs = spark.createDataFrame(
        [(1, "a b a b a"),            # words: 5, distinct 2; bigrams: a b, b a, a b, b a -> top 2/4
         (2, "x y z w"),              # all distinct; bigrams all unique -> top 1/3
         (3, "same same same same"),  # dup 3/4; bigrams: 'same same' x3 -> 3/3
         (4, "solo"),                 # no bigrams
         (5, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_word_frac"], r["top_bigram_frac"])
           for r in textops.with_repetition(docs).collect()}
    assert got[1] == (1.0 - 2.0 / 5.0, 2.0 / 4.0)
    assert got[2] == (0.0, 1.0 / 3.0)
    assert got[3] == (1.0 - 1.0 / 4.0, 1.0)
    assert got[4] == (0.0, 0.0)
    assert got[5][1] == 0.0


def test_latest_capture_semantics_and_plan(spark):
    from pyspark.sql import functions as F
    from fagi_spark import textops
    df = (spark.createDataFrame(
        [("u1", 1, "a"), ("u1", 3, "b"), ("u1", 2, "c"), ("u2", 5, "d")],
        "url string, t int, payload string")
        .withColumn("warc_ts", F.timestamp_seconds("t")))
    out = {r.url: r.payload for r in textops.latest_capture(df).collect()}
    assert out == {"u1": "b", "u2": "d"}
    # timestamp tie -> tiebreak column decides deterministically
    ties = (spark.createDataFrame([("u", 1, "x"), ("u", 1, "y")],
                                  "url string, t int, payload string")
            .withColumn("warc_ts", F.timestamp_seconds("t")))
    got = textops.latest_capture(ties, tiebreak=("payload",)).collect()
    assert [(r.url, r.payload) for r in got] == [("u", "y")]
    # rn==1 compiles to WindowGroupLimit: per-partition winners only shuffle
    plan = textops.latest_capture(df)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_filter_decision_rule_order_and_reasons(spark):
    from fagi_spark import textops
    rows = [
        (1, "short text"),                                   # 2 words
        (2, " ".join(["abcdefghijklmnopqrs"] * 12)),          # long words
        (3, " ".join(["zig", "zag"] * 10)),                   # no stopwords
        (4, "the " + " ".join(["the"] * 19)),                 # dup words (all stopwords)
        (5, "the quick brown fox jumps over a lazy dog and "
            "then runs far away home tonight quietly alone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.filter_reason, r.keep)
           for r in textops.with_filter_decision(df).collect()}
    assert out[1] == ("too_short", False)
    assert out[2] == ("weird_words", False)
    assert out[3] == ("low_stopwords", False)
    # doc 4 is 100% stopwords AND 95% duplicate words: stopword rule
    # passes, so the FIRST failing rule is repetitive
    assert out[4] == ("repetitive", False)
    assert out[5] == ("keep", True)


def test_corpus_vocab_topk_deterministic(spark):
    from fagi_spark import textops
    rows = [("en", "a a a b b c"), ("en", "b d"), ("de", "x y x")]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = [(r.lang, r.word, r.n, r.rank)
           for r in textops.corpus_vocab(df, k=2)
           .orderBy("lang", "rank").collect()]
    assert got == [("de", "x", 2, 1), ("de", "y", 1, 2),
                   ("en", "a", 3, 1), ("en", "b", 3, 2)]
    plan = textops.corpus_vocab(df, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_latest_capture_random_parity(spark):
    """Random multi-capture tables vs a pure-python reference."""
    import random
    from fagi_spark import textops
    from pyspark.sql import functions as F
    rng = random.Random(11)
    rows = []
    for u in range(40):
        for c in range(rng.randint(1, 5)):
            rows.append((f"u{u}", rng.randint(0, 10**6), f"p{u}_{c}"))
    # drop equal (url, t) pairs so the winner is unique without tiebreak
    seen, uniq = set(), []
    for u, t, p in rows:
        if (u, t) not in seen:
            seen.add((u, t))
            uniq.append((u, t, p))
    df = (spark.createDataFrame(uniq, "url string, t long, payload string")
          .withColumn("warc_ts", F.timestamp_seconds("t")))
    got = {(r.url, r.payload) for r in textops.latest_capture(df).collect()}
    best = {}
    for u, t, p in uniq:
        if u not in best or t > best[u][0]:
            best[u] = (t, p)
    want = {(u, p) for u, (t, p) in best.items()}
    assert got == want


def test_token_count_subwords(spark):
    """BPE-ish subword proxy: letter runs, digit runs, single punct."""
    from fagi_spark import textops
    df = spark.createDataFrame(
        [(0, "hello world42, it's 3.14!"), (1, ""), (2, "a-b c")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in textops.with_token_count(df).collect()}
    # hello|world|42|,|it|'|s|3|.|14|! -> 11
    assert rows[0].n_subwords == 11 and rows[0].n_tokens == 4
    assert rows[1].n_subwords == 0
    assert rows[2].n_subwords == 4  # a|-|b|c


def test_kmv_sketch_exhaustive_exact(spark):
    from fagi_spark import sketch
    df = spark.createDataFrame([(f"v{i % 50}",) for i in range(500)],
                               "text string")
    [r] = sketch.kmv_distinct(df, "text", k=64).collect()
    assert (r.n_seen, r.est) == (50, 50.0)


def test_kmv_sketch_estimate_accuracy(spark):
    from fagi_spark import sketch
    df = spark.createDataFrame([(f"value-{i}",) for i in range(5000)],
                               "text string")
    [r] = sketch.kmv_distinct(df, "text", k=64).collect()
    assert r.n_seen == 64
    # k=64 -> stderr ~ 1/sqrt(62) ~ 12.7%; 3 sigma
    assert abs(r.est - 5000) / 5000 < 0.38


def test_kmv_merge_equals_union_sketch(spark):
    from fagi_spark import sketch
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "text string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)]
                              + [(f"a{i}",) for i in range(100)],  # overlap
                              "text string")
    merged = sorted(r.h for r in
                    sketch.kmv_merge(sketch.kmv_bottom_k(a, "text"),
                                     sketch.kmv_bottom_k(b, "text")).collect())
    direct = sorted(r.h for r in
                    sketch.kmv_bottom_k(a.unionByName(b), "text").collect())
    assert merged == direct


def test_pq_encode_and_ivfpq_matches_python_reference(spark):
    """IVF-PQ: codes and ADC top-k equal a pure-python replay."""
    from fagi_spark import vector
    from fagi_spark.contract import _IVF_FIXED_CENTROIDS, _PQ_CODEBOOKS
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def pydot(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc += float(x) * float(y)
        return acc

    def argmin_code(e, cents, off=0, width=None):
        ds = []
        for c in cents:
            ss = float(sum(float(v) * float(v) for v in c))
            seg = e[off:off + width] if width else e
            ds.append((-2.0 * pydot(seg, c)) + ss)
        return ds.index(min(ds))

    enc = {r.vec_id: list(r.pq_code) for r in
           vector.pq_fixed_encode(emb, _PQ_CODEBOOKS).collect()}
    for vid, e in rows.items():
        want = [argmin_code(e, cws, 16 * j, 16)
                for j, cws in enumerate(_PQ_CODEBOOKS)]
        assert enc[vid] == want
        assert all(0 <= c < 4 for c in enc[vid])

    got = [(r.query_id, r.neighbor_id, r.rank) for r in
           vector.ivfpq_fixed_topk(emb.filter("vec_id < 3"), emb,
                                   _IVF_FIXED_CENTROIDS, _PQ_CODEBOOKS, k=3)
           .orderBy("query_id", "rank").collect()]
    # python replay
    cells = {vid: argmin_code(e, _IVF_FIXED_CENTROIDS) for vid, e in rows.items()}
    want = []
    for q in range(3):
        cands = []
        for vid, e in rows.items():
            if vid == q or cells[vid] != cells[q]:
                continue
            adc = 0.0
            for j, cws in enumerate(_PQ_CODEBOOKS):
                adc += pydot(rows[q][16 * j:16 * j + 16], cws[enc[vid][j]])
            cands.append((-adc, vid))
        for rank, (_, vid) in enumerate(sorted(cands)[:3], 1):
            want.append((q, vid, rank))
    assert got == want


def test_repetition_local_equals_agg(spark):
    from fagi_spark import textops
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "dup_word_frac", "top_bigram_frac"]
    agg = textops.with_repetition(docs, mode="agg").select(cols)
    loc = textops.with_repetition(docs, mode="local").select(cols)
    assert agg.exceptAll(loc).count() == 0
    assert loc.exceptAll(agg).count() == 0


def test_duplicate_spans_exact_and_strip(spark):
    """Lee-et-al-style exact-substring dedup: planted cross-doc
    boilerplate and a self-repeating doc produce exactly the expected
    maximal spans; stripping removes them and leaves clean docs
    unchanged. xxhash64 scale path == poly oracle path."""
    boiler = ("all rights reserved this page is part of the example "
              "archive collection")
    rows = [
        (1, "unique alpha text one two three " + boiler + " tail words"),
        (2, "different beta content four five six seven " + boiler),
        (3, "no duplicates at all in this particular document body"),
        (4, "repeat me " * 6),  # self-repeat counts (any-repeat rule)
        (5, "short doc"),       # < k words: contributes nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.span_start, r.span_end, r.n_grams)
           for r in textops.duplicate_spans(df, k=8).collect()}
    # boiler is 12 words -> 5 consecutive dup 8-grams; doc1 offset 6,
    # doc2 offset 7; doc4 is 12 tokens of pure repeat (trailing space
    # adds an empty token: 13) -> one span covering the whole doc
    assert (1, 6, 17, 5) in got and (2, 7, 18, 5) in got
    assert len([g for g in got if g[0] == 3]) == 0
    assert len([g for g in got if g[0] == 4]) == 1
    poly = {(r.doc_id, r.span_start, r.span_end, r.n_grams)
            for r in textops.duplicate_spans(df, k=8,
                                             hash_family="poly").collect()}
    assert got == poly
    stripped = {r.doc_id: r.text
                for r in textops.strip_duplicate_spans(df, k=8).collect()}
    assert stripped[1] == "unique alpha text one two three tail words"
    assert stripped[2] == "different beta content four five six seven"
    assert stripped[3] == rows[2][1]
    assert boiler not in stripped[1] and boiler not in stripped[2]


def test_duplicate_spans_partition_independent(spark):
    """Span output is a pure function of the corpus — stable under
    repartitioning (the window merge keys on (doc, pos) only)."""
    rows = [(i, f"w{i} " * 4 + "common shared eight word block here now ok "
             + f"t{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, textops.duplicate_spans(df, k=8).collect()))
    b = sorted(map(tuple, textops.duplicate_spans(
        df.repartition(13), k=8).collect()))
    assert a == b and len(a) == 40


def test_surprisal_hand_fixture(spark):
    """Digit-count surprisal on a corpus small enough to check by
    hand: 10 total tokens; 'the' x5 -> 10//5=2 -> sb 0; 'cat'/'sat'
    x2 -> 10//2=5 -> sb 0; 'zebra' x1 -> 10//1=10 -> sb 1. Rare-token
    docs score higher; empty/null docs score 0; repartitioning
    changes nothing."""
    rows = [(1, "the the the cat sat"),
            (2, "the the cat sat zebra"),
            (3, None),
            (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.surp_sum, r.n_scored, r.surp_centi)
           for r in textops.with_surprisal(df).collect()}
    assert got[1] == (0, 5, 0)
    assert got[2] == (1, 5, 20)   # one rare token in 5 -> 100*1//5
    assert got[3] == (0, 0, 0) and got[4] == (0, 0, 0)
    rep = {r.doc_id: (r.surp_sum, r.n_scored, r.surp_centi)
           for r in textops.with_surprisal(df.repartition(5)).collect()}
    assert rep == got


def test_brute_force_gemm_matches_fold_path(spark):
    """The GEMM fast path returns the same (query, neighbor, rank)
    assignment as the fold-based exact search, with scores equal to
    accumulation-order tolerance — for dot and cosine, including the
    self-match exclusion and per-batch partial top-k merge."""
    import random
    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb = emb.repartition(7)  # several batches -> real partial merges
    q = emb.filter("vec_id < 4")
    for metric in ("dot", "cosine"):
        a = {(r.query_id, r.rank): (r.neighbor_id, r.score)
             for r in vector.brute_force_topk(q, emb, 5, metric=metric).collect()}
        b = {(r.query_id, r.rank): (r.neighbor_id, r.score)
             for r in vector.brute_force_topk_gemm(q, emb, 5, metric=metric).collect()}
        assert set(a) == set(b)
        for key in a:
            assert a[key][0] == b[key][0], (metric, key)
            assert abs(a[key][1] - b[key][1]) < 1e-9


def test_brute_force_gemm_zero_norm_cosine_excluded(spark):
    """A zero-norm vector has no cosine direction: both exact paths
    EXCLUDE it (under ANSI mode the naive division would raise
    DIVIDE_BY_ZERO; numpy would produce NaN and sort it arbitrarily).
    Finite neighbors fill the ranks identically on both paths."""
    rows = [(0, [1.0] * 8), (1, [0.0] * 8), (2, [0.5] * 8), (3, [-1.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 0")
    a = [(r.rank, r.neighbor_id) for r in vector.brute_force_topk(
        q, emb, 3, metric="cosine").collect()]
    b = [(r.rank, r.neighbor_id) for r in vector.brute_force_topk_gemm(
        q, emb, 3, metric="cosine").collect()]
    assert a == b == [(1, 2), (2, 3)]  # zero-norm vec_id=1 excluded


def test_minhash_probe_incremental_equals_full(spark):
    """Probing a stored band index with a crawl increment yields
    exactly the full-recompute candidate pairs that involve at least
    one new document (old-old pairs are already known)."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the deep dark forest tonight looking for dinner")
    rows = [(i, f"unique doc {i} " + " ".join(f"w{i}x{j}" for j in range(15)))
            for i in range(10)]
    rows += [(100, base), (101, base + " tail")]
    old = spark.createDataFrame(rows, "doc_id long, text string")
    new = spark.createDataFrame(
        [(200, "prefix " + base),            # near-dups 100/101
         (201, "totally fresh content " + " ".join(f"q{j}" for j in range(15))),
         (202, "prefix " + base)],           # also matches 200
        "doc_id long, text string")
    idx = textops.minhash_bands(old)
    incr = {(r.id_a, r.id_b)
            for r in textops.minhash_probe(new, idx).collect()}
    full = {(r.id_a, r.id_b)
            for r in textops.minhash_candidates(
                old.unionByName(new)).collect()}
    new_keys = {200, 201, 202}
    want = {p for p in full if p[0] in new_keys or p[1] in new_keys}
    assert incr == want
    assert (200, 202) in incr  # new-new pair found too
    assert all(p[0] < p[1] for p in incr)


def test_minhash_probe_hot_bucket_guard(spark):
    """The probe's max_bucket star guard: a boilerplate bucket of 30
    index docs hit by 5 new copies emits linear star edges instead of
    the O(m*n) exhaustive pairs, every emitted pair touches a new doc,
    and the new docs stay connected to the bucket's representative.
    Small buckets keep exhaustive probe pairs (the unique near-pair
    survives the guard identically)."""
    boiler = "the same boilerplate mirror page body appears here again"
    old_rows = ([(i, boiler) for i in range(30)]
                + [(100, "a rare pair first variant alpha beta gamma delta")])
    new_rows = ([(200 + i, boiler) for i in range(5)]
                + [(300, "a rare pair first variant alpha beta gamma delta")])
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    idx = textops.minhash_bands(old, num_hashes=8, bands=2)
    free = {(r.id_a, r.id_b) for r in
            textops.minhash_probe(new, idx, num_hashes=8, bands=2).collect()}
    capped = {(r.id_a, r.id_b) for r in
              textops.minhash_probe(new, idx, num_hashes=8, bands=2,
                                    max_bucket=10).collect()}
    new_keys = set(range(200, 205)) | {300}
    assert all(a in new_keys or b in new_keys for a, b in capped)
    assert all(a < b for a, b in capped)
    assert (100, 300) in capped            # small bucket: exhaustive pair kept
    assert len(capped) < len(free) / 3     # hot bucket collapsed to stars
    # every new boilerplate doc still reaches the bucket representative
    rep = 0  # min doc_id of the hot bucket
    assert all((rep, k) in capped for k in range(200, 205))


def test_semantic_dedup_within_cluster_only(spark):
    """SemDeDup semantics: an identical pair in one cluster keeps the
    lower id; an identical pair SPLIT across clusters is missed (the
    documented recall trade); zero-norm rows survive untouched."""
    c0 = [1.0, 0.0, 0.0, 0.0]
    c1 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, [0.9, 0.1, 0.0, 0.0]),   # cluster 0
        (1, [0.9, 0.1, 0.0, 0.0]),   # exact dup of 0, same cluster -> drop
        (2, [0.1, 0.9, 0.0, 0.0]),   # cluster 1, survives
        (3, [0.0, 0.0, 0.0, 0.0]),   # zero-norm, survives
        # near-identical pair straddling the two clusters: both survive
        (4, [0.6, 0.4, 0.0, 0.0]),
        (5, [0.4, 0.6, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.ivf_cell for r in
           vector.semantic_dedup(emb, [c0, c1], 0.9).collect()}
    assert set(out) == {0, 2, 3, 4, 5}
    assert out[0] == 0 and out[2] == 1 and out[4] == 0 and out[5] == 1
    # sanity: 4 and 5 really are cosine-near (the miss is the split)
    import numpy as np
    a, b = np.array([0.6, 0.4]), np.array([0.4, 0.6])
    assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.9


def test_collocations_planted_ground_truth(spark):
    """collocations == hand-computed PMI lift on a planted corpus:
    'new york' co-occurs always, 'hot dog' sometimes, filler words
    pad the unigram counts; min_pair drops the rare pair."""
    from fagi_spark import textops
    docs = [
        "new york new york is big",
        "hot dog in new york",
        "a hot dog and a cold dog",
        "new york again and again",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "doc_id long, text string")
    out = {(r.a, r.b): r for r in
           textops.collocations(df, min_pair=2, topk=10).collect()}
    # hand counts: tokens per doc split on ' '
    toks = [d.split(" ") for d in docs]
    T = sum(len(t) for t in toks)
    from collections import Counter
    uni = Counter(w for t in toks for w in t)
    pairs = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    assert ("new", "york") in out and ("hot", "dog") in out
    for (a, b), r in out.items():
        assert r.n_ab == pairs[(a, b)] >= 2
        assert r.n_a == uni[a] and r.n_b == uni[b]
        assert r.total_tokens == T
        assert r.lift == (r.n_ab * T) / (r.n_a * r.n_b)
    # every pair meeting min_pair is present (topk not binding here)
    expect = {p for p, c in pairs.items() if c >= 2}
    assert set(out) == expect


def test_lsh_multiprobe_recall_dominates_single(spark, emb, exact_topk):
    """Hamming-1 probing can only ADD candidates: multiprobe recall
    >= single-probe recall at identical planes, and every multiprobe
    hit carries the exact re-ranked score."""
    q = emb.filter(F.col("vec_id") < 10)
    single = vector.lsh_topk(q, emb, k=5, dim=64, n_planes=4)
    multi = vector.lsh_multiprobe_topk(q, emb, k=5, dim=64, n_planes=4)
    ex = exact_topk.collect()
    r1 = _recall(single.collect(), ex)
    rm = _recall(multi.collect(), ex)
    assert rm >= r1
    # candidate supersets: every single-probe (q, n) pair also appears
    # in the multiprobe result or was outranked by a better candidate
    sing_pairs = {(r["query_id"], r["neighbor_id"], r["score"])
                  for r in single.collect()}
    multi_scores = {(r["query_id"], r["neighbor_id"]): r["score"]
                    for r in multi.collect()}
    for qid, nid, sc in sing_pairs:
        if (qid, nid) in multi_scores:
            assert multi_scores[(qid, nid)] == sc


def test_recall_report_values(spark, emb, exact_topk):
    """recall_report is consistent with the _recall helper, covers
    every query, and multiprobe recall >= single-probe per the report."""
    q = emb.filter(F.col("vec_id") < 10)
    single = vector.lsh_topk(q, emb, k=5, dim=64, n_planes=4)
    rep = {r.query_id: r for r in
           vector.recall_report(single, exact_topk).collect()}
    assert set(rep) == {r["query_id"] for r in exact_topk.collect()}
    for r in rep.values():
        assert r.recall == r.n_hit / r.n_exact
        assert 0.0 <= r.recall <= 1.0
    overall = sum(r.n_hit for r in rep.values()) / sum(
        r.n_exact for r in rep.values())
    assert overall == _recall(single.collect(), exact_topk.collect())
    multi = vector.lsh_multiprobe_topk(q, emb, k=5, dim=64, n_planes=4)
    rep_m = {r.query_id: r for r in
             vector.recall_report(multi, exact_topk).collect()}
    assert all(rep_m[k].recall >= rep[k].recall for k in rep)


def test_script_mix_planted_classification(spark):
    """Per-script counts and the dominant label on hand rows: pure
    Cyrillic/CJK/Arabic/Greek, a mixed row where Latin wins, digits,
    and punctuation-only -> 'none'."""
    from fagi_spark import textops

    rows = [(1, "Привет мир"), (2, "你好世界"), (3, "مرحبا"),
            (4, "Γεια σου"), (5, "mixed Привет data 2024"),
            (6, "12345"), (7, "!!! ...")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.with_script_mix(df).collect()}
    assert got[1]["dominant_script"] == "cyrillic"
    assert got[1]["n_cyrillic"] == 9 and got[1]["n_latin"] == 0
    assert got[2]["dominant_script"] == "cjk" and got[2]["n_cjk"] == 4
    assert got[3]["dominant_script"] == "arabic"
    assert got[4]["dominant_script"] == "greek"
    # mixed: latin 9 ("mixed"+"data") beats cyrillic 6, digits 4
    assert got[5]["dominant_script"] == "latin"
    assert (got[5]["n_latin"], got[5]["n_cyrillic"], got[5]["n_digit"]) \
        == (9, 6, 4)
    assert got[6]["dominant_script"] == "digit"
    assert got[7]["dominant_script"] == "none"


def test_sq8_encode_and_topk_matches_python_reference(spark):
    """IVF-SQ8: calibration, codes and integer-score top-k equal a
    pure-python replay (floor-based quantization, BIGINT fold)."""
    import math

    from fagi_spark import vector
    from fagi_spark.contract import _IVF_FIXED_CENTROIDS

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {r.vec_id: [float(v) for v in r.embedding] for r in emb.collect()}
    dim = len(next(iter(rows.values())))

    mns, mxs = vector.sq8_minmax(emb)
    assert len(mns) == dim
    for i in range(dim):
        col = [e[i] for e in rows.values()]
        assert mns[i] == min(col) and mxs[i] == max(col)
    amax = vector.sq8_amax(mns, mxs)
    assert amax == max(max(abs(v) for v in e) for e in rows.values())

    def pycode(e):
        return [max(-128, min(127, math.floor(v * 127.0 / amax)))
                for v in e]

    enc = {r.vec_id: list(r.c)
           for r in emb.select("vec_id", vector.sq8_encode_col(
               F.col("embedding"), amax).alias("c")).collect()}
    for vid, e in rows.items():
        assert enc[vid] == pycode(e)
        assert all(-128 <= c <= 127 for c in enc[vid])

    got = [(r.query_id, r.neighbor_id, r.rank, r.score) for r in
           vector.sq8_fixed_topk(emb.filter("vec_id < 3"), emb,
                                 _IVF_FIXED_CENTROIDS, k=3)
           .orderBy("query_id", "rank").collect()]

    def pydot(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc += float(x) * float(y)
        return acc

    def cell_of(e):
        ds = []
        for c in _IVF_FIXED_CENTROIDS:
            ss = float(sum(float(v) * float(v) for v in c))
            ds.append(-2.0 * pydot(e, c) + ss)
        return ds.index(min(ds))

    cells = {vid: cell_of(e) for vid, e in rows.items()}
    want = []
    for q in range(3):
        cands = []
        for vid in rows:
            if vid == q or cells[vid] != cells[q]:
                continue
            s = sum(a * b for a, b in zip(enc[q], enc[vid]))
            cands.append((-s, vid))
        for rank, (neg_s, vid) in enumerate(sorted(cands)[:3], 1):
            want.append((q, vid, rank, -neg_s))
    assert got == want


def test_sq8_topk_recall_vs_exact(spark, emb, exact_topk):
    """Quantized ranking inside the same IVF cells recovers most exact
    neighbors: SQ8's fidelity must land between PQ (coarse) and raw
    floats (perfect within-cell)."""
    from fagi_spark.contract import _IVF_FIXED_CENTROIDS

    q = emb.filter(F.col("vec_id") < 10)
    sq8 = vector.sq8_fixed_topk(q, emb, _IVF_FIXED_CENTROIDS, k=5)
    ivf = vector.ivf_fixed_topk(q, emb, _IVF_FIXED_CENTROIDS, k=5)
    r_sq8 = _recall(sq8.collect(), exact_topk.collect())
    r_ivf = _recall(ivf.collect(), exact_topk.collect())
    # same candidate cells, so SQ8 can only lose to raw-float re-rank
    # through quantization error — it should stay close
    assert r_sq8 >= r_ivf - 0.15
    assert r_sq8 >= 0.4


def test_ngram_containment_quote_absorption(spark):
    """A short quote inside a long article: containment(quote ->
    article) == 1.0 while Jaccard stays below any dedup threshold;
    direction matters (article -> quote is small); brute-force set
    parity on every emitted pair."""
    quote = "the quick brown fox jumps over the lazy dog"
    article = ("breaking news today " + quote +
               " and much more text follows here with many extra "
               "unique words padding the body out considerably now")
    docs = spark.createDataFrame(
        [(1, quote), (2, article), (3, "totally unrelated content here")],
        "doc_id long, text string")
    out = {(r["id_src"], r["id_dst"]): r["containment"]
           for r in textops.ngram_containment_pairs(
               docs, k=3, threshold=0.0).collect()}

    def shingles(t):
        ws = t.lower().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)} \
            if len(ws) >= 3 else {" ".join(ws)}

    s = {1: shingles(quote), 2: shingles(article),
         3: shingles("totally unrelated content here")}
    for (src, dst), v in out.items():
        assert v == len(s[src] & s[dst]) / len(s[src]), (src, dst)
    assert out[(1, 2)] == 1.0            # quote fully contained
    assert out[(2, 1)] < 0.5             # direction matters
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in textops.ngram_jaccard_pairs(
               docs, k=3, threshold=0.0).collect()}
    assert jac[(1, 2)] < 0.5             # Jaccard misses the quote


def test_prefix_filter_jaccard_equals_naive(spark):
    """The prefix-filtered plan returns EXACTLY the naive shingle-join
    result (pairs and float scores) on random near-dup-seeded corpora
    — the lossless-filter property of Bayardo-style prefix filtering."""
    import random
    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(30):
        docs.append((i, " ".join(rnd.choice(vocab) for _ in range(25))))
    # planted near-dups: copies with small edits
    for i in range(5):
        base = docs[i][1].split()
        base[3] = "edited"
        docs.append((100 + i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.5, 0.25):
        naive = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in textops.ngram_jaccard_pairs(
                     df, k=3, threshold=t).collect()}
        pref = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in textops.ngram_jaccard_prefix_pairs(
                    df, k=3, threshold=t).collect()}
        assert pref == naive, f"t={t}"
        assert any(a < 100 <= b for a, b in naive)  # planted pairs found


def test_kmv_grouped_matches_per_group_global(spark):
    """Per-group sketch == the global sketch run on each group alone;
    exhaustive groups are exact and big groups estimate within KMV
    error."""
    from fagi_spark import sketch
    rows = ([("small", f"s{i % 10}") for i in range(200)]
            + [("big", f"b{i}") for i in range(3000)])
    df = spark.createDataFrame(rows, "grp string, text string")
    got = {r.grp: r for r in
           sketch.kmv_distinct_grouped(df, "grp", "text", k=64).collect()}
    assert (got["small"].n_seen, got["small"].est) == (10, 10.0)
    assert got["big"].n_seen == 64
    assert abs(got["big"].est - 3000) / 3000 < 0.38
    # group isolation: per-group rows equal the global sketch of that
    # group's data alone (hashes don't leak across groups)
    for g in ("small", "big"):
        alone = sorted(r.h for r in sketch.kmv_bottom_k(
            df.filter(f"grp = '{g}'"), "text", k=64).collect())
        grouped = sorted(r.h for r in
                         sketch.kmv_bottom_k_grouped(df, "grp", "text", k=64)
                         .filter(f"grp = '{g}'").collect())
        assert alone == grouped


# ---- edit-distance similarity join ------------------------------------------

def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_edit_distance_join_equals_all_pairs(spark):
    from fagi_spark import textops
    rows = [
        (0, "spark engine"),
        (1, "spark enginx"),      # ed 1 from 0
        (2, "spark engines"),     # ed 1 from 0, ed 2 from 1
        (3, "completely different title"),
        (4, "a"),                 # short-string edge (len < q)
        (5, "ab"),                # ed 1 from 4
        (6, ""),                  # empty edge: ed 1 from 4, 2 from 5
        (7, "spark ennine"),      # ed 1 from 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in textops.edit_distance_join(df, d=2, q=2).collect()}
    want = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            dd = _lev(ta, tb)
            if dd <= 2:
                want[(ia, ib)] = dd
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1
    assert (4, 6) in got  # padding closes the short-string hole


# ---- exact grouped quantiles -------------------------------------------------

def test_grouped_quantiles_exact_selection(spark):
    from fagi_spark import textops
    rows = [("a", v) for v in [1, 2, 2, 3, 10, 10, 10, 50, 99, 100]] + \
           [("b", v) for v in [7]] + \
           [("c", v) for v in [5, 6]]
    df = spark.createDataFrame(rows, "grp string, v long")
    qs = [0.25, 0.5, 0.75, 0.9, 1.0]
    out = {(r["grp"], r["q"]): (r["n"], r["q_value"])
           for r in textops.grouped_quantiles(df, "v", qs, by="grp")
           .collect()}
    import math
    vals = {"a": sorted([1, 2, 2, 3, 10, 10, 10, 50, 99, 100]),
            "b": [7], "c": [5, 6]}
    for g, vs in vals.items():
        for q in qs:
            want = vs[math.ceil(q * len(vs)) - 1]
            assert out[(g, q)] == (len(vs), want), (g, q)
    import pytest
    with pytest.raises(ValueError):
        textops.grouped_quantiles(df, "v", [0.0], by="grp")


def test_global_rank_matches_row_number(spark):
    from fagi_spark import textops
    rows = [(i, v) for i, v in enumerate(
        [5, 3, 3, 9, 1, 3, 9, 9, 2, 7, 7, 0, 5])]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r["doc_id"]: r["rank"]
           for r in textops.global_rank(df, "v", n_buckets=4).collect()}
    want = {i: rk + 1 for rk, (v, i) in
            enumerate(sorted((v, i) for i, v in rows))}
    assert got == want
    # ties on v break by doc_id, ranks are a dense 1..n permutation
    assert sorted(got.values()) == list(range(1, len(rows) + 1))


def test_sorted_neighborhood_pairs_exact(spark):
    from fagi_spark import textops
    import pytest
    rows = [(i, v) for i, v in enumerate(
        [5, 3, 3, 9, 1, 3, 9, 9, 2, 7, 7, 0, 5])]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    for window in (2, 3, 5):
        out = textops.sorted_neighborhood_pairs(
            df, "v", window=window, n_buckets=4).collect()
        got = {(r["id_a"], r["id_b"]) for r in out}
        rank = {i: rk + 1 for rk, (v, i) in
                enumerate(sorted((v, i) for i, v in rows))}
        want = {(a, b) for a in rank for b in rank
                if 1 <= rank[b] - rank[a] <= window - 1}
        assert got == want, window
        assert len(out) == len(got)  # no duplicate pairs
        for r in out:
            assert r["rank_a"] == rank[r["id_a"]]
            assert r["rank_b"] == rank[r["id_b"]]
    with pytest.raises(ValueError):
        textops.sorted_neighborhood_pairs(df, "v", window=1)


def test_simpson_diversity_handcase(spark):
    from fagi_spark import textops
    docs = spark.createDataFrame(
        [(0, "a a a b", "en"), (1, "a b", "en"), (2, "x y", "fr"),
         (3, None, "fr")],
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in
           textops.simpson_diversity(docs, by="lang").collect()}
    # en: a=4, b=2 -> N=6, sum_c2=20; fr: x=1,y=1,''=1 -> N=3, sum_c2=3
    en = out["en"]
    assert (en["n_tokens"], en["n_distinct"], en["sum_c2"]) == (6, 2, 20)
    assert en["simpson"] == 20 / 36
    assert en["gini_simpson"] == 1.0 - 20 / 36
    fr = out["fr"]
    assert (fr["n_tokens"], fr["n_distinct"], fr["sum_c2"]) == (3, 3, 3)


def test_source_jaccard_matrix_handcase(spark):
    from fagi_spark import textops
    docs = spark.createDataFrame(
        [(0, "a b c", "s1"), (1, "b c d", "s2"), (2, "x y", "s3"),
         (3, "c", "s1")],
        "doc_id long, text string, source string")
    out = {(r["src_a"], r["src_b"]): r for r in
           textops.source_jaccard_matrix(docs, by="source").collect()}
    r12 = out[("s1", "s2")]
    assert (r12["n_inter"], r12["n_a"], r12["n_b"]) == (2, 3, 3)
    assert r12["jaccard"] == 2 / 4
    assert ("s1", "s3") not in out  # disjoint vocab: no row
    assert ("s2", "s3") not in out


def test_vocab_coverage_handcase(spark):
    from fagi_spark import textops

    docs = spark.createDataFrame([
        (0, "a a a a b b b c c d"),
        (1, "a b c e"),
    ], "doc_id long, text string")
    # freqs: a5 b4 c3 d1 e1 -> order a,b,c,d,e (d before e: tie by token)
    got = {r.top_n: r for r in
           textops.vocab_coverage(docs, [1, 2, 4]).collect()}
    assert all(r.n_types_total == 5 and r.total_tokens == 14
               for r in got.values())
    assert got[1].covered_tokens == 5 and got[1].covered_frac == 5.0 / 14.0
    assert got[2].covered_tokens == 9
    assert got[4].covered_tokens == 13  # a+b+c+d (tie d<e)
    import pytest as _p
    with _p.raises(ValueError):
        textops.vocab_coverage(docs, [])


def test_trending_terms_handcase(spark):
    import math
    from fagi_spark import textops

    # token "spike": counts [1,1,4] across periods 0-2; "flat": [2,2,2];
    # "rare" appears twice total -> filtered by min_count=3
    rows = []
    for p in range(3):
        rows.append((p, "flat flat " + ("spike " * (4 if p == 2 else 1)).strip()))
    rows.append((0, "rare"))
    rows.append((1, "rare"))
    df = spark.createDataFrame(rows, "snap long, text string")
    got = {(r.token, r.period): r for r in
           textops.trending_terms(df, "snap", min_count=3).collect()}
    assert set(t for t, _ in got) == {"flat", "spike"}
    # spike: n=3, S=6, Q=18: z(4) = (12-6)/sqrt(54-36) = 6/sqrt(18)
    assert got[("spike", 2)].z_score == 6.0 / math.sqrt(18.0)
    assert got[("spike", 0)].z_score == -3.0 / math.sqrt(18.0)
    assert all(got[("flat", p)].z_score is None for p in range(3))
    assert got[("spike", 2)].cnt == 4 and got[("spike", 2)].n_periods == 3


def test_simhash_pairs_lossless_vs_bruteforce(spark):
    from fagi_spark import textops

    rows = [(i, f"unique doc {i} about topic{i} " +
             " ".join(f"w{i}x{j}" for j in range(12))) for i in range(30)]
    rows += [(100, rows[0][1]), (101, rows[5][1] + " tail")]  # planted
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.hamming for r in
           textops.simhash_pairs(docs, max_hamming=3, bits=56,
                                 n_bands=4, hash_family="poly").collect()}
    sigs = {r.doc_id: r.simhash for r in
            textops.with_simhash(docs, bits=56,
                                 hash_family="poly").collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want          # banding is lossless at h<4
    assert got[(0, 100)] == 0   # exact twin
    import pytest as _p
    with _p.raises(ValueError):
        textops.simhash_pairs(docs, max_hamming=4, n_bands=4)


def test_source_rollup_handcase(spark):
    from fagi_spark import textops

    docs = spark.createDataFrame([
        (0, "aaaa", "en", "web"),
        (1, "aaaa", "en", "web"),      # dup of 0
        (2, "bbbbbbbb", "de", "web"),
        (3, "cc", "en", "books"),
    ], "doc_id long, text string, lang string, source string")
    got = {r.source: r for r in textops.source_rollup(docs).collect()}
    w = got["web"]
    assert (w.n_docs, w.total_chars, w.n_langs, w.n_dup_docs) == (3, 16, 2, 2)
    assert w.mean_chars == 16.0 / 3.0 and w.dup_frac == 2.0 / 3.0
    b = got["books"]
    assert (b.n_docs, b.n_dup_docs, b.dup_frac) == (1, 0, 0.0)


def test_norm_report_handcase(spark):
    import math
    from fagi_spark import vector

    rows = [(0, [3.0, 4.0]),          # norm 5
            (1, [0.6, 0.8]),          # norm 1 -> in range
            (2, [0.0, 0.0]),          # zero vector
            (3, None)]                # null embedding
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in vector.norm_report(df).collect()}
    assert got[0].n_dims == 2 and got[0].norm == 5.0
    assert got[0].in_range is False
    # expected through the float32 storage round-trip
    import numpy as np
    a, b = float(np.float32(0.6)), float(np.float32(0.8))
    assert got[1].norm == math.sqrt(a * a + b * b)
    assert got[1].in_range is True
    assert got[2].norm == 0.0 and got[2].in_range is False
    assert got[3].n_dims == 0 and got[3].norm is None
    assert got[3].in_range is None


def test_gini_concentration_handcase(spark):
    from fagi_spark import textops

    # perfectly even: gini 0
    even = spark.createDataFrame([(f"k{i}", 5) for i in range(4)],
                                 "k string, v long")
    [r] = textops.gini_concentration(even, "v", "k").collect()
    assert r.gini == 0.0
    # one key hogs everything among n=4: gini = (n-1)/n = 0.75
    hog = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)], "k string, v long")
    [r] = textops.gini_concentration(hog, "v", "k").collect()
    assert r.gini == 0.75
    # textbook mixed case vs brute force
    vals = [1, 2, 3, 4, 10]
    df = spark.createDataFrame([(f"k{i}", v) for i, v in enumerate(vals)],
                               "k string, v long")
    [r] = textops.gini_concentration(df, "v", "k").collect()
    n, s = len(vals), sum(vals)
    sr = sum((i + 1) * v for i, v in enumerate(sorted(vals)))
    assert (r.n_keys, r.sum_values, r.sum_rank_value) == (n, s, sr)
    assert r.gini == float(2 * sr - (n + 1) * s) / float(n * s)
    # degenerate: single key -> NULL
    [r] = textops.gini_concentration(
        spark.createDataFrame([("a", 7)], "k string, v long"),
        "v", "k").collect()
    assert r.gini is None


def test_cohens_kappa_handcase(spark):
    from fagi_spark import textops

    # classic 2x2: diag 20+15, off 5+10, n=50
    rows = ([("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 5 + [("n", "y")] * 10)
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = textops.cohens_kappa(df, "a", "b").collect()
    n, diag = 50, 35
    ch = 25 * 30 + 25 * 20  # ma(y)*mb(y) + ma(n)*mb(n)
    assert (r.n_rows, r.n_agree, r.chance_pairs) == (n, diag, ch)
    assert r.kappa == float(n * diag - ch) / float(n * n - ch)
    # po/pe cross-check
    po, pe = diag / n, ch / (n * n)
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-12
    # perfect agreement -> 1; NULLs drop
    perf = spark.createDataFrame(
        [("x", "x"), ("y", "y"), (None, "x")], "a string, b string")
    [r] = textops.cohens_kappa(perf, "a", "b").collect()
    assert r.n_rows == 2 and r.kappa == 1.0
    # single-label degenerate -> NULL
    one = spark.createDataFrame([("x", "x")] * 3, "a string, b string")
    [r] = textops.cohens_kappa(one, "a", "b").collect()
    assert r.kappa is None


def test_vocab_drift_handcase(spark):
    from fagi_spark import textops

    # period 0 head (top-2): a, b; period 1: b, c; period 2: x, y
    rows = [
        (0, "a a a b b z"),
        (1, "b b b c c a"),
        (2, "x x y y q")]
    df = spark.createDataFrame(rows, "snap long, text string")
    got = {(r.period_a, r.period_b): r for r in
           textops.vocab_drift(df, "snap", top_n=2).collect()}
    assert set(got) == {(0, 1), (1, 2)}
    r01 = got[(0, 1)]
    assert (r01.n_a, r01.n_b, r01.n_shared) == (2, 2, 1)  # share 'b'
    assert r01.jaccard == 1.0 / 3.0
    r12 = got[(1, 2)]
    assert r12.n_shared == 0 and r12.jaccard == 0.0
    # short period: fewer than top_n types uses the full vocab
    rows2 = [(0, "a b"), (1, "a b")]
    df2 = spark.createDataFrame(rows2, "snap long, text string")
    [r] = textops.vocab_drift(df2, "snap", top_n=10).collect()
    assert (r.n_a, r.n_b, r.n_shared, r.jaccard) == (2, 2, 2, 1.0)


def test_label_centroids_and_separation(spark):
    import math
    import numpy as np
    from fagi_spark import vector

    rows = [(0, 0, [1.0, 0.0]), (1, 0, [3.0, 0.0]),   # label 0: mean (2, 0)
            (2, 1, [0.0, 4.0]), (3, 1, [0.0, 6.0]),   # label 1: mean (0, 5)
            (4, 2, None)]                             # null drops
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    cent = {(r.label, r.dim_idx): r for r in
            vector.label_centroids(df).collect()}
    assert cent[(0, 0)].mean == 2.0 and cent[(0, 1)].mean == 0.0
    assert cent[(1, 0)].mean == 0.0 and cent[(1, 1)].mean == 5.0
    assert all(r.n_vecs == 2 for r in cent.values())
    assert not any(lab == 2 for lab, _ in cent)
    [d] = vector.centroid_separation(
        vector.label_centroids(df)).collect()
    assert (d.label_a, d.label_b) == (0, 1)
    assert d.dist == math.sqrt((2.0 - 0.0) ** 2 + (0.0 - 5.0) ** 2)
    # fold-order determinism on a larger random set: same result twice
    rng = np.random.RandomState(5)
    big = spark.createDataFrame(
        [(i, int(i % 3), [float(x) for x in rng.rand(8)])
         for i in range(60)],
        "vec_id long, label int, embedding array<float>")
    a = sorted(map(tuple, vector.label_centroids(big).collect()))
    b = sorted(map(tuple, vector.label_centroids(big).collect()))
    assert a == b


def test_class_scatter_handcase(spark):
    from fagi_spark import vector

    # label 0: vectors (1,0) and (3,0), centroid (2,0): each d2 = 1
    # label 1: identical vectors -> scatter 0
    rows = [(0, 0, [1.0, 0.0]), (1, 0, [3.0, 0.0]),
            (2, 1, [5.0, 5.0]), (3, 1, [5.0, 5.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    got = {r.label: r for r in vector.class_scatter(df).collect()}
    assert got[0].n_vecs == 2 and got[0].wss == 2.0
    assert got[0].mean_d2 == 1.0
    assert got[1].wss == 0.0 and got[1].mean_d2 == 0.0


def test_kmeans_fixed_matches_numpy_lloyd(spark, emb):
    import numpy as np

    out = (vector.kmeans_fixed_assign(emb, k=4, n_iter=2)
           .orderBy("vec_id").toPandas())

    pdf = emb.orderBy("vec_id").toPandas()
    pdf = pdf[pdf.embedding.notnull()]
    ids = pdf.vec_id.to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    k = 4
    C = V[:k]  # seeds = k smallest vec_ids (pdf already id-sorted)
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cl = d.argmin(axis=1)
    keep = [c for c in range(k) if (cl == c).any()]
    C2 = np.stack([V[cl == c].mean(axis=0) for c in keep])
    d = ((V[:, None, :] - C2[None, :, :]) ** 2).sum(axis=2)
    cl2 = np.array(keep)[d.argmin(axis=1)]
    d22 = d[np.arange(len(V)), d.argmin(axis=1)]

    assert len(out) == len(V)
    ref = {i: (c, x) for i, c, x in zip(ids, cl2, d22)}
    for r in out.itertuples():
        c, x = ref[r.vec_id]
        assert r.cluster == c
        assert abs(r.dist2 - x) < 1e-9
    # every cluster non-trivial on this fixture
    assert out.cluster.nunique() >= 2


def test_pq_recon_report_matches_numpy(spark, emb):
    import numpy as np

    cbs = [[vector._hyperplane(16, 4 * j + i, seed=23) for i in range(4)]
           for j in range(4)]
    out = (vector.pq_recon_report(emb, cbs)
           .orderBy("vec_id", "subspace").toPandas())

    pdf = emb.orderBy("vec_id").toPandas()
    pdf = pdf[pdf.embedding.notnull()]
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    C = np.asarray(cbs, dtype=np.float64)          # (4, 4, 16)
    i = 0
    for ridx, vid in enumerate(pdf.vec_id):
        for j in range(4):
            sv = V[ridx, j * 16:(j + 1) * 16]
            d = ((sv[None, :] - C[j]) ** 2).sum(axis=1)
            r = out.iloc[i]
            assert r.vec_id == vid and r.subspace == j
            assert r.code == int(d.argmin())
            assert abs(r.sub_err - d.min()) < 1e-9
            i += 1
    assert i == len(out)


def test_winnow_matches_naive_and_guarantee(spark):
    K, W, MOD = 5, 4, textops.POLY_MOD
    shared = "the quick brown fox jumps"
    docs = [(1, "alpha beta " + shared + " gamma delta"),
            (2, "unrelated preamble " + shared + " and a tail"),
            (3, "zzzzzzzzzzzzzzzz"),          # tie-heavy (equal hashes)
            (4, "short"),                      # < k+w-1: no output
            (5, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in textops.winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))

    def naive(t):
        hs = []
        for p in range(len(t) - K + 1):
            acc = 0
            for ch in t[p:p + K]:
                acc = (acc * 31 + ord(ch)) % MOD
            hs.append(acc)
        sel = set()
        for i in range(len(hs) - W + 1):
            m = min(hs[i:i + W])
            # rightmost tie
            j = max(x for x in range(i, i + W) if hs[x] == m)
            sel.add((j + 1, m))
        return sel

    for did, text in docs:
        if text is None or len(text) < K + W - 1:
            assert did not in got
        else:
            assert got[did] == naive(text), did
    # winnowing guarantee: a shared substring >= k+w-1 chars yields a
    # shared fingerprint hash between the two docs
    assert {fp for _, fp in got[1]} & {fp for _, fp in got[2]}


def test_cdc_chunks_cover_text_and_shift_robust(spark):
    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua ")
    doc1 = base * 4
    doc2 = "INSERTED-PREFIX " + doc1   # same content shifted right
    df = spark.createDataFrame([(1, doc1), (2, doc2), (3, ""), (4, None)],
                               "doc_id long, text string")
    rows = textops.cdc_chunks(df, k=8, mask_bits=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}       # empty/NULL docs drop (stated)
    for did, text in ((1, doc1), (2, doc2)):
        cs = sorted(by_doc[did], key=lambda r: r.chunk_idx)
        # chunks tile the text exactly: contiguous, full coverage
        pos = 1
        for c in cs:
            assert c.start == pos
            pos += c.length
        assert pos == len(text) + 1
    # content-defined robustness: after the insertion point re-syncs,
    # doc2 shares most chunk hashes with doc1
    h1 = {r.chash for r in by_doc[1]}
    h2 = {r.chash for r in by_doc[2]}
    shared = len(h1 & h2)
    assert shared >= max(1, len(h1) - 2)


def test_cdc_chunks_short_docs_single_chunk(spark):
    """ADVICE r4: docs with 0 < length < k must yield exactly ONE
    whole-text chunk — Spark's sequence(k, length) DESCENDS when
    length < k, which (unguarded) scanned past end-of-text and
    fabricated boundaries where the DuckDB mirror's empty RANGE
    yields one chunk. Engine and oracle are compared directly."""
    import duckdb

    docs = [(i, "abcdefg"[:i]) for i in range(1, 8)]  # 1..7 chars, k=8
    docs.append((10, "abcdefgh" * 8))                 # one long doc too
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = textops.cdc_chunks(df, k=8, mask_bits=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, text in docs:
        cs = sorted(by_doc[did], key=lambda r: r.chunk_idx)
        if len(text) < 8:
            assert len(cs) == 1
            assert (cs[0].start, cs[0].length) == (1, len(text))
        pos = 1
        for c in cs:
            assert c.start == pos
            pos += c.length
        assert pos == len(text) + 1
    # value-exact vs the DuckDB mirror on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = sorted(con.execute(
        "WITH " + textops.sql_cdc_chunks(k=8, mask_bits=4)
        + " SELECT doc_id, c.chunk_idx, c.start, c.length, c.chash"
          " FROM cdc_c").fetchall())
    got = sorted((r.doc_id, r.chunk_idx, r.start, r.length, r.chash)
                 for r in rows)
    assert got == want


def test_sql_hll_register_shift_is_bigint():
    """ADVICE r4: the harmonic-sum 1<<register must shift a BIGINT on
    the DuckDB side too — p=6 allows registers up to 51, past INT32."""
    from fagi_spark import sketch

    sql = sketch.sql_hll("documents", "text", p=6)
    assert "CAST(1 AS BIGINT) << register" in sql
    import duckdb
    # the fold expression itself survives a register >= 31
    v = duckdb.sql(
        "SELECT 1.0 / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE) "
        "FROM (VALUES (40)) t(r)").fetchone()[0]
    assert v == 1.0 / (1 << 40)
