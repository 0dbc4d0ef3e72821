"""BM25 retrieval: independent-fixture ranking + tokenization edges."""

import pytest

from fagi_spark import retrieval


def collect_sorted(df, col):
    return sorted(df.collect(), key=lambda r: r[col])


def _py_bm25(docs, terms, k1=1.5, b=0.75):
    """Independent reference: dict-based BM25 with rational idf."""
    toks = {d: t.lower().split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tv in toks.items():
        s = 0.0
        hit = False
        for term in sorted({t.lower() for t in terms}):
            tf = sum(1 for x in tv if x == term)
            df = sum(1 for v in toks.values() if term in v)
            if tf > 0:
                hit = True
            idf = (n - df + 0.5) / (df + 0.5)
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * (len(tv) / avgdl))))
        if hit:
            out[d] = s
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join spark join spark"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark is a distributed engine for big data"),
        (3, "join the  club"),          # double space -> empty token
        (4, "JOIN SPARK"),              # case folding
        (5, "nothing relevant here at all whatsoever in this one"),
        (6, "spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]), rows


def test_bm25_matches_independent_reference(docs):
    df, rows = docs
    got = collect_sorted(retrieval.bm25_topk(df, ["spark", "join"], k=10), "rank")
    want = _py_bm25(rows, ["spark", "join"])
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_bm25_non_matching_docs_excluded(docs):
    df, _ = docs
    got = collect_sorted(retrieval.bm25_topk(df, ["spark"], k=10), "rank")
    ids = {r["doc_id"] for r in got}
    assert 1 not in ids and 5 not in ids and 3 not in ids


def test_bm25_k_truncates_and_ties_break_by_key(spark):
    rows = [(i, "same text here") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = collect_sorted(retrieval.bm25_topk(df, ["same"], k=3), "rank")
    assert [r["doc_id"] for r in got] == [0, 1, 2]
    assert len({r["score"] for r in got}) == 1


def test_bm25_requires_terms(docs):
    df, _ = docs
    with pytest.raises(ValueError):
        retrieval.bm25_topk(df, [])


def test_doc_keywords_ranking_and_values(spark):
    """Hand-checkable corpus: rarer terms outrank common ones; tf
    scales the score; ties break on the term string; k caps rows."""
    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "common cherry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.doc_keywords(docs, k=2)
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score)
           for r in out.collect()}
    # N=3; idf: df=1 -> 2.5/1.5, df=2 -> 1.5/2.5, df=3 -> 0.5/3.5
    idf1, idf2 = (3 - 1 + 0.5) / 1.5, (3 - 2 + 0.5) / 2.5
    assert got[(1, 1)] == ("apple", 2, 1, 2 * idf1)
    assert got[(1, 2)] == ("banana", 1, 2, idf2)
    # doc 2: banana and cherry tie (both df=2, tf=1) -> term order
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert all(rank <= 2 for (_, rank) in got)
    # every doc contributes exactly k rows (vocab >= k here)
    assert len(got) == 6


# ---- reciprocal-rank fusion -------------------------------------------------

def test_rrf_fuse_matches_hand_computation(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(11, 1), (13, 2)], ["doc_id", "rank"])
    got = {r["doc_id"]: (r["rrf_score"], r["rank"])
           for r in retrieval.rrf_fuse(a, b, k0=60, out_k=10).collect()}
    want = {
        10: 1.0 / 61.0,
        11: 1.0 / 62.0 + 1.0 / 61.0,
        12: 1.0 / 63.0,
        13: 1.0 / 62.0,
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d][0] == pytest.approx(s, rel=0, abs=0)  # exact IEEE
    # 11 (in both lists) wins, then 10 (1/61), 13 (1/62), 12 (1/63)
    order = sorted(got.items(), key=lambda kv: kv[1][1])
    assert [d for d, _ in order] == [11, 10, 13, 12]


def test_rrf_fuse_out_k_truncates_and_ties_break_by_key(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    got = retrieval.rrf_fuse(a, b, k0=60, out_k=3).collect()
    assert len(got) == 3
    # (1,3) tie at 1/61 -> key asc; (2,4) tie at 1/62 -> 2 wins slot 3
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 3, 2]


def test_kwic_handcase(spark):
    from fagi_spark import retrieval
    docs = spark.createDataFrame([
        (0, "a b term c d"),        # interior occurrence
        (1, "term x y"),            # at start -> empty left
        (2, "x y term"),            # at end -> empty right
        (3, "term term"),           # adjacent occurrences
        (4, "no match here"),
        (5, None),
    ], "doc_id long, text string")
    got = sorted((r.doc_id, r.pos, r.left_ctx, r.right_ctx)
                 for r in retrieval.kwic(docs, "term", width=2).collect())
    assert got == [
        (0, 2, "a b", "c d"),
        (1, 0, "", "x y"),
        (2, 2, "x y", ""),
        (3, 0, "", "term"),
        (3, 1, "term", ""),
    ]


def test_boolean_search_modes(spark):
    from fagi_spark import retrieval
    docs = spark.createDataFrame([
        (0, "alpha beta gamma"),
        (1, "alpha beta"),
        (2, "alpha alpha alpha"),   # repeats count once
        (3, "delta"),
        (4, None),
    ], "doc_id long, text string")
    got = {r.doc_id: r.n_matched for r in retrieval.boolean_search(
        docs, ["alpha", "beta"], mode="and").collect()}
    assert got == {0: 2, 1: 2}
    any_ = {r.doc_id: r.n_matched for r in retrieval.boolean_search(
        docs, ["alpha", "beta"], mode="or").collect()}
    assert any_ == {0: 2, 1: 2, 2: 1}
    import pytest as _p
    with _p.raises(ValueError):
        retrieval.boolean_search(docs, [])
    with _p.raises(ValueError):
        retrieval.boolean_search(docs, ["x"], mode="xor")
