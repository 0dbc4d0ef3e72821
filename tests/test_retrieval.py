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
