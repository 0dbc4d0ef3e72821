"""Count-min sketch: over-count-only, guaranteed recall, mergeable."""

import pytest
from pyspark.sql import functions as F

from fagi_spark import sketch


@pytest.fixture(scope="module")
def skewed(spark):
    # 3 hot keys (100x), 50 cold keys (1-2x) — the hot-cell shape
    rows = ([("hot%d" % i,) for i in range(3) for _ in range(100)]
            + [("cold%d" % i,) for i in range(50)]
            + [("cold%d" % i,) for i in range(0, 50, 2)])
    return spark.createDataFrame(rows, ["k"]).repartition(8)


def _exact(df):
    return {r["k"]: r["c"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}


def test_cms_never_undercounts(skewed):
    exact = _exact(skewed)
    est = {r["k"]: r["est"] for r in
           sketch.cms_lookup(sketch.cms_build(skewed, "k", w=32),
                             skewed, "k", w=32).collect()}
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c


def test_cms_heavy_hitters_recall(skewed):
    exact = _exact(skewed)
    hot = {k for k, c in exact.items() if c >= 50}
    got = {r["k"] for r in
           sketch.cms_heavy_hitters(skewed, "k", threshold=50, w=32).collect()}
    assert hot <= got  # superset: false positives allowed, no misses


def test_cms_exact_when_no_collisions(spark):
    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, ["k"])
    est = {r["k"]: r["est"] for r in
           sketch.cms_lookup(sketch.cms_build(df, "k", w=4096),
                             df, "k", w=4096).collect()}
    assert est == {"a": 5, "b": 2, "c": 1}


def test_cms_merge_equals_union_build(skewed, spark):
    extra = spark.createDataFrame([("hot0",)] * 7 + [("newkey",)] * 3, ["k"])
    merged = sketch.cms_merge(sketch.cms_build(skewed, "k", w=32),
                              sketch.cms_build(extra, "k", w=32))
    direct = sketch.cms_build(skewed.unionByName(extra), "k", w=32)
    m = {(r["j"], r["slot"]): r["cnt"] for r in merged.collect()}
    d = {(r["j"], r["slot"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_cms_unseen_key_estimates_small(skewed, spark):
    probe = spark.createDataFrame([("never-seen-key-xyz",)], ["k"])
    est = sketch.cms_lookup(sketch.cms_build(skewed, "k", w=4096),
                            probe, "k", w=4096).collect()
    assert est[0]["est"] == 0


# --------------------------- Bloom filter ---------------------------


@pytest.fixture(scope="module")
def bloom_urls(spark):
    rows = [("https://site%d.example/p%d" % (i % 7, i),) for i in range(300)]
    return spark.createDataFrame(rows, ["url"]).repartition(8)


def test_bloom_no_false_negatives(bloom_urls):
    # every built key must probe seen=true regardless of fill factor
    filt = sketch.bloom_build(bloom_urls, "url", m_bits=512)  # saturated
    got = {r["url"]: r["seen"] for r in
           sketch.bloom_probe(filt, bloom_urls, "url", m_bits=512).collect()}
    assert len(got) == 300 and all(got.values())


def test_bloom_unseen_mostly_new_some_false_positives(bloom_urls, spark):
    built = bloom_urls.filter(F.col("url").contains("site0"))
    n_built = built.count()
    filt = sketch.bloom_build(built, "url", m_bits=1024)
    verdicts = {r["url"]: r["seen"] for r in
                sketch.bloom_probe(filt, bloom_urls, "url",
                                   m_bits=1024).collect()}
    seen = {u for u, s in verdicts.items() if s}
    in_set = {r["url"] for r in built.collect()}
    assert in_set <= seen                      # no false negatives
    assert len(seen) < len(verdicts)           # most others definite-new
    # tight filter (43 keys * 4 bits in 1024) keeps fp rate < 30%
    fp = len(seen - in_set)
    assert fp / (len(verdicts) - n_built) < 0.3


def test_bloom_merge_equals_union_build(bloom_urls):
    a = bloom_urls.filter(F.col("url").contains("site1"))
    b = bloom_urls.filter(F.col("url").contains("site2"))
    merged = sketch.bloom_merge(sketch.bloom_build(a, "url", m_bits=2048),
                                sketch.bloom_build(b, "url", m_bits=2048))
    direct = sketch.bloom_build(a.unionByName(b), "url", m_bits=2048)
    assert ({(r["word_idx"], r["word"]) for r in merged.collect()}
            == {(r["word_idx"], r["word"]) for r in direct.collect()})


def test_bloom_partition_invariance(bloom_urls):
    f1 = sketch.bloom_build(bloom_urls, "url", m_bits=2048)
    f2 = sketch.bloom_build(bloom_urls.repartition(1), "url", m_bits=2048)
    assert ({tuple(r) for r in f1.collect()}
            == {tuple(r) for r in f2.collect()})


def test_kmv_set_ops_accuracy_and_exhaustive(spark):
    from pyspark.sql import functions as F

    from fagi_spark import sketch

    # exhaustive regime (fewer than k distinct on both sides): every
    # estimate is EXACT
    a = spark.range(30).select(F.concat(F.lit("u"), F.col("id"))
                               .alias("v"))
    b = spark.range(20, 50).select(F.concat(F.lit("u"), F.col("id"))
                                   .alias("v"))
    sa = sketch.kmv_bottom_k(a, "v", k=64)
    sb = sketch.kmv_bottom_k(b, "v", k=64)
    [r] = sketch.kmv_set_ops(sa, sb, k=64).collect()
    assert r.n_merged == 50 and r.union_est == 50.0
    assert r.n_shared == 10
    assert r.jaccard_est == 10.0 / 50.0
    assert r.inter_est == (10.0 / 50.0) * 50.0
    # sketch regime: 2000/3000 with 1000 shared -> estimates within
    # a reasonable band of truth (union 4000, jaccard 0.25)
    a = spark.range(2000).select(F.concat(F.lit("x"), F.col("id"))
                                 .alias("v"))
    b = spark.range(1000, 4000).select(F.concat(F.lit("x"), F.col("id"))
                                       .alias("v"))
    [r] = sketch.kmv_set_ops(sketch.kmv_bottom_k(a, "v", 64),
                             sketch.kmv_bottom_k(b, "v", 64),
                             k=64).collect()
    assert 2500 < r.union_est < 6000
    assert 0.1 < r.jaccard_est < 0.45
    assert 400 < r.inter_est < 2200


def test_hll_estimate_accuracy_and_merge(spark):
    from fagi_spark import sketch
    import pyspark.sql.functions as F

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("key"), F.col("id"))
                               .alias("k"))
    est = sketch.hll_distinct(df, "k", p=6).collect()[0]
    assert est.m == 64
    # raw HLL at m=64: ~13% relative error expected; allow 3 sigma
    assert abs(est.est_raw - n) / n < 0.4, est.est_raw
    assert est.n_empty == 0

    # merge == sketch of the union
    a = spark.range(0, 3000).select(F.concat(F.lit("key"), F.col("id")).alias("k"))
    b = spark.range(2000, n).select(F.concat(F.lit("key"), F.col("id")).alias("k"))
    merged = sketch.hll_merge(sketch.hll_registers(a, "k", p=6),
                              sketch.hll_registers(b, "k", p=6))
    direct = {(r.bucket, r.register)
              for r in sketch.hll_registers(df, "k", p=6).collect()}
    assert {(r.bucket, r.register) for r in merged.collect()} == direct

    # duplicates don't move the estimate
    dup = df.unionByName(df)
    est2 = sketch.hll_distinct(dup, "k", p=6).collect()[0]
    assert est2.est_raw == est.est_raw
