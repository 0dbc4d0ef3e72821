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
