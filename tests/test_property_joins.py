"""Property/randomized parity: cell joins vs brute force (SURVEY §5.5).

Random seeded point clouds; the cell-partitioned radius/kNN joins must
return exactly the brute-force O(n^2) result, under every physical
variant (probe-side vs build-side ring expansion, salted vs unsalted).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fagi_spark import geom, joins

SEED = 1234


def _cloud(spark, n, seed, prefix, spread=2.0):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-spread, spread, n).round(5)
    lat = rng.uniform(-spread, spread, n).round(5)
    rows = [(f"{prefix}{i}", float(lon[i]), float(lat[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "subject string, cx double, cy double")
    return df, {f"{prefix}{i}": (float(lon[i]), float(lat[i])) for i in range(n)}


def _brute_radius(pa, pb, radius_deg):
    out = set()
    for sa, (ax, ay) in pa.items():
        for sb, (bx, by) in pb.items():
            if np.sqrt((ax - bx) ** 2 + (ay - by) ** 2) <= radius_deg:
                out.add((sa, sb))
    return out


@pytest.fixture(scope="module")
def clouds(spark):
    a, pa = _cloud(spark, 250, SEED, "a")
    b, pb = _cloud(spark, 200, SEED + 1, "b")
    bb = (b.withColumn("xmin", F.col("cx")).withColumn("xmax", F.col("cx"))
          .withColumn("geom_kind", F.lit("POINT")))
    return a, bb, pa, pb


@pytest.mark.parametrize("radius_m", [5000.0, 20000.0, 60000.0])
@pytest.mark.parametrize("expand_side", ["probe", "build"])
def test_radius_join_matches_brute_force(spark, clouds, radius_m, expand_side):
    a, b, pa, pb = clouds
    got = {(r["a_subject"], r["b_subject"])
           for r in joins.radius_join(a, b, radius_m, width_guard_deg=1e9,
                                      expand_side=expand_side).collect()}
    want = _brute_radius(pa, pb, radius_m / geom.METERS_PER_DEGREE)
    assert got == want


def test_salting_does_not_change_results(spark, clouds):
    a, b, pa, pb = clouds
    base = {(r["a_subject"], r["b_subject"])
            for r in joins.radius_join(a, b, 30000.0, width_guard_deg=1e9).collect()}
    for n_salts in (2, 7):
        salted = {(r["a_subject"], r["b_subject"])
                  for r in joins.radius_join(a, b, 30000.0, width_guard_deg=1e9,
                                             n_salts=n_salts).collect()}
        assert salted == base


def test_knn_matches_brute_force_topk(spark, clouds):
    a, b, pa, pb = clouds
    k = 3
    got = {}
    for r in joins.knn_join(a, b, k, 60000.0).collect():
        got.setdefault(r["a_subject"], []).append((r["knn_rank"], r["b_subject"]))
    radius_deg = 60000.0 / geom.METERS_PER_DEGREE
    for sa, (ax, ay) in pa.items():
        cands = sorted(
            (np.sqrt((ax - bx) ** 2 + (ay - by) ** 2), sb)
            for sb, (bx, by) in pb.items()
            if np.sqrt((ax - bx) ** 2 + (ay - by) ** 2) <= radius_deg)
        want = [sb for _, sb in cands[:k]]
        have = [sb for _, sb in sorted(got.get(sa, []))]
        assert have == want, sa


def test_result_stable_under_repartitioning(spark, clouds):
    a, b, pa, pb = clouds
    base = {(r["a_subject"], r["b_subject"])
            for r in joins.radius_join(a, b, 25000.0, width_guard_deg=1e9).collect()}
    shuffled = {(r["a_subject"], r["b_subject"])
                for r in joins.radius_join(a.repartition(13), b.repartition(5),
                                           25000.0, width_guard_deg=1e9).collect()}
    assert shuffled == base
