"""Property-based checks: gridgeom measures + convex hull invariants.

Random-geometry properties complement the fixed oracles: orientation
flips negate the exact shoelace, convex-polygon centroids land inside,
hull is idempotent and minimal, and the Spark column math equals the
plain-Python reference on arbitrary simple polygons.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from fagi_spark import cluster


def _convex_ring(pts):
    """CCW convex ring (closed) from a point set via the hull chain."""
    hull = cluster._hull_chain(sorted(set(pts)))
    return hull + [hull[0]]


def _py_measures(ring):
    a2 = cnx = cny = 0
    per = 0.0
    for (x0, y0, *_), (x1, y1, *_) in zip(ring, ring[1:]):
        c = x0 * y1 - x1 * y0
        a2 += c
        cnx += (x0 + x1) * c
        cny += (y0 + y1) * c
        per = per + math.sqrt(float((x1 - x0) ** 2 + (y1 - y0) ** 2))
    return a2, cnx, cny, per


grid_pts = st.lists(
    st.tuples(st.integers(min_value=-2000, max_value=2000),
              st.integers(min_value=-2000, max_value=2000),
              st.just("")),
    min_size=3, max_size=25, unique=True)


@given(grid_pts)
@settings(max_examples=200, deadline=None)
def test_hull_contains_all_points_and_is_idempotent(pts):
    hull = cluster._hull_chain(sorted(set(pts)))
    assert cluster._hull_chain(sorted(hull)) == hull  # idempotent
    if len(hull) < 3:
        return
    ring = hull + [hull[0]]
    for (x0, y0, _), (x1, y1, _) in zip(ring, ring[1:]):
        for px, py, _ in pts:
            cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
            assert cross >= 0  # weakly left of every CCW edge
    # strict convexity: no three consecutive hull vertices collinear
    ring2 = hull + hull[:2]
    for a, b, c in zip(ring2, ring2[1:], ring2[2:]):
        assert (b[0] - a[0]) * (c[1] - a[1]) \
            - (b[1] - a[1]) * (c[0] - a[0]) > 0


@given(grid_pts)
@settings(max_examples=100, deadline=None)
def test_convex_ring_shoelace_properties(pts):
    hull = cluster._hull_chain(sorted(set(pts)))
    if len(hull) < 3:
        return
    ring = _convex_ring(pts)
    a2, cnx, cny, per = _py_measures(ring)
    assert a2 > 0  # CCW
    # orientation flip exactly negates the integer measures
    rev = ring[::-1]
    ra2, rcnx, rcny, rper = _py_measures(rev)
    assert (ra2, rcnx, rcny) == (-a2, -cnx, -cny)
    assert rper == per or abs(rper - per) < 1e-9  # fold order differs
    # exact centroid lies strictly inside the convex hull (or on the
    # boundary for degenerate near-collinear rings): weakly right of
    # no edge
    cx, cy = cnx / (3 * a2), cny / (3 * a2)
    for (x0, y0, _), (x1, y1, _) in zip(ring, ring[1:]):
        cross = (x1 - x0) * (cy - y0) - (y1 - y0) * (cx - x0)
        assert cross >= -1e-9
    # perimeter bounds the diameter: per >= 2 * max pairwise distance
    diam = max(math.dist((a[0], a[1]), (b[0], b[1]))
               for a in hull for b in hull)
    assert per >= 2 * diam - 1e-9


def test_gridgeom_spark_matches_python_on_random_rings(spark):
    """The Catalyst expressions equal the Python reference on a batch
    of random convex rings (deterministic seed)."""
    import random

    from pyspark.sql import functions as F

    from fagi_spark import gridgeom

    rng = random.Random(41)
    rows, want = [], {}
    for i in range(40):
        pts = {(rng.randrange(0, 1500), rng.randrange(0, 1500), "")
               for _ in range(rng.randrange(3, 12))}
        hull = cluster._hull_chain(sorted(pts))
        if len(hull) < 3:
            continue
        ring = hull + [hull[0]]
        wkt = "POLYGON ((" + ", ".join(
            f"{x / 100:.2f} {y / 100:.2f}" for x, y, _ in ring) + "))"
        rows.append((i, wkt))
        want[i] = _py_measures(ring)
    df = spark.createDataFrame(rows, ["id", "geom_wkt"])
    got = {r["id"]: r for r in gridgeom.polygon_measures(df).collect()}
    for i, (a2, cnx, cny, per) in want.items():
        r = got[i]
        assert (r["area2"], r["cnx"], r["cny"]) == (a2, cnx, cny)
        assert r["perim_grid"] == per  # same left fold, same IEEE ops
