"""Unit tests for the numpy WKT geometry kernels (no Spark needed)."""

import math

import numpy as np
import pytest

from fagi_spark import geom


def test_parse_roundtrip_all_kinds():
    for w in [
        "POINT (1.5 2.5)",
        "LINESTRING (0 0, 10 0, 10 10)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT (1 1, 2 2)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))",
    ]:
        g = geom.parse_wkt(w)
        assert g is not None
        assert geom.to_wkt(geom.parse_wkt(geom.to_wkt(g))) == geom.to_wkt(g)


def test_parse_tolerates_format_variants():
    assert geom.parse_wkt("POINT(1 2)").kind == "POINT"
    assert geom.parse_wkt("MULTIPOINT ((1 1), (2 2))").parts[0].shape == (2, 2)
    assert geom.parse_wkt("point (1 2)").kind == "POINT"


def test_parse_rejects_garbage():
    assert geom.parse_wkt(None) is None
    assert geom.parse_wkt("") is None
    assert geom.parse_wkt("POINT EMPTY") is None
    assert geom.parse_wkt("hello world") is None
    assert geom.parse_wkt("POINT (lat long)") is None


def test_precedence_ranks_match_reference():
    # Constants.java:85-95: MULTIPOLYGON(0) > POLYGON(1) > MULTILINESTRING(2)
    # > LINESTRING(3) > MULTIPOINT(4) > POINT(5)
    assert geom.KIND_RANK == {
        "MULTIPOLYGON": 0, "POLYGON": 1, "MULTILINESTRING": 2,
        "LINESTRING": 3, "MULTIPOINT": 4, "POINT": 5}


def test_npoints_counts_all_vertices():
    g = geom.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert geom.npoints(g) == 10  # ST_NPoints counts closing vertices


def test_centroid_polygon_with_hole():
    g = geom.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    cx, cy = geom.centroid(g)
    # area 100 @ (5,5) minus hole 4 @ (3,3): (500-12)/96
    assert cx == pytest.approx(488 / 96)
    assert cy == pytest.approx(488 / 96)


def test_centroid_linestring_length_weighted():
    g = geom.parse_wkt("LINESTRING (0 0, 10 0, 10 10)")
    cx, cy = geom.centroid(g)
    assert cx == pytest.approx(7.5)
    assert cy == pytest.approx(2.5)


def test_translate_scale_rotate():
    g = geom.parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    t = geom.translate(g, 1, 2)
    assert geom.bbox(t) == (1, 2, 5, 6)
    s = geom.scale_about_centroid(g, 2.0)
    assert geom.bbox(s) == (-2, -2, 6, 6)
    assert geom.centroid(s) == pytest.approx((2.0, 2.0))
    r = geom.rotate_about_centroid(g, 90)
    assert geom.centroid(r) == pytest.approx((2.0, 2.0))
    x0, y0, x1, y1 = geom.bbox(r)
    assert (x0, y0, x1, y1) == pytest.approx((0, 0, 4, 4), abs=1e-9)


def test_point_in_polygon_with_hole():
    g = geom.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    px = np.array([1.0, 3.0, 11.0, 5.0])
    py = np.array([1.0, 3.0, 5.0, 5.0])
    assert geom.points_in_polygon(px, py, g).tolist() == [True, False, False, True]


def test_point_in_multipolygon():
    g = geom.parse_wkt(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))")
    px = np.array([1.0, 11.0, 5.0])
    py = np.array([1.0, 11.0, 5.0])
    assert geom.points_in_polygon(px, py, g).tolist() == [True, True, False]


def test_pip_matches_bruteforce_random():
    rng = np.random.RandomState(7)
    for _ in range(5):
        pts = rng.uniform(-1, 11, size=(200, 2))
        ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
        g = geom.Geometry("POLYGON", [ring])
        got = geom.points_in_polygon(pts[:, 0], pts[:, 1], g)
        want = (pts[:, 0] > 0) & (pts[:, 0] < 10) & (pts[:, 1] > 0) & (pts[:, 1] < 10)
        assert (got == want).all()


def test_geometrycollection_parse_and_centroid():
    g = geom.parse_wkt("GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))")
    assert g.kind == "GEOMETRYCOLLECTION"
    assert geom.npoints(g) == 6
    assert geom.centroid(g) == pytest.approx((1.0, 1.0))


def test_meters_per_degree_constant():
    # Constants.java:79-80
    assert geom.METERS_PER_DEGREE == 111195.0


# ---- geoms_intersect properties (hypothesis) --------------------------------

from hypothesis import given, settings, strategies as st


def _square_wkt(x, y, w):
    x1, y1 = x + w, y + w
    return (f"POLYGON (({x} {y}, {x1} {y}, {x1} {y1}, {x} {y1}, {x} {y}))")


coord = st.integers(min_value=-50, max_value=50)
width = st.integers(min_value=1, max_value=20)


@settings(max_examples=200, deadline=None)
@given(ax=coord, ay=coord, aw=width, bx=coord, by=coord, bw=width)
def test_intersect_squares_matches_interval_logic(ax, ay, aw, bx, by, bw):
    """For axis-aligned squares, exact ST_Intersects == interval overlap
    on both axes (boundary inclusive) — an independent ground truth."""
    ga = geom.parse_wkt(_square_wkt(ax, ay, aw))
    gb = geom.parse_wkt(_square_wkt(bx, by, bw))
    want = (ax <= bx + bw and bx <= ax + aw and ay <= by + bw and by <= ay + aw)
    assert geom.geoms_intersect(ga, gb) == want
    assert geom.geoms_intersect(gb, ga) == want  # symmetry


@settings(max_examples=100, deadline=None)
@given(px=coord, py=coord, x=coord, y=coord, w=width)
def test_intersect_point_square_matches_containment(px, py, x, y, w):
    gp = geom.parse_wkt(f"POINT ({px} {py})")
    gs = geom.parse_wkt(_square_wkt(x, y, w))
    want = (x <= px <= x + w) and (y <= py <= y + w)
    assert geom.geoms_intersect(gp, gs) == want
    assert geom.geoms_intersect(gs, gp) == want


@settings(max_examples=50, deadline=None)
@given(x=coord, y=coord, w=width, dx=coord, dy=coord)
def test_intersect_translation_invariant(x, y, w, dx, dy):
    ga = geom.parse_wkt(_square_wkt(x, y, w))
    gb = geom.parse_wkt(_square_wkt(x + 1, y + 1, w))
    ta = geom.translate(ga, float(dx), float(dy))
    tb = geom.translate(gb, float(dx), float(dy))
    assert geom.geoms_intersect(ga, gb) == geom.geoms_intersect(ta, tb)
    assert geom.geoms_intersect(ga, ga)  # self-intersection always true


def test_min_distance_hand_cases():
    from fagi_spark.geom import min_distance, parse_wkt
    sq = parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    # diagonal separation: corner-to-corner
    d = min_distance(sq, parse_wkt("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))"))
    assert abs(d - 2 ** 0.5) < 1e-12
    # axis separation: edge-to-edge, attained at segment interiors
    assert min_distance(sq, parse_wkt("POLYGON ((0.25 3, 0.75 3, 0.75 4, 0.25 4, 0.25 3))")) == 2.0
    # intersecting / contained -> 0
    assert min_distance(sq, parse_wkt("POLYGON ((0.5 0.5, 2 0.5, 2 2, 0.5 2, 0.5 0.5))")) == 0.0
    assert min_distance(sq, parse_wkt("POINT (0.5 0.5)")) == 0.0
    # point to edge interior (perpendicular foot inside the edge)
    assert min_distance(parse_wkt("POINT (0.5 -2)"), sq) == 2.0
    # point to corner (foot outside both edges)
    d = min_distance(parse_wkt("POINT (-3 -4)"), sq)
    assert abs(d - 5.0) < 1e-12
    # point-point
    assert min_distance(parse_wkt("POINT (0 0)"), parse_wkt("POINT (3 4)")) == 5.0
    # None -> inf
    assert min_distance(None, sq) == float("inf")


def test_min_distance_concave_interior_attained():
    """Concave L vs a square sitting in the notch: envelope distance is
    0 but true distance is the gap to the L's inner edges."""
    from fagi_spark.geom import min_distance, parse_wkt
    L = parse_wkt("POLYGON ((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))")
    probe = parse_wkt("POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))")
    assert min_distance(L, probe) == 0.5


@settings(max_examples=200, deadline=None)
@given(ax=coord, ay=coord, aw=width, bx=coord, by=coord, bw=width)
def test_min_distance_squares_matches_gap_formula(ax, ay, aw, bx, by, bw):
    """For axis-aligned squares min_distance == the separating-gap
    formula sqrt(max(0,gapx)^2 + max(0,gapy)^2) — the independent
    ground truth the dwithin oracle states — and it is symmetric,
    non-negative, and zero exactly when the shapes intersect."""
    import math
    ga = geom.parse_wkt(_square_wkt(ax, ay, aw))
    gb = geom.parse_wkt(_square_wkt(bx, by, bw))
    gx = max(0.0, bx - (ax + aw), ax - (bx + bw))
    gy = max(0.0, by - (ay + aw), ay - (by + bw))
    want = math.sqrt(gx * gx + gy * gy)
    d_ab = geom.min_distance(ga, gb)
    assert d_ab == geom.min_distance(gb, ga)  # symmetry
    assert d_ab == want
    assert (d_ab == 0.0) == geom.geoms_intersect(ga, gb)


@settings(max_examples=150, deadline=None)
@given(px=coord, py=coord, x=coord, y=coord, w=width)
def test_min_distance_point_square_matches_clamp(px, py, x, y, w):
    """Point-to-box distance == distance to the clamped point."""
    import math
    gp = geom.parse_wkt(f"POINT ({px} {py})")
    gs = geom.parse_wkt(_square_wkt(x, y, w))
    cx = min(max(px, x), x + w)
    cy = min(max(py, y), y + w)
    want = math.sqrt((px - cx) ** 2 + (py - cy) ** 2)
    assert geom.min_distance(gp, gs) == want
    assert geom.min_distance(gs, gp) == want


def test_simplify_dp_hand_cases():
    """Douglas-Peucker: collinear midpoints drop, off-chord spikes
    survive at tight epsilon and drop at loose epsilon; rings never
    collapse below validity; points pass through."""
    from fagi_spark.geom import parse_wkt, simplify_dp, to_wkt
    line = parse_wkt("LINESTRING (0 0, 1 0, 2 0, 3 0.4, 4 0, 5 0)")
    tight = simplify_dp(line, 0.1)
    assert [tuple(p) for p in tight.parts[0]] == [
        (0.0, 0.0), (2.0, 0.0), (3.0, 0.4), (4.0, 0.0), (5.0, 0.0)]
    loose = simplify_dp(line, 0.5)
    assert [tuple(p) for p in loose.parts[0]] == [(0.0, 0.0), (5.0, 0.0)]
    # polygon ring: a nearly-collinear vertex on an edge drops
    poly = parse_wkt("POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))")
    s = simplify_dp(poly, 0.1)
    assert [tuple(p) for p in s.parts[0]] == [
        (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    # a tiny triangle would collapse below ring validity -> unchanged
    tri = parse_wkt("POLYGON ((0 0, 1 0, 0.5 0.1, 0 0))")
    assert to_wkt(simplify_dp(tri, 10.0)) == to_wkt(tri)
    # points pass through; None stays None
    pt = parse_wkt("POINT (3 4)")
    assert simplify_dp(pt, 1.0) is pt
    assert simplify_dp(None, 1.0) is None


def test_simplify_udf_roundtrip(spark):
    """The Arrow kernel wires geom.simplify_dp: WKT in, simplified WKT
    out, vertex counts shrink, invalid WKT -> NULL."""
    from pyspark.sql import functions as F
    from fagi_spark import kernels
    rows = [(1, "LINESTRING (0 0, 1 0, 2 0, 3 0, 4 0)"),
            (2, "POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))"),
            (3, "not wkt")]
    df = spark.createDataFrame(rows, "i long, geom_wkt string")
    out = {r.i: r.s for r in df.select(
        "i", kernels.wkt_simplify_udf(F.col("geom_wkt"), F.lit(0.1))
        .alias("s")).collect()}
    assert out[1] == "LINESTRING (0 0, 4 0)"
    assert out[2] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert out[3] is None
