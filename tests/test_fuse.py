"""Fusion actions vs independently computed expected outputs
(SURVEY.md §5.3 fixture parity; formulas cited per action in fuse.py)."""

import pytest

from fagi_spark import fuse, geom


def _fixture(spark):
    geo_a = spark.createDataFrame([
        ("a1", "POINT (10 20)"),
        ("a2", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        ("a3", "POINT (100 50)"),
    ], "subject string, geom_wkt string")
    geo_b = spark.createDataFrame([
        ("b1", "POLYGON ((10 20, 12 20, 12 22, 10 22, 10 20))"),
        ("b2", "POINT (1 1)"),
        ("b3", "POINT (101 51)"),
    ], "subject string, geom_wkt string")
    links = spark.createDataFrame(
        [("a1", "b1"), ("a2", "b2"), ("a3", "b3"), ("missing", "b1")],
        "node_a string, node_b string")
    return links, geo_a, geo_b


def _rows(df):
    return {(r.subject_a, r.subject_b): r.geom_wkt for r in df.collect()}


def test_inner_join_drops_dangling_links(spark):
    links, ga, gb = _fixture(spark)
    j = fuse.resolve_links(links, ga, gb)
    assert j.count() == 3  # ("missing","b1") dropped


def test_late_fetch_equals_plain_and_prunes_before_parse(spark):
    """LATE_FETCH (Constants.java:19): identical join output, and the
    semi-join prune sits upstream of the WKT-stats kernel in the plan."""
    from fagi_spark import synth
    geo_a, geo_b, links, _, _ = synth.synth_fixture(spark, 120, 40)
    plain = fuse.resolve_links(links, geo_a, geo_b)
    late = fuse.resolve_links(links, geo_a, geo_b, late_fetch=True)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, late.collect()))
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        late.explain("formatted")
    assert "LeftSemi" in buf.getvalue()


def test_keep_left_right_both(spark):
    links, ga, gb = _fixture(spark)
    assert _rows(fuse.fuse("keep-left", links, ga, gb))[("a1", "b1")] == "POINT (10 20)"
    assert _rows(fuse.fuse("keep-right", links, ga, gb))[("a1", "b1")] == \
        "POLYGON ((10 20, 12 20, 12 22, 10 22, 10 20))"
    both = fuse.fuse("keep-both", links, ga, gb)
    assert both.count() == 6  # two rows per link (KeepBothTransformation.java:54-73)


def test_keep_most_points_and_translate(spark):
    links, ga, gb = _fixture(spark)
    r = _rows(fuse.fuse("keep-most-points", links, ga, gb))
    assert r[("a1", "b1")].startswith("POLYGON")  # b has 5 points > a's 1
    assert r[("a2", "b2")].startswith("POLYGON")  # a wins ties/more
    # translate: winner's centroid moves onto loser's centroid
    t = _rows(fuse.fuse("keep-most-points-translate", links, ga, gb))
    g = geom.parse_wkt(t[("a1", "b1")])
    assert geom.centroid(g) == pytest.approx((10.0, 20.0))  # b-polygon now on a's point
    g2 = geom.parse_wkt(t[("a2", "b2")])
    assert geom.centroid(g2) == pytest.approx((1.0, 1.0))


def test_shift_a_to_b_half(spark):
    links, ga, gb = _fixture(spark)
    r = _rows(fuse.fuse("shift-a-to-b", links, ga, gb, shift=50.0))
    g = geom.parse_wkt(r[("a3", "b3")])
    assert geom.centroid(g) == pytest.approx((100.5, 50.5))  # halfway


def test_concatenation_and_avg(spark):
    links, ga, gb = _fixture(spark)
    r = _rows(fuse.fuse("concatenation", links, ga, gb))
    assert r[("a3", "b3")] == "GEOMETRYCOLLECTION (POINT (100 50), POINT (101 51))"
    m = _rows(fuse.fuse("avg-two-points", links, ga, gb))
    assert m[("a3", "b3")] == "POINT (100.5 50.5)"


def test_shift_polygon_to_point(spark):
    links, ga, gb = _fixture(spark)
    r = _rows(fuse.fuse("shift-polygon-to-point", links, ga, gb))
    g = geom.parse_wkt(r[("a1", "b1")])  # B polygon moved onto A point
    assert geom.centroid(g) == pytest.approx((10.0, 20.0))
    h = _rows(fuse.fuse("shift-polygon-to-avg-distance", links, ga, gb))
    g2 = geom.parse_wkt(h[("a1", "b1")])
    assert geom.centroid(g2) == pytest.approx((10.5, 20.5))  # half the gap


def test_shift_polygon_grid_centroid(spark):
    """Robust-centroid variant: exact grid shoelace centroid for
    polygon B, representative-point fallback otherwise."""
    links, ga, gb = _fixture(spark)
    r = _rows(fuse.fuse("shift-polygon-grid-centroid", links, ga, gb))
    g = geom.parse_wkt(r[("a1", "b1")])  # B square centroid -> A point
    assert geom.centroid(g) == pytest.approx((10.0, 20.0))
    # non-polygon B (b2 = POINT (1 1)) falls back to b_cx/b_cy: the
    # point lands on A's representative point (a2 centroid (2, 2))
    g2 = geom.parse_wkt(r[("a2", "b2")])
    assert geom.centroid(g2) == pytest.approx((2.0, 2.0))


def test_scores(spark):
    links, ga, gb = _fixture(spark)
    j = fuse.with_scores(fuse.resolve_links(links, ga, gb), threshold_m=300000.0)
    rows = {(r.node_a, r.node_b): r for r in j.collect()}
    assert rows[("a3", "b3")].score_avg_points == 1.0  # POINT/POINT
    assert rows[("a1", "b1")].score_avg_points == 0.0
    # a1 POINT vs b1 POLYGON: gated in, sqrt((t-d)/t)
    d = ((2.0 ** 2 + 2.0 ** 2) ** 0.5 / 2) * 0  # centroid of b1 is (11,21): d = sqrt(2)
    import math
    d_m = math.sqrt(2.0) * geom.METERS_PER_DEGREE
    want = math.sqrt((300000.0 - d_m) / 300000.0)
    assert rows[("a1", "b1")].score_shift == pytest.approx(want)
    assert rows[("a3", "b3")].score_shift == 0.0  # POINT/POINT not gated in


def test_offset_action_translates_kept_side(spark):
    """Manual Offset A/B (BatchFusionServlet.java:3110-3171): the chosen
    side's geometry shifted by (dx, dy) through the links join."""
    links, geo_a, geo_b = _fixture(spark)
    out = {r["subject_a"]: r["geom_wkt"]
           for r in fuse.fuse("offset-a", links, geo_a, geo_b,
                              dx=1.5, dy=-0.5).collect()}
    assert out["a1"] == "POINT (11.5 19.5)"
    gb = {r["subject_b"]: r["geom_wkt"]
          for r in fuse.fuse("offset-b", links, geo_a, geo_b,
                             dx=2.0, dy=0.0).collect()}
    assert gb["b2"] == "POINT (3 1)"


def test_export_distinct(spark):
    links, ga, gb = _fixture(spark)
    f = fuse.fuse("keep-both", links, ga, gb)
    doubled = f.unionByName(f)
    assert fuse.export_fused(doubled).count() == fuse.export_fused(f).count()


def test_snapshot_diff_handcase(spark):
    from fagi_spark import io as fio

    old = spark.createDataFrame(
        [("s1", "POINT (1 1)"), ("s2", "POINT (2 2)"),
         ("s3", None), ("s4", "POINT (4 4)")],
        "subject string, geom_wkt string")
    new = spark.createDataFrame(
        [("s1", "POINT (1 1)"),        # unchanged
         ("s2", "POINT (9 9)"),        # changed
         ("s3", "POINT (3 3)"),        # changed (NULL -> value)
         ("s5", None)],                # added with NULL payload
        "subject string, geom_wkt string")          # s4 removed

    got = {r.subject: (r.change, r.old_geom_wkt, r.new_geom_wkt)
           for r in fio.snapshot_diff(old, new).collect()}
    assert got == {
        "s2": ("changed", "POINT (2 2)", "POINT (9 9)"),
        "s3": ("changed", None, "POINT (3 3)"),
        "s4": ("removed", "POINT (4 4)", None),
        "s5": ("added", None, None),
    }
    both = fio.snapshot_diff(old, new, keep_unchanged=True).collect()
    assert {r.subject: r.change for r in both}["s1"] == "unchanged"
    assert len(both) == 5
