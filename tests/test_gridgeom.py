"""gridgeom: exact integer-grid polygon measures (JVM-only columns)."""

import math

from pyspark.sql import functions as F

from fagi_spark import gridgeom


def _measures(spark, wkts):
    df = spark.createDataFrame([(i, w) for i, w in enumerate(wkts)],
                               ["id", "geom_wkt"])
    out = gridgeom.polygon_measures(df)
    return {r["id"]: r.asDict() for r in out.collect()}


def _py_shoelace(pts):
    """Reference integer shoelace on grid vertices (closed ring)."""
    a2 = cnx = cny = 0
    per = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        cross = x0 * y1 - x1 * y0
        a2 += cross
        cnx += (x0 + x1) * cross
        cny += (y0 + y1) * cross
        per = per + math.sqrt(float((x1 - x0) ** 2 + (y1 - y0) ** 2))
    return a2, cnx, cny, per


def test_square_exact(spark):
    wkt = "POLYGON ((0.00 0.00, 0.08 0.00, 0.08 0.08, 0.00 0.08, 0.00 0.00))"
    m = _measures(spark, [wkt])[0]
    assert m["area2"] == 128            # 2 * 8 * 8
    # centroid (4, 4) grid units: cnx = 3 * area2 * cx
    assert m["cnx"] == 3 * 128 * 4 and m["cny"] == 3 * 128 * 4
    assert m["perim_grid"] == 32.0
    assert m["n_vertices"] == 4


def test_cw_ring_negative_area(spark):
    ccw = "POLYGON ((1.00 1.00, 1.05 1.00, 1.05 1.03, 1.00 1.03, 1.00 1.00))"
    cw = "POLYGON ((1.00 1.00, 1.00 1.03, 1.05 1.03, 1.05 1.00, 1.00 1.00))"
    m = _measures(spark, [ccw, cw])
    assert m[0]["area2"] == 2 * 5 * 3
    assert m[1]["area2"] == -2 * 5 * 3
    assert m[0]["perim_grid"] == m[1]["perim_grid"] == 16.0


def test_triangle_hypotenuse_ieee(spark):
    wkt = "POLYGON ((0.00 0.00, 0.03 0.00, 0.00 0.04, 0.00 0.00))"
    m = _measures(spark, [wkt])[0]
    assert m["area2"] == 12             # 2 * (3*4/2)
    # fold order: 3 (bottom), then hypotenuse 5, then 4 (left edge)
    assert m["perim_grid"] == ((0.0 + 3.0) + 5.0) + 4.0
    assert m["n_vertices"] == 3


def test_l_shape_matches_python_reference(spark):
    # rectangle 7x5 at (12.34, -0.10) with the top-right unit notch cut
    pts = [(1234, -10), (1241, -10), (1241, -6), (1240, -6),
           (1240, -5), (1234, -5), (1234, -10)]
    wkt = "POLYGON ((" + ", ".join(
        f"{x / 100:.2f} {y / 100:.2f}" for x, y in pts) + "))"
    a2, cnx, cny, per = _py_shoelace(pts)
    assert a2 == 2 * (7 * 5 - 1)
    m = _measures(spark, [wkt])[0]
    assert (m["area2"], m["cnx"], m["cny"]) == (a2, cnx, cny)
    assert m["perim_grid"] == per
    assert m["n_vertices"] == 6


def test_linestring_length_and_displacement(spark):
    df = spark.createDataFrame(
        [(0, "LINESTRING (0.00 0.00, 0.03 0.04, 0.03 0.02)"),
         (1, "LINESTRING (1.00 1.00, 1.10 1.00)")],
        ["id", "geom_wkt"])
    m = {r["id"]: r.asDict()
         for r in gridgeom.linestring_measures(df).collect()}
    # open path: 3-4-5 leg then straight down 2 — NOT closed back
    assert m[0]["length_grid"] == (0.0 + 5.0) + 2.0
    assert (m[0]["disp_gx"], m[0]["disp_gy"]) == (3, 2)
    assert m[0]["n_vertices"] == 3
    assert m[1]["length_grid"] == 10.0
    assert (m[1]["disp_gx"], m[1]["disp_gy"]) == (10, 0)
    assert m[1]["n_vertices"] == 2


def test_linestring_contract_query(spark):
    from fagi_spark import contract
    rows = contract.q_linestring_measures(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        k = int(r["subject"][3:])
        dx, dy = k % 9 + 1, k % 7 + 1
        want_n = 4 if k % 3 == 0 else 3
        assert r["n_vertices"] == want_n
        assert r["disp_gx"] == 2 * dx
        assert r["disp_gy"] == (dy + 1 if k % 3 == 0 else 0)
        leg = math.sqrt(float(dx * dx + dy * dy))
        want = (0.0 + leg) + leg
        if k % 3 == 0:
            want = want + float(dy + 1)
        assert r["length_grid"] == want


def test_point_wkt_grid_negative_safe_roundtrip(spark):
    """Formatting is sign-correct (-0.10 must NOT print as '-1.90')
    and round-trips exactly through the grid snap parse."""
    vals = [(-0.10, -0.01), (12.34, -56.78), (0.0, 0.05), (-179.99, 89.99)]
    df = spark.createDataFrame(vals, ["lon", "lat"])
    out = df.select(
        "lon", "lat",
        gridgeom.point_wkt_grid(F.col("lon"), F.col("lat")).alias("wkt"))
    for r in out.collect():
        x, y = r["wkt"][7:-1].split(" ")
        assert float(x) == r["lon"] and float(y) == r["lat"], r["wkt"]
    assert out.filter(F.col("lon") == -0.10).first()["wkt"] \
        == "POINT (-0.10 -0.01)"


def test_jvm_only_no_python_stage(spark):
    df = spark.createDataFrame(
        [("POLYGON ((0.00 0.00, 0.01 0.00, 0.01 0.01, 0.00 0.01, 0.00 0.00))",)],
        ["geom_wkt"])
    plan = gridgeom.polygon_measures(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_contract_query_runs(spark):
    from fagi_spark import contract
    out = contract.q_polygon_measures(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    by_mod = {r["subject"]: r for r in rows}
    # every rectangle row: area2 == 2*dx*dy, n_vertices == 4
    for r in rows:
        k = int(r["subject"][4:])
        dx, dy = k % 12 + 2, k % 10 + 2
        if k % 5 == 0:
            assert r["n_vertices"] == 6
            assert r["area2"] == 2 * (dx * dy - 1)
        elif k % 5 == 1:
            assert r["n_vertices"] == 3
            assert r["area2"] == dx * dy
        else:
            assert r["n_vertices"] == 4
            assert r["area2"] == 2 * dx * dy
    assert by_mod  # non-empty corpus
