"""FagiSession façade: one object drives the whole reference workflow
(each method delegates to the operator modules the contract tests
verify — these tests check the wiring, not re-verify semantics)."""
import pytest
from pyspark.sql import functions as F

from fagi_spark import synth
from fagi_spark.api import FagiSession


@pytest.fixture(scope="module")
def sess(spark):
    ga, gb, links, ma, mb = synth.synth_fixture(spark, 300, 200)
    return FagiSession(spark, ga, gb, links=links, meta_a=ma, meta_b=mb)


def test_fuse_and_scores(sess):
    fused = sess.fuse("keep-most-points")
    assert fused.count() > 0
    assert {"subject_a", "subject_b", "geom_wkt", "action"} <= set(fused.columns)
    sc = sess.fusion_scores()
    assert "score" in sc.columns or any("score" in c for c in sc.columns)


def test_fuse_visible_subset(sess):
    all_f = sess.fuse("keep-left").count()
    vis = sess.fuse_visible("keep-left", (-10.0, -10.0, 10.0, 10.0)).count()
    assert 0 <= vis <= all_f


def test_metadata_actions(sess):
    kb = sess.fuse_metadata("keep-both")
    assert kb.count() > 0 and "predicate" in kb.columns
    with pytest.raises(ValueError):
        sess.fuse_metadata("nope")


def test_fetches_and_filters(sess):
    unl = sess.fetch_unlinked("a")
    assert unl.count() > 0
    # unlinked ∩ linked == ∅
    linked = sess.links.select(F.col("node_a").alias("subject")).distinct()
    assert unl.join(linked, "subject").count() == 0
    assert sess.viewport("a", (-180.0, -90.0, 180.0, 90.0)).count() \
        == sess._geo_a.count()
    n_f1 = sess.filter_subjects("1$").count()   # subjects ending in 1
    assert 0 < n_f1 < sess._geo_a.count()
    kinds = {r.geom_kind for r in sess.scan_geometries("a").collect()}
    assert "POINT" in kinds


def test_geometry_measures_and_exact_match_wiring(sess):
    gm = sess.geometry_measures("a", kind="POLYGON")
    assert {"area2", "cnx", "cny", "perim_grid"} <= set(gm.columns)
    rows = gm.limit(5).collect()
    assert all(r["area2"] is not None for r in rows)
    ex = sess.match_schemas(exact=True)
    assert {"pred_a", "pred_b", "sem", "type_compat",
            "score_nojw"} == set(ex.columns)
    assert ex.count() > 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        sess.match_schemas(exact=True, weighted=True)


def test_find_links_and_set(sess, spark):
    found = sess.find_links(radius_m=5000.0)
    assert {"node_a", "node_b"} <= set(found.columns)
    s2 = FagiSession(spark, sess._geo_a, sess._geo_b,
                     meta_a=sess.meta_a, meta_b=sess.meta_b)
    with pytest.raises(ValueError):
        s2.fuse("keep-left")
    s2.set_links(found)
    assert s2.fuse("keep-left").count() >= 0


def test_update_position_and_exports(sess):
    up = sess.update_position(0.01, 0.0, side="a")
    assert up.count() > 0
    nt = sess.export_links_nt()
    assert nt.count() == sess.links.count()
    ds = sess.export_dataset_nt("a")
    assert ds.count() > 0
    tiles = sess.preview_tiles("a", res=7)
    assert tiles.agg(F.sum("n_entities")).first()[0] == sess._geo_a.count()


def test_spatial_join_wiring(sess):
    rj = sess.radius_join(5000.0)
    assert {"a_subject", "b_subject"} <= set(rj.columns)
    kn = sess.knn(k=2, radius_m=5000.0)
    assert "knn_rank" in kn.columns and kn.count() > 0
    ks = sess.knn(k=1, radius_m=5000.0, shape=True)
    assert ks.count() > 0
    assert sess.intersects().count() >= 0
    # dwithin at a radius is a superset of intersects (distance 0)
    assert sess.dwithin(1000.0).count() >= sess.intersects().count()
    ov = sess.overlap_scores(res=9)
    assert {"node_a", "node_b", "iou"} <= set(ov.columns)


def test_cluster_links_wiring(sess):
    cl = sess.cluster_links(k=2)
    assert {"node_a", "node_b", "cluster"} <= set(cl.columns)
    assert cl.count() == sess.fuse("keep-left").count()


def test_dbscan_wiring(sess):
    db = sess.dbscan(res=6, min_pts=3)
    assert {"subject", "cell", "cluster", "role"} <= set(db.columns)
    roles = {r.role for r in db.select("role").distinct().collect()}
    assert roles <= {"core", "border", "noise"} and "core" in roles
    hulls = sess.dbscan_hulls(res=6, min_pts=3)
    assert {"cluster", "n_points", "n_hull", "hull_wkt",
            "area2", "diam2"} == set(hulls.columns)
    assert hulls.count() > 0


def test_esda_wiring(sess):
    mi = sess.morans_i(res=6).collect()
    assert len(mi) == 1 and mi[0].morans_i is not None
    li = sess.lisa(res=6)
    assert {"cell", "lisa_i", "quadrant"} <= set(li.columns)
    assert li.count() > 0
    hs = sess.hotspots(res=6)
    assert {"cell", "gi_star"} <= set(hs.columns)


def test_dissolve_wiring(sess, spark):
    groups = sess._geo_b.select("subject").withColumn(
        "group_id", F.xxhash64("subject") % 3)
    out = sess.dissolve(groups, side="b", res=16)
    assert {"group_id", "n_cells", "n_polys"} == set(out.columns)
    assert out.count() > 0


def test_qa_and_cdc_wiring(sess, spark):
    v = sess.validity_report()
    assert {"subject", "validity", "n_vertices", "n_crossings",
            "is_simple"} <= set(v.columns)
    assert v.filter(F.col("validity").isin("ok_point", "ok_polygon")).count() > 0

    new_geo = sess._geo_a.select(
        "subject",
        F.when(F.xxhash64("subject") % 5 == 0,
               F.lit("POINT (0.00 0.00)")).otherwise(F.col("geom_wkt"))
        .alias("geom_wkt"))
    d = sess.snapshot_diff(new_geo)
    assert set(r.change for r in d.collect()) <= {"added", "removed",
                                                  "changed"}

    h = sess.hexbin()
    assert h.count() > 0 and {"hq", "hr", "n"} <= set(h.columns)

    segs = spark.createDataFrame(
        [("s1", 0, 0, 10, 10), ("s2", 0, 10, 10, 0)],
        "subject string, x1 long, y1 long, x2 long, y2 long")
    x = sess.segment_intersections(segs, segs.withColumnRenamed(
        "subject", "subject")).collect()
    assert any(r.itype == "proper" for r in x)
