"""FAGI geometry-fusion actions over the flagship links join.

Every action follows the reference's canonical set-based shape — one
INSERT...SELECT over ``links INNER JOIN geoms ON (nodea = a_s AND
nodeb = b_s)`` (SURVEY.md §2.3 J2; e.g.
KeepMostPointsTransformation.java:62-84) — re-expressed as a two-key
DataFrame equi-join plus per-action column expressions. Geometry stats
(npoints / centroid / kind) are precomputed columns, so most actions are
pure JVM column math; only translate/scale/rotate of full WKT enter an
Arrow kernel.

Action registry mirrors FuserPanel.java:130-173 (registered actions) +
the per-link-only extras (SURVEY.md §2.5 table); scores mirror the
per-transformation suitability formulas (§2.5 "Scoring").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geom
from .kernels import make_point_udf, wkt_affine_udf, wkt_stats_udf, wkt_translate_udf

A_COLS = ("subject", "geom_wkt", "geom_kind", "kind_rank", "npoints", "cx", "cy",
          "xmin", "ymin", "xmax", "ymax")


def prepare_geoms(df: DataFrame) -> DataFrame:
    """Ensure (subject, geom_wkt) carries precomputed stats columns."""
    if "npoints" in df.columns:
        return df
    st = df.withColumn("_s", wkt_stats_udf(F.col("geom_wkt")))
    return st.select("subject", "geom_wkt", "_s.geom_kind", "_s.kind_rank", "_s.npoints",
                     "_s.cx", "_s.cy", "_s.xmin", "_s.ymin", "_s.xmax", "_s.ymax")


def resolve_links(links: DataFrame, geo_a: DataFrame, geo_b: DataFrame,
                  broadcast_geo: bool = False,
                  late_fetch: bool = False) -> DataFrame:
    """The flagship two-key equi-join: links |><| A |><| B
    (KeepMostPointsTransformation.java:62-84 canonical shape). Inner
    join drops links whose subjects lack geometries (FIXTURES.md §4).

    ``late_fetch``: the reference's LATE_FETCH optimization
    (Constants.java:19; Importer.java:259-287) — semi-join each
    geometry side down to link-referenced subjects BEFORE the Arrow
    WKT-stats kernel, so only referenced geometries pay the parse. A
    pure plan rewrite (the inner join drops unreferenced rows anyway).

    Measured (r3 bench): within THIS lazy plan Catalyst subsumes the
    optimization on its own — ExtractPythonUDFs defers the WKT-stats
    eval until after the links join (any join strategy), so unreferenced
    geometries never parse even with ``late_fetch=False``. The explicit
    semi-join still matters (a) when the parsed gazetteer is
    MATERIALIZED (stats-table builds, persist boundaries, sinks — see
    bench.py ``gazetteer_parse_late_fetch``, ~6.5x at 1% link
    coverage), and (b) to shrink the shuffled side of a non-broadcast
    join before the exchange at warehouse scale.

    At scale: links is typically the small side -> broadcast it; if all
    sides are large the join shuffles on the subject keys and AQE's
    skew-join splitting handles residual imbalance (hot subjects are
    rare — hot *cells* are handled in joins.py instead)."""
    if late_fetch:
        # no forced broadcast hint: the distinct link-subject set is
        # usually small (size-based planning + AQE pick a broadcast
        # semi-join on their own), but links grow with the corpus and a
        # mandatory F.broadcast() of a multi-GB subject set would OOM
        # the driver at exactly the scale late_fetch exists for — there
        # the planner's shuffle semi-join is the right physical shape.
        ref_a = links.select(F.col("node_a").alias("subject")).distinct()
        ref_b = links.select(F.col("node_b").alias("subject")).distinct()
        geo_a = geo_a.join(ref_a, "subject", "leftsemi")
        geo_b = geo_b.join(ref_b, "subject", "leftsemi")
    a = prepare_geoms(geo_a)
    b = prepare_geoms(geo_b)
    a = a.select(*[F.col(c).alias(f"a_{c}") for c in A_COLS])
    b = b.select(*[F.col(c).alias(f"b_{c}") for c in A_COLS])
    if broadcast_geo:
        a, b = F.broadcast(a), F.broadcast(b)
    return (links.join(a, links.node_a == a.a_subject, "inner")
                 .join(b, links.node_b == b.b_subject, "inner"))


def _out(j: DataFrame, wkt_col, action: str) -> DataFrame:
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    wkt_col.alias("geom_wkt"),
                    F.lit(action).alias("action"))


def keep_left(j: DataFrame) -> DataFrame:
    """Keep A (KeepLeftTransformation.java:48-59)."""
    return _out(j, F.col("a_geom_wkt"), "Keep A")


def keep_right(j: DataFrame) -> DataFrame:
    """Keep B (KeepRightTransformation.java:48-59)."""
    return _out(j, F.col("b_geom_wkt"), "Keep B")


def keep_both(j: DataFrame) -> DataFrame:
    """Keep both: two output rows per link (KeepBothTransformation.java:54-73)."""
    return keep_left(j).unionByName(keep_right(j)).withColumn("action", F.lit("Keep both"))


def keep_most_points(j: DataFrame) -> DataFrame:
    """CASE WHEN ST_NPoints(a) >= ST_NPoints(b) THEN a ELSE b
    (KeepMostPointsTransformation.java:62-84)."""
    return _out(j, F.when(F.col("a_npoints") >= F.col("b_npoints"),
                          F.col("a_geom_wkt")).otherwise(F.col("b_geom_wkt")),
                "Keep most points")


def keep_most_points_translate(j: DataFrame) -> DataFrame:
    """Winner translated so its centroid lands on the loser's centroid:
    ST_Translate(win, lose_x - win_x, lose_y - win_y)
    (KeepMostPointsAndTranslateTransformation.java:130-155)."""
    a_wins = F.col("a_npoints") >= F.col("b_npoints")
    wkt = F.when(a_wins, F.col("a_geom_wkt")).otherwise(F.col("b_geom_wkt"))
    dx = F.when(a_wins, F.col("b_cx") - F.col("a_cx")).otherwise(F.col("a_cx") - F.col("b_cx"))
    dy = F.when(a_wins, F.col("b_cy") - F.col("a_cy")).otherwise(F.col("a_cy") - F.col("b_cy"))
    return _out(j, wkt_translate_udf(wkt, dx, dy), "Keep most points and translate")


def shift_a_to_b(j: DataFrame, shift: float = 50.0, scale: float = 1.0,
                 rotation: float = 0.0) -> DataFrame:
    """ShiftAToB.java:190-232: A translated toward B's centroid by
    shift/100, then GeomResize(scale) and GeomRotate(rotation)."""
    s = shift / 100.0
    dx = (F.col("b_cx") - F.col("a_cx")) * F.lit(s)
    dy = (F.col("b_cy") - F.col("a_cy")) * F.lit(s)
    return _out(j, wkt_affine_udf(F.col("a_geom_wkt"), dx, dy,
                                  F.lit(scale), F.lit(rotation)), "Shift A to B")


def shift_b_to_a(j: DataFrame, shift: float = 50.0, scale: float = 1.0,
                 rotation: float = 0.0) -> DataFrame:
    """Mirror of ShiftAToB on B's geometry (ShiftBToA.java:190-230)."""
    s = shift / 100.0
    dx = (F.col("a_cx") - F.col("b_cx")) * F.lit(s)
    dy = (F.col("a_cy") - F.col("b_cy")) * F.lit(s)
    return _out(j, wkt_affine_udf(F.col("b_geom_wkt"), dx, dy,
                                  F.lit(scale), F.lit(rotation)), "Shift B to A")


def concatenation(j: DataFrame) -> DataFrame:
    """GEOMETRYCOLLECTION(a, b) via WKT string concat — pure column expr
    (Concatenation.java:66-80; AbstractFusionTransformation.java:50-68)."""
    wkt = F.concat(F.lit("GEOMETRYCOLLECTION ("), F.col("a_geom_wkt"),
                   F.lit(", "), F.col("b_geom_wkt"), F.lit(")"))
    return _out(j, wkt, "Concatenation")


def avg_two_points(j: DataFrame) -> DataFrame:
    """Midpoint POINT((ax+bx)/2, (ay+by)/2) — per-link only in the
    reference (AvgTwoPointsTransformation.java:18-41)."""
    return _out(j, make_point_udf((F.col("a_cx") + F.col("b_cx")) / 2.0,
                                  (F.col("a_cy") + F.col("b_cy")) / 2.0),
                "Average two points")


def shift_polygon_to_point(j: DataFrame) -> DataFrame:
    """Translate polygon B so its centroid sits on point A:
    ST_Translate(b, a_x - b_x, a_y - b_y) (ShiftPolygonToPoint.java:98-112)."""
    return _out(j, wkt_translate_udf(F.col("b_geom_wkt"),
                                     F.col("a_cx") - F.col("b_cx"),
                                     F.col("a_cy") - F.col("b_cy")),
                "Shift polygon to point")


def shift_polygon_to_avg_distance(j: DataFrame) -> DataFrame:
    """Translate B by half the centroid gap (ShiftPolygonToAverageDistance.java:98-118)."""
    return _out(j, wkt_translate_udf(F.col("b_geom_wkt"),
                                     (F.col("a_cx") - F.col("b_cx")) / 2.0,
                                     (F.col("a_cy") - F.col("b_cy")) / 2.0),
                "Shift polygon to average distance")


def grid_centroid_cols(wkt):
    """Exact grid-centroid degrees of a simple-polygon WKT column as
    ``(cx, cy, valid)`` — gridgeom's BIGINT shoelace numerators with
    one mirrored IEEE division each, so the values are value-exact and
    oracle-comparable (unlike the float shoelace kernel; CLAUDE.md
    centroid rule). ``valid`` is false for non-polygons and degenerate
    (zero-area) rings."""
    from . import gridgeom
    verts = gridgeom.ring_grid(wkt)
    area2 = gridgeom.area2_grid(verts)
    cn = gridgeom.centroid_num_grid(verts)
    ok = area2.isNotNull() & (area2 != 0)
    a2d = F.lit(3.0) * area2.cast("double")
    cx = (cn.getField("cnx").cast("double") / a2d) / F.lit(100.0)
    cy = (cn.getField("cny").cast("double") / a2d) / F.lit(100.0)
    return cx, cy, ok


def shift_polygon_grid_centroid(j: DataFrame) -> DataFrame:
    """ShiftPolygonToPoint (ShiftPolygonToPoint.java:98-112) on the
    ROBUST centroid: translate B so its exact integer-grid shoelace
    centroid (gridgeom) lands on A's point. The float-kernel variant
    (shift_polygon_to_point) uses the parsed representative point;
    this is the value-exact path for simple polygon rings, falling back
    to the representative point for non-polygon / degenerate B."""
    gcx, gcy, ok = grid_centroid_cols(F.col("b_geom_wkt"))
    bcx = F.when(ok, gcx).otherwise(F.col("b_cx"))
    bcy = F.when(ok, gcy).otherwise(F.col("b_cy"))
    return _out(j, wkt_translate_udf(F.col("b_geom_wkt"),
                                     F.col("a_cx") - bcx,
                                     F.col("a_cy") - bcy),
                "Shift polygon to point (grid centroid)")


def scale_action(j: DataFrame, factor: float = 2.0, side: str = "a") -> DataFrame:
    """ST_Scale about centroid of the kept side (ScaleTransformation.java:115-130)."""
    from .kernels import wkt_scale_udf
    col = F.col("a_geom_wkt") if side == "a" else F.col("b_geom_wkt")
    return _out(j, wkt_scale_udf(col, F.lit(factor)), "Scale")


def offset_side(j: DataFrame, dx: float = 0.0, dy: float = 0.0,
                side: str = "a") -> DataFrame:
    """Manual offset through the links join (BatchFusionServlet.java:3110-3171)."""
    col = F.col("a_geom_wkt") if side == "a" else F.col("b_geom_wkt")
    return _out(j, wkt_translate_udf(col, F.lit(float(dx)), F.lit(float(dy))),
                f"Offset {side.upper()}")


ACTIONS = {
    "keep-left": keep_left,
    "keep-right": keep_right,
    "keep-both": keep_both,
    "keep-most-points": keep_most_points,
    "keep-most-points-translate": keep_most_points_translate,
    "shift-a-to-b": shift_a_to_b,
    "shift-b-to-a": shift_b_to_a,
    "concatenation": concatenation,
    "avg-two-points": avg_two_points,
    "shift-polygon-to-point": shift_polygon_to_point,
    "shift-polygon-to-avg-distance": shift_polygon_to_avg_distance,
    "shift-polygon-grid-centroid": shift_polygon_grid_centroid,
    "scale": scale_action,
    "offset-a": lambda j, **kw: offset_side(j, side="a", **kw),
    "offset-b": lambda j, **kw: offset_side(j, side="b", **kw),
}


def fuse(action: str, links: DataFrame, geo_a: DataFrame, geo_b: DataFrame,
         late_fetch: bool = False, **params) -> DataFrame:
    """GeometryFuser.fuse analog (GeometryFuser.java:106-129): resolve
    links then apply one registered action set-based (fuseAll shape).
    ``late_fetch=True`` enables the reference's flagship LATE_FETCH
    optimization (Constants.java:19) — see resolve_links."""
    j = resolve_links(links, geo_a, geo_b, late_fetch=late_fetch)
    return ACTIONS[action](j, **params)


def fuse_visible(action: str, links: DataFrame, geo_a: DataFrame,
                 geo_b: DataFrame, xmin: float, ymin: float,
                 xmax: float, ymax: float, **params) -> DataFrame:
    """FuseVisibleServlet analog (FuseVisibleServlet.java:150-167):
    fuse only links whose A-side geometry envelope overlaps the
    viewport (the reference fetches viewport subjects with
    ``geom && ST_MakeEnvelope(...)`` — a bbox-overlap test — then runs
    the canonical join on them). The viewport selection is a broadcast
    semi-join; at scale compose with the cell-range prune
    (joins.bbox_join) first."""
    a = prepare_geoms(geo_a)
    vis = (a.filter((F.col("xmin") <= F.lit(xmax)) & (F.lit(xmin) <= F.col("xmax"))
                    & (F.col("ymin") <= F.lit(ymax)) & (F.lit(ymin) <= F.col("ymax")))
           .select("subject"))
    links_vis = links.join(F.broadcast(vis),
                           links.node_a == vis.subject, "leftsemi")
    return fuse(action, links_vis, geo_a, geo_b, **params)


def fuse_cluster(action: str, cluster: DataFrame, geo_a: DataFrame,
                 geo_b: DataFrame, **params) -> DataFrame:
    """fuseCluster analog (AbstractFusionTransformation.java:14-48; J3):
    the identical set-based plan with the ``cluster`` link subset
    (BatchFusionServlet.loadClusterLinks:1294-1331) replacing ``links``.
    ``cluster`` must carry (node_a, node_b)."""
    return fuse(action, cluster, geo_a, geo_b, **params)


def export_fused(fused: DataFrame) -> DataFrame:
    """S9 export: SELECT DISTINCT subject_a, subject_b, geom
    (VirtuosoImporter.java:495)."""
    return fused.select("subject_a", "subject_b", "geom_wkt").distinct()


# ---------------------------------------------------------------------------
# Scores (§2.5 "Scoring") — one withColumn per action over the joined frame.
# ---------------------------------------------------------------------------

def with_scores(j: DataFrame, threshold_m: float = -1.0) -> DataFrame:
    """Suitability scores per §2.5:
    - keep-style actions: constant 1.0 (KeepLeftTransformation.java:33-35)
    - point ops: geometry-type gate POINT/POINT else 0
      (AvgTwoPointsTransformation.java:44-65)
    - shift family: sqrt((|t| - d)/t) with d = centroid distance in
      meters, gated on POINT/POLYGON types; t = -1 -> always 1.0
      (ShiftAToB.java:138-177). The reference computes d via
      ST_Transform to a metric SRID; we use degree-distance x 111195
      (Constants.java:79-80) — the same constant it uses everywhere else.
    """
    dx = F.col("a_cx") - F.col("b_cx")
    dy = F.col("a_cy") - F.col("b_cy")
    dist_deg = F.sqrt(dx * dx + dy * dy)
    d_m = dist_deg * F.lit(geom.METERS_PER_DEGREE)
    both_points = (F.col("a_geom_kind") == "POINT") & (F.col("b_geom_kind") == "POINT")
    point_poly = ((F.col("a_geom_kind") == "POINT")
                  & F.col("b_geom_kind").isin("POLYGON", "MULTIPOLYGON"))
    t = float(threshold_m)
    if t <= 0:
        shift_score = F.lit(1.0)
    else:
        shift_score = F.when(d_m < t, F.sqrt((F.lit(abs(t)) - d_m) / F.lit(t))).otherwise(F.lit(0.0))
    return (j.withColumn("score_keep", F.lit(1.0))
             .withColumn("score_avg_points", F.when(both_points, 1.0).otherwise(0.0))
             .withColumn("score_scale", F.when(both_points, 0.0).otherwise(1.0))
             .withColumn("score_shift", F.when(point_poly, shift_score).otherwise(F.lit(0.0))))
