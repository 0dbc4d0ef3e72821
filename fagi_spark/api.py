"""One-object switchover surface for a FAGI-gis user.

The reference exposes its engine through ~28 servlets (COVERAGE.md
"servlet sweep" maps each to an engine surface). :class:`FagiSession`
collects those surfaces behind one object so a user of the reference
can drive the whole workflow — discover, fuse, cluster, learn, match,
fetch, export — against the Spark engine without knowing the module
layout. Every method is a thin delegation to the module that owns the
operator (the contract queries and tests exercise those directly);
nothing here adds semantics.

    from fagi_spark.api import FagiSession
    s = FagiSession(spark, geo_a, geo_b, links=links,
                    meta_a=ma, meta_b=mb)
    s.find_links(radius_m=3000).show()          # FindLinkServlet
    s.fuse("keep-most-points").show()           # FusionServlet
    s.fetch_unlinked("a", bbox=(0, 0, 5, 5))    # FetchUnlinkedServlet
    s.export_dataset_nt().write.text(path)      # DownloadDataset
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import (cluster, discover, fuse, io, joins, learning, metadata_fuse,
               schema_match)


class FagiSession:
    """A fusion workspace: two geometry datasets, their EAV metadata,
    and a link set — the state one reference 'FusionState' carries.
    Geometry frames are (subject, geom_wkt [, stats]); stats columns
    are computed once on first use (fuse.prepare_geoms) and reused by
    every method. ``links`` is (node_a, node_b)."""

    def __init__(self, spark: SparkSession, geo_a: DataFrame,
                 geo_b: DataFrame, links: DataFrame | None = None,
                 meta_a: DataFrame | None = None,
                 meta_b: DataFrame | None = None,
                 dom_onto: str = "http://dom.org/"):
        self.spark = spark
        self._geo_a = fuse.prepare_geoms(geo_a)
        self._geo_b = fuse.prepare_geoms(geo_b)
        self.links = links
        self.meta_a = meta_a
        self.meta_b = meta_b
        self.dom_onto = dom_onto

    @classmethod
    def from_config(cls, spark: SparkSession, path: str) -> "FagiSession":
        """Connection / FusionState servlets: build the workspace from
        a fusion.conf file (config.parse_conf) whose paths point at
        parquet tables."""
        from .config import parse_conf
        cfg = parse_conf(path)
        sess = cls(spark,
                   spark.read.parquet(cfg.geo_a_path),
                   spark.read.parquet(cfg.geo_b_path),
                   links=io.read_nt_links(spark, cfg.links_path)
                   if cfg.links_path else None,
                   dom_onto=cfg.dom_onto)
        sess.config = cfg
        return sess

    # -- link discovery (FindLink / BatchFindLink) -------------------------
    def find_links(self, radius_m: float = 3000.0,
                   threshold: float | None = None, **kw) -> DataFrame:
        if self.meta_a is None or self.meta_b is None:
            raise ValueError("find_links needs meta_a and meta_b EAV frames")
        if threshold is not None:
            kw["threshold"] = threshold
        return discover.discover_links(self._geo_a, self._geo_b,
                                       self.meta_a, self.meta_b,
                                       radius_m, **kw)

    def set_links(self, links: DataFrame) -> "FagiSession":
        """CreateLink/Links servlets: adopt a link set (e.g.
        find_links output or io.read_nt_links)."""
        self.links = links.select("node_a", "node_b")
        return self

    def _require_links(self) -> DataFrame:
        if self.links is None:
            raise ValueError("no links: call set_links() or find_links()")
        return self.links

    # -- geometry fusion (FuseLink / Fusion / BatchFusion) ------------------
    def fuse(self, action: str, late_fetch: bool = False,
             **params) -> DataFrame:
        return fuse.fuse(action, self._require_links(), self._geo_a,
                         self._geo_b, late_fetch=late_fetch, **params)

    def fuse_visible(self, action: str, bbox: tuple, **params) -> DataFrame:
        """FuseVisibleServlet: fuse only links whose A geometry
        envelope overlaps the (xmin, ymin, xmax, ymax) viewport."""
        return fuse.fuse_visible(action, self._require_links(),
                                 self._geo_a, self._geo_b, *bbox, **params)

    def fusion_scores(self, threshold_m: float = -1.0) -> DataFrame:
        j = fuse.resolve_links(self._require_links(), self._geo_a,
                               self._geo_b)
        return fuse.with_scores(j, threshold_m)

    # -- metadata fusion -----------------------------------------------------
    def fuse_metadata(self, action: str = "keep-both", **kw) -> DataFrame:
        links = self._require_links()
        if self.meta_a is None or self.meta_b is None:
            raise ValueError("fuse_metadata needs meta_a and meta_b")
        if action == "keep-left":
            return metadata_fuse.keep_left(links, self.meta_a,
                                           self.dom_onto, **kw)
        if action == "keep-right":
            return metadata_fuse.keep_right(links, self.meta_b,
                                            self.dom_onto, **kw)
        if action == "keep-both":
            return metadata_fuse.keep_both(links, self.meta_a, self.meta_b,
                                           self.dom_onto, **kw)
        if action == "concat":
            return metadata_fuse.concat_values(links, self.meta_a,
                                               self.meta_b, self.dom_onto,
                                               **kw)
        if action == "flatten-left":
            return metadata_fuse.keep_flattened(links, self.meta_a,
                                                self.dom_onto, **kw)
        raise ValueError(f"unknown metadata action {action!r}")

    # -- clustering (ClusteringServlet) --------------------------------------
    def cluster_links(self, k: int | None = None, **kw) -> DataFrame:
        j = fuse.resolve_links(self._require_links(), self._geo_a,
                               self._geo_b)
        feats = cluster.link_features(j)
        return cluster.cluster_links(feats, k=k, **kw)

    # -- learning (Learning / BatchLearning / TagPredictor) ------------------
    def recommend_actions(self, labeled: DataFrame, **kw):
        """Train the action recommender on (features..., label) rows and
        return (model, predictions-on-own-links) — the
        LearningServlet round trip."""
        j = fuse.resolve_links(self._require_links(), self._geo_a,
                               self._geo_b)
        feats = learning.geometry_features(j)
        model = learning.train_recommender(labeled, **kw)
        return model, learning.predict_actions(model, feats)

    # -- schema matching (SchemaMatch / LinkSchemas) --------------------------
    def match_schemas(self, weighted: bool = False, exact: bool = False,
                      **kw) -> DataFrame:
        """``exact=True``: the fully-distributed JW-disabled variant
        (schema_match.match_schemas_exact — no driver collect, every
        term oracle-comparable). ``exact`` and ``weighted`` are
        mutually exclusive: the exact variant has no weighted scoring
        form, so requesting both raises instead of silently ignoring
        ``weighted`` (ADVICE r3)."""
        if self.meta_a is None or self.meta_b is None:
            raise ValueError("match_schemas needs meta_a and meta_b")
        if exact and weighted:
            raise ValueError(
                "match_schemas: exact=True and weighted=True are "
                "mutually exclusive — the exact distributed variant "
                "has no weighted scoring form")
        if exact:
            return schema_match.match_schemas_exact(self.meta_a,
                                                    self.meta_b, **kw)
        fn = (schema_match.match_schemas_weighted if weighted
              else schema_match.match_schemas)
        return fn(self.spark, self.meta_a, self.meta_b, **kw)

    # -- fetches / filters -----------------------------------------------------
    def fetch_unlinked(self, side: str = "a",
                       bbox: tuple | None = None) -> DataFrame:
        geo = self._geo_a if side == "a" else self._geo_b
        out = joins.unlinked_entities(geo, self._require_links(), side)
        if bbox is not None:
            out = joins.bbox_join(out, *bbox)
        return out

    def viewport(self, side: str, bbox: tuple, res: int = 10) -> DataFrame:
        geo = self._geo_a if side == "a" else self._geo_b
        return joins.bbox_join(geo, *bbox, res=res)

    def filter_subjects(self, regex: str, side: str = "a") -> DataFrame:
        geo = self._geo_a if side == "a" else self._geo_b
        return geo.filter(F.col("subject").rlike(regex))

    def fetch_link_data(self, subject: str, side: str = "a") -> DataFrame:
        """FetchLinkData: the EAV rows of one subject."""
        meta = self.meta_a if side == "a" else self.meta_b
        if meta is None:
            raise ValueError("no metadata frame for side " + side)
        return meta.filter(F.col("subject") == subject)

    def scan_geometries(self, side: str = "a") -> DataFrame:
        """ScanGeometries: the serialization probe — per-kind counts
        over the parsed geometry stats."""
        geo = self._geo_a if side == "a" else self._geo_b
        return (geo.groupBy("geom_kind")
                .agg(F.count(F.lit(1)).alias("n")))

    def geometry_measures(self, side: str = "a",
                          kind: str = "POLYGON") -> DataFrame:
        """Exact integer-grid measures as a projection (gridgeom):
        POLYGON -> shoelace area2 + centroid numerators + perimeter
        fold; LINESTRING -> path length + endpoint displacement. Pure
        whole-stage codegen — free to attach inside any scan."""
        from . import gridgeom
        geo = self._geo_a if side == "a" else self._geo_b
        sel = geo.filter(F.col("geom_kind") == kind)
        if kind == "LINESTRING":
            return gridgeom.linestring_measures(sel)
        return gridgeom.polygon_measures(sel)

    # -- position update (UpdatePositionServlet) -------------------------------
    def update_position(self, dx: float, dy: float,
                        side: str = "a") -> DataFrame:
        j = fuse.resolve_links(self._require_links(), self._geo_a,
                               self._geo_b)
        return fuse.offset_side(j, dx=dx, dy=dy, side=side)

    # -- export (DownloadDataset / Links) ---------------------------------------
    def export_fused(self, action: str, **params) -> DataFrame:
        return fuse.export_fused(self.fuse(action, **params))

    def export_links_nt(self) -> DataFrame:
        return io.links_to_nt(self._require_links())

    def export_dataset_nt(self, side: str = "a") -> DataFrame:
        meta = self.meta_a if side == "a" else self.meta_b
        if meta is None:
            raise ValueError("no metadata frame for side " + side)
        return io.dataset_to_nt(meta)

    # -- spatial joins (engine extensions beyond the servlets) -----------------
    def radius_join(self, radius_m: float, **kw) -> DataFrame:
        return joins.radius_join(self._geo_a, self._geo_b, radius_m, **kw)

    def knn(self, k: int, radius_m: float, shape: bool = False,
            **kw) -> DataFrame:
        """kNN conflation candidates: centroid metric by default,
        ``shape=True`` for true shape-distance ranking."""
        if shape:
            return joins.knn_shape_join(self._geo_a, self._geo_b, k,
                                        radius_m, **kw)
        return joins.knn_join(self._geo_a, self._geo_b, k, radius_m, **kw)

    def intersects(self, **kw) -> DataFrame:
        return joins.intersects_join(self._geo_a, self._geo_b, **kw)

    def dwithin(self, radius_m: float, **kw) -> DataFrame:
        return joins.dwithin_join(self._geo_a, self._geo_b, radius_m, **kw)

    def overlap_scores(self, res: int = 13, **kw) -> DataFrame:
        """Raster-footprint IoU per linked pair (degree of overlap)."""
        pa = self._geo_a.filter(F.col("geom_kind").isin(
            "POLYGON", "MULTIPOLYGON"))
        pb = self._geo_b.filter(F.col("geom_kind").isin(
            "POLYGON", "MULTIPOLYGON"))
        return joins.raster_iou(pa, pb, self._require_links(), res, **kw)

    # -- map preview (tiles) ------------------------------------------------------
    def preview_tiles(self, side: str = "a", res: int = 7) -> DataFrame:
        """Per-tile entity counts for the Leaflet preview."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        c = cells.with_cell(geo.select("subject", F.col("cx").alias("lon"),
                                       F.col("cy").alias("lat")), res)
        return c.groupBy("cell").agg(F.count(F.lit(1)).alias("n_entities"))

    def preview_density(self, side: str = "a", res: int = 7) -> DataFrame:
        """Smoothed heatmap layer for the map preview (3x3 binomial
        stencil over per-cell counts; cells.density_surface)."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        return cells.density_surface(
            geo.select(F.col("cx").alias("lon"), F.col("cy").alias("lat")),
            res)

    def hotspots(self, side: str = "a", res: int = 7) -> DataFrame:
        """Getis-Ord Gi* hotspot scores per occupied cell — the
        statistically normalized heatmap (cells.hotspots)."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        return cells.hotspots(
            geo.select(F.col("cx").alias("lon"), F.col("cy").alias("lat")),
            res)

    def morans_i(self, side: str = "a", res: int = 7) -> DataFrame:
        """Global Moran's I of one side's cell counts — is activity
        spatially clustered at all? (cells.morans_i, one row)."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        return cells.morans_i(
            geo.select(F.col("cx").alias("lon"), F.col("cy").alias("lat")),
            res)

    def geary_c(self, side: str = "a", res: int = 7) -> DataFrame:
        """Global Geary's C of one side's cell counts — the
        local-contrast companion to morans_i (cells.geary_c, one
        row; C < 1 clustered, C > 1 checkerboard-dissimilar)."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        return cells.geary_c(
            geo.select(F.col("cx").alias("lon"), F.col("cy").alias("lat")),
            res)

    def lisa(self, side: str = "a", res: int = 7) -> DataFrame:
        """LISA cluster map: per-cell local Moran's I with HH/LL/HL/LH
        quadrant labels (cells.local_morans_i)."""
        from . import cells
        geo = self._geo_a if side == "a" else self._geo_b
        return cells.local_morans_i(
            geo.select(F.col("cx").alias("lon"), F.col("cy").alias("lat")),
            res)

    def dbscan(self, side: str = "a", res: int = 6,
               min_pts: int = 7) -> DataFrame:
        """Density-based POI clustering: grid DBSCAN over one side's
        points — (subject, cell, cluster, role) with role in
        core/border/noise (cluster.grid_dbscan)."""
        from . import cluster
        geo = self._geo_a if side == "a" else self._geo_b
        pts = (geo.filter(F.col("geom_kind") == "POINT")
               .select("subject", F.col("cx").alias("lon"),
                       F.col("cy").alias("lat")))
        return cluster.grid_dbscan(pts, res, min_pts)

    def dbscan_hulls(self, side: str = "a", res: int = 6,
                     min_pts: int = 7) -> DataFrame:
        """Per-cluster convex hull export (ST_ConvexHull analog):
        exact grid monotone chain, verbatim coordinate text, shoelace
        area2 (cluster.dbscan_cluster_hull)."""
        from . import cluster
        geo = self._geo_a if side == "a" else self._geo_b
        pts = geo.filter(F.col("geom_kind") == "POINT")
        lab = self.dbscan(side=side, res=res, min_pts=min_pts)
        return cluster.dbscan_cluster_hull(lab, pts)

    def dissolve(self, groups: DataFrame, side: str = "a",
                 res: int = 13) -> DataFrame:
        """Per-group raster union of this side's polygons
        (joins.dissolve_area): ``groups`` maps subject -> group_id;
        overlapping footprints within a group are never
        double-counted."""
        geo = self._geo_a if side == "a" else self._geo_b
        polys = (geo.filter(F.col("geom_kind") == "POLYGON")
                 .join(groups, "subject"))
        return joins.dissolve_area(polys, res=res)

    def validity_report(self, side: str = "a") -> DataFrame:
        """Scan-time geometry QA for one side: the 7-class structural
        WKT inventory (extract.wkt_validity) joined with the geometric
        ring-simplicity verdict for its polygons
        (extract.ring_simple_check)."""
        from . import extract
        geo = self._geo_a if side == "a" else self._geo_b
        base = geo.select("subject", "geom_wkt")
        v = extract.wkt_validity(base)
        s = extract.ring_simple_check(base).select(
            "subject", "n_crossings", "is_simple")
        return v.join(s, "subject", "left")

    def snapshot_diff(self, new_geo: DataFrame,
                      side: str = "a") -> DataFrame:
        """CDC diff of one side against a newer snapshot
        (io.snapshot_diff): what an incremental re-conflation must
        touch — added/removed/changed subjects with both payloads."""
        from . import io as io_mod
        geo = self._geo_a if side == "a" else self._geo_b
        return io_mod.snapshot_diff(geo.select("subject", "geom_wkt"),
                                    new_geo.select("subject", "geom_wkt"))

    def hexbin(self, side: str = "a", size: float = 0.25) -> DataFrame:
        """Hexagonal-grid entity counts (cells.hex_cell axial
        assignment) — the isotropic alternative to preview_tiles."""
        from . import cells as _cells
        geo = self._geo_a if side == "a" else self._geo_b
        h = _cells.hex_cell(geo.select("cx", "cy"), size)
        return (h.groupBy("hq", "hr")
                .agg(F.count(F.lit(1)).cast("long").alias("n")))

    def segment_intersections(self, segs_a: DataFrame,
                              segs_b: DataFrame, **kw) -> DataFrame:
        """Exact integer segment-crossing join
        (joins.segment_intersections) over caller-provided
        (subject, x1, y1, x2, y2) integer-unit segment tables."""
        return joins.segment_intersections(segs_a, segs_b, **kw)
