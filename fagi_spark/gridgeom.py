"""Robust integer-grid geometry measures — pure JVM column expressions.

FAGI's fusion servlets report per-geometry measures (area/centroid of
the fused geometry, e.g. FuserWorker.java's centroid-shift actions and
the OSM area buckets in learning.py); the float shoelace kernel in
geom.py is the general path, but its numpy pairwise summation makes the
results engine-specific (CLAUDE.md: never oracle-compare shoelace
floats).  This module is the ROBUST-GEOMETRY alternative used by the
big-data path: snap WKT vertices to the 0.01-degree integer grid the
corpus already lives on (contract._fmt2 invariant) and compute

  * ``area2_grid``        signed 2*area, an exact BIGINT (shoelace on
                          longs — associative integer adds, no float),
  * ``centroid_num_grid`` the exact BIGINT centroid numerators
                          (cx = cnx / (3 * area2) in grid units), and
  * ``perimeter_grid``    the perimeter as an ordered left fold of
                          per-edge sqrt lengths (each edge length is a
                          correctly-rounded IEEE sqrt of an exact
                          integer, so the fold is engine-reproducible).

This is the JTS/GEOS "snap-rounding" trick re-expressed as Catalyst
expressions: every operator here compiles to whole-stage codegen
(split/transform/aggregate) — no Python worker, no UDF, usable at
100 TB as a projection inside any scan.

Parsing accepts simple ``POLYGON ((...))`` exterior rings (the engine's
polygon corpus shape; holes and multipolygons stay on the geom.py
kernel path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GRID_PER_DEG = 100  # the 0.01-degree corpus grid (contract._fmt2)


def _snap_pts(body: Column) -> Column:
    """'x y, x y, ...' coordinate text -> grid-snapped vertex structs.
    try_cast, not cast: ANSI mode (Spark 4 default) would otherwise
    throw on non-matching WKT fed through a mixed frame — callers get
    NULL measures (and fusion actions a representative-point fallback)
    instead of a job abort."""
    return F.transform(
        F.split(body, ", "),
        lambda p: F.struct(
            F.round(F.split(p, " ")[0].try_cast("double") * GRID_PER_DEG)
            .cast("long").alias("gx"),
            F.round(F.split(p, " ")[1].try_cast("double") * GRID_PER_DEG)
            .cast("long").alias("gy")))


def point_wkt_grid(lon: Column, lat: Column) -> Column:
    """Canonical grid POINT WKT from degree columns: snap to the 0.01
    grid and format as fixed-2-decimal text. Negative-safe (sign +
    abs-part formatting — a floor/lpad format would print -0.10 as
    '-1.90'); round-trips exactly through the snap parse."""
    def fmt(v):
        g = F.round(v * GRID_PER_DEG).cast("long")
        a = F.abs(g)
        return F.concat(
            F.when(g < 0, F.lit("-")).otherwise(F.lit("")),
            F.floor(a.cast("double") / F.lit(100.0)).cast("long").cast("string"),
            F.lit("."), F.lpad((a % 100).cast("string"), 2, "0"))
    return F.concat(F.lit("POINT ("), fmt(lon), F.lit(" "), fmt(lat),
                    F.lit(")"))


def ring_grid(wkt: Column) -> Column:
    """Exterior-ring vertices of a simple POLYGON WKT as
    ``array<struct<gx:bigint, gy:bigint>>`` snapped to the integer
    grid.  JVM-only: regexp strip + split + transform (codegen), no
    Python.  The closing vertex is kept (WKT rings repeat the first
    point), which the measures below rely on."""
    return _snap_pts(F.regexp_replace(wkt, r"^POLYGON \(\(|\)\)$", ""))


def line_grid(wkt: Column) -> Column:
    """LINESTRING vertices snapped to the grid — an OPEN path (no
    closing vertex), same struct shape as :func:`ring_grid`, so
    :func:`perimeter_grid` over it is the exact path LENGTH (the
    consecutive-pair fold never closes the path)."""
    return _snap_pts(F.regexp_replace(wkt, r"^LINESTRING \(|\)$", ""))


def _edge_pairs(verts: Column, fn) -> Column:
    """zip each vertex with its successor (closed-ring edge list) and
    map ``fn(a, b)`` over the pairs — array order == ring order."""
    n = F.size(verts)
    return F.zip_with(F.slice(verts, 1, n - 1),
                      F.slice(verts, 2, n - 1), fn)


def area2_grid(verts: Column) -> Column:
    """Signed 2*area in grid cells, exact BIGINT (positive = CCW ring).
    Integer shoelace: every cross term and the sum are longs, so the
    result is bit-exact regardless of fold order or engine."""
    terms = _edge_pairs(verts, lambda a, b: a.gx * b.gy - b.gx * a.gy)
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def centroid_num_grid(verts: Column) -> Column:
    """Exact centroid numerators ``struct<cnx:bigint, cny:bigint>``:
    cx = cnx / (3 * area2), cy = cny / (3 * area2) in grid units.
    Keeping the division to the caller keeps the operator value-exact;
    a reader wanting degrees divides once at the edge."""
    nx = _edge_pairs(
        verts, lambda a, b: (a.gx + b.gx) * (a.gx * b.gy - b.gx * a.gy))
    ny = _edge_pairs(
        verts, lambda a, b: (a.gy + b.gy) * (a.gx * b.gy - b.gx * a.gy))
    zero = F.lit(0).cast("long")
    return F.struct(
        F.aggregate(nx, zero, lambda acc, t: acc + t).alias("cnx"),
        F.aggregate(ny, zero, lambda acc, t: acc + t).alias("cny"))


def perimeter_grid(verts: Column) -> Column:
    """Perimeter in grid units as an ordered left fold of per-edge
    lengths.  dx*dx+dy*dy is an exact long, its double cast is exact
    (< 2^53 for any on-earth grid), sqrt is correctly rounded IEEE —
    so the only order-sensitive step is the final fold, which both
    engines run left-associatively (F.aggregate here, LIST_REDUCE with
    a 0.0 prepend in the DuckDB mirror)."""
    lens = _edge_pairs(
        verts,
        lambda a, b: F.sqrt(((b.gx - a.gx) * (b.gx - a.gx)
                             + (b.gy - a.gy) * (b.gy - a.gy))
                            .cast("double")))
    return F.aggregate(lens, F.lit(0.0), lambda acc, x: acc + x)


def linestring_measures(df, wkt_col: str = "geom_wkt",
                        out_prefix: str = "") -> "DataFrame":  # noqa: F821
    """Attach ``length_grid`` (exact-per-edge IEEE fold, grid units),
    ``n_vertices`` and the exact BIGINT endpoint displacement
    ``(disp_gx, disp_gy)`` for a LINESTRING WKT column — the open-path
    twin of :func:`polygon_measures` (OSM-way lengths; same codegen-only
    guarantee)."""
    p = out_prefix
    verts = line_grid(F.col(wkt_col))
    return df.withColumn("_verts", verts).select(
        "*",
        perimeter_grid(F.col("_verts")).alias(p + "length_grid"),
        (F.element_at("_verts", -1).getField("gx")
         - F.element_at("_verts", 1).getField("gx")).alias(p + "disp_gx"),
        (F.element_at("_verts", -1).getField("gy")
         - F.element_at("_verts", 1).getField("gy")).alias(p + "disp_gy"),
        F.size("_verts").alias(p + "n_vertices"),
    ).drop("_verts")


def polygon_measures(df, wkt_col: str = "geom_wkt", out_prefix: str = "") -> "DataFrame":  # noqa: F821
    """Attach ``area2``, ``cnx``, ``cny``, ``perim_grid`` and
    ``n_vertices`` for a simple-polygon WKT column — one projection,
    whole-stage codegen end to end."""
    p = out_prefix
    verts = ring_grid(F.col(wkt_col))
    cn = centroid_num_grid(verts)
    return df.withColumn("_verts", verts).select(
        "*",
        area2_grid(F.col("_verts")).alias(p + "area2"),
        cn.getField("cnx").alias(p + "cnx"),
        cn.getField("cny").alias(p + "cny"),
        perimeter_grid(F.col("_verts")).alias(p + "perim_grid"),
        (F.size("_verts") - 1).alias(p + "n_vertices"),
    ).drop("_verts")
