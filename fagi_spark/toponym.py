"""Toponym disambiguation: resolve ambiguous place mentions by
spatial context.

The north-star pipeline geocodes web pages by extracting place names
(extract.geocode_pages); real gazetteers are AMBIGUOUS — "Paris" is a
city in France and in Texas — and the classic resolution (Leidner's
toponym-resolution heuristics; the one-sense-per-page assumption) picks
the candidate closest to the page's UNAMBIGUOUS mentions:

1. anchors: mentions whose name has exactly ONE gazetteer candidate
   pin the page to a region; the page anchor is their centroid;
2. each ambiguous mention picks the candidate nearest the anchor
   (squared grid distance, deterministic place-id tie-break);
3. pages with no anchor fall back to global importance (the
   most-important candidate for that name — gazetteer population
   rank), the standard default-sense heuristic.

Everything is exact/mirrorable arithmetic: coordinates snap to the
0.01-degree integer grid, the anchor centroid is ONE IEEE division of
exact BIGINT sums, distances are the same subtract/multiply tree on
both engines, and both argmins are row_number windows with total-order
tie-breaks — so the whole operator is value-exact against a DuckDB
oracle.

Scale shape: candidate counts per name are gazetteer-bounded (a name
has a handful of candidates, not millions), so the mention->candidate
join fans out by that small factor; the anchor aggregate is one
map-side-combined groupBy(page); the gazetteer side of both joins is
broadcast-sized in practice (dim table). No collects, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GRID = 100  # the engine-wide 0.01-degree integer grid


def _gridded(gazetteer: DataFrame, lon: str, lat: str) -> DataFrame:
    return gazetteer.withColumn(
        "_gx", F.round(F.col(lon) * GRID).cast("long")).withColumn(
        "_gy", F.round(F.col(lat) * GRID).cast("long"))


def resolve_toponyms(mentions: DataFrame, gazetteer: DataFrame,
                     page: str = "page_id", mention: str = "mention_id",
                     name: str = "name", place: str = "place_id",
                     lon: str = "lon", lat: str = "lat",
                     importance: str = "importance") -> DataFrame:
    """Resolve each mention to ONE gazetteer place.

    mentions: (page, mention, name); gazetteer: (place, name, lon,
    lat, importance). Returns (page, mention, name, place, method)
    with method in {'unique', 'anchor', 'importance'}."""
    gaz = _gridded(gazetteer, lon, lat).select(
        F.col(name).alias("_name"), F.col(place).alias("_place"),
        "_gx", "_gy", F.col(importance).alias("_imp"))

    n_cand = gaz.groupBy("_name").agg(F.count(F.lit(1)).alias("_nc"))
    gaz_n = gaz.join(F.broadcast(n_cand), "_name")

    m = mentions.select(F.col(page).alias("_page"),
                        F.col(mention).alias("_mention"),
                        F.col(name).alias("_name"))
    cand = m.join(gaz_n, "_name")

    # 1. unique-name mentions resolve outright and form the anchors
    uniq = cand.filter(F.col("_nc") == 1)
    anchors = (uniq.groupBy("_page")
               .agg(F.sum("_gx").alias("_sx"), F.sum("_gy").alias("_sy"),
                    F.count(F.lit(1)).alias("_n")))
    ax = F.col("_sx").cast("double") / (F.col("_n") * GRID).cast("double")
    ay = F.col("_sy").cast("double") / (F.col("_n") * GRID).cast("double")
    anchors = anchors.select("_page", ax.alias("_ax"), ay.alias("_ay"))

    # 2. ambiguous mentions: nearest candidate to the page anchor
    amb = (cand.filter(F.col("_nc") > 1)
           .join(anchors, "_page", "left"))
    cx = F.col("_gx").cast("double") / F.lit(float(GRID))
    cy = F.col("_gy").cast("double") / F.lit(float(GRID))
    d2 = ((cx - F.col("_ax")) * (cx - F.col("_ax"))
          + (cy - F.col("_ay")) * (cy - F.col("_ay")))
    amb = amb.withColumn("_d2", d2)
    w_anchor = Window.partitionBy("_page", "_mention").orderBy(
        F.col("_d2").asc(), F.col("_place").asc())
    # 3. anchorless pages: default sense = most important candidate
    #    (importance desc, place asc — a total order)
    w_imp = Window.partitionBy("_page", "_mention").orderBy(
        F.col("_imp").desc(), F.col("_place").asc())
    resolved_amb = (amb.withColumn(
        "_rn", F.when(F.col("_ax").isNotNull(),
                      F.row_number().over(w_anchor))
               .otherwise(F.row_number().over(w_imp)))
        .filter(F.col("_rn") == 1)
        .select("_page", "_mention", "_name", "_place",
                F.when(F.col("_ax").isNotNull(), F.lit("anchor"))
                 .otherwise(F.lit("importance")).alias("method")))

    resolved_uniq = uniq.select(
        "_page", "_mention", "_name", "_place",
        F.lit("unique").alias("method"))

    out = resolved_uniq.unionByName(resolved_amb)
    return out.select(F.col("_page").alias(page),
                      F.col("_mention").alias(mention),
                      F.col("_name").alias(name),
                      F.col("_place").alias(place), "method")


def sql_resolve_toponyms(mentions_cte: str = "mentions",
                         gaz_cte: str = "gazetteer") -> str:
    """DuckDB mirror of :func:`resolve_toponyms` from CTEs
    ``{mentions_cte}(page_id, mention_id, name)`` and
    ``{gaz_cte}(place_id, name, lon, lat, importance)``; the result
    lands in ``resolved(page_id, mention_id, name, place_id,
    method)``. Same grid snap, the same single IEEE division for the
    anchor centroid, the same distance tree and the same two
    row_number total orders."""
    return f"""tpg AS (
  SELECT name AS _name, place_id AS _place,
         CAST(round(lon * {GRID}) AS BIGINT) AS _gx,
         CAST(round(lat * {GRID}) AS BIGINT) AS _gy,
         importance AS _imp,
         COUNT(*) OVER (PARTITION BY name) AS _nc
  FROM {gaz_cte}),
tpc AS (
  SELECT m.page_id AS _page, m.mention_id AS _mention, g.*
  FROM {mentions_cte} m JOIN tpg g ON g._name = m.name),
tpanchor AS (
  SELECT _page,
         CAST(SUM(_gx) AS DOUBLE)
           / CAST(COUNT(*) * {GRID} AS DOUBLE) AS _ax,
         CAST(SUM(_gy) AS DOUBLE)
           / CAST(COUNT(*) * {GRID} AS DOUBLE) AS _ay
  FROM tpc WHERE _nc = 1 GROUP BY _page),
tpamb AS (
  SELECT c.*, a._ax, a._ay,
         (CAST(c._gx AS DOUBLE) / {GRID}.0 - a._ax)
           * (CAST(c._gx AS DOUBLE) / {GRID}.0 - a._ax)
         + (CAST(c._gy AS DOUBLE) / {GRID}.0 - a._ay)
           * (CAST(c._gy AS DOUBLE) / {GRID}.0 - a._ay) AS _d2
  FROM tpc c LEFT JOIN tpanchor a ON a._page = c._page
  WHERE c._nc > 1),
tpresolved_amb AS (
  SELECT _page, _mention, _name, _place,
         CASE WHEN _ax IS NOT NULL THEN 'anchor'
              ELSE 'importance' END AS method
  FROM (SELECT *,
          CASE WHEN _ax IS NOT NULL
               THEN ROW_NUMBER() OVER (PARTITION BY _page, _mention
                                       ORDER BY _d2 ASC, _place ASC)
               ELSE ROW_NUMBER() OVER (PARTITION BY _page, _mention
                                       ORDER BY _imp DESC, _place ASC)
          END AS _rn
        FROM tpamb)
  WHERE _rn = 1),
resolved AS (
  SELECT _page AS page_id, _mention AS mention_id, _name AS name,
         _place AS place_id, 'unique' AS method
  FROM tpc WHERE _nc = 1
  UNION ALL
  SELECT _page, _mention, _name, _place, method FROM tpresolved_amb)"""
