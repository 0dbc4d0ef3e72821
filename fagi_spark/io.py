"""Sources / sinks: N-Triples links scan, fused export, merge-replace.

S1 links-file scan (GeometryFuser.parseLinksFile,
GeometryFuser.java:155-180): the reference parses any RDF file with
Jena and keeps ``owl:sameAs`` statements whose object is a resource.
Here: ``spark.read.text`` + column regex parsing — line-oriented
N-Triples needs no Python, stays in codegen, and splits across
executors for arbitrarily large link files.

S9 fused-geometry export (VirtuosoImporter.java:481-550): SELECT
DISTINCT + delete-old-triples-then-insert per fused subject — the
delete/replace becomes an anti-join + union.

S10 dataset download (DownloadDatasetServlet): N-Triples text lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"  # Constants.java:49

# <subj> <pred> <obj> .   — object must be a resource (S1 rule)
_NT_RES_RE = r"^\s*<([^>]+)>\s+<([^>]+)>\s+<([^>]+)>\s*\.\s*$"
# literal object with optional @lang or ^^<dtype>
_NT_LIT_RE = r'^\s*<([^>]+)>\s+<([^>]+)>\s+"((?:[^"\\]|\\.)*)"(?:@([a-zA-Z-]+))?(?:\^\^<([^>]+)>)?\s*\.\s*$'


def read_nt_links(spark: SparkSession, path: str,
                  link_predicate: str = SAME_AS) -> DataFrame:
    """Parse an N-Triples file into (node_a, node_b) sameAs pairs.
    Non-matching lines and literal-object statements are dropped
    (object must be a resource — GeometryFuser.java:166-171)."""
    lines = spark.read.text(path)
    return parse_nt_links(lines, link_predicate)


def parse_nt_links(lines: DataFrame, link_predicate: str = SAME_AS) -> DataFrame:
    """Same as read_nt_links over an existing (value string) frame."""
    parsed = lines.select(
        F.regexp_extract("value", _NT_RES_RE, 1).alias("node_a"),
        F.regexp_extract("value", _NT_RES_RE, 2).alias("predicate"),
        F.regexp_extract("value", _NT_RES_RE, 3).alias("node_b"))
    return (parsed.filter((F.col("predicate") == link_predicate)
                          & (F.col("node_a") != "") & (F.col("node_b") != ""))
            .select("node_a", "node_b"))


def parse_nt_triples(lines: DataFrame) -> DataFrame:
    """Full EAV parse: resource + literal statements ->
    (subject, predicate, object, lang, dtype) — the metadata_{a,b}
    table shape (schema.sql:20-29)."""
    res = (lines
           .filter(F.col("value").rlike(_NT_RES_RE))
           .select(F.regexp_extract("value", _NT_RES_RE, 1).alias("subject"),
                   F.regexp_extract("value", _NT_RES_RE, 2).alias("predicate"),
                   F.regexp_extract("value", _NT_RES_RE, 3).alias("object"),
                   F.lit(None).cast("string").alias("lang"),
                   F.lit(None).cast("string").alias("dtype")))
    lit = (lines
           .filter(F.col("value").rlike(_NT_LIT_RE))
           .select(F.regexp_extract("value", _NT_LIT_RE, 1).alias("subject"),
                   F.regexp_extract("value", _NT_LIT_RE, 2).alias("predicate"),
                   # unescape ONLY \" and \\ (what dataset_to_nt emits);
                   # other NT escapes (\n, \t, \uXXXX) pass through
                   # untouched rather than being silently corrupted
                   F.regexp_replace(
                       F.regexp_extract("value", _NT_LIT_RE, 3),
                       r'\\(["\\])', "$1").alias("object"),
                   F.nullif(F.regexp_extract("value", _NT_LIT_RE, 4), F.lit("")).alias("lang"),
                   F.nullif(F.regexp_extract("value", _NT_LIT_RE, 5), F.lit("")).alias("dtype")))
    return res.unionByName(lit)


def links_to_nt(links: DataFrame, link_predicate: str = SAME_AS) -> DataFrame:
    """Links -> N-Triples lines (S8 ``selected_links.nt`` analog,
    FusionGISCLI.java:374-421)."""
    return links.select(F.concat(F.lit("<"), "node_a", F.lit(f"> <{link_predicate}> <"),
                                 "node_b", F.lit("> .")).alias("value"))


def dataset_to_nt(meta: DataFrame) -> DataFrame:
    """S10 full fused-dataset dump (DownloadDatasetServlet.StreamDataset,
    DownloadDatasetServlet.java:97-160): every triple of the target
    graph as one N-Triples line — resource objects as
    ``<s> <p> <o> .`` (the servlet's isURI pass), literals as
    ``<s> <p> "o" .`` (the isLiteral pass). Deviations from the
    reference, both lossless-direction fixes: ``@lang`` / ``^^<dtype>``
    tags are emitted (the servlet drops them) and quotes/backslashes
    are escaped (the servlet writes them raw, producing invalid NT).
    Pure column concat — codegen, no Python; write with
    ``df.write.text(path)`` for the dump file."""
    is_uri = (F.col("lang").isNull() & F.col("dtype").isNull()
              & F.col("object").rlike("^https?://"))
    esc = F.regexp_replace(F.regexp_replace(F.col("object"),
                                            "\\\\", "\\\\\\\\"),
                           '"', '\\\\"')
    res_line = F.concat(F.lit("<"), "subject", F.lit("> <"), "predicate",
                        F.lit("> <"), "object", F.lit("> ."))
    lit_line = F.concat(
        F.lit("<"), "subject", F.lit("> <"), "predicate", F.lit('> "'),
        esc, F.lit('"'),
        F.coalesce(F.concat(F.lit("@"), "lang"), F.lit("")),
        F.coalesce(F.concat(F.lit("^^<"), "dtype", F.lit(">")), F.lit("")),
        F.lit(" ."))
    return meta.select(F.when(is_uri, res_line).otherwise(lit_line).alias("value"))


def merge_replace(target_meta: DataFrame, fused_geoms: DataFrame,
                  geom_predicate: str = "http://www.opengis.net/ont/geosparql#asWKT",
                  subject_col: str = "subject_a") -> DataFrame:
    """S9 delete-then-insert: drop the target's existing geometry
    triples for every fused subject, then add the fused geometries
    (VirtuosoImporter.java:511-528). Anti-join + union; the fused side
    is DISTINCT per the reference's export SELECT (:495)."""
    fused = fused_geoms.select(F.col(subject_col).alias("subject"),
                               F.col("geom_wkt")).distinct()
    subjects = fused.select("subject").distinct()
    kept = (target_meta.join(subjects,
                             (target_meta.subject == subjects.subject)
                             & (target_meta.predicate == geom_predicate),
                             "left_anti"))
    new_rows = fused.select("subject", F.lit(geom_predicate).alias("predicate"),
                            F.col("geom_wkt").alias("object"),
                            F.lit(None).cast("string").alias("lang"),
                            F.lit("http://www.opengis.net/ont/geosparql#wktLiteral").alias("dtype"))
    return kept.unionByName(new_rows)


def read_entities_viewport(spark: SparkSession, path: str,
                           xmin: float, ymin: float, xmax: float, ymax: float,
                           res: int = 7, cell_col: str | None = None,
                           max_cells: int = 4096,
                           refine: tuple[str, str] | None = ("lon", "lat")) -> DataFrame:
    """Viewport read of a cell-partitioned entity table (the layout
    ``jobs.ingest`` writes: ``partitionBy("cell_r7")`` — the engine's
    Iceberg-partition-layout analog). The bbox becomes an IN-list over
    the partition column, which Spark turns into ``PartitionFilters``
    — whole cell directories are skipped at file-listing time, before
    any row group is opened. That is the 100 TB viewport story: a city
    bbox touches a handful of the 2^14 res-7 directories, so the scan
    cost is proportional to the viewport, not the corpus.

    ``max_cells`` guards against planet-sized bboxes degenerating into
    a giant IN-list (at that point a full scan is the right plan —
    raise or widen ``res`` deliberately).

    ``refine`` names the (lon, lat) columns for the exact-bbox filter
    applied after the cell prune — the engine's prune-then-refine
    viewport convention (same as ``joins.bbox_join``); the refine
    predicate additionally pushes into parquet row-group filters. Pass
    ``refine=None`` to get the raw cell superset (e.g. when the table
    carries only geometries, not point columns)."""
    from . import cells as _c
    col = cell_col or f"cell_r{res}"
    ix0, ix1, iy0, iy1 = _c.bbox_cells_range(res, xmin, ymin, xmax, ymax)
    n = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    if n > max_cells:
        raise ValueError(
            f"viewport covers {n} res-{res} cells (> {max_cells}); "
            "use a coarser partition resolution or a full scan")
    wanted = [_c.pack_cell_value(ix, iy, res)
              for ix in range(ix0, ix1 + 1) for iy in range(iy0, iy1 + 1)]
    out = spark.read.parquet(path).filter(F.col(col).isin(wanted))
    if refine is not None:
        lon, lat = refine
        out = out.filter(F.col(lon).between(xmin, xmax)
                         & F.col(lat).between(ymin, ymax))
    return out


def write_bucketed(df: DataFrame, name: str, path: str, key: str = "cell",
                   num_buckets: int = 64, sort: bool = True) -> None:
    """Materialize a frame hash-bucketed on ``key`` — the co-located
    join layout. Two tables bucketed identically on the join key
    (entities and the gazetteer, both on ``cell``) join WITHOUT ANY
    shuffle exchange: each task zips bucket i with bucket i, and with
    ``sort=True`` the per-bucket sort also drops the SortMergeJoin's
    sort step. This is Spark's native bucketing (Hive-compatible
    murmur3 bucket files + catalog metadata), the engine's analog of
    the reference pre-CLUSTERing both PostGIS tables on geometry
    (schema.sql:38-39, 66-67) so every join walks co-located data.

    At 10^12 rows the conflation join's shuffle is THE dominant cost;
    bucketing both sides at ingest amortizes that single shuffle into
    the write and every later join (discovery, fusion re-runs,
    incremental conflation) rides the layout for free.
    tests/test_bucketed_join.py asserts the no-Exchange plan shape.
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read of a bucketed table (spark.read.parquet(path) would
    drop the bucket metadata and re-shuffle on join)."""
    return spark.table(name)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "subject",
                  cols=("geom_wkt",), keep_unchanged: bool = False) -> DataFrame:
    """Snapshot-to-snapshot CDC diff: which subjects were added,
    removed, or changed between two versions of a geometry/metadata
    table — the incremental-conflation shape behind the reference's
    delete-then-insert merge (VirtuosoImporter.java:511-528 replaces
    blindly; a diff tells you WHAT the merge will touch, and at
    10^12-row scale the diff output is the only thing worth
    re-processing downstream).

    One full-outer hash join on ``key`` (both sides shuffle-partition
    on the key — with bucketed snapshot tables it is co-located and
    shuffle-free); presence is tracked by literal flags so a NULL
    payload column never masquerades as an absent row, and per-column
    change detection is null-safe (eqNullSafe). Keys must be unique
    per snapshot (a snapshot is a keyed table by contract).

    Returns (key, change, old_<col>..., new_<col>...) with
    change in {'added','removed','changed'} (+ 'unchanged' when
    ``keep_unchanged``).
    """
    cols = list(cols)
    o = old.select(F.col(key).alias("_k"), F.lit(1).alias("_op"),
                   *[F.col(c).alias(f"old_{c}") for c in cols])
    n = new.select(F.col(key).alias("_k"), F.lit(1).alias("_np"),
                   *[F.col(c).alias(f"new_{c}") for c in cols])
    j = o.join(n, "_k", "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (F.when(F.col("_op").isNull(), F.lit("added"))
               .when(F.col("_np").isNull(), F.lit("removed"))
               .when(same, F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    out = j.withColumn("change", change)
    if not keep_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out.select(F.col("_k").alias(key), "change",
                      *[f"old_{c}" for c in cols],
                      *[f"new_{c}" for c in cols])
