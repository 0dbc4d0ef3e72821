"""End-to-end resumable pipeline: ingest -> link -> fuse -> tiles.

The Spark re-expression of the reference CLI lifecycle
(FusionGISCLI.java: parse config -> import A/B -> fuse -> export;
SURVEY.md §3.1), run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.pipeline \
        --out /path/ckpt --n-pages 100000 [--action keep-most-points] \
        [--fail-after STAGE]        # crash injection for resume tests

Every stage commits a snapshot through ``CheckpointStore``; relaunching
with the same ``--out`` resumes after the last committed stage (nothing
before it is recomputed). ``--fail-after`` raises immediately after the
named stage commits — the resume test's kill switch.

Stage metrics (row counts, entity counts) are observed on the write job
and recorded in each snapshot's lineage file alongside per-file row
counts.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import discover, extract, fuse, synth
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("pages", "entities", "links", "fused", "tiles")


def run(spark, out: str, n_pages: int, action: str = "keep-most-points",
        radius_m: float = 3000.0, threshold: float = 0.2,
        fail_after: str | None = None, tile_res: int = 7):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    # 1. ingest: synthesize (or read) the web-page table. text bytes are
    # the invariant payload — committed verbatim.
    pages = store.run_stage(
        spark, "pages",
        lambda: synth.synth_pages(spark, n_pages),
        observe={"n_pages": F.count(F.lit(1))})
    maybe_fail("pages")

    # 2. geocode: Arrow-UDF extraction + precedence dedup + cells.
    entities = store.run_stage(
        spark, "entities",
        lambda: extract.geocode_pages(pages),
        observe={"n_entities": F.count(F.lit(1)),
                 "n_points": F.sum(F.when(F.col("geom_kind") == "POINT", 1).otherwise(0))})
    maybe_fail("entities")

    # 3. link discovery vs the gazetteer (B side), FAGI batch threshold.
    # The gazetteer is a dimension table: materialize its pandas-UDF
    # stats BEFORE the join — left lazy inside the broadcast build it
    # serializes against the probe stage (~5x slower at local[32]).
    n_gaz = max(1000, n_pages // 100)
    geo_b = fuse.prepare_geoms(spark.createDataFrame(synth.gazetteer_pdf(n_gaz, "b"))).persist()
    geo_b.count()
    meta_b = spark.createDataFrame(synth.metadata_pdf(n_gaz, "b"))
    ga = entities.select(F.col("url").alias("subject"), "geom_wkt", "geom_kind",
                         "kind_rank", "npoints",
                         F.col("lon").alias("cx"), F.col("lat").alias("cy"),
                         "xmin", "ymin", "xmax", "ymax")
    # page-side literals: the page text's leading words act as the label
    meta_a = pages.select(F.col("url").alias("subject"),
                          F.lit("http://fagi/label").alias("predicate"),
                          F.substring("text", 1, 40).alias("object"),
                          F.lit("en").alias("lang"),
                          F.lit(None).cast("string").alias("dtype"))
    links = store.run_stage(
        spark, "links",
        lambda: discover.discover_links(ga, geo_b, meta_a, meta_b,
                                        radius_m=radius_m, threshold=threshold)
        .select(F.col("node_a"), F.col("node_b")),
        observe={"n_links": F.count(F.lit(1))})
    maybe_fail("links")

    # 4. geometry fusion (FAGI action). LATE_FETCH (the reference's
    # flagship optimization, Constants.java:19): links reference a small
    # fraction of the geocoded entities, so both geometry sides are
    # semi-join-pruned to linked subjects before the fuse join — at
    # warehouse scale this is the difference between shuffling the whole
    # gazetteer and shuffling only what the links touch.
    fused = store.run_stage(
        spark, "fused",
        lambda: fuse.fuse(action, links, ga, geo_b, late_fetch=True),
        observe={"n_fused": F.count(F.lit(1))})
    maybe_fail("fused")

    # 5. tile assignment rollup.
    from fagi_spark import cells
    tiles = store.run_stage(
        spark, "tiles",
        lambda: entities.groupBy(
            cells.cell_col(F.col("lon"), F.col("lat"), tile_res).alias("tile"))
        .agg(F.count(F.lit(1)).alias("n_entities")),
        observe={"n_tiles": F.count(F.lit(1))})
    maybe_fail("tiles")
    return {"pages": pages, "entities": entities, "links": links,
            "fused": fused, "tiles": tiles, "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-pages", type=int, default=10000)
    p.add_argument("--action", default="keep-most-points")
    p.add_argument("--radius-m", type=float, default=3000.0)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    p.add_argument("--vacuum-keep", type=int, default=None,
                   help="after a successful run, expire snapshots per "
                        "stage beyond the newest N (retention job)")
    args = p.parse_args(argv)
    spark = get_spark("fagi_pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_pages, args.action, args.radius_m,
              args.threshold, args.fail_after)
    for stage in STAGES:
        lin = out["store"].lineage(stage)
        print(f"{stage}: {lin['n_rows']} rows in {lin['n_files']} files, "
              f"metrics={lin['metrics']}")
    if args.vacuum_keep is not None:
        for stage in STAGES:
            expired = out["store"].vacuum(stage, keep_last=args.vacuum_keep)
            if expired:
                print(f"{stage}: expired snapshots {expired}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
