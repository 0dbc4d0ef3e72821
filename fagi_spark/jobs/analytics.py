"""Resumable spatial-analytics mart: entities -> ESDA layer tables.

The fourth leg of the job family (pipeline.py geocodes, curate.py
filters, dedup.py deduplicates; this one ANALYZES): the daily
analytics-mart build a map/dashboard backend reads, as
snapshot-committed stages —

    pages -> entities -> density surface -> Gi* hotspots -> LISA map
          -> grid-DBSCAN labels -> cluster summary -> global Moran's I

Run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.analytics \
        --out /path/ckpt --n-pages 20000 [--res 7] [--fail-after STAGE]

Every stage commits through ``CheckpointStore`` (per-partition lineage
+ observed counters: entity volume, occupied cells, hot/cold cell
counts, cluster count — the headline numbers an operator watches).
Relaunching with the same ``--out`` resumes after the last committed
stage; ``--fail-after`` is the resume test's kill switch, mirroring
the other jobs. Each layer is the contract-verified operator
(cells.density_surface / hotspots / local_morans_i / morans_i,
cluster.grid_dbscan / dbscan_cluster_summary) — the job adds the
lifecycle, not new math.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import cells, cluster, extract, synth
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("entities", "density", "hotspots", "lisa", "clusters",
          "summary", "hulls", "global_stats")


def run(spark, out: str, n_pages: int, res: int = 7,
        min_pts: int = 5, prehull_salts: int = 8,
        fail_after: str | None = None):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    def entities_df():
        pages = synth.synth_pages(spark, n_pages)
        return (extract.geocode_pages(pages, dedup_mode="local")
                .select("url", "lon", "lat"))

    ents = store.run_stage(spark, "entities", entities_df,
                           observe={"n_entities": F.count(F.lit(1))})
    maybe_fail("entities")

    density = store.run_stage(
        spark, "density", lambda: cells.density_surface(ents, res),
        observe={"n_cells": F.count(F.lit(1)),
                 "mass16": F.sum("density16")})
    maybe_fail("density")

    hot = store.run_stage(
        spark, "hotspots", lambda: cells.hotspots(ents, res),
        observe={"n_cells": F.count(F.lit(1)),
                 "n_hot": F.sum(F.when(F.col("gi_star") > 0, 1)
                                .otherwise(0))})
    maybe_fail("hotspots")

    lisa = store.run_stage(
        spark, "lisa", lambda: cells.local_morans_i(ents, res),
        observe={"n_cells": F.count(F.lit(1)),
                 "n_hh": F.sum(F.when(F.col("quadrant") == "HH", 1)
                               .otherwise(0))})
    maybe_fail("lisa")

    labels = store.run_stage(
        spark, "clusters",
        lambda: cluster.grid_dbscan(ents, res, min_pts, key="url"),
        observe={"n_points": F.count(F.lit(1)),
                 "n_core": F.sum(F.when(F.col("role") == "core", 1)
                                 .otherwise(0))})
    maybe_fail("clusters")

    summary = store.run_stage(
        spark, "summary",
        lambda: cluster.dbscan_cluster_summary(labels, res),
        observe={"n_clusters": F.count(F.lit(1)),
                 "n_members": F.sum("n_points")})
    maybe_fail("summary")

    def hulls_df():
        from fagi_spark import gridgeom
        pts = ents.select(
            F.col("url"),
            gridgeom.point_wkt_grid(F.col("lon"),
                                    F.col("lat")).alias("geom_wkt"))
        # prehull_salts > 0 keeps one dense cluster from funnelling all
        # of its distinct grid points into a single applyInPandas group
        # (two-level salted monotone-chain reduction; ADVICE r3)
        return cluster.dbscan_cluster_hull(labels, pts, key="url",
                                           prehull_salts=prehull_salts)

    hulls = store.run_stage(
        spark, "hulls", hulls_df,
        observe={"n_clusters": F.count(F.lit(1)),
                 "hull_area2": F.sum("area2")})
    maybe_fail("hulls")

    gstats = store.run_stage(
        spark, "global_stats", lambda: cells.morans_i(ents, res),
        observe={"n_rows": F.count(F.lit(1))})
    maybe_fail("global_stats")

    return {"entities": ents, "density": density, "hotspots": hot,
            "lisa": lisa, "clusters": labels, "summary": summary,
            "hulls": hulls, "global_stats": gstats, "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-pages", type=int, default=20000)
    p.add_argument("--res", type=int, default=7)
    p.add_argument("--min-pts", type=int, default=5)
    p.add_argument("--prehull-salts", type=int, default=8)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    p.add_argument("--vacuum-keep", type=int, default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_analytics", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_pages, res=args.res,
              min_pts=args.min_pts, prehull_salts=args.prehull_salts,
              fail_after=args.fail_after)
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
