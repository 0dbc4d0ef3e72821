"""Resumable link-graph mart: edges -> components -> PageRank ->
seed reachability -> weighted distances -> per-component summary.

The sixth leg of the job family (pipeline.py geocodes, curate.py
filters, dedup.py deduplicates, analytics.py analyzes space,
mobility.py analyzes movement; this one analyzes the LINK GRAPH): the
host-graph mart a crawl-curation pipeline reads for quality priors —

    edges -> components (large-star/small-star)
          -> ranks (PageRank, the host-quality prior)
          -> reach (k-hop BFS from trusted seed hosts)
          -> dist  (weighted bounded shortest paths, same seeds)
          -> per-component summary

Run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.graph \
        --out /path/ckpt --n-hosts 2000 [--n-edges 12000] \
        [--fail-after STAGE]

Every stage commits through ``CheckpointStore`` (per-partition lineage
+ observed counters); relaunching with the same ``--out`` resumes
after the last committed stage, and ``--fail-after`` is the resume
test's kill switch — the same lifecycle contract as the other five
jobs. Each layer is the contract-verified operator
(components.connected_components / pagerank / khop_reachability /
bounded_shortest_paths); the job adds the lifecycle, not new math.

The edge table is synthesized deterministically and
partition-independently (pure column math of the row id, the synth
convention), so a resumed run is bit-identical to a fresh one.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from fagi_spark import components
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("edges", "components", "ranks", "reach", "dist", "summary")


def synth_edges(spark, n_hosts: int, n_edges: int):
    """Deterministic host-link edge list (src, dst, w): pure column
    math of the row id (partition-independent). A skewed-ish digraph:
    src spreads uniformly, dst mixes through xxhash64 so a few hosts
    collect many in-links (the real web's shape), weights 1..9."""
    df = spark.range(0, n_edges, 1,
                     max(8, spark.sparkContext.defaultParallelism))
    src = F.col("id") % n_hosts
    dst = F.pmod(F.xxhash64(F.col("id")), F.lit(n_hosts))
    w = F.pmod(F.xxhash64(F.col("id") + 3), F.lit(9)) + 1
    return (df.select(src.alias("src"), dst.alias("dst"),
                      w.cast("long").alias("w"))
            .filter(F.col("src") != F.col("dst")))


def run(spark, out: str, n_hosts: int, n_edges: int,
        pr_iters: int = 5, max_hops: int = 3, seed_mod: int = 101,
        fail_after: str | None = None):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    edges = store.run_stage(
        spark, "edges", lambda: synth_edges(spark, n_hosts, n_edges),
        observe={"n_edges": F.count(F.lit(1)),
                 "n_src": F.count_distinct("src")})
    maybe_fail("edges")

    comp = store.run_stage(
        spark, "components",
        lambda: components.connected_components(edges, "src", "dst"),
        observe={"n_nodes": F.count(F.lit(1)),
                 "n_components": F.count_distinct("component")})
    maybe_fail("components")

    ranks = store.run_stage(
        spark, "ranks",
        lambda: components.pagerank(edges, iters=pr_iters,
                                    checkpoint_every=2),
        observe={"n_nodes": F.count(F.lit(1)),
                 "rank_mass": F.sum("rank")})
    maybe_fail("ranks")

    seeds = (edges.select(F.col("src").alias("node"))
             .filter(F.col("node") % seed_mod == 0).distinct())

    reach = store.run_stage(
        spark, "reach",
        lambda: components.khop_reachability(edges, seeds, max_hops),
        observe={"n_reached": F.count(F.lit(1)),
                 "max_hops": F.max("hops")})
    maybe_fail("reach")

    dist = store.run_stage(
        spark, "dist",
        lambda: components.bounded_shortest_paths(edges, seeds, max_hops),
        observe={"n_reached": F.count(F.lit(1)),
                 "max_dist": F.max("dist")})
    maybe_fail("dist")

    def summary_df():
        per_node = (comp
                    .join(ranks, "node")
                    .join(reach.withColumnRenamed("hops", "seed_hops"),
                          "node", "left"))
        return (per_node.groupBy("component")
                .agg(F.count(F.lit(1)).alias("n_hosts"),
                     F.max("rank").alias("max_rank"),
                     F.count("seed_hops").alias("n_seed_reachable"))
                .withColumn("seed_covered",
                            F.col("n_seed_reachable") > 0))

    summary = store.run_stage(
        spark, "summary", summary_df,
        observe={"n_components": F.count(F.lit(1)),
                 "n_hosts": F.sum("n_hosts")})
    maybe_fail("summary")

    return {"edges": edges, "components": comp, "ranks": ranks,
            "reach": reach, "dist": dist, "summary": summary,
            "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-hosts", type=int, default=2000)
    p.add_argument("--n-edges", type=int, default=12000)
    p.add_argument("--pr-iters", type=int, default=5)
    p.add_argument("--max-hops", type=int, default=3)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_graph", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_hosts, args.n_edges,
              pr_iters=args.pr_iters, max_hops=args.max_hops,
              fail_after=args.fail_after)
    for stage in STAGES:
        lin = out["store"].lineage(stage)
        print(f"{stage}: {lin['n_rows']} rows in {lin['n_files']} files, "
              f"metrics={lin['metrics']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
