"""Resumable corpus-dedup job: documents -> canonical survivors.

The third leg of the job family (pipeline.py geocodes, curate.py
filters, this one deduplicates): the complete near-dup chain as
snapshot-committed stages —

    docs -> band index -> candidate pairs -> verified edges
         -> connected components -> canonical keep (longest wins)

Run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.dedup \
        --out /path/ckpt --n-docs 4000 [--fail-after STAGE]

Every stage commits through ``CheckpointStore`` (per-partition lineage
+ observed counters: candidate volume, verified-edge volume, cluster
count, survivor count — the dedup-attrition headline a warehouse
operator watches). Relaunching with the same ``--out`` resumes after
the last committed stage; ``--fail-after`` is the resume test's kill
switch, mirroring the other jobs.

The ``bands`` stage IS the persistent incremental index: a later run
over a crawl increment calls ``textops.minhash_probe`` against this
committed snapshot instead of re-shingling the corpus (see
textops.minhash_bands; bench.py ``minhash_probe_incr``).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import components, synth, textops
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("docs", "bands", "candidates", "edges", "clusters", "kept")


def run(spark, out: str, n_docs: int, fail_after: str | None = None,
        dup_every: int = 7, threshold: float = 0.5,
        max_bucket: int | None = 64):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    # 1. corpus with planted near-dup families: every ``dup_every``-th
    # page also appears under a mirror url with a small prefix edit —
    # the template-mirror pattern real crawls exhibit.
    def docs_df():
        pages = synth.synth_pages(spark, n_docs)
        docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")
        mirror = (docs.filter(F.col("doc_id") % dup_every == 0)
                  .select((-F.col("doc_id")).alias("doc_id"),
                          F.concat(F.lit("mirror of "),
                                   F.col("text")).alias("text")))
        return docs.unionByName(mirror)

    docs = store.run_stage(spark, "docs", docs_df,
                           observe={"n_docs": F.count(F.lit(1))})
    maybe_fail("docs")

    # 2. the persistent band index (the incremental-probe artifact).
    bands = store.run_stage(
        spark, "bands", lambda: textops.minhash_bands(docs),
        observe={"n_rows": F.count(F.lit(1)),
                 "n_buckets": F.count_distinct("band", "band_hash")})
    maybe_fail("bands")

    # 3. candidate pairs from the committed index: textops.band_pairs
    # (the same self-join minhash_candidates uses) WITH the hot-bucket
    # star guard — a boilerplate bucket of m docs emits m-1 star edges
    # instead of m^2/2 pairs; connected components downstream see the
    # same clusters for pairs that verify.
    cands = store.run_stage(
        spark, "candidates",
        lambda: textops.band_pairs(bands, "doc_id", max_bucket=max_bucket),
        observe={"n_pairs": F.count(F.lit(1))})
    maybe_fail("candidates")

    # 4. exact shingle-Jaccard verification of the candidates.
    edges = store.run_stage(
        spark, "edges",
        lambda: components.verify_pairs(docs, cands, threshold=threshold),
        observe={"n_edges": F.count(F.lit(1))})
    maybe_fail("edges")

    # 5. connected components over the verified edges.
    clusters = store.run_stage(
        spark, "clusters",
        lambda: components.connected_components(
            edges, "id_a", "id_b", nodes=docs, node_col="doc_id"),
        observe={"n_nodes": F.count(F.lit(1)),
                 "n_clusters": F.count_distinct("component")})
    maybe_fail("clusters")

    # 6. canonical keep: longest member per cluster survives — the
    # SHARED components.keep_longest_keys policy (identical tie-break
    # to dedup_near(policy="longest")) over the COMMITTED cluster
    # labels, so a re-run never re-clusters.
    def kept_df():
        keep = components.keep_longest_keys(docs, clusters, "doc_id", "text")
        return (docs.join(keep, "doc_id", "leftsemi")
                .select("doc_id", "text"))

    kept = store.run_stage(
        spark, "kept", kept_df,
        observe={"n_kept": F.count(F.lit(1))})
    maybe_fail("kept")
    return {"docs": docs, "bands": bands, "candidates": cands,
            "edges": edges, "clusters": clusters, "kept": kept,
            "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-docs", type=int, default=4000)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    p.add_argument("--vacuum-keep", type=int, default=None)
    p.add_argument("--max-bucket", type=int, default=64,
                   help="hot-bucket star-guard cap for the candidates stage")
    args = p.parse_args(argv)
    spark = get_spark("fagi_dedup", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_docs, args.fail_after,
              max_bucket=args.max_bucket)
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
