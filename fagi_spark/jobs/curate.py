"""Resumable corpus-curation job: crawl table -> training-ready mix.

The companion to jobs/pipeline.py on the text side of the house: where
the pipeline geocodes/conflates/tiles the page table, this job runs the
crawl->training hygiene chain over the same `(url, warc_ts, html, text,
lang)` input —

    captures -> latest-capture dedup -> PII scrub -> boilerplate strip
    -> quality/composite filter -> exact dedup -> stratified sample

Run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.curate \
        --out /path/ckpt --n-pages 20000 [--fail-after STAGE]

Every stage commits a snapshot through ``CheckpointStore`` with
per-partition lineage rows and observed counters (pages in/out,
redaction totals, per-reason attrition survives in the `filtered`
stage's reason column); relaunching with the same ``--out`` resumes
after the last committed stage. ``--fail-after`` is the resume test's
kill switch, mirroring jobs/pipeline.py.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import curation, synth, textops
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("captures", "latest", "scrubbed", "stripped", "filtered",
          "deduped", "mix", "packed")

# deterministic per-language mix rates for the final sampling stage
MIX_RATES = {"en": 0.5, "de": 0.8}


def run(spark, out: str, n_pages: int, fail_after: str | None = None,
        recapture_every: int = 3, boiler_max_docs: int = 50):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    # 1. the crawl table, with repeated captures: every
    # ``recapture_every``-th page also appears as an older snapshot with
    # an earlier warc_ts and a stale text marker — what a real crawl
    # warehouse accumulates across monthly snapshots.
    def captures_df():
        pages = synth.synth_pages(spark, n_pages)
        stale = (pages.filter(F.xxhash64("url") % recapture_every == 0)
                 .withColumn("warc_ts",
                             F.col("warc_ts") - F.expr("INTERVAL 30 DAYS"))
                 .withColumn("text", F.concat(F.lit("OLD SNAPSHOT "),
                                              F.col("text"))))
        return pages.unionByName(stale)

    caps = store.run_stage(spark, "captures", captures_df,
                           observe={"n_captures": F.count(F.lit(1))})
    maybe_fail("captures")

    # 2. as-of dedup: one row per url, the newest capture wins
    # (WindowGroupLimit — per-partition winners shuffle, not captures).
    latest = store.run_stage(
        spark, "latest",
        lambda: textops.latest_capture(caps, key="url", ts="warc_ts"),
        observe={"n_latest": F.count(F.lit(1))})
    maybe_fail("latest")

    # 3. PII redaction (map-only; totals observed into lineage).
    scrubbed = store.run_stage(
        spark, "scrubbed",
        lambda: curation.with_pii_scrub(latest)
        .drop("text").withColumnRenamed("text_clean", "text"),
        observe={"n_rows": F.count(F.lit(1)),
                 "n_emails": F.sum("n_emails"),
                 "n_phones": F.sum("n_phones")})
    maybe_fail("scrubbed")

    # 4. boilerplate line removal across the corpus. The synthetic
    # corpus is single-line, so this is usually a pass-through — the
    # stage exists to hold the plan shape (line doc-freq + broadcast
    # anti-join) inside the checkpointed chain.
    stripped = store.run_stage(
        spark, "stripped",
        lambda: scrubbed.drop("text").join(
            curation.strip_boilerplate(scrubbed, key="url",
                                       max_docs=boiler_max_docs)
            .withColumnRenamed("text_clean", "text"),
            "url"),
        observe={"n_rows": F.count(F.lit(1))})
    maybe_fail("stripped")

    # 5. composite quality filter (C4/Gopher-style rules); only keepers
    # continue, the kept count is the observed attrition headline.
    filtered = store.run_stage(
        spark, "filtered",
        lambda: textops.with_filter_decision(stripped, key="url",
                                             min_words=5)
        .filter(F.col("keep")),
        observe={"n_kept": F.count(F.lit(1))})
    maybe_fail("filtered")

    # 6. exact dedup on content (hash groupBy, min url wins).
    deduped = store.run_stage(
        spark, "deduped",
        lambda: textops.dedup_exact(filtered, key="url"),
        observe={"n_unique": F.count(F.lit(1))})
    maybe_fail("deduped")

    # 7. deterministic stratified sample -> the training mix.
    mix = store.run_stage(
        spark, "mix",
        lambda: curation.stratified_sample(deduped, MIX_RATES,
                                           default_rate=1.0, key="url"),
        observe={"n_mix": F.count(F.lit(1))})
    maybe_fail("mix")

    # 8. sequence packing: the mix laid end-to-end (url-hash order)
    # into fixed 2048-token training windows — the artifact a trainer
    # actually reads. Distributed quantile-bucket prefix sum; the
    # observed metrics are the training-volume headline.
    packed = store.run_stage(
        spark, "packed",
        lambda: curation.pack_sequences(
            # pack_sequences requires UNIQUE numeric keys and fails
            # loudly on ties; at corpus scale two urls WILL eventually
            # share an xxhash64 (64-bit birthday), so collisions are
            # merged by construction — the rare merged pair packs as
            # one virtual doc, token totals conserved exactly
            mix.select(F.xxhash64("url").alias("doc_id"),
                       F.size(F.split(F.coalesce("text", F.lit("")), " "))
                       .alias("n_tokens"))
            .groupBy("doc_id").agg(F.sum("n_tokens").alias("n_tokens")),
            ctx=2048),
        observe={"n_segments": F.count(F.lit(1)),
                 "n_packs": F.count_distinct(F.col("pack_id")),
                 "n_tokens_packed": F.sum("seg_len")})
    maybe_fail("packed")
    return {"captures": caps, "latest": latest, "scrubbed": scrubbed,
            "stripped": stripped, "filtered": filtered, "deduped": deduped,
            "mix": mix, "packed": packed, "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-pages", type=int, default=20000)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    p.add_argument("--vacuum-keep", type=int, default=None,
                   help="after a successful run, expire snapshots per "
                        "stage beyond the newest N (retention job)")
    args = p.parse_args(argv)
    spark = get_spark("fagi_curate", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_pages, args.fail_after)
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
