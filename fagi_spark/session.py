"""SparkSession builder with the engine's standard configuration.

Arrow on (all our Python kernels are Arrow-vectorized pandas UDFs —
never row-at-a-time), AQE on (runtime skew-join splitting + coalescing
on top of our explicit salting), sane shuffle partitioning for local
test mode. On a real cluster these remain correct; only
``shuffle_partitions`` should scale with executor count."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "fagi_spark", master: str | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # private scratch dir for the block manager: the r3 bench tail
    # showed mid-suite shuffle_*.index "No such file or directory"
    # executor errors from /tmp churn on the shared host (tasks retried
    # and the suite completed, but the affected invocation is inflated).
    # A dir we own keeps external /tmp cleaners off our shuffle files.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                               "/tmp/fagi_spark_blockmgr")
    os.makedirs(local_dir, exist_ok=True)
    if shuffle_partitions is None:
        # match local core count; on a real cluster: ~2-3x total cores
        inner = master.split("[")[-1].rstrip("]")
        shuffle_partitions = 32 if inner in ("*", "") else max(8, int(inner))
    b = (SparkSession.builder.appName(app).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # 2500-row Arrow batches: r3 interleaved A/B at local[32]
         # (3 rounds, each pairing in the same noise epoch) had 2500
         # beat 5000 in every round — 96.2/120.0/126.4k vs
         # 72.3/93.0/115.0k pages/sec — confirming r2's "marginally
         # faster" note; smaller batches stay cache-resident under
         # full-core contention and cut per-batch python latency.
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2500")
         .config("spark.sql.session.timeZone", "UTC")
         # blocking shuffle GC: the async ContextCleaner deletes a
         # GC'd shuffle's files while a resubmitted straggler still
         # writes them — the recurring mid-suite
         # "shuffle_*.index (No such file or directory)" executor
         # errors (r3 tail, r4 bench run), which cost task retries
         # inside OUR pinned local dir (so not an external cleaner).
         # Blocking cleanup serializes the delete behind the driver's
         # reference-processing, closing the race.
         .config("spark.cleaner.referenceTracking.blocking.shuffle",
                 "true")
         .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
         .config("spark.local.dir", local_dir)
         .config("spark.ui.enabled", "false"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
