"""Structured Streaming ingest: pages arriving as micro-batches.

The reference is purely batch (no streaming anywhere — SURVEY.md §2.11),
and the engine's durability model is snapshot checkpoints, not
streaming state. This module exists for the *ingest* edge of a live
deployment: pages landing continuously (a WARC drop folder / Kafka
topic) geocoded incrementally with exactly-once file-sink semantics.

- ``stream_pages``: file-source stream with the canonical page schema;
- ``stream_geocode``: the SAME Arrow extraction kernel as the batch
  path (extract.extract_entities works unchanged on a streaming frame;
  ``warc_ts`` is carried through for event-time semantics). Precedence
  dedup is per-micro-batch here (global dedup needs state; the batch
  engine's window dedup runs at compaction instead);
- ``tile_counts_stream``: watermarked event-time windowed rollup of
  entities per tile — late pages beyond the watermark are dropped,
  everything else updates its window;
- ``write_entities``: parquet sink with checkpointLocation (Spark's
  own WAL gives exactly-once into the warehouse the batch engine
  compacts from).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells, extract
from .synth import PAGES_SCHEMA


def stream_pages(spark: SparkSession, path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source page stream (new parquet files under ``path``)."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def stream_geocode(pages: DataFrame,
                   resolutions=cells.RESOLUTIONS) -> DataFrame:
    """Incremental geocoding: identical kernel to the batch path, with
    event-time (warc_ts) carried onto every entity row."""
    return extract.extract_entities(pages, resolutions, carry=("warc_ts",))


def micro_batch_dedup(entities: DataFrame) -> DataFrame:
    """Per-micro-batch precedence dedup via ``dropDuplicates`` on the
    (url,) key after a sort-free min-struct agg — streaming-legal
    (no window functions). Matches batch semantics within a batch."""
    best = (entities.groupBy("url")
            .agg(F.min_by(F.struct([F.col(c) for c in entities.columns]),
                          F.struct(F.col("kind_rank"), F.col("entity_idx"))).alias("_e")))
    return best.select("_e.*")


def tile_counts_stream(entities: DataFrame, res: int = 7,
                       window: str = "1 hour",
                       watermark: str = "2 hours") -> DataFrame:
    """Watermarked windowed tile rollup: (event window, tile) counts."""
    return (entities
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"),
                     F.col(f"cell_r{res}").alias("tile"))
            .agg(F.count(F.lit(1)).alias("n_entities"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "tile", "n_entities"))


def write_entities(entities: DataFrame, out_path: str, checkpoint: str,
                   trigger_available_now: bool = True):
    """Exactly-once parquet sink; availableNow drains the backlog and
    stops (the test/compaction mode)."""
    w = (entities.writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
