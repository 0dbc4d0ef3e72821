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

from pyspark.errors import AnalysisException
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


def dedup_stream(pages: DataFrame, ts: str = "warc_ts",
                 watermark: str = "2 hours",
                 within_watermark: bool = True) -> DataFrame:
    """Cross-micro-batch EXACT content dedup: the first arrival of
    each content fingerprint (md5 of normalized text — same key as
    textops.dedup_exact) survives; later duplicate captures are
    dropped ACROSS batch boundaries via Structured Streaming's keyed
    dedup state — the stateful complement of micro_batch_dedup (which
    is batch-local) and of compact_entities (which dedups at rest).

    ``within_watermark=True`` (default) uses
    ``dropDuplicatesWithinWatermark``: state for a fingerprint is
    dropped once the watermark passes it, so memory is bounded by the
    duplicate-arrival horizon — a duplicate arriving more than
    ``watermark`` of event time later is re-emitted (at 100 TB/day of
    crawl this is the only viable mode; pair it with the batch
    compaction job for the long tail). ``False`` keeps global state —
    exactly-once per content for the stream's lifetime, state grows
    with distinct contents."""
    from . import textops

    df = textops.with_fingerprint(pages)
    if within_watermark:
        return (df.withWatermark(ts, watermark)
                .dropDuplicatesWithinWatermark(["fingerprint"]))
    return df.dropDuplicates(["fingerprint"])


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


def tile_pyramid_stream(entities: DataFrame,
                        resolutions=cells.RESOLUTIONS,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Watermarked multi-resolution tile rollup — the streaming twin of
    ``cells.tile_pyramid`` with the same one-shuffle shape: each entity
    explodes into its (res, cell) pair per zoom level (the cell_r{N}
    columns ``extract`` already computed) and ONE stateful aggregation
    keyed (window, res, cell) maintains every zoom level's counts.
    Late entities beyond the watermark are dropped; the batch
    compaction recomputes exact pyramids from the entity sink."""
    pairs = F.array(*[
        F.struct(F.lit(r).cast("long").alias("res"),
                 F.col(f"cell_r{r}").alias("cell")) for r in resolutions])
    return (entities
            .withWatermark("warc_ts", watermark)
            .select("warc_ts", F.explode(pairs).alias("rc"))
            .groupBy(F.window("warc_ts", window).alias("win"),
                     F.col("rc.res").alias("res"),
                     F.col("rc.cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_entities"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "res", "cell", "n_entities"))


SESSION_OUT_SCHEMA = ("user_id bigint, n_events bigint, "
                      "start_ts timestamp, end_ts timestamp")
SESSION_STATE_SCHEMA = "start_s double, last_s double, n bigint"


def sessionize_stream(events: DataFrame, gap_seconds: float = 1800.0,
                      ts: str = "ts", user: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the task brief's custom-stateful-op
    path). Per-user state carries the open session (start, last event,
    count); a session is EMITTED when a later event arrives more than
    ``gap_seconds`` after it (closed-session append semantics — the
    still-open session stays in the state store across micro-batches).
    The batch twin is events.session_stats; the streaming/batch parity
    test closes sessions with trailing events and compares."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            start_s, last_s, n = state.get
        else:
            start_s, last_s, n = None, None, 0
        closed = []
        # very-late events (more than a gap BEFORE the open session's
        # start) sessionize among THEMSELVES (vstart/vlast/vn): batch
        # session_stats would group consecutive very-late events into
        # one earlier session, not singletons. Resolution is deferred
        # to the end of the batch because a later moderately-late event
        # can lower start_s enough that the very-late run belongs to
        # the open session after all (the batch is ascending, so
        # start_s only moves down and the final comparison is the
        # right one).
        vstart = vlast = None
        vn = 0

        def resolve_vrun(cur_start, cur_n):
            """Fold the pending very-late run into the current open
            session when its tail lands within one gap of the (possibly
            lowered) session start; otherwise emit it as its own closed
            session. Returns the adjusted (start, n)."""
            nonlocal vstart, vlast, vn
            if vstart is not None:
                if cur_start is not None and cur_start - vlast <= gap_seconds:
                    cur_start = min(cur_start, vstart)
                    cur_n += vn
                else:
                    closed.append((key[0], vn, vstart, vlast))
                vstart, vlast, vn = None, None, 0
            return cur_start, cur_n

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for t in batch[ts]:
            t_s = t.timestamp()
            if start_s is None:
                start_s, last_s, n = t_s, t_s, 1
            elif t_s - last_s > gap_seconds:
                # the open session is closing: first fold any pending
                # very-late run into it (or emit the run separately) —
                # resolution cannot wait for batch end because the
                # session it belongs with is being emitted NOW
                start_s, n = resolve_vrun(start_s, n)
                closed.append((key[0], n, start_s, last_s))
                start_s, last_s, n = t_s, t_s, 1
            elif t_s < start_s - gap_seconds:
                if vstart is None:
                    vstart, vlast, vn = t_s, t_s, 1
                elif t_s - vlast > gap_seconds:
                    closed.append((key[0], vn, vstart, vlast))
                    vstart, vlast, vn = t_s, t_s, 1
                else:
                    vlast = max(vlast, t_s)
                    vn += 1
            else:
                # a moderately-late cross-batch event may sort before
                # the open session's bounds — extend within one gap
                start_s = min(start_s, t_s)
                last_s = max(last_s, t_s)
                n += 1
        start_s, n = resolve_vrun(start_s, n)
        state.update((start_s, last_s, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "start_ts": pd.to_datetime([c[2] for c in closed], unit="s"),
                "end_ts": pd.to_datetime([c[3] for c in closed], unit="s"),
            })

    return (events.groupBy(user).applyInPandasWithState(
        fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))


def conflate_stream(spark: SparkSession, src_path: str, gazetteer: DataFrame,
                    out_path: str, checkpoint: str, k_neighbors: int = 1,
                    radius_m: float = 2000.0,
                    max_files_per_trigger: int | None = None):
    """Incremental conflation: as page files land, geocode each
    micro-batch and kNN-join it against a STATIC prepared gazetteer
    (``fuse.prepare_geoms(...)`` output, materialized — the broadcast
    build side), appending matches via ``foreachBatch``.

    Exactly-once without streaming-sink support: each batch overwrites
    its own ``batch_id=N`` partition directory, so a retried batch
    replaces rather than duplicates its output (the standard idempotent
    foreachBatch pattern); readers see the result as one
    partition-discovered parquet table. Precedence dedup inside a batch
    is batch-local — the global dedup runs at compaction, as with
    ``write_entities``. Returns the started query (availableNow)."""
    from . import joins

    pages = stream_pages(spark, src_path, max_files_per_trigger)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ents = extract.extract_entities(batch_df)
        ents = extract.dedup_by_precedence(ents)
        ga = ents.select(F.col("url").alias("subject"),
                         F.col("lon").alias("cx"), F.col("lat").alias("cy"))
        (joins.knn_join(ga, gazetteer, k_neighbors, radius_m)
         .write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}"))

    return (pages.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def neardup_stream(docs: DataFrame, index_path: str, pairs_path: str,
                   checkpoint: str, num_hashes: int = 32, bands: int = 8,
                   shingle_k: int = 3, max_bucket: int | None = None):
    """Streaming near-dup MAINTENANCE: the incremental-dedup loop
    (textops.minhash_bands index + minhash_probe) as a continuously
    running job. Each micro-batch of ``docs`` (doc_id, text; ids
    globally unique across batches) is banded ONCE, probed against the
    persistent band index — emitting every candidate pair that touches
    a batch doc, including within-batch new-new pairs — and its bands
    are appended to the index. Old documents are never re-shingled;
    the union of per-batch pair outputs equals the full-corpus
    ``minhash_candidates`` set (tested), because any pair is found
    when its LATER member arrives.

    Exactly-once: pair output and index increment both write to their
    own ``batch_id=N`` partition dir (overwrite-per-batch — the
    idempotent foreachBatch pattern conflate_stream uses). A retried
    batch is additionally safe against its own half-committed index
    increment: probing an index that already contains this batch's
    bands only re-derives the batch's new-new pairs, which the probe's
    DISTINCT collapses. ``max_bucket`` is the hot-bucket star guard
    (see minhash_probe). Returns the started query (availableNow)."""
    from . import textops

    spark = docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bn = textops.minhash_bands(batch_df, "doc_id", "text", num_hashes,
                                   bands, shingle_k)
        bn = bn.persist()
        bn.count()
        try:
            try:
                index = spark.read.parquet(index_path) \
                    .select("doc_id", "band", "band_hash")
            except AnalysisException as e:
                # ONLY the first-batch missing-path case may fall back
                # to an empty index — any other read failure (transient
                # FS error, corrupt footer) must fail the batch, else
                # cross-batch pairs are silently and permanently lost.
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                index = bn.limit(0)
            pairs = textops.minhash_probe(
                batch_df, index, "doc_id", "text", num_hashes, bands,
                shingle_k, max_bucket=max_bucket, new_bands=bn)
            (pairs.write.mode("overwrite")
             .parquet(f"{pairs_path}/batch_id={batch_id}"))
            (bn.write.mode("overwrite")
             .parquet(f"{index_path}/batch_id={batch_id}"))
        finally:
            bn.unpersist()

    return (docs.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def conflate_two_streams(a: DataFrame, b: DataFrame, radius_m: float,
                         lag_seconds: float = 3600.0,
                         watermark: str = "1 hour",
                         res: int | None = None) -> DataFrame:
    """Stream-STREAM conflation: two live entity feeds (columns
    ``subject, lon, lat, warc_ts``) joined as they arrive — e.g. two
    crawl sources discovering the same places near-simultaneously.
    This is the live twin of ``joins.radius_join``: same cell-ring
    candidate equi-join (ring exploded on the B side), same exact
    distance refine; plus the event-time range ``|a.ts - b.ts| <=
    lag_seconds`` that makes unbounded dual-stream state finite —
    with both sides watermarked, Spark evicts join state older than
    watermark + lag, so the state store holds a bounded time slice of
    each feed regardless of how long the streams run.

    Returns the joined streaming frame (a_subject, b_subject,
    a_ts, b_ts, distance_m); batch parity with radius_join + the time
    filter is tested (stream == batch for on-time data)."""
    from . import geom, joins

    radius_deg = radius_m / geom.METERS_PER_DEGREE
    if res is None:
        res = cells.res_for_radius_deg(radius_deg)
    k = cells.ring_k_for_radius(radius_deg, res)

    aw = (a.select(F.col("subject").alias("a_subject"),
                   F.col("lon").alias("a_cx"), F.col("lat").alias("a_cy"),
                   F.col("warc_ts").alias("a_ts"))
          .withWatermark("a_ts", watermark))
    bw = (b.select(F.col("subject").alias("b_subject"),
                   F.col("lon").alias("b_cx"), F.col("lat").alias("b_cy"),
                   F.col("warc_ts").alias("b_ts"))
          .withWatermark("b_ts", watermark))
    aw = cells.with_cell(aw, res, lon="a_cx", lat="a_cy", prefix="a_")
    bw = cells.with_cell(bw, res, lon="b_cx", lat="b_cy", prefix="b_")
    bw = cells.explode_ring(bw, res, k, ix="b_ix", iy="b_iy",
                            out="probe_cell")

    lag = f"INTERVAL {int(lag_seconds)} SECONDS"
    cond = ((F.col("a_cell") == F.col("probe_cell"))
            & (F.col("b_ts") >= F.expr(f"a_ts - {lag}"))
            & (F.col("b_ts") <= F.expr(f"a_ts + {lag}")))
    joined = aw.join(bw, cond, "inner")
    dist = joins.DIST_DEG(F.col("a_cx"), F.col("a_cy"),
                          F.col("b_cx"), F.col("b_cy"))
    return (joined.withColumn("dist_deg", dist)
            .filter(F.col("dist_deg") <= F.lit(radius_deg))
            .select("a_subject", "b_subject", "a_ts", "b_ts",
                    (F.col("dist_deg") * F.lit(geom.METERS_PER_DEGREE))
                    .alias("distance_m")))


def compact_entities(spark: SparkSession, sink_path: str,
                     store=None, stage: str = "entities_compacted") -> DataFrame:
    """Batch compaction over the streamed entity sink: the GLOBAL
    precedence dedup that ``micro_batch_dedup`` deliberately defers
    (a url's entities may span micro-batch files, so per-batch dedup
    cannot be global). Reads the parquet sink as a batch frame, runs
    the batch engine's window dedup (WindowGroupLimit — only
    per-partition winners shuffle), and — when a
    :class:`~fagi_spark.checkpoint.CheckpointStore` is passed —
    commits the result as a snapshot so downstream stages resume from
    the compacted view instead of the raw append log. This closes the
    loop documented in the module header: stream-then-compact ==
    batch ``geocode_pages`` exactly (tested)."""
    ents = spark.read.parquet(sink_path)
    compacted = extract.dedup_by_precedence(ents)
    if store is not None:
        store.commit(compacted, stage)
        return store.load(spark, stage)
    return compacted


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


def curate_stream(pages: DataFrame, rates=None) -> DataFrame:
    """Streaming curation: the stateless stages of jobs/curate.py (PII
    scrub -> composite quality filter -> deterministic stratified
    sample) over a page stream. Identical kernels to the batch path,
    so stream == batch row-for-row (tested); the stateful stages
    (latest-capture dedup, exact content dedup) run at compaction,
    the same split as micro_batch_dedup vs compact_entities."""
    from . import curation, textops
    scrub = (curation.with_pii_scrub(pages)
             .drop("text").withColumnRenamed("text_clean", "text"))
    filt = (textops.with_filter_decision(scrub, key="url", min_words=5,
                                         repetition_mode="local")
            .filter(F.col("keep")))
    return curation.stratified_sample(filt, rates or {"en": 0.5, "de": 0.8},
                                      default_rate=1.0, key="url")


def cooccur_stream(events: DataFrame, index_path: str, pairs_path: str,
                   checkpoint: str, radius_deg: float, window_s: int,
                   key: str = "event_id", ts: str = "ts",
                   lon: str = "lon", lat: str = "lat"):
    """Streaming co-occurrence MAINTENANCE: the spatio-temporal pair
    join (events.cooccurrence_join) as an incremental job — each
    micro-batch of events is key-projected ONCE (events.cooccur_index),
    appended to the persistent exact-key index, and probed ring x
    bucket against index+increment (events.cooccur_probe). A 100 TB
    event log is never re-joined for a daily increment; the union of
    per-batch pair outputs equals the full-corpus batch join because
    any pair surfaces when its LATER member arrives (tested).

    Exactly-once: the idempotent overwrite-per-batch_id pattern
    neardup_stream uses; a retried batch re-probing an index that
    already holds its own rows only re-derives canonical pairs the
    probe's dropDuplicates collapses. Returns the started availableNow
    query."""
    from . import events as evmod

    spark = events.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = evmod.cooccur_index(batch_df, radius_deg, window_s,
                                   key, ts, lon, lat)
        rows = rows.persist()
        rows.count()
        try:
            try:
                hist = (spark.read.parquet(index_path)
                        .select("id", "x", "y", "us", "cell", "bk"))
            except AnalysisException as e:
                # same first-batch-only fallback rule as neardup_stream
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                hist = rows.limit(0)
            pairs = evmod.cooccur_probe(
                batch_df, hist.unionByName(rows), radius_deg, window_s,
                key, ts, lon, lat)
            (pairs.write.mode("overwrite")
             .parquet(f"{pairs_path}/batch_id={batch_id}"))
            (rows.write.mode("overwrite")
             .parquet(f"{index_path}/batch_id={batch_id}"))
        finally:
            rows.unpersist()

    return (events.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


OD_STATE_SCHEMA = "last_us long, last_key long, last_cell long"


def od_flows_stream(events: DataFrame, res: int, user: str = "user_id",
                    key: str = "event_id", ts: str = "ts",
                    lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Streaming origin-destination transitions: the stateful twin of
    events.od_flows. Per-user state carries the last seen event
    (us, key, cell); each micro-batch chains its (us, key)-sorted
    events onto it and APPENDS one row per cell-changing transition —
    the flow matrix is a downstream rollup of these rows, so the union
    of per-batch outputs rolled up equals the batch od_flows (tested).

    The cell id is computed JVM-side (cells.with_cell) before the
    stateful groupBy, so the pandas fn only sorts and chains.
    Precondition (documented, watermark-style): per-user event-time
    order must hold ACROSS batches — an event at or before the state's
    (last_us, last_key) is dropped rather than spliced retroactively
    into an already-emitted chain (the same late-data stance a
    watermark takes); within a batch any disorder is fine (sorted).

    The user and event keys must be integer-typed (the state schema
    carries them as BIGINT) — validated up front."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from . import cells

    for c in (user, key):
        dt = events.schema[c].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"od_flows_stream: column {c!r} must be integer-typed "
                f"(state schema is BIGINT), got {dt}")
    ev = (events.select(F.col(user).cast("long").alias(user),
                        F.col(key).cast("long").alias("_k"),
                        F.unix_micros(F.col(ts).cast("timestamp"))
                         .alias("_us"),
                        F.col(lon).alias("_x"), F.col(lat).alias("_y")))
    ev = cells.with_cell(ev, res, lon="_x", lat="_y").select(
        user, "_k", "_us", "cell")

    def fn(k, pdfs, state: GroupState):
        if state.exists:
            last_us, last_key, last_cell = state.get
        else:
            last_us, last_key, last_cell = None, None, None
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["_us", "_k"])
        frm, to = [], []
        for us, kk, cell in zip(batch["_us"], batch["_k"], batch["cell"]):
            us, kk, cell = int(us), int(kk), int(cell)
            if last_us is not None and (us, kk) <= (last_us, last_key):
                continue  # cross-batch late event: dropped (see doc)
            if last_cell is not None and cell != last_cell:
                frm.append(last_cell)
                to.append(cell)
            last_us, last_key, last_cell = us, kk, cell
        if last_us is not None:
            state.update((last_us, last_key, last_cell))
        if frm:
            yield pd.DataFrame({user: [k[0]] * len(frm),
                                "from_cell": frm, "to_cell": to})

    out_schema = f"{user} long, from_cell long, to_cell long"
    return (ev.groupBy(user).applyInPandasWithState(
        fn, out_schema, OD_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))


STAY_OUT_SCHEMA = ("user_id bigint, cell bigint, enter_us bigint, "
                   "exit_us bigint, n_events bigint")
STAY_STATE_SCHEMA = "cell bigint, enter_us bigint, last_us bigint, n bigint"


def stay_points_stream(events: DataFrame, res: int, ts: str = "ts",
                       user: str = "user_id", lon: str = "lon",
                       lat: str = "lat") -> DataFrame:
    """Streaming twin of events.stay_points: per-user keyed state
    carries the OPEN same-cell run across micro-batches; a stay is
    EMITTED when an event in a DIFFERENT cell arrives (closed-run
    append semantics, like sessionize_stream's closed sessions). Cell
    assignment is plain column math upstream of the stateful op.

    Ordering contract: events are sorted by event time within each
    batch; an out-of-order event in the SAME cell extends the open
    run's bounds (enter=min, exit=max), but cross-batch out-of-order
    CELL CHANGES cannot be repaired once the earlier run closed — feed
    per-user event-time-ordered batches (or watermark upstream), the
    same discipline od_flows needs. Parity: closed stream runs ==
    batch stay_points(min_events=1) minus each user's final (still
    open) run — asserted in pytest across a batch boundary."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from . import cells

    keyed = cells.with_cell(
        events.select(F.col(user),
                      F.unix_micros(F.col(ts).cast("timestamp"))
                       .alias("_us"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y").select(user, "_us", "cell")

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            cur_cell, enter_us, last_us, n = state.get
        else:
            cur_cell, enter_us, last_us, n = None, None, None, 0
        closed = []
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("_us")
        for t_us, cell in zip(batch["_us"].astype("int64"),
                              batch["cell"].astype("int64")):
            t_us, cell = int(t_us), int(cell)
            if cur_cell is None:
                cur_cell, enter_us, last_us, n = cell, t_us, t_us, 1
            elif cell == cur_cell:
                enter_us = min(enter_us, t_us)
                last_us = max(last_us, t_us)
                n += 1
            else:
                closed.append((key[0], cur_cell, enter_us, last_us, n))
                cur_cell, enter_us, last_us, n = cell, t_us, t_us, 1
        state.update((cur_cell, enter_us, last_us, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "cell": [c[1] for c in closed],
                "enter_us": [c[2] for c in closed],
                "exit_us": [c[3] for c in closed],
                "n_events": [c[4] for c in closed],
            })

    return (keyed.groupBy(user).applyInPandasWithState(
        fn, STAY_OUT_SCHEMA, STAY_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))


MM_OUT_SCHEMA = ("user_id bigint, way string, enter_us bigint, "
                 "exit_us bigint, n_pings bigint, min_snap_m double")
MM_STATE_SCHEMA = ("way string, enter_us bigint, last_us bigint, "
                   "n bigint, min_snap double")


def map_match_stream(events: DataFrame, ways: DataFrame,
                     max_radius_m: float, res: int, user: str = "user_id",
                     ts: str = "ts", lon: str = "lon",
                     lat: str = "lat") -> DataFrame:
    """Streaming twin of events.map_match: per-user keyed state carries
    the OPEN traversal across micro-batches; a traversal is EMITTED
    when a ping snaps to a DIFFERENT way (closed-run append semantics,
    like stay_points_stream).

    The snap's candidate generation is the stream-static dwithin join
    (explodes + equi-join + mapInPandas exact refinement — all
    streaming-legal; ``res`` must be explicit because auto-resolution
    needs an action). The per-ping nearest-way ARGMIN cannot be a
    row_number window in a stream, so it moves inside the state fn:
    candidates sort by (ping, distance, way) — the exact batch
    tie-break — and each ping keeps its first row before the run
    collapse. Off-network pings never reach the fn (no candidates), so
    they drop without splitting runs, exactly like batch.

    Ordering contract: same as stay_points_stream — feed per-user
    event-time-ordered batches; same-way out-of-order pings extend the
    open run's bounds, cross-batch way CHANGES cannot be repaired once
    the earlier traversal closed. Parity: closed stream traversals ==
    batch map_match minus each user's final (still open) run —
    asserted in pytest across a batch boundary."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from . import fuse as _fuse
    from . import joins as _joins

    pts = events.select(
        F.concat(F.col(user).cast("string"), F.lit("|"),
                 F.unix_micros(F.col(ts).cast("timestamp")).cast("string"))
         .alias("subject"),
        F.concat(F.lit("POINT ("), F.col(lon).cast("string"), F.lit(" "),
                 F.col(lat).cast("string"), F.lit(")")).alias("geom_wkt"))
    cand = _joins.dwithin_join(_fuse.prepare_geoms(pts), ways,
                               max_radius_m, res=res)
    split = F.split(F.col("a_subject"), "\\|")
    keyed = cand.select(
        split.getItem(0).cast("bigint").alias("user_id"),
        split.getItem(1).cast("bigint").alias("_us"),
        F.col("b_subject").alias("way"),
        F.col("distance_m").alias("d"))

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            cur_way, enter_us, last_us, n, msnap = state.get
        else:
            cur_way, enter_us, last_us, n, msnap = None, None, None, 0, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["_us", "d", "way"])
        best = batch.groupby("_us", sort=True).first().reset_index()
        closed = []
        for t_us, way, d in zip(best["_us"].astype("int64"),
                                best["way"], best["d"]):
            t_us, way, d = int(t_us), str(way), float(d)
            if cur_way is None:
                cur_way, enter_us, last_us, n, msnap = way, t_us, t_us, 1, d
            elif way == cur_way:
                enter_us = min(enter_us, t_us)
                last_us = max(last_us, t_us)
                n += 1
                msnap = min(msnap, d)
            else:
                closed.append((key[0], cur_way, enter_us, last_us, n, msnap))
                cur_way, enter_us, last_us, n, msnap = way, t_us, t_us, 1, d
        state.update((cur_way, enter_us, last_us, n, msnap))
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "way": [c[1] for c in closed],
                "enter_us": [c[2] for c in closed],
                "exit_us": [c[3] for c in closed],
                "n_pings": [c[4] for c in closed],
                "min_snap_m": [c[5] for c in closed],
            })

    return (keyed.groupBy("user_id").applyInPandasWithState(
        fn, MM_OUT_SCHEMA, MM_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))


OCT_OUT_SCHEMA = "user_id bigint, octant int, d2 bigint"
OCT_STATE_SCHEMA = "us bigint, k bigint, px bigint, py bigint"


def _octant_int(dx: int, dy: int) -> int:
    """The heading sector rule of events.heading_octants as plain
    integer python — MUST stay branch-identical to the Spark CASE
    (pytest pins stream == batch on all 8 directions + diagonals)."""
    adx, ady = abs(dx), abs(dy)
    if dx > 0 and dy >= 0 and adx > ady:
        return 0
    if dx >= 0 and dy > 0 and ady >= adx and adx > 0:
        return 1
    if dx == 0 and dy > 0:
        return 2
    if dx < 0 and dy > 0 and ady > adx:
        return 2
    if dx < 0 and dy > 0 and adx >= ady:
        return 3
    if dx < 0 and dy <= 0 and adx > ady:
        return 4
    if dx <= 0 and dy < 0 and ady >= adx and adx > 0:
        return 5
    if dx == 0 and dy < 0:
        return 6
    if dx > 0 and dy < 0 and ady > adx:
        return 6
    return 7


def heading_octants_stream(pts: DataFrame, user: str = "user_id",
                           key: str = "event_id", ts: str = "ts",
                           ix: str = "ix", iy: str = "iy") -> DataFrame:
    """Streaming twin of events.heading_octants: per-user keyed state
    carries the LAST ping (us, key, px, py) across micro-batches; each
    batch chains its (us, key)-sorted pings onto it and APPENDS one
    row per non-zero displacement (user, octant, d2). The profile is a
    downstream rollup of these rows, so the union of per-batch outputs
    grouped by (user, octant) equals the batch operator — including
    the displacement that crosses the batch boundary (tested).

    Same late-data stance as od_flows_stream: an event at or before
    the state's (last_us, last_key) is dropped, never spliced
    retroactively. Integer-typed user/key validated up front."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    for c in (user, key):
        dt = pts.schema[c].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"heading_octants_stream: column {c!r} must be "
                f"integer-typed (state schema is BIGINT), got {dt}")
    ev = pts.select(F.col(user).cast("long").alias("user_id"),
                    F.col(key).cast("long").alias("_k"),
                    F.unix_micros(F.col(ts).cast("timestamp")).alias("_us"),
                    F.col(ix).cast("long").alias("_px"),
                    F.col(iy).cast("long").alias("_py"))

    def fn(k, pdfs, state: GroupState):
        if state.exists:
            last_us, last_key, last_px, last_py = state.get
        else:
            last_us = last_key = last_px = last_py = None
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["_us", "_k"])
        octs, d2s = [], []
        for us, kk, px, py in zip(batch["_us"], batch["_k"],
                                  batch["_px"], batch["_py"]):
            us, kk, px, py = int(us), int(kk), int(px), int(py)
            if last_us is not None and (us, kk) <= (last_us, last_key):
                continue  # cross-batch late event: dropped (see doc)
            if last_us is not None:
                dx, dy = px - last_px, py - last_py
                if dx != 0 or dy != 0:
                    octs.append(_octant_int(dx, dy))
                    d2s.append(dx * dx + dy * dy)
            last_us, last_key, last_px, last_py = us, kk, px, py
        if last_us is not None:
            state.update((last_us, last_key, last_px, last_py))
        if octs:
            yield pd.DataFrame({"user_id": [k[0]] * len(octs),
                                "octant": pd.array(octs, dtype="int32"),
                                "d2": d2s})

    return (ev.groupBy("user_id").applyInPandasWithState(
        fn, OCT_OUT_SCHEMA, OCT_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))


def activity_periods_stream(events: DataFrame, res: int, period_s: int,
                            watermark: str = "2 hours", ts: str = "ts",
                            lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Streaming half of the decayed-activity surface (the lambda
    shape): maintain watermarked (period window, cell, n_events)
    counts — state is touched-cells x recent-periods, tiny and
    bounded — and leave the exponential decay to the stateless
    read-time finalize ``events.decayed_from_periods``, so ONE
    running stream serves every (now, half-life, horizon) a dashboard
    asks for instead of baking one decay constant into stream state.
    Late events beyond the watermark drop; the batch compaction
    recomputes exact surfaces from the event sink."""
    base = cells.with_cell(
        events.select(F.col(ts).alias("_ts"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    return (base
            .withWatermark("_ts", watermark)
            .groupBy(F.window("_ts", f"{int(period_s)} seconds").alias("win"),
                     "cell")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("period_start"),
                    "cell", "n_events"))


def _cdc_state_ids(state_path: str) -> list[int]:
    """Sorted batch ids present under ``state_path`` (local-fs
    directory listing — the test-scale stand-in for Iceberg snapshot
    metadata; the marker/id scan is O(#snapshots), never O(rows))."""
    import os
    import re

    if not os.path.isdir(state_path):
        return []
    out = []
    for d in os.listdir(state_path):
        m = re.fullmatch(r"batch_id=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_cdc_state(spark: SparkSession, state_path: str,
                   before: int | None = None) -> DataFrame:
    """Reconstruct the CDC snapshot as of (exclusive) ``before`` —
    or the current snapshot when None — from the log-structured state
    layout of ``cdc_diff_stream``: newest FULL snapshot partition
    (``_FULL`` marker) + the delta partitions after it, applied in
    batch order. Merge-on-read: the chain is at most
    ``compact_every - 1`` deltas long by construction."""
    import os

    empty = spark.createDataFrame([], "subject string, geom_wkt string")
    ids = _cdc_state_ids(state_path)
    if before is not None:
        ids = [i for i in ids if i < before]
    if not ids:
        return empty
    fulls = [i for i in ids
             if os.path.exists(f"{state_path}/batch_id={i}/_FULL")]
    base_id = max(fulls) if fulls else None
    state = (spark.read.parquet(f"{state_path}/batch_id={base_id}")
             .select("subject", "geom_wkt") if base_id is not None else empty)
    for d in ids:
        if base_id is not None and d <= base_id:
            continue
        ops = spark.read.parquet(f"{state_path}/batch_id={d}")
        touched = ops.select("subject").distinct()
        puts = (ops.filter(F.col("op") == "put")
                .select("subject", "geom_wkt"))
        state = (state.join(touched, "subject", "left_anti")
                 .unionByName(puts))
    return state


def cdc_diff_stream(updates: DataFrame, state_path: str, diff_path: str,
                    checkpoint: str, compact_every: int = 8):
    """Streaming CDC maintenance: each micro-batch of geometry
    upserts/deletes (subject, geom_wkt, op in {'put','del'}; one op
    per subject per batch) is applied to the persistent snapshot and
    the per-batch io.snapshot_diff (added/removed/changed, both
    payloads) is emitted — the live form of the delete-then-insert
    merge (VirtuosoImporter.java:511-528), where downstream
    re-conflation consumes only the diff stream instead of
    re-scanning the table.

    State layout (r4 verdict item 6 — write volume scales with the
    BATCH, not the snapshot): ``state_path/batch_id=N`` holds either
    the batch's DELTA (the ops themselves: subject, geom_wkt, op) or,
    every ``compact_every`` batches, a compacted FULL snapshot
    (subject, geom_wkt + a ``_FULL`` marker file — the
    cells.tile_counts_update delta-merge idea applied to streaming
    state, log-structured-merge style). Reads reconstruct via
    ``read_cdc_state`` (newest full + ≤ compact_every-1 deltas in
    batch order), so a retried batch — which only ever looks at ids
    < N — recomputes the same diff idempotently and overwrites its
    own partition. ``compact_every=1`` degenerates to the r4
    full-rewrite-per-batch layout. At warehouse scale the same loop
    writes an Iceberg merge-on-read delta (delete vectors + appended
    rows) with identical diff semantics; the local ``_FULL`` marker
    stands in for snapshot metadata. Returns the started query
    (availableNow).
    """
    import os

    from . import io as io_mod

    if compact_every < 1:
        raise ValueError("compact_every must be >= 1")
    spark = updates.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        base = read_cdc_state(spark, state_path, before=batch_id)
        touched = batch_df.select("subject").distinct()
        puts = (batch_df.filter(F.col("op") == "put")
                .select("subject", "geom_wkt"))
        new_state = (base.join(touched, "subject", "left_anti")
                     .unionByName(puts).persist())
        new_state.count()
        try:
            diff = io_mod.snapshot_diff(base, new_state)
            (diff.write.mode("overwrite")
             .parquet(f"{diff_path}/batch_id={batch_id}"))
            ids = [i for i in _cdc_state_ids(state_path) if i < batch_id]
            fulls = [i for i in ids
                     if os.path.exists(f"{state_path}/batch_id={i}/_FULL")]
            chain = len([i for i in ids
                         if not fulls or i > max(fulls)])
            part = f"{state_path}/batch_id={batch_id}"
            if chain + 1 >= compact_every:
                new_state.write.mode("overwrite").parquet(part)
                open(os.path.join(part, "_FULL"), "w").close()
            else:
                (batch_df.select("subject", "geom_wkt", "op")
                 .write.mode("overwrite").parquet(part))
        finally:
            new_state.unpersist()

    return (updates.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
