"""Event-stream-shaped batch operators over the ``events`` table.

The reference has no streaming/time-series surface (SURVEY.md §2.11),
but a web-scale ingest pipeline timestamps everything (``warc_ts``) and
needs the standard event-time operators batch-side too (the streaming
variants live in streaming.py):

- tumbling-window rollups (the batch twin of
  ``streaming.tile_counts_stream``);
- gap-based sessionization — pure window functions (lag -> new-session
  flag -> running sum), no state store needed in batch.

Both are deterministic column math with bit-exact SQL mirrors; the
double-valued ``value`` column is aggregated in integer cents so sums
are order-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_rollup(events: DataFrame, window: str = "1 hour",
                    ts: str = "ts", by: str = "event_type") -> DataFrame:
    """Tumbling-window counts + exact integer-cents value sums per key."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (events
            .groupBy(F.window(F.col(ts), window).alias("win"), F.col(by))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(cents).alias("sum_value_cents"))
            .select(F.col("win.start").alias("window_start"), by,
                    "n_events", "sum_value_cents"))


def sessionize(events: DataFrame, gap_seconds: float = 1800.0,
               ts: str = "ts", user: str = "user_id") -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_seconds``. session_id counts a
    user's sessions in time order (1-based). Pure window functions —
    one shuffle on the user key."""
    w = Window.partitionBy(user).orderBy(ts)
    # NTZ-safe epoch seconds (micros / 1e6 — exact for uS timestamps)
    epoch = F.unix_micros(F.col(ts).cast("timestamp")).cast("double") / F.lit(1e6)
    prev = F.lag(epoch).over(w)
    new_sess = F.when(prev.isNull() | ((epoch - prev) > gap_seconds), 1).otherwise(0)
    return (events
            .withColumn("_new", new_sess)
            .withColumn("session_id",
                        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("_new"))


def session_stats(events: DataFrame, gap_seconds: float = 1800.0,
                  ts: str = "ts", user: str = "user_id") -> DataFrame:
    """Per-session rollup: event count + start/end timestamps."""
    s = sessionize(events, gap_seconds, ts, user)
    return (s.groupBy(user, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts).alias("start_ts"),
                 F.max(ts).alias("end_ts")))


def user_session_summary(events: DataFrame, gap_seconds: float = 1800.0,
                         ts: str = "ts", user: str = "user_id") -> DataFrame:
    """Per-user session-duration rollup on top of ``session_stats``:
    number of sessions, total events, and sum/max session duration.

    Durations are integer microseconds (``unix_micros(end) -
    unix_micros(start)``) so every aggregate is exact long arithmetic —
    order-independent and bit-identical to the SQL oracle. Two shuffles
    total, both on the user key (the second groupBy reuses the
    sessionize partitioning's key family, so AQE can often collapse the
    exchange)."""
    s = session_stats(events, gap_seconds, ts, user)
    dur = (F.unix_micros(F.col("end_ts").cast("timestamp"))
           - F.unix_micros(F.col("start_ts").cast("timestamp")))
    return (s.withColumn("dur_us", dur)
            .groupBy(user)
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.sum("dur_us").alias("sum_dur_us"),
                 F.max("dur_us").alias("max_dur_us")))


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              left_ts: str = "ts", right_ts: str = "vts") -> DataFrame:
    """AS-OF join (backward, inclusive): every left row gains the most
    recent right row whose ``right_ts <= left_ts`` for the same key,
    NULLs when no version precedes it — left-join semantics, matching
    DuckDB's ``ASOF LEFT JOIN`` (the contract oracle).

    Spark has no native as-of join; the distributed shape here is the
    canonical union-merge: tag both sides, one shuffle on the key, one
    per-partition sort by (ts, side), then a running ``last(...,
    ignorenulls)`` carries the latest version forward onto each event
    row. Version rows sort BEFORE event rows at an equal timestamp, so
    the match is inclusive. Never a per-row range probe, never a
    cross join; cost is sort-merge-like regardless of how many events
    share a key. At warehouse scale both sides arrive
    partition-pruned; the window's sort rides the shuffle's
    partitioning (no extra exchange). Hot-key caveat: one key with
    10^9 events sorts inside a single partition — pre-split such keys
    by coarse time range (key, t_bucket) and seed each bucket with
    the version in force at its open, the 1-D analog of
    cells.promote_hot_cells."""
    r_extra = [c for c in right.columns if c not in (on, right_ts)]
    l_cols = left.columns
    lt = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_ver", F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in r_extra) + ">"))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.struct(*[F.col(c) for c in r_extra]).alias("_ver"))
    for c in l_cols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    # side flag: versions (0) order before events (1) at equal _t
    lt = lt.withColumn("_side", F.lit(1)).select(*l_cols, "_t", "_ver", "_side")
    rt = rt.withColumn("_side", F.lit(0)).select(*l_cols, "_t", "_ver", "_side")
    w = (Window.partitionBy(on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = lt.unionByName(rt).withColumn(
        "_cur", F.last("_ver", ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1).select(
        *l_cols, *[F.col(f"_cur.{c}").alias(c) for c in r_extra])
    return out


def interval_range_join(events: DataFrame, intervals: DataFrame,
                        ts: str = "ts", start: str = "start",
                        end: str = "end",
                        bucket_seconds: int = 3600) -> DataFrame:
    """Range (interval) join: every (event, interval) pair with
    ``start <= ts < end`` — via time-bucket equi-join, the 1-D twin of
    the spatial cell join (joins.cell-ring): each interval explodes to
    the coarse buckets it spans, each event maps to its single bucket,
    and the equi-join on the bucket bounds the comparison to
    co-bucketed pairs — never the events x intervals cross product.
    An event belongs to exactly one bucket, so a multi-bucket interval
    still pairs with it at most once (no dedup needed). Size
    ``bucket_seconds`` to the typical interval length; skewed buckets
    fall to AQE skew-join handling like any hot cell."""
    b = F.lit(int(bucket_seconds) * 1_000_000)
    ev = events.withColumn("_bk", F.floor(F.unix_micros(F.col(ts)) / b))
    iv = intervals.withColumn(
        "_bk", F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start)) / b),
            # end is exclusive, but an interval ending exactly on a
            # bucket edge still owns no event there; sequence is
            # inclusive so the edge bucket is probed and the exact
            # predicate below decides
            F.floor(F.unix_micros(F.col(end)) / b))))
    j = ev.join(iv, "_bk")
    return (j.filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
            .drop("_bk"))


def _st_keys(events: DataFrame, res: int, window_us: int, key: str,
             ts: str, lon: str, lat: str) -> DataFrame:
    """Shared spatio-temporal key projection: (key, _x, _y, _us, ix,
    iy, cell, _bk) — exact epoch micros, integer DIV bucket, grid cell
    at ``res``."""
    from . import cells

    base = (events.select(F.col(key), F.col(lon).alias("_x"),
                          F.col(lat).alias("_y"),
                          F.unix_micros(F.col(ts).cast("timestamp"))
                           .alias("_us"))
            .withColumn("_bk", F.expr(f"_us DIV {window_us}")))
    return cells.with_cell(base, res, lon="_x", lat="_y")


def cooccurrence_join(events: DataFrame, radius_deg: float, window_s: int,
                      key: str = "event_id", ts: str = "ts",
                      lon: str = "lon", lat: str = "lat",
                      res: int | None = None) -> DataFrame:
    """Spatio-temporal co-occurrence: all pairs of events within
    ``radius_deg`` (Euclidean degrees) AND ``window_s`` seconds of
    each other — who-was-near-whom-when, the join behind co-location
    mining and contact tracing. Composes the engine's two replication
    tricks on ONE composite key: the build side replicates to its
    spatial cell ring (joins.radius_join's shape, cells.explode_ring)
    x three adjacent time buckets of width ``window_s``, and the
    probe side joins on its exact (cell, bucket) — so each candidate
    pair meets exactly once (the probe key is unique per event) and
    the exact distance + |dt| predicates run JVM-side on candidates,
    never all pairs.

    Report-once canonicalization: pairs emit with a_id < b_id.
    Replication cost is (2kx+1)(2ky+1)*3 rows per event with k chosen
    by cells.ring_k_for_radius — 27x at the default resolution, flat
    in corpus size; hot cells take the same salting/splitting levers
    as the radius join. Timestamps compare in exact epoch
    microseconds (BIGINT); buckets are integer DIV so boundary pairs
    always fall in adjacent buckets."""
    from . import cells

    res = res if res is not None else cells.res_for_radius_deg(radius_deg)
    kx, ky = cells.ring_k_for_radius(radius_deg, res)
    window_us = int(window_s) * 1_000_000
    base = _st_keys(events, res, window_us, key, ts, lon, lat)
    probe = base.select(F.col(key).alias("a_id"),
                        F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                        F.col("_us").alias("_aus"),
                        F.col("cell").alias("probe_cell"),
                        F.col("_bk").alias("pbk"))
    build = (cells.explode_ring(base, res, (kx, ky))
             .withColumn("_dbk", F.explode(F.array(
                 F.lit(-1), F.lit(0), F.lit(1))))
             .select(F.col(key).alias("b_id"),
                     F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                     F.col("_us").alias("_bus"), "probe_cell",
                     (F.col("_bk") + F.col("_dbk")).alias("pbk")))
    j = probe.join(build, ["probe_cell", "pbk"])
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    dd2 = dx * dx + dy * dy
    dtus = F.abs(F.col("_aus") - F.col("_bus"))
    return (j.filter((F.col("a_id") < F.col("b_id"))
                     & (dtus <= F.lit(window_us))
                     & (dd2 <= F.lit(radius_deg) * F.lit(radius_deg)))
             .select("a_id", "b_id", dtus.alias("dt_us"),
                     F.sqrt(dd2).alias("dist_deg")))


def cooccur_index(events: DataFrame, radius_deg: float, window_s: int,
                  key: str = "event_id", ts: str = "ts",
                  lon: str = "lon", lat: str = "lat",
                  res: int | None = None) -> DataFrame:
    """Exact-key index rows for INCREMENTAL co-occurrence: one row per
    event — (id, x, y, us, cell, bk), never replicated. The historical
    log is indexed once at ingest; only each day's increment pays the
    27x probe replication (cooccur_probe). Parameters must match the
    probe's (same res/window derivation)."""
    from . import cells

    res = res if res is not None else cells.res_for_radius_deg(radius_deg)
    window_us = int(window_s) * 1_000_000
    return (_st_keys(events, res, window_us, key, ts, lon, lat)
            .select(F.col(key).alias("id"), F.col("_x").alias("x"),
                    F.col("_y").alias("y"), F.col("_us").alias("us"),
                    "cell", F.col("_bk").alias("bk")))


def cooccur_probe(new_events: DataFrame, index: DataFrame,
                  radius_deg: float, window_s: int,
                  key: str = "event_id", ts: str = "ts",
                  lon: str = "lon", lat: str = "lat",
                  res: int | None = None) -> DataFrame:
    """Probe an increment of events against a persistent cooccur_index
    (which should already include THIS batch's own rows, so new-new
    pairs surface too): the incremental-maintenance twin of
    ``cooccurrence_join`` — the replication runs on the INCREMENT
    only; the historical index is equi-joined on its exact (cell, bk)
    and never re-scanned ringwise.

    A pair (earlier, later) is found when its LATER member probes, so
    the union of per-batch probe outputs over any batch split equals
    the full-corpus cooccurrence_join (tested in
    test_multimodal_streaming). Output is canonicalized to
    a_id < b_id; the dropDuplicates collapses the double sighting of
    within-batch pairs (both members probe) and makes a retried batch
    idempotent against its own half-committed index increment."""
    from . import cells

    res = res if res is not None else cells.res_for_radius_deg(radius_deg)
    kx, ky = cells.ring_k_for_radius(radius_deg, res)
    window_us = int(window_s) * 1_000_000
    base = _st_keys(new_events, res, window_us, key, ts, lon, lat)
    probe = (cells.explode_ring(base, res, (kx, ky))
             .withColumn("_dbk", F.explode(F.array(
                 F.lit(-1), F.lit(0), F.lit(1))))
             .select(F.col(key).alias("p_id"),
                     F.col("_x").alias("_px"), F.col("_y").alias("_py"),
                     F.col("_us").alias("_pus"),
                     F.col("probe_cell").alias("cell"),
                     (F.col("_bk") + F.col("_dbk")).alias("bk")))
    j = probe.join(index, ["cell", "bk"])
    dx = F.col("_px") - F.col("x")
    dy = F.col("_py") - F.col("y")
    dd2 = dx * dx + dy * dy
    dtus = F.abs(F.col("_pus") - F.col("us"))
    hit = j.filter((F.col("p_id") != F.col("id"))
                   & (dtus <= F.lit(window_us))
                   & (dd2 <= F.lit(radius_deg) * F.lit(radius_deg)))
    return (hit.select(F.least("p_id", "id").alias("a_id"),
                       F.greatest("p_id", "id").alias("b_id"),
                       dtus.alias("dt_us"), F.sqrt(dd2).alias("dist_deg"))
            .dropDuplicates(["a_id", "b_id"]))


def od_flows(events: DataFrame, res: int, user: str = "user_id",
             key: str = "event_id", ts: str = "ts",
             lon: str = "lon", lat: str = "lat",
             include_stays: bool = False) -> DataFrame:
    """Origin-destination flow matrix: each user's consecutive event
    pairs become one movement from the earlier event's cell to the
    later one's — the OD rollup behind every mobility/catchment
    analysis. Returns (from_cell, to_cell, n_moves, n_users);
    same-cell consecutive pairs ("stays") are excluded unless
    ``include_stays``.

    One shuffle on the user key for the lag window (ordered by exact
    epoch micros with the event id as total-order tie-break), one
    map-side-combined groupBy on the (from, to) cell pair. Hot users
    sort within one partition — pre-split by coarse time like the
    asof_join note. Value-exact: counts only (sql mirror in the
    contract query)."""
    from . import cells

    base = (events.select(F.col(user), F.col(key),
                          F.col(lon).alias("_x"), F.col(lat).alias("_y"),
                          F.unix_micros(F.col(ts).cast("timestamp"))
                           .alias("_us")))
    base = cells.with_cell(base, res, lon="_x", lat="_y")
    w = Window.partitionBy(user).orderBy("_us", key)
    moved = (base.withColumn("from_cell", F.lag("cell").over(w))
             .filter(F.col("from_cell").isNotNull()))
    if not include_stays:
        moved = moved.filter(F.col("from_cell") != F.col("cell"))
    return (moved.groupBy("from_cell", F.col("cell").alias("to_cell"))
            .agg(F.count(F.lit(1)).alias("n_moves"),
                 F.count_distinct(user).alias("n_users")))


def _cell_period_series(events: DataFrame, res: int, period_s: int,
                        ts: str, lon: str, lat: str) -> DataFrame:
    """(cell, _p, _x) per-period event counts per touched cell,
    zero-completed over the global [pmin, pmax] period range (a
    one-row broadcast). Shared by emerging_hotspots and
    cell_burst_scores — the count rollup is the only pass over raw
    events; completion runs on touched-cells x T rows."""
    from . import cells

    period_us = int(period_s) * 1_000_000
    # floor division (not DIV's truncation) so pre-1970 timestamps
    # bucket identically to the oracle's `//`: subtracting the
    # non-negative pmod makes _us an exact multiple, where DIV == floor
    base = (events.select(F.col(lon).alias("_x"), F.col(lat).alias("_y"),
                          F.unix_micros(F.col(ts).cast("timestamp"))
                           .alias("_us"))
            .withColumn("_p", F.expr(
                f"(_us - pmod(_us, {period_us})) DIV {period_us}")))
    base = cells.with_cell(base, res, lon="_x", lat="_y")
    counts = base.groupBy("cell", "_p").agg(F.count(F.lit(1)).alias("_x"))
    rng = counts.agg(F.min("_p").alias("_pmin"), F.max("_p").alias("_pmax"))
    return (counts.select("cell").distinct()
            .crossJoin(F.broadcast(rng))
            .select("cell", F.explode(F.sequence("_pmin", "_pmax"))
                    .alias("_p"))
            .join(counts, ["cell", "_p"], "left")
            .select("cell", "_p",
                    F.coalesce("_x", F.lit(0)).cast("long").alias("_x")))


def emerging_hotspots(events: DataFrame, res: int, period_s: int,
                      ts: str = "ts", lon: str = "lon",
                      lat: str = "lat") -> DataFrame:
    """Emerging-hotspot analysis (the Mann-Kendall trend half of
    ArcGIS's "Emerging Hot Spot Analysis"): per cell, the MK S
    statistic of its per-period event counts — S = sum over period
    pairs i<j of sign(x_j - x_i) — classifying activity as rising /
    falling / flat. Pure integers end to end (counts, signs, sums), so
    the whole row is value-exact.

    Zero periods COUNT: each touched cell's series is completed over
    the global [pmin, pmax] period range (a one-row broadcast) with
    0-count periods, else a cell active only at the end would look
    flat. Scale shape: the count rollup is the only pass over raw
    events; the series completion and the i<j self-join run on
    touched-cells x T rows (T = number of periods, tens), so pair
    volume is cells x T^2/2 — flat in event count. For T beyond a few
    hundred, switch to the O(T log T) rank formulation; at the
    analysis granularities this serves (daily/weekly periods over a
    season) the quadratic-in-T join is the cheaper plan."""
    series = _cell_period_series(events, res, period_s, ts, lon, lat)
    a = series.select("cell", F.col("_p").alias("_pa"),
                      F.col("_x").alias("_xa"))
    b = series.select("cell", F.col("_p").alias("_pb"),
                      F.col("_x").alias("_xb"))
    pairs = a.join(b, "cell").filter(F.col("_pa") < F.col("_pb"))
    return (pairs.groupBy("cell")
            .agg(F.sum(F.signum(F.col("_xb") - F.col("_xa")).cast("long"))
                 .alias("s_stat"),
                 (F.max("_pb") - F.min("_pa") + 1).alias("n_periods"))
            .select("cell", "s_stat", "n_periods",
                    F.when(F.col("s_stat") > 0, F.lit("rising"))
                     .when(F.col("s_stat") < 0, F.lit("falling"))
                     .otherwise(F.lit("flat")).alias("trend")))


def stay_points(events: DataFrame, res: int, min_duration_s: float = 0.0,
                min_events: int = 2, user: str = "user_id",
                key: str = "event_id", ts: str = "ts",
                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Stay-point detection: per user, MAXIMAL runs of consecutive
    events inside one grid cell — the mobility primitive behind
    home/work inference, dwell-time analytics and OD trip splitting
    (od_flows emits the moves between exactly these runs).

    Gaps-and-islands, fully declarative: a lag flags cell changes, a
    running sum numbers the runs, one groupBy((user, run)) aggregates
    enter/exit epoch micros and the event count; runs shorter than
    ``min_duration_s`` or ``min_events`` are dropped. Output
    (user, cell, enter_us, exit_us, dwell_us, n_events) — all exact
    integers.

    One shuffle on the user key (the two windows and the groupBy share
    it); counts and epoch-micro bounds are exact BIGINTs, so the whole
    operator is oracle-comparable. The SQL mirror must CAST its
    running SUM to BIGINT (DuckDB SUM OVER returns HUGEINT)."""
    from . import cells

    base = (events.select(F.col(user), F.col(key),
                          F.col(lon).alias("_x"), F.col(lat).alias("_y"),
                          F.unix_micros(F.col(ts).cast("timestamp"))
                           .alias("_us")))
    base = cells.with_cell(base, res, lon="_x", lat="_y")
    w = Window.partitionBy(user).orderBy("_us", key)
    chg = F.when(F.lag("cell").over(w).isNull()
                 | (F.lag("cell").over(w) != F.col("cell")), 1).otherwise(0)
    run = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (base.withColumn("_run", run)
           .groupBy(user, "_run", "cell")
           .agg(F.min("_us").alias("enter_us"),
                F.max("_us").alias("exit_us"),
                F.count(F.lit(1)).alias("n_events"))
           .withColumn("dwell_us", F.col("exit_us") - F.col("enter_us"))
           .filter((F.col("n_events") >= min_events)
                   & (F.col("dwell_us") >= int(min_duration_s * 1_000_000)))
           .select(user, "cell", "enter_us", "exit_us", "dwell_us",
                   "n_events"))
    return out


def map_match(events: DataFrame, ways: DataFrame, max_radius_m: float,
              res: int | None = None, user: str = "user_id",
              key: str = "event_id", ts: str = "ts",
              lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Trajectory map-matching: assign each ping to its nearest road
    (TRUE shape distance to the LINESTRING, not a centroid metric),
    then collapse each user's consecutive same-way pings into traversal
    intervals — the mobility op that turns raw GPS streams into
    per-segment travel records (the snap step is joins.knn_shape_join's
    k=1 assignment, the collapse is stay_points' gaps-and-islands over
    ways instead of cells).

    1. Snap: pings become POINT geometries (double -> shortest-roundtrip
       string -> parse gives back the identical double) and
       knn_shape_join(k=1) picks each ping's nearest way within
       ``max_radius_m`` — padded-PBSM candidate cells, envelope
       prefilter, exact refinement, per-ping WindowGroupLimit rank.
       Off-network pings (nothing in radius) drop out; a run therefore
       spans consecutive SURVIVING pings (an off-network ping between
       two same-way pings does not split the traversal).
    2. Recover (user, ts) by joining back on the unique ping key.
    3. Runs: lag flags way changes per user (ordered by event time,
       ping key), a running sum numbers traversals, ONE
       groupBy((user, run, way)) emits exact epoch-micro enter/exit
       bounds, the ping count and the closest snap distance.

    ``ways`` is a prepare_geoms frame. One user-key shuffle carries
    both windows and the groupBy (the stay_points plan argument); the
    snap join's shuffles are cell-bounded. Every output column is an
    exact integer except min_snap_m, which both engines fold with
    identical IEEE ops (the fagi_snap_to_way argument)."""
    from . import fuse as _fuse
    from . import joins as _joins

    pts = events.select(
        F.col(key).cast("string").alias("subject"),
        F.concat(F.lit("POINT ("), F.col(lon).cast("string"), F.lit(" "),
                 F.col(lat).cast("string"), F.lit(")")).alias("geom_wkt"))
    snap = (_joins.knn_shape_join(_fuse.prepare_geoms(pts), ways, 1,
                                  max_radius_m, res=res)
            .select(F.col("a_subject").alias("_k"),
                    F.col("b_subject").alias("way"),
                    F.col("distance_m").alias("snap_m")))
    base = (events.select(F.col(user), F.col(key),
                          F.col(key).cast("string").alias("_k"),
                          F.unix_micros(F.col(ts).cast("timestamp"))
                           .alias("_us"))
            .join(snap, "_k"))
    w = Window.partitionBy(user).orderBy("_us", key)
    chg = F.when(F.lag("way").over(w).isNull()
                 | (F.lag("way").over(w) != F.col("way")), 1).otherwise(0)
    run = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base.withColumn("_run", run)
            .groupBy(user, "_run", "way")
            .agg(F.min("_us").alias("enter_us"),
                 F.max("_us").alias("exit_us"),
                 F.count(F.lit(1)).alias("n_pings"),
                 F.min("snap_m").alias("min_snap_m"))
            .select(user, "way", "enter_us", "exit_us",
                    (F.col("exit_us") - F.col("enter_us")).alias("dwell_us"),
                    "n_pings", "min_snap_m"))


def trajectory_hausdorff(pts: DataFrame, block_shift: int,
                         user: str = "user_id",
                         ix: str = "ix", iy: str = "iy") -> DataFrame:
    """Symmetric Hausdorff distance between user trajectories on the
    integer grid -> (user_a, user_b, hausdorff_d2) for every candidate
    pair — the trajectory-similarity op behind "which users move alike"
    (carpool detection, mirrored-bot crawls, duplicate GPS devices).

    ``pts`` carries integer grid coordinates (``ix``/``iy``, e.g.
    ``cells.ix_col`` output or centi-degree ints); the distance is the
    exact BIGINT squared grid distance
    ``max(h(A->B), h(B->A)), h(A->B) = max_a min_b ((ax-bx)^2+(ay-by)^2)``
    — no floats anywhere, so the contract oracle is value-exact by
    construction.

    Candidate pairs are CO-LOCATION BLOCKED, never all-pairs: users
    sharing any ``2^block_shift``-cell block are compared (the
    minhash-band shape applied to space). Per-pair work is
    |A|x|B| over DISTINCT grid points, which trajectory quantization
    bounds (a device pinging a cell twice adds nothing); the pair
    cross-product rides an equi-join on the pair key, so a hot block
    spreads across partitions by pair, not by block. At 100 TB the
    knobs are ``block_shift`` (bigger blocks = more recall, more
    pairs) and the upstream grid resolution (coarser = fewer distinct
    points per user)."""
    p = (pts.select(F.col(user).alias("u"),
                    F.col(ix).cast("long").alias("px"),
                    F.col(iy).cast("long").alias("py"))
         .distinct())
    b = (p.select("u", F.shiftright("px", block_shift).alias("bx"),
                  F.shiftright("py", block_shift).alias("by"))
         .distinct())
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.bx") == F.col("r.bx"))
                    & (F.col("l.by") == F.col("r.by"))
                    & (F.col("l.u") < F.col("r.u")))
             .select(F.col("l.u").alias("user_a"),
                     F.col("r.u").alias("user_b"))
             .distinct())

    def directed(pa, pb):
        """max over pa's points of min over pb's points, per pair."""
        a = pairs.join(p.select(F.col("u").alias(pa),
                                F.col("px").alias("ax"),
                                F.col("py").alias("ay")), pa)
        ab = a.join(p.select(F.col("u").alias(pb),
                             F.col("px").alias("qx"),
                             F.col("py").alias("qy")), pb)
        d2 = ((F.col("ax") - F.col("qx")) * (F.col("ax") - F.col("qx"))
              + (F.col("ay") - F.col("qy")) * (F.col("ay") - F.col("qy")))
        mn = (ab.groupBy("user_a", "user_b", "ax", "ay")
              .agg(F.min(d2).alias("_md")))
        return mn.groupBy("user_a", "user_b").agg(F.max("_md").alias("_h"))

    hab = directed("user_a", "user_b").withColumnRenamed("_h", "_hab")
    hba = directed("user_b", "user_a").withColumnRenamed("_h", "_hba")
    return (hab.join(hba, ["user_a", "user_b"])
            .select("user_a", "user_b",
                    F.greatest("_hab", "_hba").alias("hausdorff_d2")))


def _dtw_numpy(ax, ay, bx, by, band=None):
    """Exact integer DTW on two grid sequences (squared cell costs).
    Classic O(n*m) DP; ``band`` (Sakoe-Chiba half-width) bounds the
    scan to a diagonal corridor for long sequences."""
    n, m = len(ax), len(by)
    if n == 0 or m == 0:
        return None
    import numpy as _np
    ax = _np.asarray(ax, dtype=_np.int64)
    ay = _np.asarray(ay, dtype=_np.int64)
    bx = _np.asarray(bx, dtype=_np.int64)
    by = _np.asarray(by, dtype=_np.int64)
    big = _np.iinfo(_np.int64).max // 4
    prev = _np.full(m, big, dtype=_np.int64)
    for i in range(n):
        cost = (ax[i] - bx) ** 2 + (ay[i] - by) ** 2
        cur = _np.full(m, big, dtype=_np.int64)
        lo, hi = 0, m
        if band is not None:
            lo, hi = max(0, i - band), min(m, i + band + 1)
        for j in range(lo, hi):
            if i == 0 and j == 0:
                best = 0
            elif i == 0:
                best = cur[j - 1]
            elif j == 0:
                best = prev[0]
            else:
                best = min(prev[j], prev[j - 1], cur[j - 1])
            cur[j] = cost[j] + best
        prev = cur
    return int(prev[m - 1]) if prev[m - 1] < big else None


def trajectory_dtw(pts: DataFrame, block_shift: int,
                   user: str = "user_id", ix: str = "ix", iy: str = "iy",
                   order: tuple = ("us",), band: int | None = None,
                   max_len: int = 4096,
                   overflow: str = "error") -> DataFrame:
    """Dynamic-time-warping trajectory similarity -> (user_a, user_b,
    dtw_d2) over co-location-blocked user pairs — the ORDER-aware
    companion to ``trajectory_hausdorff``: Hausdorff asks "do the two
    point CLOUDS overlap", DTW asks "did they trace the same PATH in
    the same order" (route-following convoy detection vs mere shared
    territory). Cost per aligned step is the exact BIGINT squared grid
    distance; the DTW total is the min over monotone alignments, so
    the whole value is integer-exact and the contract oracle
    (one-DP-cell-per-step recursive CTE carrying the flattened DP list
    — the sanctioned sequential-state oracle pattern, cf.
    sql_cluster_hull / the BPE-fixed oracle) matches bit-for-bit.

    Candidate pairs reuse the Hausdorff blocking (shared
    ``2^block_shift``-cell block). Each pair costs O(n*m) in an Arrow
    pandas UDF over the two collected sequences — per-user sequences
    must therefore be BOUNDED upstream (session/day segmentation, or
    ping thinning), which is the standard DTW deployment shape; pass
    ``band`` (Sakoe-Chiba half-width) to cut a long pair to O(n*band).
    The pair frame itself is an equi-join on the pair key, so hot
    blocks spread by pair exactly as in the Hausdorff plan.

    ``max_len`` enforces the bounded-sequence precondition IN-ENGINE
    (r4 verdict item 7): a user sequence longer than ``max_len``
    points either fails the job with a clear error (``overflow=
    "error"``, the default — an unsegmented runaway user would
    otherwise cost O(n*m) per pair silently) or is cut to its first
    ``max_len`` points in ``order`` (``overflow="truncate"``, the
    thinning escape hatch; truncation changes dtw_d2, so it is never
    the silent default)."""
    from pyspark.sql.functions import pandas_udf

    ocols = [F.col(c) for c in order]
    seq = (pts.select(F.col(user).alias("u"), *[F.col(c) for c in order],
                      F.col(ix).cast("long").alias("px"),
                      F.col(iy).cast("long").alias("py"))
           .groupBy("u")
           .agg(F.array_sort(F.collect_list(
               F.struct(*ocols, F.col("px"), F.col("py")))).alias("_s"))
           .select("u", F.transform("_s", lambda r: r["px"]).alias("xs"),
                   F.transform("_s", lambda r: r["py"]).alias("ys")))
    if overflow == "truncate":
        seq = seq.select("u", F.slice("xs", 1, max_len).alias("xs"),
                         F.slice("ys", 1, max_len).alias("ys"))
    elif overflow != "error":
        raise ValueError(f"trajectory_dtw: unknown overflow={overflow!r} "
                         "(use 'error' or 'truncate')")
    p = (pts.select(F.col(user).alias("u"),
                    F.col(ix).cast("long").alias("px"),
                    F.col(iy).cast("long").alias("py"))
         .distinct())
    b = (p.select("u", F.shiftright("px", block_shift).alias("bx"),
                  F.shiftright("py", block_shift).alias("by"))
         .distinct())
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.bx") == F.col("r.bx"))
                    & (F.col("l.by") == F.col("r.by"))
                    & (F.col("l.u") < F.col("r.u")))
             .select(F.col("l.u").alias("user_a"),
                     F.col("r.u").alias("user_b"))
             .distinct())

    @pandas_udf("long")
    def dtw_udf(axs: pd.Series, ays: pd.Series,
                bxs: pd.Series, bys: pd.Series) -> pd.Series:
        out = []
        for a, c, d, e in zip(axs, ays, bxs, bys):
            if len(a) > max_len or len(d) > max_len:
                raise ValueError(
                    f"trajectory_dtw: sequence length {max(len(a), len(d))} "
                    f"exceeds max_len={max_len}; segment/thin upstream or "
                    "pass overflow='truncate'")
            out.append(_dtw_numpy(a, c, d, e, band=band))
        return pd.Series(out, dtype="object")

    withseq = (pairs
               .join(seq.select(F.col("u").alias("user_a"),
                                F.col("xs").alias("axs"),
                                F.col("ys").alias("ays")), "user_a")
               .join(seq.select(F.col("u").alias("user_b"),
                                F.col("xs").alias("bxs"),
                                F.col("ys").alias("bys")), "user_b"))
    return (withseq
            .select("user_a", "user_b",
                    dtw_udf("axs", "ays", "bxs", "bys").alias("dtw_d2"))
            .filter(F.col("dtw_d2").isNotNull()))


def heading_octants(pts: DataFrame, user: str = "user_id",
                    ix: str = "ix", iy: str = "iy",
                    order: tuple = ("us",)) -> DataFrame:
    """Per-user movement-direction profile -> (user, octant, n_moves,
    sum_d2): consecutive ping displacements classified into the 8
    integer octants (0=E, 1=NE, 2=N, ... 7=SE — 45-degree sectors
    bounded by the axes and diagonals), with the exact BIGINT squared
    step length summed per octant. The transcendental-free heading
    feature (no atan2 anywhere): a commuter shows two opposite heavy
    octants, a delivery round spreads flat, a mirrored-bot trace
    matches another user's profile exactly.

    Sector rule (deterministic ties): with adx=|dx|, ady=|dy|, the
    diagonal goes to the sector it starts (adx==ady ties break toward
    the diagonal's own octant, axis-exact steps to the axis octant);
    zero-displacement steps (same grid cell twice) are dropped. All
    comparisons are integer, so the oracle mirrors them with one CASE.

    One user-key shuffle carries the lag window AND the final groupBy
    (the stay_points plan argument)."""
    ocols = [F.col(c) for c in order]
    w = Window.partitionBy(user).orderBy(*ocols)
    p = pts.select(F.col(user).alias("u"), *[F.col(c) for c in order],
                   F.col(ix).cast("long").alias("px"),
                   F.col(iy).cast("long").alias("py"))
    dx = F.col("px") - F.lag("px").over(w.partitionBy("u"))
    dy = F.col("py") - F.lag("py").over(w.partitionBy("u"))
    d = (p.withColumn("dx", dx).withColumn("dy", dy)
         .filter(F.col("dx").isNotNull()
                 & ((F.col("dx") != 0) | (F.col("dy") != 0))))
    adx, ady = F.abs(F.col("dx")), F.abs(F.col("dy"))
    oct_ = (
        F.when((F.col("dx") > 0) & (F.col("dy") >= 0) & (adx > ady), 0)
        .when((F.col("dx") >= 0) & (F.col("dy") > 0) & (ady >= adx) & (adx > 0), 1)
        .when((F.col("dx") == 0) & (F.col("dy") > 0), 2)
        .when((F.col("dx") < 0) & (F.col("dy") > 0) & (ady > adx), 2)
        .when((F.col("dx") < 0) & (F.col("dy") > 0) & (adx >= ady), 3)
        .when((F.col("dx") < 0) & (F.col("dy") <= 0) & (adx > ady), 4)
        .when((F.col("dx") <= 0) & (F.col("dy") < 0) & (ady >= adx) & (adx > 0), 5)
        .when((F.col("dx") == 0) & (F.col("dy") < 0), 6)
        .when((F.col("dx") > 0) & (F.col("dy") < 0) & (ady > adx), 6)
        .otherwise(7).cast("int"))
    d2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    return (d.select(F.col("u").alias(user), oct_.alias("octant"),
                     d2.alias("_d2"))
            .groupBy(user, "octant")
            .agg(F.count(F.lit(1)).alias("n_moves"),
                 F.sum("_d2").alias("sum_d2")))


def knox_statistic(events: DataFrame, radius_deg: float, window_s: int,
                   key: str = "event_id", ts: str = "ts",
                   lon: str = "lon", lat: str = "lat",
                   res: int | None = None) -> DataFrame:
    """Knox space-time interaction statistic -> ONE row (n_events,
    n_pairs, n_close_st, n_close_s, n_close_t, knox_ratio): do events
    that are close in SPACE also tend to be close in TIME (disease
    clusters, aftershock-like bursts, coordinated bot swarms)? The
    classic ESDA test: knox_ratio = (n_close_st * n_pairs) /
    (n_close_s * n_close_t) — ratio > 1 means space-time interaction
    beyond what the marginals explain.

    All four counts are exact BIGINTs from blocked pair joins —
    space-and-time pairs are ``cooccurrence_join``'s composite
    (cell-ring x time-bucket) join, space-only pairs the cell-ring
    join alone, time-only pairs the bucket join alone — never an
    all-pairs product; the ratio is ONE IEEE division of exact
    integers, so the whole row is oracle-exact. At 100 TB the time-only
    count is the widest join (every same-window pair); its bucket key
    spreads uniformly by construction, and the window is the knob.

    Follows the morans_i single-row-aggregate pattern: four
    single-row count frames cross-joined into the statistic."""
    from . import cells

    res = res if res is not None else cells.res_for_radius_deg(radius_deg)
    kx, ky = cells.ring_k_for_radius(radius_deg, res)
    window_us = int(window_s) * 1_000_000
    r2 = radius_deg * radius_deg
    base = _st_keys(events, res, window_us, key, ts, lon, lat)

    st_pairs = cooccurrence_join(events, radius_deg, window_s,
                                 key=key, ts=ts, lon=lon, lat=lat, res=res)

    probe_s = base.select(F.col(key).alias("a_id"),
                          F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                          F.col("cell").alias("probe_cell"))
    build_s = (cells.explode_ring(base, res, (kx, ky))
               .select(F.col(key).alias("b_id"),
                       F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                       "probe_cell"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    s_pairs = (probe_s.join(build_s, "probe_cell")
               .filter((F.col("a_id") < F.col("b_id"))
                       & (dx * dx + dy * dy <= F.lit(r2))))

    probe_t = base.select(F.col(key).alias("a_id"),
                          F.col("_us").alias("_aus"),
                          F.col("_bk").alias("pbk"))
    build_t = (base.withColumn("_dbk", F.explode(F.array(
                   F.lit(-1), F.lit(0), F.lit(1))))
               .select(F.col(key).alias("b_id"),
                       F.col("_us").alias("_bus"),
                       (F.col("_bk") + F.col("_dbk")).alias("pbk")))
    t_pairs = (probe_t.join(build_t, "pbk")
               .filter((F.col("a_id") < F.col("b_id"))
                       & (F.abs(F.col("_aus") - F.col("_bus"))
                          <= F.lit(window_us))))

    c_n = base.agg(F.count(F.lit(1)).alias("n_events"))
    c_st = st_pairs.agg(F.count(F.lit(1)).alias("n_close_st"))
    c_s = s_pairs.agg(F.count(F.lit(1)).alias("n_close_s"))
    c_t = t_pairs.agg(F.count(F.lit(1)).alias("n_close_t"))
    out = c_n.crossJoin(c_st).crossJoin(c_s).crossJoin(c_t)
    n_pairs = F.expr("n_events * (n_events - 1) DIV 2")
    return (out.withColumn("n_pairs", n_pairs)
            .withColumn("knox_ratio",
                        (F.col("n_close_st") * F.col("n_pairs"))
                        / F.nullif(F.col("n_close_s") * F.col("n_close_t"),
                                   F.lit(0)))
            .select("n_events", "n_pairs", "n_close_st", "n_close_s",
                    "n_close_t", "knox_ratio"))


def funnel_stages(events: DataFrame, steps: list,
                  ts: str = "ts", user: str = "user_id",
                  kind: str = "event_type") -> DataFrame:
    """Per-user strict ordered-funnel progress: ``stage`` = how many of
    ``steps`` the user completed IN ORDER, each step strictly after the
    previous one (the product-analytics funnel; no FAGI analog — the
    web-event side of the graft).

    One shuffle: groupBy(user) -> time-sorted event array -> a JVM
    ``aggregate`` fold that greedily advances the stage pointer when
    the next step's event type appears at a strictly later timestamp.
    Greedy-earliest is optimal here (matching a step sooner never
    blocks a later step, since the only constraint is ``ts >`` the
    previous match), so the fold equals the sequential-min-join
    definition the SQL oracle uses — different algorithm, same rows.
    Per-user state is the user's own event list; web-scale per-user
    event counts are bounded (sessions of one principal), and the
    all-users work distributes on the groupBy key.

    Returns (user_id, stage) with stage in [0, len(steps)].
    """
    n = len(steps)
    if n == 0:
        raise ValueError("funnel_stages needs at least one step")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.select(
        F.col(user).alias("user_id"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("_us"),
        F.col(kind).alias("_k"))
    agg = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("_us").alias("us"), F.col("_k").alias("k")))).alias("evs"))
    init = F.struct(F.lit(0).cast("int").alias("stage"),
                    F.lit(-1).cast("long").alias("t"))
    fold = F.aggregate(
        "evs", init,
        lambda st, e: F.when(
            (st["stage"] < F.lit(n))
            & (e["k"] == F.element_at(steps_arr, st["stage"] + 1))
            & (e["us"] > st["t"]),
            F.struct((st["stage"] + 1).alias("stage"),
                     e["us"].alias("t"))).otherwise(st))
    return agg.select("user_id", fold["stage"].cast("int").alias("stage"))


def funnel(events: DataFrame, steps: list, ts: str = "ts",
           user: str = "user_id", kind: str = "event_type") -> DataFrame:
    """Funnel conversion report: one row per step with the number of
    users who reached it (strict in-order semantics of
    ``funnel_stages``) and the fraction of step-1 users retained.

    Everything after the per-user fold is driver-free tiny-frame
    algebra: stage histogram (<= len(steps)+1 rows) -> broadcast
    non-equi join against the step list -> one cross join for the
    step-1 denominator. Returns (step, step_name, n_users,
    frac_of_first) sorted by step.
    """
    spark = events.sparkSession
    st = funnel_stages(events, steps, ts=ts, user=user, kind=kind)
    by_stage = st.groupBy("stage").agg(F.count(F.lit(1)).alias("cnt"))
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, step_name string")
    reached = (steps_df.join(F.broadcast(by_stage),
                             F.col("stage") >= F.col("step"), "left")
               .groupBy("step", "step_name")
               .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long")
                    .alias("n_users")))
    first = (reached.filter(F.col("step") == 1)
             .select(F.col("n_users").alias("_first")))
    return (reached.crossJoin(F.broadcast(first))
            .select("step", "step_name", "n_users",
                    (F.col("n_users").cast("double")
                     / F.nullif(F.col("_first").cast("double"), F.lit(0.0)))
                    .alias("frac_of_first")))


def cohort_retention(events: DataFrame, anchor: str = "2024-01-01",
                     ts: str = "ts", user: str = "user_id") -> DataFrame:
    """Weekly cohort-retention matrix: cohort = the week (7-day index
    from ``anchor``) of a user's first event; each later active week
    counts toward (cohort_week, week_offset). The classic growth
    analytics rollup a web-events warehouse runs daily.

    Scale shape: distinct (user, week) -> min-per-user cohort (both
    map-side combinable) -> equi-join on user -> final rollup; the
    per-cohort denominator joins back on the tiny cohort_week frame
    (broadcast). No windows over the full table, no driver loops.

    Returns (cohort_week, week_offset, n_users, retained_frac) where
    retained_frac = n_users / cohort size (offset-0 count).
    """
    wk = F.floor(F.datediff(F.to_date(F.col(ts)), F.lit(anchor)) / 7) \
        .cast("long")
    act = (events.select(F.col(user).alias("user_id"), wk.alias("week"))
           .distinct())
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells_ = (act.join(cohort, "user_id")
              .groupBy("cohort_week",
                       (F.col("week") - F.col("cohort_week"))
                       .alias("week_offset"))
              .agg(F.count(F.lit(1)).alias("n_users")))
    base = (cells_.filter(F.col("week_offset") == 0)
            .select("cohort_week", F.col("n_users").alias("_size")))
    return (cells_.join(F.broadcast(base), "cohort_week")
            .select("cohort_week", "week_offset", "n_users",
                    (F.col("n_users").cast("double")
                     / F.col("_size").cast("double")).alias("retained_frac")))


def ripley_k(pts: DataFrame, radii_deg: list, key: str = "event_id",
             lon: str = "lon", lat: str = "lat",
             res: int | None = None) -> DataFrame:
    """Ripley's K point-pattern statistic (uncorrected estimator) at a
    ladder of radii — the multi-scale sibling of the single-radius
    Knox/Gi* tests: K(r) = A/(n(n-1)) * #{ordered pairs within r}.
    K above pi*r^2 means clustering at that scale, below means
    dispersion (Ripley 1976; standard ESDA literature).

    One blocked pair join at max(radii) (the same cell-ring probe/build
    skeleton as ``knox_statistic`` — never all-pairs), then every
    radius is a conditional SUM over the one candidate frame, stacked
    to rows; n and the bounding-box window area A come from one
    aggregate row cross-joined in. All counts are exact BIGINTs and
    the only float ops are the same (dx*dx)+(dy*dy) form the oracle
    mirrors plus one multiply/divide per output — value-exact.

    Returns (r_idx, r_deg, n_close, k_hat, k_csr) with n_close the
    UNORDERED (a<b) pair count; k_hat doubles it for the ordered-sum
    estimator; k_csr = pi*r^2 is the CSR reference curve.
    """
    import math
    from . import cells

    radii = sorted(float(r) for r in radii_deg)
    if not radii or radii[0] <= 0:
        raise ValueError("ripley_k needs positive radii")
    r_max = radii[-1]
    res = res if res is not None else cells.res_for_radius_deg(r_max)
    kx, ky = cells.ring_k_for_radius(r_max, res)
    base = cells.with_cell(
        pts.select(F.col(key).alias("_id"),
                   F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    probe = base.select(F.col("_id").alias("a_id"),
                        F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                        F.col("cell").alias("probe_cell"))
    build = (cells.explode_ring(base, res, (kx, ky))
             .select(F.col("_id").alias("b_id"),
                     F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                     "probe_cell"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    d2 = (dx * dx) + (dy * dy)
    pairs = (probe.join(build, "probe_cell")
             .filter((F.col("a_id") < F.col("b_id"))
                     & (d2 <= F.lit(r_max * r_max)))
             .select(d2.alias("d2")))
    counts = pairs.agg(*[
        F.sum(F.when(F.col("d2") <= F.lit(r * r), 1).otherwise(0))
        .cast("long").alias(f"_c{i}") for i, r in enumerate(radii)])
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        ((F.max("_x") - F.min("_x")) * (F.max("_y") - F.min("_y")))
        .alias("_area"))
    stacked = counts.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("r_idx"),
                 F.lit(r).alias("r_deg"),
                 F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("long")
                 .alias("n_close"))
        for i, r in enumerate(radii)])).alias("s")).select("s.*")
    out = stacked.crossJoin(F.broadcast(stats))
    k_hat = ((F.col("_area") * (F.lit(2) * F.col("n_close")).cast("double"))
             / (F.col("_n") * (F.col("_n") - 1)).cast("double"))
    return (out.select("r_idx", "r_deg", "n_close",
                       k_hat.alias("k_hat"),
                       *[])
            .withColumn("k_csr", F.element_at(
                F.array(*[F.lit(math.pi * r * r) for r in radii]),
                F.col("r_idx") + 1)))


def nn_g_function(pts: DataFrame, radii_deg: list, key: str = "event_id",
                  lon: str = "lon", lat: str = "lat",
                  res: int | None = None) -> DataFrame:
    """Nearest-neighbor G-function: the fraction of points whose
    nearest OTHER point lies within r, at a ladder of radii — the
    second classic point-pattern summary beside ``ripley_k`` (G rises
    early under clustering, late under inhibition; Diggle's standard
    ESDA pair). Radii must satisfy r <= max(radii): a point with no
    neighbor inside the max-radius ring correctly counts as "beyond r"
    for every reported r.

    Same blocked skeleton as ripley_k, but directional (a != b) so
    each point owns a MIN(d2) — an exactly order-independent float
    reduction (no data-dependent float sums), then per-radius counts
    are conditional integer SUMs and g_frac is one division. All
    value-exact against the naive per-point-min oracle.

    Returns (r_idx, r_deg, n_within, g_frac).
    """
    from . import cells

    radii = sorted(float(r) for r in radii_deg)
    if not radii or radii[0] <= 0:
        raise ValueError("nn_g_function needs positive radii")
    r_max = radii[-1]
    res = res if res is not None else cells.res_for_radius_deg(r_max)
    kx, ky = cells.ring_k_for_radius(r_max, res)
    base = cells.with_cell(
        pts.select(F.col(key).alias("_id"),
                   F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    probe = base.select(F.col("_id").alias("a_id"),
                        F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                        F.col("cell").alias("probe_cell"))
    build = (cells.explode_ring(base, res, (kx, ky))
             .select(F.col("_id").alias("b_id"),
                     F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                     "probe_cell"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    d2 = (dx * dx) + (dy * dy)
    nn = (probe.join(build, "probe_cell")
          .filter((F.col("a_id") != F.col("b_id"))
                  & (d2 <= F.lit(r_max * r_max)))
          .groupBy("a_id").agg(F.min(d2).alias("nn_d2")))
    counts = nn.agg(*[
        F.sum(F.when(F.col("nn_d2") <= F.lit(r * r), 1).otherwise(0))
        .cast("long").alias(f"_c{i}") for i, r in enumerate(radii)])
    n_row = base.agg(F.count(F.lit(1)).alias("_n"))
    stacked = counts.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("r_idx"),
                 F.lit(r).alias("r_deg"),
                 F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("long")
                 .alias("n_within"))
        for i, r in enumerate(radii)])).alias("s")).select("s.*")
    return (stacked.crossJoin(F.broadcast(n_row))
            .select("r_idx", "r_deg", "n_within",
                    (F.col("n_within").cast("double")
                     / F.col("_n").cast("double")).alias("g_frac")))


def transition_matrix(events: DataFrame, ts: str = "ts",
                      user: str = "user_id",
                      kind: str = "event_type") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count every consecutive (from_type -> to_type) step and
    row-normalize into transition probabilities — the behavioral
    model a web-events warehouse fits for next-action prediction and
    session-anomaly scoring.

    One shuffle: lag window per user ordered by (ts, event_id)
    (event_id tiebreak makes equal-timestamp order deterministic and
    SQL-mirrorable), then a count rollup with map-side combine and a
    broadcast row-total join. p is ONE division of exact BIGINTs.

    Returns (from_type, to_type, n, p).
    """
    w = Window.partitionBy(user).orderBy(ts, "event_id")
    steps = (events
             .withColumn("_prev", F.lag(kind).over(w))
             .filter(F.col("_prev").isNotNull())
             .select(F.col("_prev").alias("from_type"),
                     F.col(kind).alias("to_type")))
    cnt = (steps.groupBy("from_type", "to_type")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (cnt.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type", F.col("n").cast("long").alias("n"),
                    (F.col("n").cast("double")
                     / F.col("_tot").cast("double")).alias("p")))


def gap_regularity(events: DataFrame, ts: str = "ts",
                   user: str = "user_id",
                   min_gaps: int = 2) -> DataFrame:
    """Inter-event-time regularity per user — the metronome test for
    bot/crawler detection: humans produce bursty gaps (squared
    coefficient of variation cv2 near or above 1), schedulers produce
    near-constant gaps (cv2 near 0).

    Gaps are exact integer SECONDS (epoch-micros diff DIV 1e6), so the
    three per-user sums (n, sum, sum of squares) are order-independent
    BIGINTs — one lag window on the user key, one rollup. cv2 =
    var/mean^2 is a fixed tree of IEEE divisions over those integers,
    mirrored token-for-token in the oracle. Integer-domain note: the
    exact sumsq holds while n * max_gap_s^2 < 2^63 (any realistic
    per-user stream); a 100-TB outlier principal would bucket gaps
    first.

    Returns (user_id, n_gaps, sum_gap_s, sumsq_gap_s, cv2) for users
    with at least ``min_gaps`` gaps; cv2 NULL when the mean gap is 0.
    """
    w = Window.partitionBy(user).orderBy(ts, "event_id")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gaps = (events
            .withColumn("_g", (us - F.lag(us).over(w)))
            .filter(F.col("_g").isNotNull())
            .select(F.col(user).alias("user_id"),
                    F.expr("_g DIV 1000000").alias("gap_s")))
    agg = (gaps.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_gaps"),
                F.sum("gap_s").alias("sum_gap_s"),
                F.sum(F.col("gap_s") * F.col("gap_s"))
                .alias("sumsq_gap_s"))
           .filter(F.col("n_gaps") >= int(min_gaps)))
    nd = F.col("n_gaps").cast("double")
    sd = F.col("sum_gap_s").cast("double")
    qd = F.col("sumsq_gap_s").cast("double")
    mean = sd / nd
    var = qd / nd - mean * mean
    return agg.select(
        "user_id", "n_gaps", "sum_gap_s", "sumsq_gap_s",
        F.when(F.col("sum_gap_s") > 0, var / (mean * mean)).alias("cv2"))


def decayed_cell_counts(events: DataFrame, res: int, now: str,
                        half_life_s: int, horizon: int = 40,
                        ts: str = "ts", lon: str = "lon",
                        lat: str = "lat") -> DataFrame:
    """Exponentially time-decayed activity surface per grid cell —
    the "what's hot right now" rollup a freshness-aware crawler or
    trending-places feature reads — with NO transcendentals: the
    decay weight 2^-(age // half_life) is realized as an exact BIGINT
    power of two, 1 << (horizon - age_buckets), summed per cell
    (order-independent integer arithmetic), and the final score is
    one IEEE division by the exactly-representable double 2^horizon.
    Events older than ``horizon`` half-lives (or after ``now``)
    contribute 0.

    Scale shape: one map-side weight expression + one hash rollup on
    the cell key; the BIGINT sum stays inside int64 while
    n_events * 2^horizon < 2^63 (horizon 40 leaves 8M events per
    cell-free headroom; lower horizon at bigger scales).

    Returns (cell, n_events, sum_w, decayed_score) per touched cell.
    """
    from . import cells

    h_us = int(half_life_s) * 1_000_000
    hz = int(horizon)
    now_us = F.unix_micros(F.lit(now).cast("timestamp"))
    age = (now_us - F.unix_micros(F.col(ts).cast("timestamp")))
    base = (events.select(F.col(lon).alias("_x"), F.col(lat).alias("_y"),
                          age.alias("_a"))
            # floor-division bucketing, exact for negative ages too
            .withColumn("_b", F.expr(
                f"(_a - pmod(_a, {h_us})) DIV {h_us}")))
    w = (F.when((F.col("_b") >= 0) & (F.col("_b") <= hz),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                       f"CAST({hz} - _b AS INT))"))
         .otherwise(F.lit(0)).cast("long"))
    base = cells.with_cell(base.withColumn("_w", w), res,
                           lon="_x", lat="_y")
    denom = float(2 ** hz)  # exactly representable double
    return (base.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("_w").alias("sum_w"))
            .select("cell",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.col("sum_w").cast("long").alias("sum_w"),
                    (F.col("sum_w").cast("double") / F.lit(denom))
                    .alias("decayed_score")))


def sql_decayed_cell_counts(lon_expr: str, lat_expr: str, ts_expr: str,
                            from_clause: str, res: int, now: str,
                            half_life_s: int, horizon: int = 40) -> str:
    """DuckDB twin of decayed_cell_counts — same integer bucket, same
    BIGINT shift-sum, same single division by 2^horizon."""
    from . import cells

    h_us = int(half_life_s) * 1_000_000
    hz = int(horizon)
    return f"""WITH e AS (
  SELECT {cells.sql_cell(lon_expr, lat_expr, res)} AS cell,
         CAST((epoch_us(TIMESTAMP '{now}') - epoch_us({ts_expr}))
              // {h_us} AS BIGINT) AS b
  {from_clause}),
w AS (
  SELECT cell,
         CASE WHEN b >= 0 AND b <= {hz}
              THEN (CAST(1 AS BIGINT) << CAST({hz} - b AS INT))
              ELSE CAST(0 AS BIGINT) END AS w
  FROM e)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(w) AS DOUBLE) / {float(2 ** hz)!r} AS decayed_score
FROM w GROUP BY cell"""


def cell_burst_scores(events: DataFrame, res: int, period_s: int,
                      ts: str = "ts", lon: str = "lon",
                      lat: str = "lat") -> DataFrame:
    """Per-(cell, period) burst z-score against the cell's own
    zero-completed period history — the "this place is anomalously
    busy THIS week" detector that complements emerging_hotspots'
    monotone-trend reading (a one-off festival spike is a burst but
    no trend; steady growth is a trend but never a burst).

    Transcendental-free except one sqrt (sanctioned IEEE op): with
    n periods, S = sum(x), Q = sum(x^2) as exact BIGINTs, the
    population z-score algebra collapses to
    z = (n*x - S) / sqrt(n*Q - S*S) — one subtraction tree inside
    int64, one division, one sqrt, identically mirrored in SQL.
    NULL z for a constant series (zero variance). BIGINT domain:
    n*Q < 2^63 caps per-cell-period counts around 3M at T=1000
    periods — beyond web-analytics granularities.

    Scale shape: the shared _cell_period_series rollup (one pass over
    raw events) + a per-cell stats rollup on touched-cells x T rows +
    a broadcast-sized join back. Returns (cell, period, cnt, n_periods,
    z_score) for every touched cell x period.
    """
    series = _cell_period_series(events, res, period_s, ts, lon, lat)
    stats = (series.groupBy("cell")
             .agg(F.count(F.lit(1)).cast("long").alias("_n"),
                  F.sum("_x").cast("long").alias("_s"),
                  F.sum(F.col("_x") * F.col("_x")).cast("long")
                  .alias("_q")))
    j = series.join(stats, "cell")
    num = F.col("_n") * F.col("_x") - F.col("_s")
    den = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    return j.select(
        "cell", F.col("_p").alias("period"), F.col("_x").alias("cnt"),
        F.col("_n").alias("n_periods"),
        F.when(den > 0, num.cast("double") / F.sqrt(den.cast("double")))
        .alias("z_score"))


def radius_of_gyration(events: DataFrame, res: int,
                       user: str = "user_id", lon: str = "lon",
                       lat: str = "lat") -> DataFrame:
    """Per-user radius of gyration over grid-cell coordinates — the
    canonical human-mobility home-range scalar (Gonzalez, Hidalgo &
    Barabasi 2008): RMS distance of a user's pings from their own
    centroid. Commuters score small, travellers large, and a fleet of
    fake accounts sharing one template trajectory scores identically —
    which is why rg sits beside gap_regularity in a bot-score panel.

    Exact-arithmetic form: pings snap to integer grid coords (ix, iy)
    at ``res``; with n pings, Sx/Sy/Q = sum(ix), sum(iy),
    sum(ix^2+iy^2) as exact BIGINTs, rg^2's numerator is
    n*Q - Sx^2 - Sy^2 (the mean-free identity), and
    rg_cells = sqrt(num / n^2) — one division + one sqrt, mirrored.
    Units are CELLS at ``res`` (degree/metric conversion is a caller
    multiply); int64 domain holds while n * (2^res)^2 < 2^63 — res 12
    leaves 500G pings per user.

    One map-side snap + one hash rollup on the user key; returns
    (user_id, n_pings, rg2_num, rg_cells).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(user).alias("user_id"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    agg = (base.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pings"),
                F.sum("ix").cast("long").alias("_sx"),
                F.sum("iy").cast("long").alias("_sy"),
                F.sum(F.col("ix") * F.col("ix")
                      + F.col("iy") * F.col("iy")).cast("long")
                .alias("_q")))
    num = (F.col("n_pings") * F.col("_q")
           - F.col("_sx") * F.col("_sx") - F.col("_sy") * F.col("_sy"))
    return agg.select(
        "user_id", "n_pings", num.alias("rg2_num"),
        F.sqrt(num.cast("double")
               / (F.col("n_pings") * F.col("n_pings")).cast("double"))
        .alias("rg_cells"))


def cross_k(pts: DataFrame, radii_deg: list, cat: str,
            cat_a, cat_b, key: str = "event_id",
            lon: str = "lon", lat: str = "lat",
            res: int | None = None) -> DataFrame:
    """Bivariate (cross) Ripley's K: K_ab(r) = A/(n_a*n_b) * #{(a, b):
    category(a)=cat_a, category(b)=cat_b, d(a,b) <= r} at a ladder of
    radii — the classic "are cafes clustered AROUND transit stops"
    test (K above pi*r^2: attraction between the two categories;
    below: repulsion), completing the univariate ripley_k /
    nn_g_function point-pattern suite.

    Same blocked cell-ring skeleton as ripley_k, but the probe side
    carries only cat_a points and the ring-exploded build side only
    cat_b, so pair volume scales with the CROSS density, never
    all-pairs. Counts are exact BIGINTs; d2 is the same mirrored
    (dx*dx)+(dy*dy) form; k_ab is one multiply + one divide; the
    window area A is the bbox of BOTH categories (one aggregate).

    Returns (r_idx, r_deg, n_close, k_ab, k_csr).
    """
    import math
    from . import cells

    radii = sorted(float(r) for r in radii_deg)
    if not radii or radii[0] <= 0:
        raise ValueError("cross_k needs positive radii")
    r_max = radii[-1]
    res = res if res is not None else cells.res_for_radius_deg(r_max)
    kx, ky = cells.ring_k_for_radius(r_max, res)
    base = cells.with_cell(
        pts.select(F.col(key).alias("_id"), F.col(cat).alias("_c"),
                   F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    pa = base.filter(F.col("_c") == cat_a)
    pb = base.filter(F.col("_c") == cat_b)
    probe = pa.select(F.col("_id").alias("a_id"),
                      F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                      F.col("cell").alias("probe_cell"))
    build = (cells.explode_ring(pb, res, (kx, ky))
             .select(F.col("_id").alias("b_id"),
                     F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                     "probe_cell"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    d2 = (dx * dx) + (dy * dy)
    pairs = (probe.join(build, "probe_cell")
             .filter(d2 <= F.lit(r_max * r_max))
             .select(d2.alias("d2")))
    counts = pairs.agg(*[
        F.sum(F.when(F.col("d2") <= F.lit(r * r), 1).otherwise(0))
        .cast("long").alias(f"_c{i}") for i, r in enumerate(radii)])
    stats = base.agg(
        F.sum((F.col("_c") == cat_a).cast("long")).alias("_na"),
        F.sum((F.col("_c") == cat_b).cast("long")).alias("_nb"),
        ((F.max("_x") - F.min("_x")) * (F.max("_y") - F.min("_y")))
        .alias("_area"))
    stacked = counts.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("r_idx"),
                 F.lit(r).alias("r_deg"),
                 F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("long")
                 .alias("n_close"))
        for i, r in enumerate(radii)])).alias("s")).select("s.*")
    out = stacked.crossJoin(F.broadcast(stats))
    k_ab = ((F.col("_area") * F.col("n_close").cast("double"))
            / (F.col("_na") * F.col("_nb")).cast("double"))
    return (out.select("r_idx", "r_deg", "n_close",
                       F.when((F.col("_na") > 0) & (F.col("_nb") > 0), k_ab)
                       .alias("k_ab"))
            .withColumn("k_csr", F.element_at(
                F.array(*[F.lit(math.pi * r * r) for r in radii]),
                F.col("r_idx") + 1)))


def quadrat_stats(events: DataFrame, res: int, lon: str = "lon",
                  lat: str = "lat") -> DataFrame:
    """Quadrat analysis of a point pattern (the third classic test
    beside ripley_k / nn_g_function): chi-square CSR statistic and
    variance-mean ratio of per-cell counts over the pattern's grid
    bounding box. VMR >> 1: clustered; ~1: Poisson; << 1: regular.

    Empty quadrats count WITHOUT materializing: with Q total bbox
    quadrats, S points and Σc² over touched cells only, the identity
    Σ_all (c - S/Q)² = Σc² - S²/Q collapses chi2 to
    (Q*Σc² - S²)/S and vmr to chi2/(Q-1) — exact BIGINT numerators,
    two mirrored IEEE divisions. One cell rollup + one scalar
    aggregate; int64 domain: Q*Σc² < 2^63.

    Returns one row (n_points, n_quadrats, sum_sq, chi2, vmr);
    chi2/vmr NULL for degenerate inputs (no points, one quadrat).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    cnt = base.groupBy("cell").agg(F.count(F.lit(1)).alias("_c"))
    per = cnt.agg(F.sum(F.col("_c") * F.col("_c")).cast("long")
                  .alias("sum_sq"))
    box = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        ((F.max("ix") - F.min("ix") + 1)
         * (F.max("iy") - F.min("iy") + 1)).cast("long")
        .alias("n_quadrats"))
    j = box.crossJoin(per)
    chi2 = (F.col("n_quadrats") * F.col("sum_sq")
            - F.col("n_points") * F.col("n_points")).cast("double") \
        / F.col("n_points").cast("double")
    return j.select(
        "n_points", "n_quadrats", "sum_sq",
        F.when(F.col("n_points") > 0, chi2).alias("chi2"),
        F.when((F.col("n_points") > 0) & (F.col("n_quadrats") > 1),
               chi2 / (F.col("n_quadrats") - 1).cast("double"))
        .alias("vmr"))


def teleport_flags(events: DataFrame, res: int, max_speed_num: int,
                   max_speed_den_s: int, user: str = "user_id",
                   key: str = "event_id", ts: str = "ts",
                   lon: str = "lon", lat: str = "lat") -> DataFrame:
    """GPS teleport / speed-violation detection: consecutive same-user
    pings whose implied speed exceeds ``max_speed_num`` grid cells per
    ``max_speed_den_s`` seconds (a RATIONAL bound — realistic limits
    are fractions of a cell per second) — the data-quality gate a
    mobility pipeline runs before trusting trajectories (spoofed
    locations, tower jumps and account sharing all present as
    teleports).

    Division-free exact integers: a transition with gap dt_s seconds
    and squared cell distance d2 violates iff
    d2 * den^2 > (num * dt_s)^2 — same-second pairs (dt_s = 0)
    violate whenever they move at all. One user-key window (ordered
    by exact epoch micros + event id), one map-side filter; domain:
    d2 * den^2 and num * dt_s inside int64.

    Returns flagged transitions only:
    (user_id, from_event, to_event, dt_s, d2_cells).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(user).alias("user_id"),
                      F.col(key).alias("event_id"),
                      F.unix_micros(F.col(ts).cast("timestamp"))
                      .alias("_us"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    num, den = int(max_speed_num), int(max_speed_den_s)
    t = (base.withColumn("_pid", F.lag("event_id").over(w))
         .withColumn("_pus", F.lag("_us").over(w))
         .withColumn("_pix", F.lag("ix").over(w))
         .withColumn("_piy", F.lag("iy").over(w))
         .filter(F.col("_pid").isNotNull()))
    # whole seconds: exact floor of a non-negative difference
    dt = F.expr("(_us - _pus) DIV 1000000")
    dx, dy = F.col("ix") - F.col("_pix"), F.col("iy") - F.col("_piy")
    d2 = dx * dx + dy * dy
    return (t.select("user_id",
                     F.col("_pid").alias("from_event"),
                     F.col("event_id").alias("to_event"),
                     dt.cast("long").alias("dt_s"),
                     d2.cast("long").alias("d2_cells"))
            .filter(F.col("d2_cells") * F.lit(den * den)
                    > (F.lit(num) * F.col("dt_s"))
                    * (F.lit(num) * F.col("dt_s"))))


def od_flow_lift(events: DataFrame, res: int, user: str = "user_id",
                 key: str = "event_id", ts: str = "ts",
                 lon: str = "lon", lat: str = "lat") -> DataFrame:
    """OD flow lift against the independence (gravity-margin) model:
    lift(o, d) = n_moves(o,d) * total / (out_margin(o) * in_margin(d))
    — the "is this corridor stronger than its endpoints predict"
    normalization that turns a raw OD matrix into an anomaly surface
    (commuter corridors light up; popular-to-popular background flows
    flatten to ~1).

    Built on od_flows' rollup (one window + one groupBy), plus two
    margin rollups joined back on their keys — margins are
    cell-cardinality frames, broadcast-sized at analysis resolutions.
    Counts are exact BIGINTs; lift is one mirrored IEEE division of
    exact products (domain: n_moves * total < 2^63).

    Returns (from_cell, to_cell, n_moves, out_total, in_total, lift).
    """
    flows = od_flows(events, res, user=user, key=key, ts=ts,
                     lon=lon, lat=lat).select(
        "from_cell", "to_cell", "n_moves")
    om = (flows.groupBy("from_cell")
          .agg(F.sum("n_moves").cast("long").alias("out_total")))
    im = (flows.groupBy("to_cell")
          .agg(F.sum("n_moves").cast("long").alias("in_total")))
    tot = flows.agg(F.sum("n_moves").cast("long").alias("_tot"))
    return (flows.join(om, "from_cell").join(im, "to_cell")
            .crossJoin(F.broadcast(tot))
            .select("from_cell", "to_cell",
                    F.col("n_moves").cast("long").alias("n_moves"),
                    "out_total", "in_total",
                    ((F.col("n_moves") * F.col("_tot")).cast("double")
                     / (F.col("out_total") * F.col("in_total"))
                     .cast("double")).alias("lift")))


def decayed_from_periods(periods: DataFrame, now: str, half_life_s: int,
                         horizon: int = 40,
                         period_start: str = "period_start",
                         n_events: str = "n_events") -> DataFrame:
    """Read-time decay finalize over a (period_start, cell, n_events)
    frame — the batch half of streaming.activity_periods_stream's
    lambda pair: period-ALIGNED exponential decay (each period's
    bucket index is floor(now/hl) - floor(period/hl); coarser than
    decayed_cell_counts' per-event ages, identical when events are
    period-aligned) with the same transcendental-free weights: BIGINT
    1 << (horizon - b), one division by exact 2^horizon.

    Stateless and tiny (touched-cells x periods rows), so one stored
    period frame answers any (now, half_life, horizon) query.
    Returns (cell, n_events, sum_w, decayed_score).
    """
    h_us = int(half_life_s) * 1_000_000
    hz = int(horizon)
    # integer floor division on exact micros (never a double divide:
    # boundary periods would mis-bucket on a one-ulp rounding)
    now_p = F.expr(
        f"(unix_micros(CAST('{now}' AS TIMESTAMP))"
        f" - pmod(unix_micros(CAST('{now}' AS TIMESTAMP)), {h_us}))"
        f" DIV {h_us}")
    pb = F.expr(f"(unix_micros(CAST({period_start} AS TIMESTAMP))"
                f" - pmod(unix_micros(CAST({period_start} AS TIMESTAMP)),"
                f" {h_us})) DIV {h_us}")
    b = (now_p - pb).cast("long")
    denom = float(2 ** hz)
    staged = periods.select("cell",
                            F.col(n_events).cast("long").alias("_n"),
                            b.alias("_b"))
    w = (F.when((F.col("_b") >= 0) & (F.col("_b") <= hz),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                       f"CAST({hz} - _b AS INT))"))
         .otherwise(F.lit(0)).cast("long"))
    return (staged
            .select("cell", F.col("_n"), (w * F.col("_n")).alias("_w"))
            .groupBy("cell")
            .agg(F.sum("_n").cast("long").alias("n_events"),
                 F.sum("_w").cast("long").alias("sum_w"))
            .select("cell", "n_events", "sum_w",
                    (F.col("sum_w").cast("double") / F.lit(denom))
                    .alias("decayed_score")))


def colocation_quotient(pts: DataFrame, cat: str, cat_a, cat_b,
                        max_r_deg: float, key: str = "event_id",
                        lon: str = "lon", lat: str = "lat",
                        res: int | None = None) -> DataFrame:
    """Co-location quotient CLQ_A->B (Leslie & Kronenfeld 2011):
    among category-A points, how over-represented is category B as
    the NEAREST neighbor, versus B's global share —
    CLQ = (C_A->B / N_A') / (N_B / (N-1)). CLQ > 1: B attracts A
    (cafes cluster at transit); < 1: avoidance. The directional,
    category-aware sibling of nn_g_function (and asymmetric:
    A->B != B->A).

    Bounded variant: nearest neighbors are found within
    ``max_r_deg`` (the same cell-ring skeleton as nn_g_function);
    A points with NO neighbor in range drop from both numerator and
    N_A' (stated in the output columns). The per-A argmin is
    deterministic — ordered by (d2, neighbor id) — so the oracle
    mirrors it exactly; the quotient is two mirrored IEEE divisions
    of exact BIGINTs.

    Returns one row (n_total, n_a_with_nn, n_b, c_ab, clq).
    """
    from . import cells

    r_max = float(max_r_deg)
    res = res if res is not None else cells.res_for_radius_deg(r_max)
    kx, ky = cells.ring_k_for_radius(r_max, res)
    base = cells.with_cell(
        pts.select(F.col(key).alias("_id"), F.col(cat).alias("_c"),
                   F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    probe = (base.filter(F.col("_c") == cat_a)
             .select(F.col("_id").alias("a_id"),
                     F.col("_x").alias("_ax"), F.col("_y").alias("_ay"),
                     F.col("cell").alias("probe_cell")))
    build = (cells.explode_ring(base, res, (kx, ky))
             .select(F.col("_id").alias("b_id"), F.col("_c").alias("b_c"),
                     F.col("_x").alias("_bx"), F.col("_y").alias("_by"),
                     "probe_cell"))
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    d2 = (dx * dx) + (dy * dy)
    cand = (probe.join(build, "probe_cell")
            .filter((F.col("a_id") != F.col("b_id"))
                    & (d2 <= F.lit(r_max * r_max)))
            .select("a_id", "b_id", "b_c", d2.alias("_d2")))
    w = Window.partitionBy("a_id").orderBy("_d2", "b_id")
    nn = (cand.withColumn("_rk", F.row_number().over(w))
          .filter(F.col("_rk") == 1))
    num = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n_a_with_nn"),
        F.sum((F.col("b_c") == cat_b).cast("long")).cast("long")
        .alias("c_ab"))
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((F.col("_c") == cat_b).cast("long")).cast("long")
        .alias("n_b"))
    j = num.crossJoin(F.broadcast(tot))
    clq = ((F.col("c_ab").cast("double")
            / F.col("n_a_with_nn").cast("double"))
           / (F.col("n_b").cast("double")
              / (F.col("n_total") - 1).cast("double")))
    return j.select(
        "n_total", "n_a_with_nn", "n_b", "c_ab",
        F.when((F.col("n_a_with_nn") > 0) & (F.col("n_b") > 0)
               & (F.col("n_total") > 1), clq).alias("clq"))


def dwell_times(events: DataFrame, res: int, user: str = "user_id",
                key: str = "event_id", ts: str = "ts",
                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Total dwell time per (user, cell): each consecutive same-user
    ping pair whose BOTH ends lie in the same cell contributes its
    gap to that cell — the "minutes spent at place" feature behind
    home/work inference, store-visit attribution and POI ranking
    (stay_points emits the run GEOMETRY; this is the time-budget
    rollup).

    One user-key lag window (the od_flows total order: epoch micros
    + event id) + one (user, cell) rollup; gaps are exact integer
    microseconds, reported as whole seconds via the non-negative
    floor `DIV` both engines share. A gap spanning two cells is
    transit, not dwell — it contributes nowhere (stated; the
    alternative of splitting it needs a path model).

    Returns (user_id, cell, n_stays, dwell_s).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(user).alias("user_id"),
                      F.col(key).alias("event_id"),
                      F.unix_micros(F.col(ts).cast("timestamp"))
                      .alias("_us"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    t = (base.withColumn("_pcell", F.lag("cell").over(w))
         .withColumn("_pus", F.lag("_us").over(w))
         .filter(F.col("_pcell").isNotNull()
                 & (F.col("_pcell") == F.col("cell"))))
    return (t.groupBy("user_id", "cell")
            .agg(F.count(F.lit(1)).cast("long").alias("n_stays"),
                 F.sum(F.expr("(_us - _pus) DIV 1000000")).cast("long")
                 .alias("dwell_s")))


def od_stationary(events: DataFrame, res: int, iters: int = 3,
                  user: str = "user_id", key: str = "event_id",
                  ts: str = "ts", lon: str = "lon",
                  lat: str = "lat",
                  deterministic: bool = False) -> DataFrame:
    """Long-run cell-occupancy prediction: ``iters`` synchronous
    power-iteration steps of the row-normalized OD transition matrix,
    started from the uniform distribution over cells that have
    outgoing moves — "if people keep moving the way the OD matrix
    says, where does mass settle" (site-selection / coverage-planning
    reading of the flows; the mobility analog of pagerank without
    teleport). Cells with no outgoing moves leak their mass, exactly
    like pagerank's dangling convention — the RANKING is the
    consumable.

    Each step is one edge join + one destination rollup (the
    pagerank skeleton over od_flows' matrix). ``deterministic=True``
    folds each destination's inflow in from_cell-sorted order so the
    float masses are bit-reproducible and SQL-mirrorable; plain SUM
    is the scale path. Returns (cell, mass) after ``iters`` steps.
    """
    flows = od_flows(events, res, user=user, key=key, ts=ts,
                     lon=lon, lat=lat).select(
        "from_cell", "to_cell", "n_moves")
    out = flows.groupBy("from_cell").agg(
        F.sum("n_moves").cast("double").alias("_out"))
    e = (flows.join(out, "from_cell")
         .select("from_cell", "to_cell",
                 (F.col("n_moves").cast("double") / F.col("_out"))
                 .alias("_p")))
    nodes = flows.select(F.col("from_cell").alias("cell")).distinct() \
        .unionByName(flows.select(F.col("to_cell").alias("cell"))) \
        .distinct()
    starts = flows.select(F.col("from_cell").alias("cell")).distinct()
    n0 = starts.count()
    mass = nodes.join(starts.withColumn("_s", F.lit(True)), "cell", "left") \
        .select("cell",
                F.when(F.col("_s"), F.lit(1.0 / float(n0)))
                .otherwise(F.lit(0.0)).alias("mass"))
    for _ in range(int(iters)):
        contrib = (e.join(mass, F.col("from_cell") == F.col("cell"))
                   .select("from_cell", "to_cell",
                           (F.col("mass") * F.col("_p")).alias("_c")))
        if deterministic:
            agg = (contrib.groupBy("to_cell")
                   .agg(F.aggregate(
                       F.array_sort(F.collect_list(
                           F.struct("from_cell", "_c"))),
                       F.lit(0.0),
                       lambda acc, x: acc + x["_c"]).alias("_m")))
        else:
            agg = contrib.groupBy("to_cell").agg(F.sum("_c").alias("_m"))
        mass = (nodes.join(agg, F.col("cell") == F.col("to_cell"), "left")
                .select("cell",
                        F.coalesce(F.col("_m"), F.lit(0.0)).alias("mass")))
    return mass


def routine_index(events: DataFrame, ts: str = "ts",
                  user: str = "user_id") -> DataFrame:
    """Temporal-routine score per user: the fraction of a user's
    events falling in their single busiest (weekday, hour-of-day)
    bucket — commuters score high on one bucket, tourists spread
    flat, and schedulers/bots hit 1.0 exactly (pairs with
    gap_regularity's metronome cv2 in a bot panel).

    Timezone-free integer bucketing both engines share: with
    d = epoch days and h = epoch hours, weekday = (d + 4) % 7
    (1970-01-01 was a Thursday; 0 = Sunday) and hour = h % 24 — no
    date() / dayofweek() semantics to reconcile. Argmax bucket is
    deterministic (count DESC, then smallest weekday, hour). One
    (user, bucket) rollup + a WindowGroupLimit top-1 per user + one
    division.

    Returns (user_id, n_events, top_weekday, top_hour, top_count,
    routine_frac).
    """
    # integer floor-div on non-negative micros: DIV == // both engines
    d = F.expr("unix_micros(CAST(" + ts + " AS TIMESTAMP)) DIV 86400000000")
    h = F.expr("unix_micros(CAST(" + ts + " AS TIMESTAMP)) DIV 3600000000")
    base = events.select(
        F.col(user).alias("user_id"),
        ((d + 4) % 7).cast("long").alias("wd"),
        (h % 24).cast("long").alias("hh"))
    cnt = (base.groupBy("user_id", "wd", "hh")
           .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy("user_id").orderBy(
        F.col("_c").desc(), F.col("wd").asc(), F.col("hh").asc())
    top = (cnt.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") == 1)
           .select("user_id", F.col("wd").alias("top_weekday"),
                   F.col("hh").alias("top_hour"),
                   F.col("_c").cast("long").alias("top_count")))
    tot = (base.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    return (tot.join(top, "user_id")
            .select("user_id", "n_events", "top_weekday", "top_hour",
                    "top_count",
                    (F.col("top_count").cast("double")
                     / F.col("n_events").cast("double"))
                    .alias("routine_frac")))


def cell_temporal_autocorr(events: DataFrame, res: int, period_s: int,
                           ts: str = "ts", lon: str = "lon",
                           lat: str = "lat") -> DataFrame:
    """Lag-1 temporal autocorrelation per cell — the TIME axis of the
    ESDA matrix (Moran's I is correlation across NEIGHBORING CELLS;
    this is correlation across CONSECUTIVE PERIODS of one cell):
    persistent places score near 1, flickering event-driven places
    near 0/negative, separating "always busy" from "bursty" beyond
    what cell_burst_scores' per-period z says.

    Built on the shared zero-completed _cell_period_series; the lag
    pairs come from a per-cell window over the AGGREGATE (touched-
    cells x T rows, never raw events). Pearson over the m = T-1
    (x_t, x_{t+1}) pairs via exact BIGINT sums and the standard
    identity — two sqrts (sanctioned) and one division, mirrored
    with explicit (sa * sb) parenthesization. NULL when either
    series side is constant.

    Returns (cell, n_pairs, r1).
    """
    series = _cell_period_series(events, res, period_s, ts, lon, lat)
    w = Window.partitionBy("cell").orderBy("_p")
    pairs = (series.withColumn("_y", F.lead("_x").over(w))
             .filter(F.col("_y").isNotNull()))
    agg = (pairs.groupBy("cell")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum("_x").cast("long").alias("_sx"),
                F.sum("_y").cast("long").alias("_sy"),
                F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
                F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
                F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy")))
    m = F.col("n_pairs")
    num = (m * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    va = (m * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    vb = (m * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    return agg.select(
        "cell", "n_pairs",
        F.when((va > 0) & (vb > 0),
               num / (F.sqrt(va.cast("double"))
                      * F.sqrt(vb.cast("double")))).alias("r1"))


def cotravelers(events: DataFrame, res: int, window_s: int,
                min_meets: int = 2, user: str = "user_id",
                ts: str = "ts", lon: str = "lon",
                lat: str = "lat",
                max_bucket_users: int | None = None) -> DataFrame:
    """Co-traveler detection: user pairs repeatedly co-located in the
    same (cell, time-bucket) — the contact/convoy graph behind
    account-farm detection (devices that always move together) and
    companion inference. A pair must meet in >= ``min_meets``
    DISTINCT buckets, which kills the one-off-crowd false positive.

    Plan: distinct (user, cell, bucket) presences -> self equi-join
    on (cell, bucket) -> distinct-bucket count per pair. A stadium
    bucket with B users emits B^2 pairs — the projection blow-up —
    so ``max_bucket_users`` drops buckets above the cap via one
    count rollup + semi-join (crowds carry no pairing signal; the
    bipartite_project guard's shape). Pure integers.

    Returns (user_a, user_b, n_meets) with user_a < user_b.
    """
    from . import cells

    w_us = int(window_s) * 1_000_000
    base = cells.with_cell(
        events.select(F.col(user).alias("_u"),
                      F.expr(f"(unix_micros(CAST({ts} AS TIMESTAMP)) - "
                             f"pmod(unix_micros(CAST({ts} AS TIMESTAMP)),"
                             f" {w_us})) DIV {w_us}").alias("_b"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    pres = base.select("_u", "cell", "_b").distinct()
    if max_bucket_users is not None:
        ok = (pres.groupBy("cell", "_b")
              .agg(F.count(F.lit(1)).alias("_n"))
              .filter(F.col("_n") <= int(max_bucket_users))
              .select("cell", "_b"))
        pres = pres.join(ok, ["cell", "_b"], "semi")
    a = pres.select(F.col("_u").alias("user_a"), "cell", "_b")
    b = pres.select(F.col("_u").alias("user_b"), "cell", "_b")
    return (a.join(b, ["cell", "_b"])
            .filter(F.col("user_a") < F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_meets"))
            .filter(F.col("n_meets") >= int(min_meets)))


def place_concentration(events: DataFrame, res: int, top_k: int = 2,
                        user: str = "user_id", lon: str = "lon",
                        lat: str = "lat") -> DataFrame:
    """Per-user place concentration: the share of a user's pings
    falling in their ``top_k`` most-visited cells — the Song-et-al
    predictability proxy (humans: top-2 places cover ~80%+; a
    location-spoofing bot or a delivery fleet spreads flat). The
    spatial sibling of routine_index's time-bucket share and the
    count-based complement of dwell_times' seconds.

    One (user, cell) rollup, a WindowGroupLimit top-k per user with
    the deterministic (count DESC, cell ASC) order, one division.

    Returns (user_id, n_pings, n_cells, top_count, top_frac).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(user).alias("user_id"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    cnt = (base.groupBy("user_id", "cell")
           .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy("user_id").orderBy(F.col("_c").desc(),
                                              F.col("cell").asc())
    top = (cnt.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= int(top_k))
           .groupBy("user_id")
           .agg(F.sum("_c").cast("long").alias("top_count")))
    tot = (cnt.groupBy("user_id")
           .agg(F.sum("_c").cast("long").alias("n_pings"),
                F.count(F.lit(1)).cast("long").alias("n_cells")))
    return (tot.join(top, "user_id")
            .select("user_id", "n_pings", "n_cells", "top_count",
                    (F.col("top_count").cast("double")
                     / F.col("n_pings").cast("double"))
                    .alias("top_frac")))


def jump_lengths(events: DataFrame, res: int, user: str = "user_id",
                 key: str = "event_id", ts: str = "ts",
                 lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Displacement (jump-length) distribution — the second
    Gonzalez-Hidalgo-Barabasi mobility signature beside
    radius_of_gyration: histogram of per-transition Chebyshev cell
    distances. Human movement is heavy-tailed (many 0-1-cell hops, a
    fat tail of long jumps); a synthetic/spoofed trace shows up as
    the wrong histogram shape before any model sees it.

    One user-key lag window (the od_flows total order) + one
    histogram rollup; distances are exact integers.

    Returns (jump_cells, n_moves).
    """
    from . import cells

    base = cells.with_cell(
        events.select(F.col(user).alias("user_id"),
                      F.col(key).alias("event_id"),
                      F.unix_micros(F.col(ts).cast("timestamp"))
                      .alias("_us"),
                      F.col(lon).alias("_x"), F.col(lat).alias("_y")),
        res, lon="_x", lat="_y")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    t = (base.withColumn("_pix", F.lag("ix").over(w))
         .withColumn("_piy", F.lag("iy").over(w))
         .filter(F.col("_pix").isNotNull()))
    d = F.greatest(F.abs(F.col("ix") - F.col("_pix")),
                   F.abs(F.col("iy") - F.col("_piy")))
    return (t.select(d.cast("long").alias("jump_cells"))
            .groupBy("jump_cells")
            .agg(F.count(F.lit(1)).cast("long").alias("n_moves")))


def st_cube(pts: DataFrame, res: int, ts: str = "ts",
            user: str = "user_id", lon: str = "lon",
            lat: str = "lat") -> DataFrame:
    """Space-time OLAP cube: event counts + exact distinct-user counts
    at EVERY granularity of (cell, day) — (cell, day), (cell), (day),
    and the grand total — in ONE pass via grouping sets (F.cube).
    This is the dashboard-backing rollup a tile server reads at mixed
    zoom/time granularities; computing it as a cube lets Spark share
    the scan and the partial aggregation across all four levels
    instead of four separate jobs (the multi-res analog of
    cells.tile_pyramid, which shares one scan across zoom levels the
    same way).

    grouping_id() disambiguates levels (0 = (cell,day), 1 = cell-only,
    2 = day-only, 3 = grand total — bit i set means that column is
    rolled up); NULL cell/day in the output are the rolled-up slots.
    COUNT(DISTINCT user) is exact — Spark plans cube + one distinct
    aggregate as expand + two-phase agg, still a single shuffle
    lineage, no driver work.

    Returns (cell_x, cell_y, day, lvl, n_events, n_users).
    """
    from . import cells
    e = pts.select(
        cells.ix_col(F.col(lon), res).alias("cell_x"),
        cells.iy_col(F.col(lat), res).alias("cell_y"),
        F.to_date(F.col(ts)).alias("day"),
        F.col(user).alias("_u"))
    return (e.cube(F.struct("cell_x", "cell_y").alias("cell"), "day")
            .agg(F.grouping_id().alias("lvl"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.countDistinct("_u").cast("long").alias("n_users"))
            .select(F.col("cell.cell_x").alias("cell_x"),
                    F.col("cell.cell_y").alias("cell_y"),
                    "day", F.col("lvl").cast("long").alias("lvl"),
                    "n_events", "n_users"))


def mad_anomalies(pts: DataFrame, res: int = 6, ts: str = "ts",
                  factor: int = 3, lon: str = "lon",
                  lat: str = "lat") -> DataFrame:
    """Robust per-cell anomaly days via median absolute deviation:
    a (cell, day) count is anomalous when |n - median| >
    factor * MAD — the outlier rule that, unlike z-scores
    (events.burst_scores), is itself immune to the outliers it
    hunts. INTEGER-EXACT end to end: counts are integers, both
    medians use the lower-step selection (textops.grouped_quantiles'
    ceil(q*n) rule — identical to SQL QUANTILE_DISC at q=0.5 for
    every parity), so deviations, MAD, and the comparison are all
    BIGINT — no floats anywhere.

    Scale shape: one (cell, day) rollup, then two selection passes
    over per-cell AGGREGATES (cardinality = distinct counts per
    cell, not events) + broadcast-sized joins back. MAD = 0 cells
    (constant traffic) flag any deviation > 0 (stated).

    Returns (cell, day, n, med, mad, is_anomaly).
    """
    from . import cells, textops
    e = pts.select(
        cells.pack_cell(cells.ix_col(F.col(lon), res),
                        cells.iy_col(F.col(lat), res), res).alias("cell"),
        F.to_date(F.col(ts)).alias("day"))
    # the count column is named _n internally: grouped_quantiles emits
    # its own group-total column "n", which would collide
    daily = (e.groupBy("cell", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    med = (textops.grouped_quantiles(daily, "_n", [0.5], by="cell")
           .select("cell", F.col("q_value").alias("med")))
    dev = (daily.join(med, "cell")
           .withColumn("dev", F.abs(F.col("_n") - F.col("med"))))
    mad = (textops.grouped_quantiles(
               dev.select("cell", "dev"), "dev", [0.5], by="cell")
           .select("cell", F.col("q_value").alias("mad")))
    return (dev.join(mad, "cell")
            .select("cell", "day", F.col("_n").alias("n"), "med", "mad",
                    (F.col("dev") > F.lit(int(factor)) * F.col("mad"))
                    .alias("is_anomaly")))


def od_ipf_balance(flows: DataFrame, n_rounds: int = 1) -> DataFrame:
    """Doubly-stochastic OD balancing (one IPF / Sinkhorn round per
    ``n_rounds``): scale each origin row of the OD matrix to sum
    to 1, then each destination column of THAT — the
    gravity-calibration step that strips away origin/destination size
    effects so residual structure (corridor preferences) shows. Input
    is od_flows' (from_cell, to_cell, n_moves).

    Exactness: the row totals are BIGINT sums (order-free); every
    later float total folds its addends in from_cell order (the
    doc_lang_mixture rule), and each scaling is one division —
    value-exact against an unrolled-CTE oracle. One shuffle per
    scaling pass, partial-agg combinable except the ordered fold,
    which aggregates (cell, addend) pairs — cardinality = matrix
    cells, not movements.

    Returns (from_cell, to_cell, n_moves, w) with w the balanced
    weight after the final column pass.
    """
    cur = flows.select("from_cell", "to_cell",
                       F.col("n_moves").cast("long").alias("n_moves"),
                       F.col("n_moves").cast("double").alias("w"))
    for r in range(int(n_rounds)):
        if r == 0:
            # integer row totals: order-free
            rt = (cur.groupBy("from_cell")
                  .agg(F.sum("n_moves").cast("double").alias("_rt")))
        else:
            rt = (cur.groupBy("from_cell")
                  .agg(F.aggregate(
                      F.array_sort(F.collect_list(
                          F.struct("to_cell", F.col("w").alias("_v")))),
                      F.lit(0.0), lambda a, x: a + x["_v"]).alias("_rt")))
        cur = (cur.join(rt, "from_cell")
               .withColumn("w", F.col("w") / F.col("_rt")).drop("_rt"))
        ct = (cur.groupBy("to_cell")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(
                      F.struct("from_cell", F.col("w").alias("_v")))),
                  F.lit(0.0), lambda a, x: a + x["_v"]).alias("_ct")))
        cur = (cur.join(ct, "to_cell")
               .withColumn("w", F.col("w") / F.col("_ct")).drop("_ct"))
    return cur.select("from_cell", "to_cell", "n_moves", "w")


def theil_sen_trend(pts: DataFrame, res: int = 6, ts: str = "ts",
                    lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Robust per-cell activity trend: the Theil-Sen estimator —
    median over all pairwise slopes of the (day, daily count) series
    — the magnitude companion to the Mann-Kendall direction test
    (emerging_hotspots) and, like mad_anomalies, immune to the
    bursts it shares a dashboard with.

    Exactness: each pairwise slope is the single division
    (n_j - n_i) / (d_j - d_i) of BIGINTs (den > 0 by construction);
    the median is a lower-median ROW_NUMBER selection ordered by
    (slope, day_i, day_j) — float comparisons only DECIDE, ties
    break on integer day pairs, and the chosen slope's exact
    numerator/denominator ride along. Pairs per cell are
    O(observed_days^2) — bounded by the calendar, not event volume;
    the pair self-join keys on the cell so cells never mix.

    Returns (cell, n_days, n_pairs, slope_num, slope_den, slope) for
    cells with >= 2 observed days.
    """
    from . import cells
    e = pts.select(
        cells.pack_cell(cells.ix_col(F.col(lon), res),
                        cells.iy_col(F.col(lat), res), res).alias("cell"),
        F.datediff(F.to_date(F.col(ts)), F.lit("1970-01-01"))
         .cast("long").alias("d"))
    daily = (e.groupBy("cell", "d")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    a = daily.select("cell", F.col("d").alias("di"), F.col("n").alias("ni"))
    b = daily.select(F.col("cell").alias("_c2"), F.col("d").alias("dj"),
                     F.col("n").alias("nj"))
    pairs = (a.join(b, (F.col("cell") == F.col("_c2"))
                    & (F.col("dj") > F.col("di")))
             .select("cell", "di", "dj",
                     (F.col("nj") - F.col("ni")).alias("num"),
                     (F.col("dj") - F.col("di")).alias("den")))
    pairs = pairs.withColumn(
        "slope", F.col("num").cast("double") / F.col("den").cast("double"))
    w = Window.partitionBy("cell").orderBy("slope", "di", "dj")
    ranked = (pairs.withColumn("_rn", F.row_number().over(w))
              .withColumn("_cnt", F.count(F.lit(1)).over(
                  Window.partitionBy("cell"))))
    med = ranked.filter(F.col("_rn") == F.ceil(F.col("_cnt") / 2))
    days = daily.groupBy("cell").agg(F.count(F.lit(1)).cast("long")
                                     .alias("n_days"))
    return (med.join(days, "cell")
            .select("cell", "n_days",
                    F.col("_cnt").cast("long").alias("n_pairs"),
                    F.col("num").alias("slope_num"),
                    F.col("den").alias("slope_den"), "slope"))
