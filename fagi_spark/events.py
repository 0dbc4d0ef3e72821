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
