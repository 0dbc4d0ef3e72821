"""Mobility/events contract queries + oracles (events_*).

Mechanically split from the single-file contract.py registry (r4 verdict
item 8): block order, comments and strings preserved verbatim; the
public surface is re-exported unchanged through ``fagi_spark.contract``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import (cells, curation, extract, fuse, joins,  # noqa: F401
                metadata_fuse, textops, vector)
from ..discover import literal_kind_filter, tf_unique_filter  # noqa: F401

from ._core import (M_PER_DEG, _EV_LAT_SQL, _EV_LON_SQL, _dlit,  # noqa: F401
                    _event_pts, _fmt2, _line_wkt, _t)  # noqa: F401


def q_events_cooccur(spark, sf_dir):
    """Spatio-temporal co-occurrence join (events.cooccurrence_join):
    event pairs within 0.03 deg and 1 hour over the shared _event_pts
    fixture. The cell-ring x time-bucket composite join must reproduce
    the oracle's brute-force predicate exactly — including the
    dist_deg float (same IEEE subtract/multiply/sqrt tree both
    sides)."""
    from .. import events as ev

    pts = _event_pts(_t(spark, sf_dir, "events"), "event_id", "ts")
    return ev.cooccurrence_join(pts, radius_deg=0.03, window_s=3600)


O_EVENTS_COOCCUR = f"""WITH p AS (
  SELECT event_id, epoch_us(ts) AS us,
         {_EV_LON_SQL} AS lon,
         {_EV_LAT_SQL} AS lat
  FROM events)
SELECT a.event_id AS a_id, b.event_id AS b_id,
       ABS(a.us - b.us) AS dt_us,
       SQRT((a.lon - b.lon) * (a.lon - b.lon)
            + (a.lat - b.lat) * (a.lat - b.lat)) AS dist_deg
FROM p a JOIN p b ON a.event_id < b.event_id
WHERE ABS(a.us - b.us) <= CAST(3600 AS BIGINT) * 1000000
  AND (a.lon - b.lon) * (a.lon - b.lon)
      + (a.lat - b.lat) * (a.lat - b.lat) <= 0.03 * 0.03"""


def q_od_flows(spark, sf_dir):
    """Origin-destination flow matrix (events.od_flows): per-user
    consecutive events at res 6, stays excluded. The lag window
    orders by (epoch micros, event_id) — a total order mirrored
    literally by the oracle's LAG."""
    from .. import events as ev

    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.od_flows(pts, res=6)


def _o_od_flows(res: int = 6) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
m AS (SELECT user_id, cell AS to_cell,
             LAG(cell) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS from_cell
      FROM p)
SELECT from_cell, to_cell, COUNT(*) AS n_moves,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM m WHERE from_cell IS NOT NULL AND from_cell <> to_cell
GROUP BY from_cell, to_cell"""


O_OD_FLOWS = _o_od_flows()


def q_events_od_ipf(spark, sf_dir):
    """Doubly-stochastic OD balancing (events.od_ipf_balance, one IPF
    round over the res-6 od_flows matrix): row scale to 1 then
    column scale — integer row totals, from_cell-sorted float fold
    for the column totals, one division per scaling. The
    gravity-calibration weight IS value-compared."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.od_ipf_balance(ev.od_flows(pts, res=6)
                             .select("from_cell", "to_cell", "n_moves"))


_O_OD_IPF_FLOWS = _o_od_flows().replace(
    "WITH p AS (", "flows0 AS (\n  WITH p AS (").replace(
    "GROUP BY from_cell, to_cell", "GROUP BY from_cell, to_cell\n)")

O_EVENTS_OD_IPF = f"""WITH {_O_OD_IPF_FLOWS},
ipf0 AS (
  SELECT from_cell, to_cell, CAST(n_moves AS BIGINT) AS n_moves,
         CAST(n_moves AS DOUBLE) AS w
  FROM flows0),
ipf_rt AS (
  SELECT from_cell, CAST(SUM(n_moves) AS DOUBLE) AS rt
  FROM ipf0 GROUP BY from_cell),
ipf1 AS (
  SELECT i.from_cell, to_cell, n_moves, w / rt AS w
  FROM ipf0 i JOIN ipf_rt r ON i.from_cell = r.from_cell),
ipf_ct AS (
  SELECT to_cell,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(w ORDER BY from_cell)), (acc, x) -> acc + x) AS ct
  FROM ipf1 GROUP BY to_cell)
SELECT i.from_cell, i.to_cell, n_moves, w / ct AS w
FROM ipf1 i JOIN ipf_ct c ON i.to_cell = c.to_cell"""


def q_emerging_hotspots(spark, sf_dir):
    """Mann-Kendall emerging-hotspot trend per cell
    (events.emerging_hotspots): daily periods at res 6 — integer S
    statistic over the zero-completed per-period counts, rising/
    falling/flat classification. Everything integer, value-exact."""
    from .. import events as ev

    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.emerging_hotspots(pts, res=6, period_s=86400)


def _o_emerging_hotspots(res: int = 6, period_s: int = 86400) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    pus = period_s * 1_000_000
    return f"""WITH p AS (
  SELECT epoch_us(ts) // {pus} AS per,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
cnt AS (SELECT cell, per, COUNT(*) AS x FROM p GROUP BY cell, per),
rng AS (SELECT MIN(per) AS pmin, MAX(per) AS pmax FROM cnt),
series AS (
  SELECT c.cell, g.per, CAST(COALESCE(cnt.x, 0) AS BIGINT) AS x
  FROM (SELECT DISTINCT cell FROM cnt) c
  CROSS JOIN (SELECT UNNEST(RANGE(pmin, pmax + 1)) AS per FROM rng) g
  LEFT JOIN cnt ON cnt.cell = c.cell AND cnt.per = g.per),
pairs AS (
  SELECT a.cell, a.per AS pa, b.per AS pb, a.x AS xa, b.x AS xb
  FROM series a JOIN series b ON b.cell = a.cell AND a.per < b.per),
mk AS (
  SELECT cell, CAST(SUM(SIGN(xb - xa)) AS BIGINT) AS s_stat,
         MAX(pb) - MIN(pa) + 1 AS n_periods
  FROM pairs GROUP BY cell)
SELECT cell, s_stat, n_periods,
       CASE WHEN s_stat > 0 THEN 'rising'
            WHEN s_stat < 0 THEN 'falling'
            ELSE 'flat' END AS trend
FROM mk"""


O_EMERGING_HOTSPOTS = _o_emerging_hotspots()


def q_events_windowed(spark, sf_dir):
    """Tumbling 1-hour event rollup (batch twin of the streaming tile
    rollup); value summed in integer cents for order-independence."""
    from .. import events as ev
    return ev.windowed_rollup(_t(spark, sf_dir, "events"))


O_EVENTS_WINDOWED = """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2"""


def q_events_st_cube(spark, sf_dir):
    """Space-time OLAP cube (events.st_cube, res 6): counts + exact
    distinct users at all four (cell, day) granularities in ONE
    grouping-sets pass — cell_x/cell_y grouped as one struct so only
    the meaningful levels materialize; grouping_id disambiguates
    (bit 1 = cell rolled up, bit 0 = day rolled up)."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts", "user_id")
    return ev.st_cube(pts, res=6)


O_EVENTS_ST_CUBE = f"""WITH e AS (
  SELECT {cells.sql_ix(_EV_LON_SQL, 6)} AS cell_x,
         {cells.sql_iy(_EV_LAT_SQL, 6)} AS cell_y,
         CAST(ts AS DATE) AS day, user_id
  FROM events)
SELECT cell_x, cell_y, day,
       CAST(2 * GROUPING(cell_x) + GROUPING(day) AS BIGINT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY GROUPING SETS ((cell_x, cell_y, day), (cell_x, cell_y),
                               (day), ())"""


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min gap) + per-session rollup —
    lag/running-sum window functions, one shuffle on user_id."""
    from .. import events as ev
    return ev.session_stats(_t(spark, sf_dir, "events"))


# shared 30-min-gap sessionize CTEs (s -> sess), used by BOTH events
# session oracles so the gap logic lives in exactly one SQL string
_SESSIONIZE_CTE = """s AS (
  SELECT user_id, ts,
         CASE WHEN LAG(EPOCH(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR EPOCH(ts) - LAG(EPOCH(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM s)"""

O_EVENTS_SESSIONS = f"""WITH {_SESSIONIZE_CTE}
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM sess GROUP BY user_id, session_id"""


def q_events_user_sessions(spark, sf_dir):
    """Per-user session-duration stats (30-min gap): session count,
    event count, sum/max session duration in exact integer micros."""
    from .. import events as ev
    return ev.user_session_summary(_t(spark, sf_dir, "events"))


O_EVENTS_USER_SESSIONS = f"""WITH {_SESSIONIZE_CTE},
per_sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS dur_us
  FROM sess GROUP BY user_id, session_id)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
       CAST(MAX(dur_us) AS BIGINT) AS max_dur_us
FROM per_sess GROUP BY user_id"""


_EV_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01, the events table base


def q_events_asof_join(spark, sf_dir):
    """AS-OF join (events.asof_join — the union-merge distributed
    shape): every event picks up the latest per-user dimension version
    at-or-before its timestamp. Versions planted at days 1/8/15 per
    user, so early events exercise the no-version NULL path. Oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from .. import events as ev_ops
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    vers = (ev.select("user_id").distinct()
            .select("user_id",
                    F.explode(F.array(F.lit(1), F.lit(8), F.lit(15)))
                    .alias("vday"))
            .select("user_id",
                    F.timestamp_micros(
                        F.lit(_EV_EPOCH_US)
                        + F.col("vday").cast("long") * F.lit(86_400_000_000))
                    .alias("vts"),
                    (F.col("user_id") * 100 + F.col("vday")).cast("long")
                    .alias("version_tag")))
    out = ev_ops.asof_join(ev, vers)
    return out.select(F.col("event_id").cast("long").alias("event_id"),
                      F.col("user_id").cast("long").alias("user_id"),
                      F.unix_micros("ts").alias("ts_us"), "version_tag")


O_EVENTS_ASOF_JOIN = f"""WITH u AS (SELECT DISTINCT user_id FROM events),
vd AS (SELECT user_id, UNNEST([1, 8, 15]) AS vday FROM u),
vers AS (SELECT user_id,
                MAKE_TIMESTAMP({_EV_EPOCH_US} + vday * 86400000000) AS vts,
                CAST(user_id * 100 + vday AS BIGINT) AS version_tag
         FROM vd)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       EPOCH_US(e.ts) AS ts_us, v.version_tag AS version_tag
FROM events e ASOF LEFT JOIN vers v
  ON e.user_id = v.user_id AND e.ts >= v.vts"""


def q_events_range_join(spark, sf_dir):
    """Interval range join (events.interval_range_join — time-bucket
    equi-join, the 1-D twin of the spatial cell join): events against
    100 planted overlapping windows (6h cadence, 1-5h widths)."""
    from .. import events as ev_ops
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"))
    hour_us = 3_600_000_000
    iv = spark.range(0, 100).select(
        F.col("id").cast("long").alias("interval_id"),
        F.timestamp_micros(F.lit(_EV_EPOCH_US)
                           + F.col("id") * F.lit(6 * hour_us)).alias("start"),
        F.timestamp_micros(F.lit(_EV_EPOCH_US) + F.col("id") * F.lit(6 * hour_us)
                           + (F.lit(1) + F.col("id") % 5) * F.lit(hour_us))
        .alias("end"))
    out = ev_ops.interval_range_join(ev, iv)
    return out.select(F.col("event_id").cast("long").alias("event_id"),
                      "interval_id", F.unix_micros("ts").alias("ts_us"))


O_EVENTS_RANGE_JOIN = f"""WITH iv AS (
  SELECT CAST(i AS BIGINT) AS interval_id,
         MAKE_TIMESTAMP({_EV_EPOCH_US} + i * 21600000000) AS s,
         MAKE_TIMESTAMP({_EV_EPOCH_US} + i * 21600000000
                        + (1 + i % 5) * 3600000000) AS e
  FROM RANGE(0, 100) t(i))
SELECT CAST(ev.event_id AS BIGINT) AS event_id, iv.interval_id,
       EPOCH_US(ev.ts) AS ts_us
FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e"""


def q_events_stay_points(spark, sf_dir):
    """Stay-point detection (events.stay_points): per-user maximal
    same-cell runs with exact epoch-micro enter/exit bounds — the
    mobility primitive OD flows splits trips on. Gaps-and-islands
    (lag -> change flag -> running sum -> one groupBy); all output
    columns exact integers."""
    from .. import events as ev

    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.stay_points(pts, res=6, min_events=2)


O_EVENTS_STAY_POINTS = f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, 6)} AS cell
  FROM events),
m AS (SELECT user_id, event_id, us, cell,
             CASE WHEN LAG(cell) OVER w IS NULL
                       OR LAG(cell) OVER w <> cell THEN 1 ELSE 0 END AS chg
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
r AS (SELECT user_id, us, cell,
             CAST(SUM(chg) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM m)
SELECT user_id, cell, MIN(us) AS enter_us, MAX(us) AS exit_us,
       MAX(us) - MIN(us) AS dwell_us, COUNT(*) AS n_events
FROM r GROUP BY user_id, run, cell
HAVING COUNT(*) >= 2 AND MAX(us) - MIN(us) >= 0"""


def q_events_map_match(spark, sf_dir):
    """Trajectory map-matching (events.map_match): per-ping nearest-way
    snap (knn_shape_join k=1, true shape distance to axis-aligned
    staircase roads — the fagi_snap_to_way box-gap IEEE argument) +
    per-user gaps-and-islands collapse of consecutive same-way pings
    into traversal intervals. Roads tile the [0,16]x[0,8] deg box at ~120/deg^2; the 8 km
    snap radius keeps per-ping candidates bounded (the realistic
    map-matching regime) while a good fraction of the fixture snaps and the rest exercises the
    off-network drop path; epoch-micro bounds and ping counts are
    exact integers, min_snap_m folds identically on both engines."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events")
    pts = _event_pts(e, "event_id", "ts", "user_id")
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    v, w = (k * 41) % 1600, (k * 59) % 800
    ways = cust.select(
        F.concat(F.lit("road"), k.cast("string")).alias("subject"),
        _line_wkt([(v, w), (v + 6, w), (v + 6, w + 5)]).alias("geom_wkt"))
    return ev.map_match(pts, fuse.prepare_geoms(ways), 8000.0)


def _o_map_match(radius_m: float = 8000.0) -> str:
    from .. import geom as _g
    rdeg = _dlit(radius_m / _g.METERS_PER_DEGREE)
    mpd = _dlit(_g.METERS_PER_DEGREE)
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {_EV_LON_SQL} AS px, {_EV_LAT_SQL} AS py
  FROM events),
w AS (
  SELECT CONCAT('road', CAST(c_custkey AS STRING)) AS way,
         CAST((c_custkey*41) % 1600 AS DOUBLE)/100.0 AS wx0,
         CAST((c_custkey*41) % 1600 + 6 AS DOUBLE)/100.0 AS wx1,
         CAST((c_custkey*59) % 800 AS DOUBLE)/100.0 AS wy0,
         CAST((c_custkey*59) % 800 + 5 AS DOUBLE)/100.0 AS wy1
  FROM customer),
g AS (
  SELECT user_id, event_id, us, way,
         GREATEST(0e0, wx0 - px, px - wx1) AS h_gx,
         GREATEST(0e0, wy0 - py, py - wy0) AS h_gy,
         GREATEST(0e0, wx1 - px, px - wx1) AS v_gx,
         GREATEST(0e0, wy0 - py, py - wy1) AS v_gy
  FROM p JOIN w ON px BETWEEN wx0 - {rdeg} AND wx1 + {rdeg}
               AND py BETWEEN wy0 - {rdeg} AND wy1 + {rdeg}),
d AS (
  SELECT user_id, event_id, us, way,
         LEAST(SQRT(h_gx*h_gx + h_gy*h_gy),
               SQRT(v_gx*v_gx + v_gy*v_gy)) AS d_deg
  FROM g),
s AS (
  SELECT user_id, event_id, us, way, d_deg * {mpd} AS snap_m
  FROM d WHERE d_deg <= {rdeg}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
                             ORDER BY d_deg * {mpd}, way) = 1),
m AS (SELECT user_id, event_id, us, way, snap_m,
             CASE WHEN LAG(way) OVER win IS NULL
                       OR LAG(way) OVER win <> way THEN 1 ELSE 0 END AS chg
      FROM s WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id)),
r AS (SELECT user_id, us, event_id, way, snap_m,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM m)
SELECT user_id, way, MIN(us) AS enter_us, MAX(us) AS exit_us,
       MAX(us) - MIN(us) AS dwell_us, COUNT(*) AS n_pings,
       MIN(snap_m) AS min_snap_m
FROM r GROUP BY user_id, run, way"""


O_EVENTS_MAP_MATCH = _o_map_match()


def q_trajectory_hausdorff(spark, sf_dir):
    """Symmetric Hausdorff trajectory distance
    (events.trajectory_hausdorff): co-location-blocked user pairs
    (shared 32-cell block) scored with the exact BIGINT squared grid
    Hausdorff over each user's DISTINCT grid points. A denser variant
    of the _event_pts layout (320x160 cells) so blocks actually
    collide; every value is integer arithmetic end to end."""
    from .. import events as ev

    e = _t(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        (F.col("user_id") * 37 % 320 + F.col("event_id") * 11 % 5).alias("ix"),
        (F.col("user_id") * 53 % 160 + F.col("event_id") * 7 % 5).alias("iy"))
    return ev.trajectory_hausdorff(pts, block_shift=5)


O_TRAJECTORY_HAUSDORFF = """WITH p AS (
  SELECT DISTINCT user_id AS u,
         CAST(user_id*37 % 320 + event_id*11 % 5 AS BIGINT) AS px,
         CAST(user_id*53 % 160 + event_id*7 % 5 AS BIGINT) AS py
  FROM events),
b AS (SELECT DISTINCT u, px >> 5 AS bx, py >> 5 AS by FROM p),
pr AS (SELECT DISTINCT l.u AS ua, r.u AS ub
       FROM b l JOIN b r ON l.bx = r.bx AND l.by = r.by AND l.u < r.u),
mab AS (SELECT pr.ua, pr.ub, a.px AS ax, a.py AS ay,
               MIN((a.px-q.px)*(a.px-q.px) + (a.py-q.py)*(a.py-q.py)) AS md
        FROM pr JOIN p a ON a.u = pr.ua JOIN p q ON q.u = pr.ub
        GROUP BY pr.ua, pr.ub, a.px, a.py),
hab AS (SELECT ua, ub, MAX(md) AS h_ab FROM mab GROUP BY ua, ub),
mba AS (SELECT pr.ua, pr.ub, a.px AS ax, a.py AS ay,
               MIN((a.px-q.px)*(a.px-q.px) + (a.py-q.py)*(a.py-q.py)) AS md
        FROM pr JOIN p a ON a.u = pr.ub JOIN p q ON q.u = pr.ua
        GROUP BY pr.ua, pr.ub, a.px, a.py),
hba AS (SELECT ua, ub, MAX(md) AS h_ba FROM mba GROUP BY ua, ub)
SELECT hab.ua AS user_a, hab.ub AS user_b,
       GREATEST(h_ab, h_ba) AS hausdorff_d2
FROM hab JOIN hba ON hab.ua = hba.ua AND hab.ub = hba.ub"""


def q_trajectory_dtw(spark, sf_dir):
    """Order-aware DTW trajectory similarity (events.trajectory_dtw)
    over a thinned fixture (40 users, every 4th event, ~17 pings per
    sequence). The engine runs the batch O(n*m) DP in an Arrow kernel;
    the oracle fills the SAME DP one cell per recursive-CTE step,
    carrying the flattened matrix as list state (the sanctioned
    sequential-oracle pattern: each step appends exactly one value
    computed from three known offsets). Costs are BIGINT squared grid
    distances, so equality is bit-for-bit."""
    from .. import events as ev

    e = (_t(spark, sf_dir, "events")
         .filter((F.col("user_id") < 40) & (F.col("event_id") % 4 == 0)))
    pts = e.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("user_id") * 37 % 320 + F.col("event_id") * 11 % 5).alias("ix"),
        (F.col("user_id") * 53 % 160 + F.col("event_id") * 7 % 5).alias("iy"))
    return ev.trajectory_dtw(pts, block_shift=5, order=("us", "event_id"))


def _o_trajectory_dtw() -> str:
    i_, j_ = "r.step // pq.m", "r.step % pq.m"

    def cost(idx_i, idx_j):
        ai = f"pq.axs[CAST({idx_i} + 1 AS BIGINT)]"
        bi = f"pq.bxs[CAST({idx_j} + 1 AS BIGINT)]"
        ay = f"pq.ays[CAST({idx_i} + 1 AS BIGINT)]"
        by = f"pq.bys[CAST({idx_j} + 1 AS BIGINT)]"
        return f"({ai} - {bi}) * ({ai} - {bi}) + ({ay} - {by}) * ({ay} - {by})"

    return f"""WITH RECURSIVE p AS (
  SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid,
         CAST(user_id*37 % 320 + event_id*11 % 5 AS BIGINT) AS px,
         CAST(user_id*53 % 160 + event_id*7 % 5 AS BIGINT) AS py
  FROM events WHERE user_id < 40 AND event_id % 4 = 0),
seqs AS (SELECT u, LIST(px ORDER BY us, eid) AS xs,
                LIST(py ORDER BY us, eid) AS ys, COUNT(*) AS n
         FROM p GROUP BY u),
pd AS (SELECT DISTINCT u, px, py FROM p),
b AS (SELECT DISTINCT u, px >> 5 AS bx, py >> 5 AS by FROM pd),
pr AS (SELECT DISTINCT l.u AS ua, r.u AS ub
       FROM b l JOIN b r ON l.bx = r.bx AND l.by = r.by AND l.u < r.u),
pq AS (SELECT pr.ua, pr.ub, a.xs AS axs, a.ys AS ays,
              b.xs AS bxs, b.ys AS bys,
              CAST(a.n AS BIGINT) AS n, CAST(b.n AS BIGINT) AS m
       FROM pr JOIN seqs a ON a.u = pr.ua JOIN seqs b ON b.u = pr.ub),
r AS (
  SELECT ua, ub, CAST(0 AS BIGINT) AS step, []::BIGINT[] AS d FROM pq
  UNION ALL
  SELECT r.ua, r.ub, r.step + 1,
         list_append(r.d, {cost(i_, j_)}
         + CASE
             WHEN {i_} = 0 AND {j_} = 0 THEN 0
             WHEN {i_} = 0 THEN r.d[CAST({j_} AS BIGINT)]
             WHEN {j_} = 0 THEN r.d[CAST(({i_} - 1) * pq.m + 1 AS BIGINT)]
             ELSE LEAST(r.d[CAST(({i_} - 1) * pq.m + {j_} + 1 AS BIGINT)],
                        r.d[CAST(({i_} - 1) * pq.m + {j_} AS BIGINT)],
                        r.d[CAST({i_} * pq.m + {j_} AS BIGINT)])
           END)
  FROM r JOIN pq ON pq.ua = r.ua AND pq.ub = r.ub
  WHERE r.step < pq.n * pq.m)
SELECT r.ua AS user_a, r.ub AS user_b,
       r.d[CAST(pq.n * pq.m AS BIGINT)] AS dtw_d2
FROM r JOIN pq ON pq.ua = r.ua AND pq.ub = r.ub
WHERE r.step = pq.n * pq.m"""


O_TRAJECTORY_DTW = _o_trajectory_dtw()


def q_knox_statistic(spark, sf_dir):
    """Knox space-time interaction (events.knox_statistic): one row of
    exact pair counts (space-and-time via the composite cell-ring x
    bucket join, space-only via the ring join, time-only via the
    bucket join) plus the single-division ratio. The oracle
    brute-forces all three pair predicates with inequality self-joins
    — different plan, identical integers, identical one IEEE
    division."""
    from .. import events as ev

    pts = _event_pts(_t(spark, sf_dir, "events"), "event_id", "ts")
    return ev.knox_statistic(pts, radius_deg=0.03, window_s=3600)


def _o_knox(radius_deg: float = 0.03, window_s: int = 3600) -> str:
    r2 = _dlit(radius_deg * radius_deg)
    w_us = int(window_s) * 1_000_000
    return f"""WITH p AS (
  SELECT event_id AS id, epoch_us(ts) AS us,
         {_EV_LON_SQL} AS x, {_EV_LAT_SQL} AS y
  FROM events),
st AS (SELECT COUNT(*) AS c FROM p a JOIN p b ON a.id < b.id
       AND ABS(a.us - b.us) <= {w_us}
       AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {r2}),
s AS (SELECT COUNT(*) AS c FROM p a JOIN p b ON a.id < b.id
      AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {r2}),
t AS (SELECT COUNT(*) AS c FROM p a JOIN p b ON a.id < b.id
      AND ABS(a.us - b.us) <= {w_us}),
n AS (SELECT COUNT(*) AS c FROM p)
SELECT n.c AS n_events, n.c * (n.c - 1) // 2 AS n_pairs,
       st.c AS n_close_st, s.c AS n_close_s, t.c AS n_close_t,
       CAST(st.c * (n.c * (n.c - 1) // 2) AS DOUBLE)
         / NULLIF(CAST(s.c * t.c AS DOUBLE), 0.0) AS knox_ratio
FROM n, st, s, t"""


O_KNOX_STATISTIC = _o_knox()


def q_heading_octants(spark, sf_dir):
    """Per-user heading-octant profile (events.heading_octants):
    consecutive displacements on the integer grid classified into the
    8 floor(angle/45deg) sectors with pure integer comparisons (no
    atan2), counts + exact BIGINT squared step lengths. The oracle
    mirrors the sequential CASE branch-for-branch and the same
    (us, event_id) lag order."""
    from .. import events as ev

    e = _t(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        (F.col("user_id") * 37 % 320 + F.col("event_id") * 11 % 5).alias("ix"),
        (F.col("user_id") * 53 % 160 + F.col("event_id") * 7 % 5).alias("iy"))
    return ev.heading_octants(pts, order=("us", "event_id"))


O_HEADING_OCTANTS = """WITH p AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(user_id*37 % 320 + event_id*11 % 5 AS BIGINT) AS px,
         CAST(user_id*53 % 160 + event_id*7 % 5 AS BIGINT) AS py
  FROM events),
d0 AS (
  SELECT user_id,
         px - LAG(px) OVER w AS dx, py - LAG(py) OVER w AS dy
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
d AS (SELECT * FROM d0
      WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)),
o AS (
  SELECT user_id,
         CAST(CASE
           WHEN dx > 0 AND dy >= 0 AND ABS(dx) > ABS(dy) THEN 0
           WHEN dx >= 0 AND dy > 0 AND ABS(dy) >= ABS(dx)
                AND ABS(dx) > 0 THEN 1
           WHEN dx = 0 AND dy > 0 THEN 2
           WHEN dx < 0 AND dy > 0 AND ABS(dy) > ABS(dx) THEN 2
           WHEN dx < 0 AND dy > 0 AND ABS(dx) >= ABS(dy) THEN 3
           WHEN dx < 0 AND dy <= 0 AND ABS(dx) > ABS(dy) THEN 4
           WHEN dx <= 0 AND dy < 0 AND ABS(dy) >= ABS(dx)
                AND ABS(dx) > 0 THEN 5
           WHEN dx = 0 AND dy < 0 THEN 6
           WHEN dx > 0 AND dy < 0 AND ABS(dy) > ABS(dx) THEN 6
           ELSE 7 END AS INT) AS octant,
         dx*dx + dy*dy AS d2
  FROM d)
SELECT user_id, octant, COUNT(*) AS n_moves,
       CAST(SUM(d2) AS BIGINT) AS sum_d2
FROM o GROUP BY user_id, octant"""


_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def q_events_funnel(spark, sf_dir):
    """Strict ordered-funnel conversion (events.funnel): per step, how
    many users completed signup -> view -> click -> purchase in order,
    each step strictly after the previous match. The engine runs one
    groupBy(user) + JVM aggregate-fold (greedy-earliest pointer); the
    oracle is the textbook sequential-min join chain — the fold's
    greedy-optimal equivalence is exactly what the hash check proves.
    The event stream is thinned (event_id % 23) so the fixture's
    hyperactive users don't all convert (72 -> 19 -> 3 -> 1 at
    sf0.01)."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 23 == 0)
    out = ev.funnel(e, _FUNNEL_STEPS)
    return out.select(F.col("step").cast("long").alias("step"),
                      "step_name",
                      F.col("n_users").cast("long").alias("n_users"),
                      "frac_of_first")


def _o_events_funnel() -> str:
    s1, s2, s3, s4 = _FUNNEL_STEPS
    return f"""WITH e AS (SELECT * FROM events WHERE event_id % 23 = 0),
t1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM e
       WHERE event_type = '{s1}' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM e
       JOIN t1 USING (user_id)
       WHERE e.event_type = '{s2}' AND epoch_us(e.ts) > t1.t
       GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM e
       JOIN t2 USING (user_id)
       WHERE e.event_type = '{s3}' AND epoch_us(e.ts) > t2.t
       GROUP BY e.user_id),
t4 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM e
       JOIN t3 USING (user_id)
       WHERE e.event_type = '{s4}' AND epoch_us(e.ts) > t3.t
       GROUP BY e.user_id),
c(step, step_name, n_users) AS (
  SELECT CAST(1 AS BIGINT), '{s1}', (SELECT CAST(COUNT(*) AS BIGINT) FROM t1)
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{s2}', (SELECT CAST(COUNT(*) AS BIGINT) FROM t2)
  UNION ALL
  SELECT CAST(3 AS BIGINT), '{s3}', (SELECT CAST(COUNT(*) AS BIGINT) FROM t3)
  UNION ALL
  SELECT CAST(4 AS BIGINT), '{s4}', (SELECT CAST(COUNT(*) AS BIGINT) FROM t4))
SELECT step, step_name, n_users,
       CAST(n_users AS DOUBLE)
         / NULLIF(CAST((SELECT n_users FROM c WHERE step = 1) AS DOUBLE), 0.0)
         AS frac_of_first
FROM c"""


O_EVENTS_FUNNEL = _o_events_funnel()


def q_events_cohort(spark, sf_dir):
    """Weekly cohort-retention matrix (events.cohort_retention): users
    bucketed by first-event week, counted per active week offset, with
    the retained fraction vs the cohort's offset-0 size. Thinned
    (event_id % 13) so later cohorts exist and retention decays."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    return ev.cohort_retention(e)


O_EVENTS_COHORT = """WITH e AS (
  SELECT * FROM events WHERE event_id % 13 = 0),
act AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    / 7.0) AS BIGINT) AS week
  FROM e),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id),
cells AS (
  SELECT cohort_week, week - cohort_week AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM act JOIN c USING (user_id)
  GROUP BY 1, 2),
base AS (SELECT cohort_week, n_users AS sz FROM cells WHERE week_offset = 0)
SELECT cohort_week, week_offset, n_users,
       CAST(n_users AS DOUBLE) / CAST(sz AS DOUBLE) AS retained_frac
FROM cells JOIN base USING (cohort_week)"""


_RIPLEY_RADII = [0.01, 0.02, 0.04, 0.08]


def q_events_ripley(spark, sf_dir):
    """Ripley's K at four radii (events.ripley_k): blocked cell-ring
    pair counting at max(r), per-radius conditional sums, bounding-box
    window area — the oracle brute-forces every pair predicate over
    the thinned point set (event_id % 7) and mirrors the two float
    ops (area product, one division) plus the pi*r^2 CSR literal."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    pts = _event_pts(e, "event_id")
    return ev.ripley_k(pts, _RIPLEY_RADII)


def _o_events_ripley() -> str:
    import math
    arms = []
    for i, r in enumerate(_RIPLEY_RADII):
        arms.append(
            f"SELECT CAST({i} AS INT) AS r_idx, {_dlit(r)} AS r_deg, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM pr "
            f"WHERE pr.d2 <= {_dlit(r * r)}) AS n_close, "
            f"{_dlit(math.pi * r * r)} AS k_csr")
    radii_sql = "\nUNION ALL\n".join(arms)
    return f"""WITH p AS (
  SELECT event_id AS id, {_EV_LON_SQL} AS x, {_EV_LAT_SQL} AS y
  FROM events WHERE event_id % 7 = 0),
pr AS (
  SELECT ((a.x - b.x) * (a.x - b.x)) + ((a.y - b.y) * (a.y - b.y)) AS d2
  FROM p a JOIN p b ON a.id < b.id),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              (MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS area FROM p),
r AS ({radii_sql})
SELECT r.r_idx, r.r_deg, r.n_close,
       (st.area * CAST(2 * r.n_close AS DOUBLE))
         / CAST(st.n * (st.n - 1) AS DOUBLE) AS k_hat,
       r.k_csr
FROM r, st"""


O_EVENTS_RIPLEY = _o_events_ripley()


_G_RADII = [0.01, 0.02, 0.04, 0.08]


def q_events_gfunction(spark, sf_dir):
    """Nearest-neighbor G-function (events.nn_g_function): fraction of
    points whose nearest other point lies within r, four radii. The
    per-point MIN(d2) is an exactly order-independent float reduction,
    so the blocked ring join is value-comparable against the naive
    per-point-min oracle; n_within/g_frac mirror as integer counts +
    one division."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    pts = _event_pts(e, "event_id")
    return ev.nn_g_function(pts, _G_RADII)


def _o_events_gfunction() -> str:
    arms = []
    for i, r in enumerate(_G_RADII):
        arms.append(
            f"SELECT CAST({i} AS INT) AS r_idx, {_dlit(r)} AS r_deg, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM nn "
            f"WHERE nn.d2 <= {_dlit(r * r)}) AS n_within")
    radii_sql = "\nUNION ALL\n".join(arms)
    return f"""WITH p AS (
  SELECT event_id AS id, {_EV_LON_SQL} AS x, {_EV_LAT_SQL} AS y
  FROM events WHERE event_id % 7 = 0),
nn AS (
  SELECT a.id,
         MIN(((a.x - b.x) * (a.x - b.x)) + ((a.y - b.y) * (a.y - b.y))) AS d2
  FROM p a JOIN p b ON a.id <> b.id
  GROUP BY a.id),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
r AS ({radii_sql})
SELECT r.r_idx, r.r_deg, r.n_within,
       CAST(r.n_within AS DOUBLE) / CAST(st.n AS DOUBLE) AS g_frac
FROM r, st"""


O_EVENTS_GFUNCTION = _o_events_gfunction()


def q_events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (events.transition_matrix): lag window ordered by
    (ts, event_id) -> count rollup -> one division per row."""
    from .. import events as ev
    return ev.transition_matrix(_t(spark, sf_dir, "events"))


O_EVENTS_TRANSITIONS = """WITH s AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
c AS (SELECT prev AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
FROM c JOIN t USING (from_type)"""


def q_events_mad_anomaly(spark, sf_dir):
    """Robust MAD anomaly days per cell (events.mad_anomalies, res 6,
    3x rule): integer-exact end to end — both medians are the
    lower-step selection (== QUANTILE_DISC at 0.5), so deviations and
    the flag comparison never touch a float."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.mad_anomalies(pts, res=6)


O_EVENTS_MAD_ANOMALY = f"""WITH p AS (
  SELECT {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, 6)} AS cell,
         CAST(ts AS DATE) AS day
  FROM events),
daily AS (
  SELECT cell, day, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY cell, day),
med AS (
  SELECT cell, QUANTILE_DISC(n, 0.5) AS med FROM daily GROUP BY cell),
dev AS (
  SELECT daily.cell, day, n, med, ABS(n - med) AS dev
  FROM daily JOIN med ON daily.cell = med.cell),
mad AS (
  SELECT cell, QUANTILE_DISC(dev, 0.5) AS mad FROM dev GROUP BY cell)
SELECT dev.cell, day, n, med, mad, dev > 3 * mad AS is_anomaly
FROM dev JOIN mad ON dev.cell = mad.cell"""


def q_events_theil_sen(spark, sf_dir):
    """Theil-Sen per-cell trend slope (events.theil_sen_trend, res 6):
    lower-median pairwise slope with (slope, day-pair) deterministic
    tie-break; the chosen slope's exact BIGINT num/den ride along and
    the float is one mirrored division."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.theil_sen_trend(pts, res=6)


O_EVENTS_THEIL_SEN = f"""WITH p AS (
  SELECT {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, 6)} AS cell,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events),
daily AS (
  SELECT cell, d, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY cell, d),
prs AS (
  SELECT a.cell, a.d AS di, b.d AS dj,
         b.n - a.n AS num, b.d - a.d AS den,
         CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.cell = b.cell AND b.d > a.d),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                               ORDER BY slope, di, dj) AS rn,
         COUNT(*) OVER (PARTITION BY cell) AS cnt
  FROM prs),
dd AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY cell)
SELECT rk.cell, dd.n_days, CAST(cnt AS BIGINT) AS n_pairs,
       num AS slope_num, den AS slope_den, slope
FROM rk JOIN dd ON rk.cell = dd.cell
WHERE rn = CAST(CEIL(CAST(cnt AS DOUBLE) / 2) AS BIGINT)"""


def q_events_gap_regularity(spark, sf_dir):
    """Inter-event-gap regularity per user (events.gap_regularity):
    exact integer-seconds gap sums + the cv2 metronome score, a fixed
    division tree over three order-independent BIGINTs."""
    from .. import events as ev
    return ev.gap_regularity(_t(spark, sf_dir, "events"))


O_EVENTS_GAP_REGULARITY = """WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM events),
a AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS sumsq_gap_s
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps, sum_gap_s, sumsq_gap_s,
       CASE WHEN sum_gap_s > 0 THEN
         (CAST(sumsq_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          - (CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
            * (CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
         / ((CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
            * (CAST(sum_gap_s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
       ELSE NULL END AS cv2
FROM a WHERE n_gaps >= 2"""


_DECAY_NOW = "2024-02-01 00:00:00"
_DECAY_HL_S = 2 * 86400
_DECAY_HORIZON = 40
_DECAY_RES = 6


def q_events_decayed_cells(spark, sf_dir):
    """Exponentially time-decayed activity surface per grid cell
    (events.decayed_cell_counts): the freshness-weighted "what's hot
    now" rollup, transcendental-free — decay weights are exact BIGINT
    powers of two (1 << (horizon - age//half_life)), the score one
    IEEE division by the exactly-representable 2^horizon."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.decayed_cell_counts(pts, _DECAY_RES, _DECAY_NOW,
                                  _DECAY_HL_S, horizon=_DECAY_HORIZON)


def _o_decayed_cells() -> str:
    from .. import events as ev
    return ev.sql_decayed_cell_counts(
        _EV_LON_SQL, _EV_LAT_SQL, "ts", "FROM events", _DECAY_RES,
        _DECAY_NOW, _DECAY_HL_S, horizon=_DECAY_HORIZON)


O_EVENTS_DECAYED_CELLS = _o_decayed_cells()


_CROSSK_RADII = [0.01, 0.02, 0.04, 0.08]


def q_events_cross_k(spark, sf_dir):
    """Bivariate cross-Ripley K (events.cross_k) between the even and
    odd event-id point classes (thinned %5): blocked A-probe x
    B-build cell-ring counting; oracle brute-forces the A x B pair
    predicate and mirrors the area product + one division."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    pts = _event_pts(e, "event_id").withColumn(
        "cls", (F.col("event_id") % 2 == 0).cast("int"))
    return ev.cross_k(pts, _CROSSK_RADII, "cls", 1, 0)


def _o_events_cross_k() -> str:
    import math
    arms = []
    for i, r in enumerate(_CROSSK_RADII):
        arms.append(
            f"SELECT CAST({i} AS INT) AS r_idx, {_dlit(r)} AS r_deg, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM pr "
            f"WHERE pr.d2 <= {_dlit(r * r)}) AS n_close, "
            f"{_dlit(math.pi * r * r)} AS k_csr")
    radii_sql = "\nUNION ALL\n".join(arms)
    return f"""WITH p AS (
  SELECT event_id AS id, CAST(event_id % 2 = 0 AS INT) AS cls,
         {_EV_LON_SQL} AS x, {_EV_LAT_SQL} AS y
  FROM events WHERE event_id % 5 = 0),
pr AS MATERIALIZED (
  SELECT ((a.x - b.x) * (a.x - b.x)) + ((a.y - b.y) * (a.y - b.y)) AS d2
  FROM p a JOIN p b ON a.cls = 1 AND b.cls = 0),
st AS (SELECT CAST(SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
              CAST(SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS nb,
              (MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS area FROM p),
r AS ({radii_sql})
SELECT r.r_idx, r.r_deg, r.n_close,
       CASE WHEN st.na > 0 AND st.nb > 0 THEN
         (st.area * CAST(r.n_close AS DOUBLE))
           / CAST(st.na * st.nb AS DOUBLE) END AS k_ab,
       r.k_csr
FROM r, st"""


O_EVENTS_CROSS_K = _o_events_cross_k()

_QUADRAT_RES = 7


def q_events_quadrat(spark, sf_dir):
    """Quadrat CSR test (events.quadrat_stats, res 7): chi-square and
    variance-mean ratio over the pattern's grid bbox WITHOUT
    materializing empty quadrats (mean-free identity); exact BIGINT
    numerators, two mirrored divisions."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"))
    return ev.quadrat_stats(pts, res=_QUADRAT_RES)


def _o_events_quadrat(res: int) -> str:
    ix = cells.sql_ix(_EV_LON_SQL, res)
    iy = cells.sql_iy(_EV_LAT_SQL, res)
    return f"""WITH g AS (
  SELECT {ix} AS ix, {iy} AS iy FROM events),
c AS (SELECT ix, iy, COUNT(*) AS c FROM g GROUP BY 1, 2),
ss AS (SELECT CAST(SUM(c * c) AS BIGINT) AS sum_sq FROM c),
box AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST((MAX(ix) - MIN(ix) + 1) * (MAX(iy) - MIN(iy) + 1)
              AS BIGINT) AS n_quadrats
  FROM g)
SELECT n_points, n_quadrats, sum_sq,
       CASE WHEN n_points > 0 THEN
         CAST(n_quadrats * sum_sq - n_points * n_points AS DOUBLE)
           / CAST(n_points AS DOUBLE) END AS chi2,
       CASE WHEN n_points > 0 AND n_quadrats > 1 THEN
         (CAST(n_quadrats * sum_sq - n_points * n_points AS DOUBLE)
            / CAST(n_points AS DOUBLE))
           / CAST(n_quadrats - 1 AS DOUBLE) END AS vmr
FROM box, ss"""


O_EVENTS_QUADRAT = _o_events_quadrat(_QUADRAT_RES)

_TELEPORT_RES = 14
_TELEPORT_NUM = 1
_TELEPORT_DEN = 3600


def q_events_teleport(spark, sf_dir):
    """GPS teleport detection (events.teleport_flags, res 14, max
    speed 1 cell/hour — ~2.4 km/h at this res): per-user lag
    transitions violating d2*den^2 > (num*dt_s)^2 — division-free
    exact integers (flags ~15% of the fixture's transitions, so the
    check is non-vacuous in BOTH directions); the oracle mirrors the
    (epoch micros, event_id) total order and the same non-negative
    `DIV`/`//` second floor."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.teleport_flags(pts, res=_TELEPORT_RES,
                             max_speed_num=_TELEPORT_NUM,
                             max_speed_den_s=_TELEPORT_DEN)


def _o_events_teleport(res: int, num: int, den: int) -> str:
    ix = cells.sql_ix(_EV_LON_SQL, res)
    iy = cells.sql_iy(_EV_LAT_SQL, res)
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {ix} AS ix, {iy} AS iy
  FROM events),
t AS (
  SELECT user_id, event_id AS to_event,
         LAG(event_id) OVER w AS from_event,
         (us - LAG(us) OVER w) // 1000000 AS dt_s,
         (ix - LAG(ix) OVER w) * (ix - LAG(ix) OVER w)
           + (iy - LAG(iy) OVER w) * (iy - LAG(iy) OVER w) AS d2
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT user_id, from_event, to_event,
       CAST(dt_s AS BIGINT) AS dt_s, CAST(d2 AS BIGINT) AS d2_cells
FROM t
WHERE from_event IS NOT NULL
  AND d2 * {den * den} > ({num} * dt_s) * ({num} * dt_s)"""


O_EVENTS_TELEPORT = _o_events_teleport(_TELEPORT_RES, _TELEPORT_NUM,
                                       _TELEPORT_DEN)


def q_events_od_lift(spark, sf_dir):
    """OD gravity lift (events.od_flow_lift, res 6): corridor flow
    vs the independence model n*total/(out_margin*in_margin) — one
    mirrored IEEE division over exact BIGINT products on top of the
    od_flows rollup."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.od_flow_lift(pts, res=6)


def _o_events_od_lift(res: int = 6) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
m AS (SELECT user_id, cell AS to_cell,
             LAG(cell) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS from_cell
      FROM p),
fl AS MATERIALIZED (
  SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n_moves
  FROM m WHERE from_cell IS NOT NULL AND from_cell <> to_cell
  GROUP BY 1, 2),
om AS (SELECT from_cell, CAST(SUM(n_moves) AS BIGINT) AS out_total
       FROM fl GROUP BY 1),
im AS (SELECT to_cell, CAST(SUM(n_moves) AS BIGINT) AS in_total
       FROM fl GROUP BY 1),
tt AS (SELECT CAST(SUM(n_moves) AS BIGINT) AS tot FROM fl)
SELECT fl.from_cell, fl.to_cell, fl.n_moves, om.out_total, im.in_total,
       CAST(fl.n_moves * tt.tot AS DOUBLE)
         / CAST(om.out_total * im.in_total AS DOUBLE) AS lift
FROM fl JOIN om USING (from_cell) JOIN im USING (to_cell), tt"""


O_EVENTS_OD_LIFT = _o_events_od_lift()


# res 10 / min_shared 1: the synth users wander near-disjoint
# tracks, so >= 2 shared visitors is VACUOUS at every sf (0 rows
# — caught in the r4 continuation sweep); the threshold branch
# is exercised by the bipartite_project pytest instead
_COVISIT_RES = 10
_COVISIT_MIN = 1
_COVISIT_CAP = 50


def q_events_covisit(spark, sf_dir):
    """Place co-visitation graph (components.bipartite_project over
    (user, cell-at-res-10) incidence): cells linked by shared
    visitors, power-visitors above degree 50 dropped by the hot-left
    guard — the projection blow-up control. All counts BIGINT-exact
    (min_shared=1 here: the fixture's near-disjoint user tracks make
    stricter thresholds vacuous; the threshold branch is
    pytest-covered)."""
    from .. import components
    pts = _event_pts(_t(spark, sf_dir, "events"), "user_id")
    visits = cells.with_cell(pts, _COVISIT_RES).select("user_id", "cell")
    return components.bipartite_project(
        visits, left="user_id", right="cell",
        min_shared=_COVISIT_MIN, max_left_degree=_COVISIT_CAP)


def _o_covisit(res: int, min_shared: int, cap: int) -> str:
    return f"""WITH v AS MATERIALIZED (
  SELECT DISTINCT user_id AS l,
         {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, res)} AS r
  FROM events),
keep AS (SELECT l FROM v GROUP BY l HAVING COUNT(*) <= {cap}),
e AS MATERIALIZED (SELECT v.l, v.r FROM v JOIN keep USING (l))
SELECT a.r AS item_a, b.r AS item_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM e a JOIN e b ON a.l = b.l AND a.r < b.r
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}"""


O_EVENTS_COVISIT = _o_covisit(_COVISIT_RES, _COVISIT_MIN, _COVISIT_CAP)

_CLQ_RMAX = 0.08


def q_events_clq(spark, sf_dir):
    """Co-location quotient CLQ(even -> odd) (events.
    colocation_quotient, bounded at 0.08 deg) over the thinned (%5)
    two-class event points: per-A nearest neighbor by the
    deterministic (d2, id) order, quotient = two mirrored divisions.
    The oracle brute-forces every candidate pair and replays the
    same ROW_NUMBER argmin."""
    from .. import events as ev
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    pts = _event_pts(e, "event_id").withColumn(
        "cls", (F.col("event_id") % 2 == 0).cast("int"))
    return ev.colocation_quotient(pts, "cls", 1, 0, _CLQ_RMAX)


def _o_events_clq(r_max: float) -> str:
    return f"""WITH p AS MATERIALIZED (
  SELECT event_id AS id, CAST(event_id % 2 = 0 AS INT) AS cls,
         {_EV_LON_SQL} AS x, {_EV_LAT_SQL} AS y
  FROM events WHERE event_id % 5 = 0),
cand AS MATERIALIZED (
  SELECT a.id AS a_id, b.id AS b_id, b.cls AS b_c,
         ((a.x - b.x) * (a.x - b.x)) + ((a.y - b.y) * (a.y - b.y)) AS d2
  FROM p a JOIN p b ON a.cls = 1 AND a.id <> b.id),
nn AS (
  SELECT * FROM (
    SELECT a_id, b_c,
           ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY d2, b_id) AS rk
    FROM cand WHERE d2 <= {_dlit(r_max * r_max)})
  WHERE rk = 1),
num AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a_with_nn,
               CAST(SUM(CASE WHEN b_c = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_ab
        FROM nn),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
        FROM p)
SELECT n_total, n_a_with_nn, n_b, c_ab,
       CASE WHEN n_a_with_nn > 0 AND n_b > 0 AND n_total > 1 THEN
         (CAST(c_ab AS DOUBLE) / CAST(n_a_with_nn AS DOUBLE))
           / (CAST(n_b AS DOUBLE) / CAST(n_total - 1 AS DOUBLE)) END
         AS clq
FROM num, tot"""


O_EVENTS_CLQ = _o_events_clq(_CLQ_RMAX)


_DWELL_RES = 6


def q_events_dwell(spark, sf_dir):
    """Per-(user, cell) dwell-time rollup (events.dwell_times, res 6):
    consecutive same-cell ping gaps summed as exact whole seconds
    (non-negative DIV floor mirrored); transit gaps contribute
    nowhere."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.dwell_times(pts, res=_DWELL_RES)


def _o_events_dwell(res: int) -> str:
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, res)} AS cell
  FROM events),
t AS (
  SELECT user_id, cell,
         LAG(cell) OVER w AS pcell,
         us - LAG(us) OVER w AS gap
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT user_id, cell, CAST(COUNT(*) AS BIGINT) AS n_stays,
       CAST(SUM(gap // 1000000) AS BIGINT) AS dwell_s
FROM t WHERE pcell IS NOT NULL AND pcell = cell
GROUP BY 1, 2"""


O_EVENTS_DWELL = _o_events_dwell(_DWELL_RES)


_GINI_RES = 6


def q_events_gini(spark, sf_dir):
    """Gini coefficient of per-cell event concentration
    (textops.gini_concentration over the res-6 cell counts): exact
    two-pass global rank + the (2*S_r - (n+1)*S)/(n*S) identity,
    one mirrored division."""
    pts = _event_pts(_t(spark, sf_dir, "events"))
    counts = (cells.with_cell(pts, _GINI_RES)
              .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))
    return textops.gini_concentration(counts, "n", "cell")


def _o_events_gini(res: int) -> str:
    return f"""WITH c AS (
  SELECT {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, res)} AS k,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY 1),
r AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, k) AS BIGINT)
        AS rk FROM c),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(v) AS BIGINT) AS sum_values,
             CAST(SUM(rk * v) AS BIGINT) AS sum_rank_value
      FROM r)
SELECT n_keys, sum_values, sum_rank_value,
       CASE WHEN sum_values > 0 AND n_keys >= 2 THEN
         CAST(2 * sum_rank_value - (n_keys + 1) * sum_values AS DOUBLE)
           / CAST(n_keys * sum_values AS DOUBLE) END AS gini
FROM a"""


O_EVENTS_GINI = _o_events_gini(_GINI_RES)


_STAT_ITERS = 3
_STAT_RES = 6


def q_events_stationary(spark, sf_dir):
    """Long-run cell-occupancy (events.od_stationary, 3 power-
    iteration steps of the row-normalized OD matrix at res 6,
    deterministic fold): masses ARE value-compared via the same
    from_cell-sorted LIST_REDUCE fold as doc_pagerank; dangling
    cells leak, uniform start over cells with outgoing moves."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.od_stationary(pts, res=_STAT_RES, iters=_STAT_ITERS,
                            deterministic=True)


def _o_events_stationary(res: int, iters: int) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    parts = [f"""p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
mv AS (SELECT user_id, cell AS to_cell,
              LAG(cell) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS from_cell
       FROM p),
fl AS MATERIALIZED (
  SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n
  FROM mv WHERE from_cell IS NOT NULL AND from_cell <> to_cell
  GROUP BY 1, 2),
o AS (SELECT from_cell, CAST(SUM(n) AS DOUBLE) AS outm
      FROM fl GROUP BY 1),
e AS MATERIALIZED (
  SELECT fl.from_cell, fl.to_cell,
         CAST(fl.n AS DOUBLE) / o.outm AS p
  FROM fl JOIN o USING (from_cell)),
nd AS MATERIALIZED (
  SELECT DISTINCT cell FROM (
    SELECT from_cell AS cell FROM fl
    UNION ALL SELECT to_cell FROM fl)),
st AS (SELECT DISTINCT from_cell AS cell FROM fl),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM st),
m0 AS (SELECT nd.cell,
              CASE WHEN st.cell IS NOT NULL
                   THEN CAST(1.0 AS DOUBLE) / CAST(ns.n0 AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE) END AS mass
       FROM nd LEFT JOIN st ON st.cell = nd.cell, ns)"""]
    for i in range(iters):
        parts.append(f"""c{i + 1} AS (
  SELECT e.from_cell, e.to_cell, m.mass * e.p AS c
  FROM e JOIN m{i} m ON m.cell = e.from_cell),
s{i + 1} AS (
  SELECT to_cell, LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST(c ORDER BY from_cell)), (acc, v) -> acc + v) AS s
  FROM c{i + 1} GROUP BY to_cell),
m{i + 1} AS (
  SELECT nd.cell, COALESCE(s{i + 1}.s, CAST(0.0 AS DOUBLE)) AS mass
  FROM nd LEFT JOIN s{i + 1} ON s{i + 1}.to_cell = nd.cell)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT cell, mass FROM m{iters}")


O_EVENTS_STATIONARY = _o_events_stationary(_STAT_RES, _STAT_ITERS)


def q_events_routine(spark, sf_dir):
    """Temporal-routine score (events.routine_index): busiest
    (weekday, hour) bucket share per user, with timezone-free
    integer bucketing ((epoch_days + 4) % 7 / epoch_hours % 24) and
    a deterministic argmax — one division."""
    from .. import events as ev
    return ev.routine_index(_t(spark, sf_dir, "events"))


O_EVENTS_ROUTINE = """WITH b AS (
  SELECT user_id,
         CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS wd,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hh
  FROM events),
c AS MATERIALIZED (
  SELECT user_id, wd, hh, CAST(COUNT(*) AS BIGINT) AS c
  FROM b GROUP BY 1, 2, 3),
top AS (
  SELECT user_id, wd AS top_weekday, hh AS top_hour, c AS top_count
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY c DESC, wd ASC, hh ASC) AS rk FROM c)
  WHERE rk = 1),
tot AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM b GROUP BY 1)
SELECT tot.user_id, n_events, top_weekday, top_hour, top_count,
       CAST(top_count AS DOUBLE) / CAST(n_events AS DOUBLE)
         AS routine_frac
FROM tot JOIN top ON top.user_id = tot.user_id"""


def q_events_autocorr(spark, sf_dir):
    """Lag-1 temporal autocorrelation per cell
    (events.cell_temporal_autocorr, daily periods at res 6): Pearson
    over consecutive-period pairs of the zero-completed series —
    exact BIGINT sums, two sanctioned sqrts, explicit (sa*sb)
    parenthesization mirrored."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.cell_temporal_autocorr(pts, res=6, period_s=86400)


def _o_events_autocorr(res: int = 6, period_s: int = 86400) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    pus = period_s * 1_000_000
    return f"""WITH p AS (
  SELECT epoch_us(ts) // {pus} AS per,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
cnt AS (SELECT cell, per, COUNT(*) AS x FROM p GROUP BY cell, per),
rng AS (SELECT MIN(per) AS pmin, MAX(per) AS pmax FROM cnt),
series AS MATERIALIZED (
  SELECT c.cell, g.per, CAST(COALESCE(cnt.x, 0) AS BIGINT) AS x
  FROM (SELECT DISTINCT cell FROM cnt) c
  CROSS JOIN (SELECT UNNEST(RANGE(pmin, pmax + 1)) AS per FROM rng) g
  LEFT JOIN cnt ON cnt.cell = c.cell AND cnt.per = g.per),
pr AS (
  SELECT cell, x,
         LEAD(x) OVER (PARTITION BY cell ORDER BY per) AS y
  FROM series),
a AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pr WHERE y IS NOT NULL GROUP BY cell)
SELECT cell, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0
             AND n_pairs * syy - sy * sy > 0 THEN
         CAST(n_pairs * sxy - sx * sy AS DOUBLE)
           / (SQRT(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(n_pairs * syy - sy * sy AS DOUBLE))) END AS r1
FROM a"""


O_EVENTS_AUTOCORR = _o_events_autocorr()

_COTRAV_RES = 8
_COTRAV_WIN = 6 * 3600
_COTRAV_MIN = 2
_COTRAV_CAP = 20


def q_events_cotravelers(spark, sf_dir):
    """Co-traveler pairs (events.cotravelers, res 8, 6h buckets,
    >= 2 distinct meets, crowd cap 20): distinct presences ->
    (cell, bucket) self-join -> pair meet counts; the bucket cap is
    the projection blow-up guard."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.cotravelers(pts, res=_COTRAV_RES, window_s=_COTRAV_WIN,
                          min_meets=_COTRAV_MIN,
                          max_bucket_users=_COTRAV_CAP)


def _o_cotravelers(res: int, window_s: int, min_meets: int,
                   cap: int) -> str:
    wus = window_s * 1_000_000
    return f"""WITH pres AS MATERIALIZED (
  SELECT DISTINCT user_id AS u,
         {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, res)} AS cell,
         epoch_us(ts) // {wus} AS b
  FROM events),
ok AS (SELECT cell, b FROM pres GROUP BY cell, b
       HAVING COUNT(*) <= {cap}),
pk AS MATERIALIZED (
  SELECT pres.u, pres.cell, pres.b FROM pres JOIN ok USING (cell, b))
SELECT a.u AS user_a, b.u AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_meets
FROM pk a JOIN pk b ON a.cell = b.cell AND a.b = b.b AND a.u < b.u
GROUP BY 1, 2 HAVING COUNT(*) >= {min_meets}"""


O_EVENTS_COTRAVELERS = _o_cotravelers(_COTRAV_RES, _COTRAV_WIN,
                                      _COTRAV_MIN, _COTRAV_CAP)


def q_events_place_conc(spark, sf_dir):
    """Per-user top-2 place concentration
    (events.place_concentration, res 6): WindowGroupLimit top-k with
    the deterministic (count DESC, cell ASC) order; one division."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "user_id")
    return ev.place_concentration(pts, res=6, top_k=2)


def _o_place_conc(res: int, top_k: int) -> str:
    return f"""WITH c AS MATERIALIZED (
  SELECT user_id,
         {cells.sql_cell(_EV_LON_SQL, _EV_LAT_SQL, res)} AS cell,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
top AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS top_count
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY c DESC, cell ASC) AS rk FROM c)
  WHERE rk <= {top_k} GROUP BY 1),
tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_pings,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM c GROUP BY 1)
SELECT tot.user_id, n_pings, n_cells, top_count,
       CAST(top_count AS DOUBLE) / CAST(n_pings AS DOUBLE) AS top_frac
FROM tot JOIN top ON top.user_id = tot.user_id"""


O_EVENTS_PLACE_CONC = _o_place_conc(6, 2)


def q_events_jumps(spark, sf_dir):
    """Jump-length distribution (events.jump_lengths, res 12):
    histogram of per-transition Chebyshev cell distances — exact
    integers, one lag window + one rollup."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"),
                     "event_id", "ts", "user_id")
    return ev.jump_lengths(pts, res=12)


def _o_events_jumps(res: int) -> str:
    ix = cells.sql_ix(_EV_LON_SQL, res)
    iy = cells.sql_iy(_EV_LAT_SQL, res)
    return f"""WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {ix} AS ix, {iy} AS iy
  FROM events),
t AS (
  SELECT GREATEST(ABS(ix - LAG(ix) OVER w), ABS(iy - LAG(iy) OVER w))
           AS j,
         LAG(ix) OVER w AS pix
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT CAST(j AS BIGINT) AS jump_cells,
       CAST(COUNT(*) AS BIGINT) AS n_moves
FROM t WHERE pix IS NOT NULL GROUP BY 1"""


O_EVENTS_JUMPS = _o_events_jumps(12)


def q_events_burst(spark, sf_dir):
    """Per-(cell, period) burst z-score (events.cell_burst_scores,
    daily periods at res 6) against the cell's own zero-completed
    history: z = (n*x - S) / sqrt(n*Q - S^2) over exact BIGINT
    sums — one division + one sanctioned sqrt, mirrored; NULL for
    constant series."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "ts")
    return ev.cell_burst_scores(pts, res=6, period_s=86400)


def _o_events_burst(res: int = 6, period_s: int = 86400) -> str:
    lon, lat = _EV_LON_SQL, _EV_LAT_SQL
    pus = period_s * 1_000_000
    return f"""WITH p AS (
  SELECT epoch_us(ts) // {pus} AS per,
         {cells.sql_cell(lon, lat, res)} AS cell
  FROM events),
cnt AS (SELECT cell, per, COUNT(*) AS x FROM p GROUP BY cell, per),
rng AS (SELECT MIN(per) AS pmin, MAX(per) AS pmax FROM cnt),
series AS MATERIALIZED (
  SELECT c.cell, g.per, CAST(COALESCE(cnt.x, 0) AS BIGINT) AS x
  FROM (SELECT DISTINCT cell FROM cnt) c
  CROSS JOIN (SELECT UNNEST(RANGE(pmin, pmax + 1)) AS per FROM rng) g
  LEFT JOIN cnt ON cnt.cell = c.cell AND cnt.per = g.per),
st AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM series GROUP BY cell)
SELECT series.cell, CAST(per AS BIGINT) AS period, x AS cnt,
       n AS n_periods,
       CASE WHEN n * q - s * s > 0 THEN
         CAST(n * x - s AS DOUBLE) / SQRT(CAST(n * q - s * s AS DOUBLE))
       END AS z_score
FROM series JOIN st ON st.cell = series.cell"""


O_EVENTS_BURST = _o_events_burst()

_GYRATION_RES = 8


def q_events_gyration(spark, sf_dir):
    """Per-user radius of gyration (events.radius_of_gyration, grid
    res 8): rg_cells = sqrt((n*Q - Sx^2 - Sy^2) / n^2) over exact
    BIGINT grid-coordinate sums — the mean-free identity keeps both
    engines on the identical one-division-one-sqrt tree."""
    from .. import events as ev
    pts = _event_pts(_t(spark, sf_dir, "events"), "user_id")
    return ev.radius_of_gyration(pts, res=_GYRATION_RES)


def _o_events_gyration(res: int) -> str:
    ix = cells.sql_ix(_EV_LON_SQL, res)
    iy = cells.sql_iy(_EV_LAT_SQL, res)
    return f"""WITH g AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         {ix} AS ix, {iy} AS iy
  FROM events),
a AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pings,
         CAST(SUM(ix) AS BIGINT) AS sx,
         CAST(SUM(iy) AS BIGINT) AS sy,
         CAST(SUM(ix * ix + iy * iy) AS BIGINT) AS q
  FROM g GROUP BY user_id)
SELECT user_id, n_pings,
       CAST(n_pings * q - sx * sx - sy * sy AS BIGINT) AS rg2_num,
       SQRT(CAST(n_pings * q - sx * sx - sy * sy AS DOUBLE)
            / CAST(n_pings * n_pings AS DOUBLE)) AS rg_cells
FROM a"""


O_EVENTS_GYRATION = _o_events_gyration(_GYRATION_RES)
