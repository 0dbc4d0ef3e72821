"""Resumable mobility mart: pings -> map-matched traversals -> stays
-> OD flows -> per-user summary.

The fifth leg of the job family (pipeline.py geocodes, curate.py
filters, dedup.py deduplicates, analytics.py analyzes space; this one
analyzes MOVEMENT): the daily trajectory mart a fleet/mobility
dashboard reads, as snapshot-committed stages —

    pings -> traversals (events.map_match vs a deterministic road grid)
          -> stay points -> OD flows
          -> per-user behavioral profiles (gyration + routine + dwell
             + teleport QA)
          -> per-user mobility summary

Run as

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.mobility \
        --out /path/ckpt --n-users 200 [--pings-per-user 50] \
        [--fail-after STAGE]

Every stage commits through ``CheckpointStore`` (per-partition lineage
+ observed counters: ping volume, snapped-ping volume, traversal /
stay / move counts). Relaunching with the same ``--out`` resumes after
the last committed stage; ``--fail-after`` is the resume test's kill
switch, mirroring the other jobs. Each layer is the contract-verified
operator (events.map_match / stay_points / od_flows) — the job adds
the lifecycle, not new math.

Inputs are synthesized deterministically and partition-independently
(pure column math of the row id, the synth module's convention): each
user walks east along a home latitude with a small hash jitter, over a
staircase road grid — so traversals, stays and flows are all non-empty
and a resumed run is bit-identical to a fresh one.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from fagi_spark import events, fuse
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.session import get_spark

STAGES = ("pings", "traversals", "stays", "od", "profiles", "summary")
T0_S = 1_704_067_200  # 2024-01-01T00:00:00Z


def synth_pings(spark, n_users: int, pings_per_user: int):
    """Deterministic ping table (event_id, user_id, ts, lon, lat):
    pure column math of the row id (partition-independent, the synth
    convention). User u's home sits on the [0, 16) x [0, 8) deg box;
    ping i drifts east 0.01 deg/step with a +-0.02-deg hash jitter and
    ticks one minute, so consecutive pings stay on nearby roads and
    every run produces real traversals/stays/moves."""
    n = n_users * pings_per_user
    df = spark.range(0, n, 1, max(8, spark.sparkContext.defaultParallelism))
    user = F.col("id") % n_users
    i = F.floor(F.col("id") / n_users).cast("long")
    jit = F.pmod(F.xxhash64(F.col("id")), F.lit(5)) - 2  # -2..2 hundredths
    lon = ((user * 37 % 1600) + (i % 120) + jit).cast("double") / 100.0
    lat = ((user * 53 % 800) + F.pmod(F.xxhash64(F.col("id") + 7),
                                      F.lit(3))).cast("double") / 100.0
    ts = F.timestamp_seconds(F.lit(T0_S) + i * 60 + user % 17)
    return df.select(F.col("id").alias("event_id"),
                     user.alias("user_id"), ts.alias("ts"),
                     lon.alias("lon"), lat.alias("lat"))


def synth_ways(spark, n_ways: int = 1500):
    """Staircase road grid over the ping box (the contract fixture's
    shape): way k runs (v, w) -> (v+0.06, w) -> (v+0.06, w+0.05)."""
    df = spark.range(0, n_ways, 1, 8)
    k = F.col("id")
    v = (k * 41 % 1600).cast("double") / 100.0
    # 53 is the ping generator's latitude multiplier: road
    # latitudes coincide with user home latitudes (mod the
    # +-0.02-deg jitter), so most pings have a road in range
    w = (k * 53 % 800).cast("double") / 100.0
    wkt = F.concat(
        F.lit("LINESTRING ("),
        v.cast("string"), F.lit(" "), w.cast("string"), F.lit(", "),
        (v + 0.06).cast("string"), F.lit(" "), w.cast("string"),
        F.lit(", "),
        (v + 0.06).cast("string"), F.lit(" "),
        (w + 0.05).cast("string"), F.lit(")"))
    return df.select(F.concat(F.lit("road"), k.cast("string"))
                      .alias("subject"), wkt.alias("geom_wkt"))


def run(spark, out: str, n_users: int, pings_per_user: int = 50,
        n_ways: int = 1500, radius_m: float = 3000.0, res: int = 11,
        fail_after: str | None = None):
    store = CheckpointStore(out)

    def maybe_fail(stage):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage!r}")

    pings = store.run_stage(
        spark, "pings",
        lambda: synth_pings(spark, n_users, pings_per_user),
        observe={"n_pings": F.count(F.lit(1)),
                 "n_users": F.count_distinct("user_id")})
    maybe_fail("pings")

    ways = fuse.prepare_geoms(synth_ways(spark, n_ways))

    trav = store.run_stage(
        spark, "traversals",
        lambda: events.map_match(pings, ways, radius_m, res=res),
        observe={"n_traversals": F.count(F.lit(1)),
                 "n_snapped_pings": F.sum("n_pings"),
                 "n_ways_used": F.count_distinct("way")})
    maybe_fail("traversals")

    stays = store.run_stage(
        spark, "stays", lambda: events.stay_points(pings, res),
        observe={"n_stays": F.count(F.lit(1)),
                 "n_stay_events": F.sum("n_events")})
    maybe_fail("stays")

    od = store.run_stage(
        spark, "od", lambda: events.od_flows(pings, res),
        observe={"n_pairs": F.count(F.lit(1)),
                 "n_moves": F.sum("n_moves")})
    maybe_fail("od")

    def profiles_df():
        # per-user behavioral profile: home range (gyration), temporal
        # routine, place time budget, and teleport data-quality count
        # — the r4 mobility operators given a lifecycle home. Teleports
        # use a finer grid (res+3) and a 1-cell/60s bound so the synth
        # jitter's largest jumps flag while ordinary drift does not.
        rg = events.radius_of_gyration(pings, res)
        rt = events.routine_index(pings).select(
            "user_id", "top_weekday", "top_hour", "routine_frac")
        dw = (events.dwell_times(pings, res)
              .groupBy("user_id")
              .agg(F.sum("dwell_s").alias("total_dwell_s"),
                   F.count(F.lit(1)).alias("n_dwell_cells")))
        tp = (events.teleport_flags(pings, res + 3, 1, 60)
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_teleports")))
        return (rg.join(rt, "user_id")
                .join(dw, "user_id", "left")
                .join(tp, "user_id", "left")
                .fillna(0, ["total_dwell_s", "n_dwell_cells",
                            "n_teleports"]))

    profiles = store.run_stage(
        spark, "profiles", profiles_df,
        observe={"n_users": F.count(F.lit(1)),
                 "n_teleports": F.sum("n_teleports")})
    maybe_fail("profiles")

    def summary_df():
        return (trav.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_traversals"),
                     F.count_distinct("way").alias("n_distinct_ways"),
                     F.sum("dwell_us").alias("total_dwell_us"),
                     F.sum("n_pings").alias("n_snapped_pings"))
                .join(stays.groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n_stays")),
                      "user_id", "left")
                .fillna(0, ["n_stays"]))

    summary = store.run_stage(
        spark, "summary", summary_df,
        observe={"n_users": F.count(F.lit(1)),
                 "n_traversals": F.sum("n_traversals")})
    maybe_fail("summary")

    return {"pings": pings, "traversals": trav, "stays": stays,
            "od": od, "profiles": profiles, "summary": summary,
            "store": store}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-users", type=int, default=200)
    p.add_argument("--pings-per-user", type=int, default=50)
    p.add_argument("--n-ways", type=int, default=1500)
    p.add_argument("--radius-m", type=float, default=3000.0)
    p.add_argument("--res", type=int, default=11)
    p.add_argument("--fail-after", default=None, choices=STAGES)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_mobility", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, args.out, args.n_users,
              pings_per_user=args.pings_per_user, n_ways=args.n_ways,
              radius_m=args.radius_m, res=args.res,
              fail_after=args.fail_after)
    for stage in STAGES:
        lin = out["store"].lineage(stage)
        print(f"{stage}: {lin['n_rows']} rows in {lin['n_files']} files, "
              f"metrics={lin['metrics']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
