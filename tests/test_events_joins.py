"""As-of join and interval range join (fagi_spark/events.py)."""
from datetime import datetime

from pyspark.sql import functions as F

from fagi_spark import events as ev


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(0, 1, _ts("2024-01-01T00:30")),   # before any version -> NULL
         (1, 1, _ts("2024-01-01T01:00")),   # exactly at v1 -> inclusive
         (2, 1, _ts("2024-01-01T02:30")),   # between v1 and v2 -> v1
         (3, 1, _ts("2024-01-05T00:00")),   # after v2 -> v2
         (4, 2, _ts("2024-01-01T09:00"))],  # other key -> its own v
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00"), "u1v1"),
         (1, _ts("2024-01-01T03:00"), "u1v2"),
         (2, _ts("2024-01-01T08:00"), "u2v1")],
        "user_id long, vts timestamp, tag string")
    got = {r.event_id: r.tag for r in ev.asof_join(left, right).collect()}
    assert got == {0: None, 1: "u1v1", 2: "u1v1", 3: "u1v2", 4: "u2v1"}


def test_asof_join_random_parity(spark):
    import random
    rng = random.Random(3)
    left = [(i, rng.randint(0, 5), rng.randint(0, 10_000)) for i in range(300)]
    right = [(u, t, f"v{u}_{t}") for u in range(6)
             for t in sorted(rng.sample(range(10_000), 4))]
    ldf = (spark.createDataFrame(left, "event_id long, user_id long, s long")
           .withColumn("ts", F.timestamp_seconds("s")).drop("s"))
    rdf = (spark.createDataFrame(right, "user_id long, v long, tag string")
           .withColumn("vts", F.timestamp_seconds("v")).drop("v"))
    got = {r.event_id: r.tag for r in ev.asof_join(ldf, rdf).collect()}
    vers = {}
    for u, t, tag in right:
        vers.setdefault(u, []).append((t, tag))
    want = {}
    for i, u, s in left:
        best = None
        for t, tag in vers.get(u, []):
            if t <= s and (best is None or t > best[0]):
                best = (t, tag)
        want[i] = best[1] if best else None
    assert got == want


def test_interval_range_join_buckets_and_edges(spark):
    evs = (spark.createDataFrame(
        [(0, 0), (1, 3600), (2, 5399), (3, 5400), (4, 9000)],
        "event_id long, s long")
        .withColumn("ts", F.timestamp_seconds("s")).drop("s"))
    iv = (spark.createDataFrame(
        [(0, 0, 5400),        # spans 2 buckets at 1h bucketing
         (1, 3600, 7200)],
        "interval_id long, a long, b long")
        .withColumn("start", F.timestamp_seconds("a"))
        .withColumn("end", F.timestamp_seconds("b")).drop("a", "b"))
    got = sorted((r.event_id, r.interval_id) for r in
                 ev.interval_range_join(evs, iv).collect())
    # end exclusive: event 3 (t=5400) joins interval 1 only; events 1
    # and 2 hit both intervals; event 4 matches nothing; no dup pairs
    # even though interval 0 spans two buckets
    assert got == [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (3, 1)]


def test_cooccurrence_join_bruteforce_parity(spark):
    """Cell-ring x time-bucket candidates == naive all-pairs filter on
    a random cloud, including pairs exactly AT the radius/window
    boundary and across bucket boundaries."""
    import datetime
    import itertools

    n = 120
    rows = []
    for i in range(n):
        lon = ((i * 131) % 500) / 100.0
        lat = ((i * 257) % 300) / 100.0
        t = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=(i * 977) % 36000)
        rows.append((i, t, lon, lat))
    # planted boundary pair: exactly radius apart, exactly window apart
    rows.append((1000, datetime.datetime(2024, 1, 2), 9.0, 9.0))
    rows.append((1001, datetime.datetime(2024, 1, 2, 0, 10), 9.03, 9.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, lon double, lat double")
    got = sorted((r.a_id, r.b_id) for r in
                 ev.cooccurrence_join(df, 0.03, 600).collect())
    want = []
    for (ia, ta, xa, ya), (ib, tb, xb, yb) in itertools.combinations(rows, 2):
        a, b = ((ia, ta, xa, ya), (ib, tb, xb, yb))
        if ia > ib:
            a, b = b, a
        dd2 = (a[2] - b[2]) ** 2 + (a[3] - b[3]) ** 2
        if dd2 <= 0.03 * 0.03 and abs((a[1] - b[1]).total_seconds()) <= 600:
            want.append((a[0], b[0]))
    assert got == sorted(want)
    assert (1000, 1001) in got  # the exact-boundary pair survives


def test_od_flows_hand_fixture(spark):
    """Two users hopping cells: hand-checkable moves, stays excluded
    by default and counted when include_stays=True."""
    import datetime as dt

    from fagi_spark import cells, events as ev2

    res = 6
    w = cells.cell_width_deg(res)
    t0 = dt.datetime(2024, 1, 1)
    lonA, lonB, lat = 10.0 + w / 2, 10.0 + 3 * w / 2, 20.0
    rows = [  # user 1: A -> B -> B(stay) -> A ; user 2: A -> B
        (1, 1, t0, lonA, lat), (2, 1, t0 + dt.timedelta(60), lonB, lat),
        (3, 1, t0 + dt.timedelta(120), lonB, lat),
        (4, 1, t0 + dt.timedelta(180), lonA, lat),
        (5, 2, t0, lonA, lat), (6, 2, t0 + dt.timedelta(60), lonB, lat),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    out = {(r.from_cell, r.to_cell): (r.n_moves, r.n_users)
           for r in ev2.od_flows(df, res).collect()}
    ca = cells.pack_cell_value(int((lonA + 180) / 360 * 64),
                               int((lat + 90) / 180 * 64), res)
    cb = cells.pack_cell_value(int((lonB + 180) / 360 * 64),
                               int((lat + 90) / 180 * 64), res)
    assert out == {(ca, cb): (2, 2), (cb, ca): (1, 1)}
    with_stays = {(r.from_cell, r.to_cell): r.n_moves
                  for r in ev2.od_flows(df, res,
                                        include_stays=True).collect()}
    assert with_stays[(cb, cb)] == 1


def test_emerging_hotspots_trends(spark):
    """Planted monotone series: strictly rising counts give the max S
    = T(T-1)/2, strictly falling the min, constant 0; zero-completion
    makes a cell active only in the last period read as rising."""
    import datetime as dt

    from fagi_spark import cells, events as ev2

    res = 6
    w = cells.cell_width_deg(res)
    lat = 20.0
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 4 daily periods; cell R: 1,2,3,4 events; cell Fa: 4,3,2,1;
    # cell C: 2,2,2,2; cell L: only day 3 (zero-completed -> rising)
    for d in range(4):
        day = t0 + dt.timedelta(days=d)
        rows += [(day, 10.0 + w / 2, lat)] * (d + 1)
        rows += [(day, 10.0 + 5 * w / 2, lat)] * (4 - d)
        rows += [(day, 10.0 + 9 * w / 2, lat)] * 2
    rows += [(t0 + dt.timedelta(days=3), 10.0 + 13 * w / 2, lat)] * 3
    df = spark.createDataFrame(rows, "ts timestamp, lon double, lat double")
    out = {r.cell: r for r in
           ev2.emerging_hotspots(df, res, 86400).collect()}

    def cid(j):
        return cells.pack_cell_value(
            int((10.0 + (4 * j + 1) * w / 2 + 180) / 360 * 64),
            int((lat + 90) / 180 * 64), res)

    assert (out[cid(0)].s_stat, out[cid(0)].trend) == (6, "rising")
    assert (out[cid(1)].s_stat, out[cid(1)].trend) == (-6, "falling")
    assert (out[cid(2)].s_stat, out[cid(2)].trend) == (0, "flat")
    # late cell: 0,0,0,3 -> pairs (0,0)x3 flat + (0,3)x3 rising = +3
    assert (out[cid(3)].s_stat, out[cid(3)].trend) == (3, "rising")
    assert all(r.n_periods == 4 for r in out.values())


def test_stay_points_gaps_and_islands(spark):
    """A-B-A cell sequence splits into three runs (the second A run is
    a NEW stay); min_events drops the singleton; bounds are exact
    epoch micros; re-partitioning does not change the result."""
    from fagi_spark import cells

    w = cells.cell_width_deg(6)
    rows = []
    # user 1: 3 events in cell A, 1 in cell B, 2 back in A
    for i, (dx, s) in enumerate([(0.0, "00"), (0.0, "10"), (0.0, "20"),
                                 (1.5 * w, "30"), (0.0, "40"), (0.0, "50")]):
        rows.append((i, 1, _ts(f"2024-01-01T00:{s}"), 10.0 + dx, 20.0))
    # user 2: a lone event (never a stay at min_events=2)
    rows.append((99, 2, _ts("2024-01-01T01:00"), 50.0, 30.0))
    pts = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    got = sorted(map(tuple, ev.stay_points(pts, res=6).collect()))
    assert len(got) == 2  # two A runs; B singleton + user 2 dropped
    (u1, c1, e1, x1, d1, n1), (u2, c2, e2, x2, d2, n2) = got
    assert u1 == u2 == 1 and c1 == c2  # same cell, separate stays
    assert (n1, n2) == (3, 2)
    assert d1 == x1 - e1 == 20 * 60 * 1_000_000
    assert d2 == x2 - e2 == 10 * 60 * 1_000_000
    assert e2 > x1  # the second stay starts after the first ends
    again = sorted(map(tuple,
                       ev.stay_points(pts.repartition(7), res=6).collect()))
    assert again == got


def test_map_match_runs_and_offnetwork(spark):
    """Map-matching: pings snap to the nearest road by true shape
    distance; consecutive same-way pings collapse into one traversal;
    an off-network ping (outside the radius) drops out WITHOUT
    splitting the run around it; A-B-A way sequences produce three
    traversals; result is partition-independent."""
    from fagi_spark import fuse

    ways = spark.createDataFrame(
        [("roadA", "LINESTRING (10.0 20.0, 10.1 20.0)"),
         ("roadB", "LINESTRING (10.0 20.5, 10.1 20.5)")],
        "subject string, geom_wkt string")
    ways = fuse.prepare_geoms(ways)
    rows = [
        # user 1: two pings on A, an off-network ping 2 deg away, two
        # more on A (one run of 4), then one on B, then back to A
        (0, 1, _ts("2024-01-01T00:00"), 10.02, 20.001),
        (1, 1, _ts("2024-01-01T00:10"), 10.03, 20.002),
        (2, 1, _ts("2024-01-01T00:20"), 12.50, 22.500),
        (3, 1, _ts("2024-01-01T00:30"), 10.04, 20.001),
        (4, 1, _ts("2024-01-01T00:40"), 10.05, 20.003),
        (5, 1, _ts("2024-01-01T00:50"), 10.05, 20.499),
        (6, 1, _ts("2024-01-01T01:00"), 10.06, 20.002),
    ]
    pts = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    got = sorted(map(tuple, ev.map_match(pts, ways, 5000.0).collect()),
                 key=lambda r: r[2])
    assert [(r[0], r[1], r[5]) for r in got] == [
        (1, "roadA", 4), (1, "roadB", 1), (1, "roadA", 1)]
    runA = got[0]
    assert runA[3] - runA[2] == runA[4] == 40 * 60 * 1_000_000
    # closest ping of the first run sits 0.001 deg off the road
    import math
    from fagi_spark import geom
    assert math.isclose(runA[6], 0.001 * geom.METERS_PER_DEGREE,
                        rel_tol=1e-9)
    again = sorted(map(tuple,
                       ev.map_match(pts.repartition(5), ways,
                                    5000.0).collect()),
                   key=lambda r: r[2])
    assert again == got


def _hausdorff_bruteforce(pts, shift):
    """All-blocked-pairs symmetric Hausdorff over distinct grid points."""
    byu = {}
    for u, x, y in set(pts):
        byu.setdefault(u, set()).add((x, y))
    blocks = {u: {(x >> shift, y >> shift) for x, y in p}
              for u, p in byu.items()}

    def directed(a, b):
        return max(min((ax - bx) ** 2 + (ay - by) ** 2
                       for bx, by in b) for ax, ay in a)

    out = {}
    users = sorted(byu)
    for i, u1 in enumerate(users):
        for u2 in users[i + 1:]:
            if blocks[u1] & blocks[u2]:
                a, b = byu[u1], byu[u2]
                out[(u1, u2)] = max(directed(a, b), directed(b, a))
    return out


def test_trajectory_hausdorff_bruteforce(spark):
    """Blocked pairs + exact BIGINT Hausdorff vs brute force, with
    duplicate pings (must not change the distance) and a far-away user
    (must produce no pair)."""
    from fagi_spark import events as ev
    pts = ([(1, 3, 4), (1, 5, 6), (1, 3, 4),        # dup ping
            (2, 4, 4), (2, 9, 9),
            (3, 1000, 1000)]                         # isolated block
           + [(4, 7, 2), (4, 8, 8)])
    df = spark.createDataFrame(pts, "user_id long, ix long, iy long")
    got = {(r["user_a"], r["user_b"]): r["hausdorff_d2"]
           for r in ev.trajectory_hausdorff(df, block_shift=4).collect()}
    want = _hausdorff_bruteforce(pts, 4)
    assert got == want
    assert all(u != 3 and v != 3 for u, v in got)
    # symmetry of the metric itself on a hand case
    assert got[(1, 2)] == max((5 - 9) ** 2 + (6 - 9) ** 2,
                              (9 - 5) ** 2 + (9 - 6) ** 2)


def _dtw_recursive(a, b):
    """Independent memoized-recursion DTW ground truth."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def d(i, j):
        c = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
        if i == 0 and j == 0:
            return c
        opts = []
        if i > 0:
            opts.append(d(i - 1, j))
        if j > 0:
            opts.append(d(i, j - 1))
        if i > 0 and j > 0:
            opts.append(d(i - 1, j - 1))
        return c + min(opts)

    return d(len(a) - 1, len(b) - 1)


def test_trajectory_dtw_bruteforce(spark):
    """Engine DTW equals memoized-recursion ground truth on every
    blocked pair; identical paths score 0; order matters (reversed
    path scores strictly worse than Hausdorff would suggest)."""
    from fagi_spark import events as ev
    import sys
    sys.setrecursionlimit(100000)
    seqs = {
        1: [(3, 4), (5, 6), (7, 8), (9, 9)],
        2: [(3, 4), (5, 6), (7, 8), (9, 9)],        # identical to 1
        3: [(9, 9), (7, 8), (5, 6), (3, 4)],        # reversed 1
        4: [(2, 2), (8, 3), (4, 9)],                 # same block, other shape
    }
    rows = [(u, t, x, y) for u, s in seqs.items()
            for t, (x, y) in enumerate(s)]
    df = spark.createDataFrame(rows, "user_id long, t long, ix long, iy long")
    got = {(r["user_a"], r["user_b"]): r["dtw_d2"]
           for r in ev.trajectory_dtw(df, block_shift=4, order=("t",))
           .collect()}
    for (u1, u2), v in got.items():
        assert v == _dtw_recursive(seqs[u1], seqs[u2]), (u1, u2)
    assert got[(1, 2)] == 0
    assert got[(1, 3)] > 0  # order-aware: reversal costs


def test_trajectory_dtw_band(spark):
    """A Sakoe-Chiba band wide enough to cover the optimal alignment
    reproduces the unbanded value exactly."""
    from fagi_spark import events as ev
    seqs = {1: [(i, i) for i in range(10)],
            2: [(i, i + 1) for i in range(10)]}
    rows = [(u, t, x, y) for u, s in seqs.items()
            for t, (x, y) in enumerate(s)]
    df = spark.createDataFrame(rows, "user_id long, t long, ix long, iy long")
    full = ev.trajectory_dtw(df, block_shift=6, order=("t",)).collect()
    band = ev.trajectory_dtw(df, block_shift=6, order=("t",),
                             band=3).collect()
    assert full[0]["dtw_d2"] == band[0]["dtw_d2"] == \
        _dtw_recursive(seqs[1], seqs[2])


def test_heading_octants_known_directions(spark):
    """All 8 compass directions plus diagonals and zero-steps, checked
    against the floor(angle/45) sector definition via math.atan2."""
    import math
    from fagi_spark import events as ev
    # one user stepping through known displacements
    steps = [(3, 0), (2, 2), (0, 4), (-1, 3), (-5, 0), (-2, -2),
             (0, -7), (4, -4), (1, 0), (0, 0), (5, 1), (-3, -1)]
    pos, rows, t = (0, 0), [(1, 0, 1000, 1000)], 0
    for dx, dy in steps:
        t += 1
        pos = (pos[0] + dx, pos[1] + dy)
        rows.append((1, t, pos[0] + 1000, pos[1] + 1000))
    df = spark.createDataFrame(
        [(u, t, x, y) for u, t, x, y in rows],
        "user_id long, us long, ix long, iy long")
    got = {(r["octant"]): (r["n_moves"], r["sum_d2"])
           for r in ev.heading_octants(df, order=("us",))
           .filter(F.col("user_id") == 1).collect()}
    want = {}
    for dx, dy in steps:
        if dx == 0 and dy == 0:
            continue  # dropped
        ang = math.degrees(math.atan2(dy, dx)) % 360.0
        o = int(ang // 45)
        n, s = want.get(o, (0, 0))
        want[o] = (n + 1, s + dx * dx + dy * dy)
    assert got == want
    assert sum(n for n, _ in got.values()) == len(steps) - 1  # one zero-step


def test_knox_statistic_bruteforce(spark):
    """Exact pair counts vs a brute-force O(n^2) scan, and a planted
    space-time cluster drives the ratio above 1."""
    from datetime import datetime, timezone
    from fagi_spark import events as ev
    rows = []
    # planted cluster: 4 events same place, same minute
    for i in range(4):
        rows.append((i, datetime(2024, 1, 1, 0, 0, i), 10.0, 10.0))
    # background: spread in space AND time
    for i in range(12):
        rows.append((100 + i, datetime(2024, 1, 1 + i, 12, 0, 0),
                     10.0 + i * 0.5, 10.0))
    # same place, far apart in time (space-close only)
    rows.append((200, datetime(2024, 6, 1), 10.0, 10.0))
    # same time as cluster, far away (time-close only)
    rows.append((201, datetime(2024, 1, 1, 0, 0, 30), 50.0, 10.0))
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, "
                               "lon double, lat double")
    r, w = 0.05, 3600
    out = ev.knox_statistic(df, radius_deg=r, window_s=w).first()
    import itertools
    pts = [(i, t.replace(tzinfo=timezone.utc).timestamp(), x, y)
           for i, t, x, y in rows]
    n_s = n_t = n_st = 0
    for (i1, t1, x1, y1), (i2, t2, x2, y2) in itertools.combinations(pts, 2):
        cs = (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r * r
        ct = abs(t1 - t2) <= w
        n_s += cs
        n_t += ct
        n_st += cs and ct
    n = len(pts)
    assert (out["n_events"], out["n_pairs"]) == (n, n * (n - 1) // 2)
    assert (out["n_close_s"], out["n_close_t"], out["n_close_st"]) == \
        (n_s, n_t, n_st)
    assert out["knox_ratio"] == n_st * (n * (n - 1) // 2) / (n_s * n_t)
    assert out["knox_ratio"] > 1.0  # planted interaction


# ---- funnel / cohort / ripley / phrase --------------------------------------

def test_funnel_strict_order_bruteforce(spark):
    # user 1: full in-order funnel; user 2: click BEFORE view (strict
    # order blocks stage 3); user 3: signup only; user 4: view-first
    # (never signs up -> stage 0); ties: user 5 has view at the SAME
    # timestamp as signup -> strict '>' must reject it.
    rows = [
        (0, 1, "signup", "2024-01-01T01:00"),
        (1, 1, "view", "2024-01-01T02:00"),
        (2, 1, "click", "2024-01-01T03:00"),
        (3, 1, "purchase", "2024-01-01T04:00"),
        (4, 2, "signup", "2024-01-01T01:00"),
        (5, 2, "click", "2024-01-01T01:30"),   # too early, not view yet
        (6, 2, "view", "2024-01-01T02:00"),
        (7, 3, "signup", "2024-01-01T01:00"),
        (8, 4, "view", "2024-01-01T01:00"),
        (9, 5, "signup", "2024-01-01T01:00"),
        (10, 5, "view", "2024-01-01T01:00"),   # same instant: rejected
        (11, 5, "view", "2024-01-01T01:01"),
    ]
    df = spark.createDataFrame(
        [(i, u, k, _ts(t)) for i, u, k, t in rows],
        "event_id long, user_id long, event_type string, ts timestamp")
    steps = ["signup", "view", "click", "purchase"]
    stages = {r["user_id"]: r["stage"]
              for r in ev.funnel_stages(df, steps).collect()}
    assert stages == {1: 4, 2: 2, 3: 1, 4: 0, 5: 2}
    out = {r["step"]: (r["step_name"], r["n_users"], r["frac_of_first"])
           for r in ev.funnel(df, steps).collect()}
    assert out == {1: ("signup", 4, 1.0), 2: ("view", 3, 0.75),
                   3: ("click", 1, 0.25), 4: ("purchase", 1, 0.25)}


def test_funnel_greedy_equals_sequential_min(spark):
    # randomized-ish stream: greedy fold must equal the sequential-min
    # definition the oracle uses
    import itertools
    steps = ["a", "b", "c"]
    kinds = ["a", "b", "c", "x"]
    rows, eid = [], 0
    for u in range(30):
        for j in range(7):
            k = kinds[(u * 7 + j * 5) % len(kinds)]
            t = f"2024-01-01T{(u + j * 3) % 24:02d}:{(u * j) % 60:02d}"
            rows.append((eid, u, k, _ts(t)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts2 long, event_type string, ts timestamp") \
        .withColumnRenamed("ts2", "user_id")
    got = {r["user_id"]: r["stage"]
           for r in ev.funnel_stages(df, steps).collect()}
    per_user = {}
    for _, u, k, t in [(r[0], r[1], r[2], r[3]) for r in rows]:
        per_user.setdefault(u, []).append((t, k))
    want = {}
    for u, evs in per_user.items():
        stage, last = 0, None
        # sequential-min: for each step, earliest event strictly later
        for s in steps:
            cand = [t for t, k in evs if k == s
                    and (last is None or t > last)]
            if not cand:
                break
            last = min(cand)
            stage += 1
        want[u] = stage
    assert got == want


def test_cohort_retention_handcase(spark):
    rows = [
        (0, 1, "2024-01-02"), (1, 1, "2024-01-10"), (2, 1, "2024-01-20"),
        (3, 2, "2024-01-03"), (4, 2, "2024-01-04"),
        (5, 3, "2024-01-09"), (6, 3, "2024-01-16"),
    ]
    df = spark.createDataFrame(
        [(i, u, _ts(d + "T12:00")) for i, u, d in rows],
        "event_id long, user_id long, ts timestamp")
    out = {(r["cohort_week"], r["week_offset"]):
           (r["n_users"], r["retained_frac"])
           for r in ev.cohort_retention(df).collect()}
    # users 1,2 are week-0 cohort; user 1 active weeks 0,1,2; user 3 is
    # week-1 cohort active weeks 1,2
    assert out == {(0, 0): (2, 1.0), (0, 1): (1, 0.5), (0, 2): (1, 0.5),
                   (1, 0): (1, 1.0), (1, 1): (1, 1.0)}


def test_ripley_k_bruteforce(spark):
    import itertools
    pts = [(i, -7.0 + (i * 13 % 40) / 100.0, 2.0 + (i * 29 % 40) / 100.0)
           for i in range(120)]
    df = spark.createDataFrame(pts, "event_id long, lon double, lat double")
    radii = [0.02, 0.05, 0.11]
    out = {r["r_idx"]: r for r in ev.ripley_k(df, radii).collect()}
    xs = [x for _, x, _ in pts]
    ys = [y for _, _, y in pts]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    n = len(pts)
    for i, r in enumerate(radii):
        naive = sum(
            ((x1 - x2) * (x1 - x2)) + ((y1 - y2) * (y1 - y2)) <= r * r
            for (_, x1, y1), (_, x2, y2) in itertools.combinations(pts, 2))
        row = out[i]
        assert row["n_close"] == naive
        assert row["k_hat"] == area * (2 * naive) / (n * (n - 1))
        import math
        assert row["k_csr"] == math.pi * r * r


def test_phrase_search_overlaps_and_absence(spark):
    from fagi_spark import retrieval
    docs = spark.createDataFrame(
        [(0, "batch batch batch stream"),       # overlapping "batch batch" x2
         (1, "stream table hash join"),
         (2, "table hash stream"),              # wrong order
         (3, None),
         (4, "stream table hash stream table hash")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in retrieval.phrase_search(docs, "batch batch").collect()}
    assert out == {0: (2, 0)}
    out3 = {r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in retrieval.phrase_search(docs, "stream table hash")
            .collect()}
    assert out3 == {1: (1, 0), 4: (2, 0)}


def test_nn_g_function_bruteforce(spark):
    import itertools
    pts = [(i, -7.0 + (i * 13 % 40) / 100.0, 2.0 + (i * 29 % 40) / 100.0)
           for i in range(100)]
    # add one isolated point whose NN is beyond max radius: must count
    # as "beyond r" at every radius
    pts.append((100, -2.0, 6.0))
    df = spark.createDataFrame(pts, "event_id long, lon double, lat double")
    radii = [0.02, 0.05, 0.11]
    out = {r["r_idx"]: r for r in ev.nn_g_function(df, radii).collect()}
    n = len(pts)
    nn = {}
    for (i1, x1, y1) in pts:
        best = min(((x1 - x2) * (x1 - x2)) + ((y1 - y2) * (y1 - y2))
                   for (i2, x2, y2) in pts if i2 != i1)
        nn[i1] = best
    for i, r in enumerate(radii):
        naive = sum(d <= r * r for d in nn.values())
        assert out[i]["n_within"] == naive
        assert out[i]["g_frac"] == naive / n
    assert out[len(radii) - 1]["n_within"] < n  # the isolated point


def test_transition_matrix_handcase(spark):
    rows = [
        (0, 1, "a", "2024-01-01T01:00"), (1, 1, "b", "2024-01-01T02:00"),
        (2, 1, "a", "2024-01-01T03:00"), (3, 1, "b", "2024-01-01T04:00"),
        (4, 2, "a", "2024-01-01T01:00"), (5, 2, "c", "2024-01-01T02:00"),
        (6, 3, "x", "2024-01-01T01:00"),  # single event: no transition
    ]
    df = spark.createDataFrame(
        [(i, u, k, _ts(t)) for i, u, k, t in rows],
        "event_id long, user_id long, event_type string, ts timestamp")
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in ev.transition_matrix(df).collect()}
    assert out == {("a", "b"): (2, 2 / 3), ("a", "c"): (1, 1 / 3),
                   ("b", "a"): (1, 1.0)}


def test_transition_matrix_tie_order_deterministic(spark):
    # two events at the SAME timestamp: event_id breaks the tie
    rows = [(0, 1, "a", "2024-01-01T01:00"),
            (1, 1, "b", "2024-01-01T02:00"),
            (2, 1, "c", "2024-01-01T02:00")]
    df = spark.createDataFrame(
        [(i, u, k, _ts(t)) for i, u, k, t in rows],
        "event_id long, user_id long, event_type string, ts timestamp")
    out = {(r["from_type"], r["to_type"]): r["n"]
           for r in ev.transition_matrix(df).collect()}
    assert out == {("a", "b"): 1, ("b", "c"): 1}


def test_gap_regularity_metronome_vs_bursty(spark):
    rows = []
    # user 1: perfect metronome, 60 s gaps -> cv2 == 0
    for i in range(5):
        rows.append((i, 1, _ts(f"2024-01-01T01:{i:02d}:00")))
    # user 2: bursty gaps 10 s, 10 s, 3600 s
    from datetime import timedelta
    for i, sec in enumerate([0, 10, 20, 3620]):
        rows.append((10 + i, 2,
                     _ts("2024-01-01T02:00:00") + timedelta(seconds=sec)))
    # user 3: single event -> filtered (no gaps)
    rows.append((20, 3, _ts("2024-01-01T03:00:00")))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["user_id"]: r for r in ev.gap_regularity(df).collect()}
    assert set(out) == {1, 2}
    m = out[1]
    assert (m["n_gaps"], m["sum_gap_s"], m["sumsq_gap_s"]) == \
        (4, 240, 4 * 3600)
    assert m["cv2"] == 0.0
    b = out[2]
    gaps = [10, 10, 3600]
    n, s, q = len(gaps), sum(gaps), sum(g * g for g in gaps)
    assert (b["n_gaps"], b["sum_gap_s"], b["sumsq_gap_s"]) == (n, s, q)
    mean = s / n
    assert b["cv2"] == (q / n - mean * mean) / (mean * mean)
    assert b["cv2"] > 0.5


def test_decayed_cell_counts_handcase(spark):
    # half-life 1 day, horizon 3: weight 1 << (3 - age//1d), zero for
    # future events and events older than 3 half-lives.
    now = "2024-01-10 00:00:00"
    rows = [
        (0.0, _ts("2024-01-10T00:00:00")),   # age 0d   -> w 8
        (0.0, _ts("2024-01-09T00:00:00")),   # age 1d   -> w 4
        (0.0, _ts("2024-01-08T00:00:00")),   # age 2d   -> w 2
        (0.0, _ts("2024-01-06T12:00:00")),   # age 3.5d -> w 1
        (0.0, _ts("2024-01-05T00:00:00")),   # age 4d   -> w 0
        (0.0, _ts("2024-01-10T01:00:00")),   # future   -> w 0
        (50.0, _ts("2024-01-09T12:00:00")),  # other cell, age 0.5d -> w 8
    ]
    df = spark.createDataFrame(rows, "lon double, ts timestamp") \
        .withColumn("lat", F.lit(0.0))
    got = {r.cell: (r.n_events, r.sum_w, r.decayed_score)
           for r in ev.decayed_cell_counts(
               df, res=4, now=now, half_life_s=86400, horizon=3).collect()}
    assert len(got) == 2
    by_n = sorted(got.values())
    # hot cell: all 6 events counted, weights 8+4+2+1 = 15, / 2^3
    assert by_n[1] == (6, 15, 15.0 / 8.0)
    assert by_n[0] == (1, 8, 1.0)


def test_cell_burst_scores_handcase(spark):
    import math
    # one cell, daily periods: counts [3, 0, 0] (day 2 zero-completed
    # via the global range spanned by the other cell), burst on day 0.
    rows = [(0.0, _ts("2024-01-01T01:00:00")),
            (0.0, _ts("2024-01-01T02:00:00")),
            (0.0, _ts("2024-01-01T03:00:00")),
            # second cell keeps the global range at 3 days
            (50.0, _ts("2024-01-01T12:00:00")),
            (50.0, _ts("2024-01-02T12:00:00")),
            (50.0, _ts("2024-01-03T12:00:00"))]
    df = spark.createDataFrame(rows, "lon double, ts timestamp") \
        .withColumn("lat", F.lit(0.0))
    out = ev.cell_burst_scores(df, res=4, period_s=86400).collect()
    assert len(out) == 6
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, {})[r.period - min(
            x.period for x in out)] = r
    bursty = [c for c, d in by_cell.items()
              if {p: r.cnt for p, r in d.items()} == {0: 3, 1: 0, 2: 0}][0]
    d = by_cell[bursty]
    # n=3, S=3, Q=9: z(3) = (9-3)/sqrt(27-9), z(0) = -3/sqrt(18)
    assert d[0].z_score == 6.0 / math.sqrt(18.0)
    assert d[1].z_score == -3.0 / math.sqrt(18.0)
    assert d[0].n_periods == 3
    # constant-series cell: counts [1,1,1] -> zero variance -> NULL
    flat = [c for c in by_cell if c != bursty][0]
    assert all(r.z_score is None for r in by_cell[flat].values())


def test_radius_of_gyration_handcase(spark):
    import math
    # res 4 -> 16x16 world grid, cells 22.5 deg wide; points chosen
    # at cell centers so ix/iy are unambiguous.
    rows = [  # user 1: square of 4 cells -> rg = sqrt(1/2)
        (1, -180.0 + 22.5 * 4, -90.0 + 11.25 * 4),
        (1, -180.0 + 22.5 * 5, -90.0 + 11.25 * 4),
        (1, -180.0 + 22.5 * 4, -90.0 + 11.25 * 6),
        (1, -180.0 + 22.5 * 5, -90.0 + 11.25 * 6),
        # user 2: single ping -> rg 0
        (2, 0.0, 0.0),
        # user 3: two pings 3 cells apart in x -> rg = 1.5
        (3, -180.0 + 22.5 * 2, 0.0),
        (3, -180.0 + 22.5 * 5, 0.0)]
    df = spark.createDataFrame(rows, "user_id long, lon double, lat double")
    got = {r.user_id: r for r in
           ev.radius_of_gyration(df, res=4).collect()}
    # grid: ix = floor((lon+180)/360*16), iy = floor((lat+90)/180*16)
    # -> user 1 occupies (4,4),(5,4),(4,6),(5,6): a 1x2-cell rectangle
    assert got[1].n_pings == 4
    # mean-free identity cross-check in exact ints
    pts1 = [(4, 4), (5, 4), (4, 6), (5, 6)]
    n = 4
    sx = sum(p[0] for p in pts1); sy = sum(p[1] for p in pts1)
    q = sum(p[0] ** 2 + p[1] ** 2 for p in pts1)
    assert got[1].rg2_num == n * q - sx * sx - sy * sy == 20
    assert got[1].rg_cells == math.sqrt(20.0 / 16.0)
    assert got[2].rg2_num == 0 and got[2].rg_cells == 0.0
    assert got[3].rg2_num == 2 * (2 ** 2 + 5 ** 2) - 49 == 9
    assert got[3].rg_cells == math.sqrt(9.0 / 4.0)


def test_cross_k_bruteforce_parity(spark):
    import math
    # deterministic clustered two-class pattern on the 0.01 grid
    pts = []
    for i in range(60):
        x = round((i * 7 % 40) * 0.01, 2)
        y = round((i * 13 % 30) * 0.01, 2)
        pts.append((i, 1 if i % 2 == 0 else 0, x, y))
    df = spark.createDataFrame(pts, "event_id long, cls int, "
                               "lon double, lat double")
    radii = [0.02, 0.05, 0.11]
    got = {r.r_idx: r for r in
           ev.cross_k(df, radii, "cls", 1, 0, res=9).collect()}
    pa = [(x, y) for _, c, x, y in pts if c == 1]
    pb = [(x, y) for _, c, x, y in pts if c == 0]
    xs = [x for _, _, x, _ in pts]; ys = [y for _, _, _, y in pts]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    for i, r in enumerate(sorted(radii)):
        n = sum(1 for ax, ay in pa for bx, by in pb
                if ((ax - bx) * (ax - bx)) + ((ay - by) * (ay - by))
                <= r * r)
        assert got[i].n_close == n, r
        assert got[i].k_ab == (area * float(n)) / float(len(pa) * len(pb))
        assert got[i].k_csr == math.pi * r * r


def test_quadrat_stats_handcase(spark):
    # res 4 grid; 6 points: 4 in one cell, 1 each in two others, bbox
    # spans 2x2 = 4 quadrats (one empty).
    rows = [(-180.0, -90.0)] * 4 + [(-150.0, -90.0), (-180.0, -75.0)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    [r] = ev.quadrat_stats(df, res=4).collect()
    # cells: (0,0)x4, (1,0), (0,1): bbox 2x2 -> Q=4, S=6, ss=16+1+1=18
    assert (r.n_points, r.n_quadrats, r.sum_sq) == (6, 4, 18)
    chi2 = (4 * 18 - 36) / 6.0
    assert r.chi2 == chi2
    assert r.vmr == chi2 / 3.0
    # brute-force chi-square over ALL quadrats incl. the empty one
    counts = [4, 1, 1, 0]
    mean = 6 / 4
    brute = sum((c - mean) ** 2 for c in counts) / mean
    assert abs(chi2 - brute) < 1e-12


def test_teleport_flags_handcase(spark):
    # res 4 cells are 22.5 deg: user 1 hops a full cell in 1s (flag),
    # then stays put for an hour (no flag), then crosses one cell in
    # 10 days at 1 cell/3600s limit (no flag: d2*den^2 = 1*3600^2 <
    # (864000)^2), then same-second move (flag, dt=0).
    rows = [
        (1, 0, -180.0, 0.0, _ts("2024-01-01T00:00:00")),
        (1, 1, -157.5, 0.0, _ts("2024-01-01T00:00:01")),   # 1 cell in 1s
        (1, 2, -157.5, 0.0, _ts("2024-01-01T01:00:01")),   # no move
        (1, 3, -135.0, 0.0, _ts("2024-01-11T01:00:01")),   # slow
        (1, 4, -112.5, 0.0, _ts("2024-01-11T01:00:01")),   # dt=0 move
        (2, 5, 0.0, 0.0, _ts("2024-01-01T00:00:00"))]      # lone ping
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon double, lat double, "
              "ts timestamp")
    got = {(r.from_event, r.to_event): r for r in ev.teleport_flags(
        df, res=4, max_speed_num=1, max_speed_den_s=3600).collect()}
    assert set(got) == {(0, 1), (3, 4)}
    assert got[(0, 1)].dt_s == 1 and got[(0, 1)].d2_cells == 1
    assert got[(3, 4)].dt_s == 0 and got[(3, 4)].d2_cells == 1


def test_od_flow_lift_handcase(spark):
    # moves: A->B x2, A->C x1, B->C x1 (stays dropped by od_flows)
    rows = [
        (1, 0, -180.0, 0.0, _ts("2024-01-01T00:00:00")),  # A
        (1, 1, -157.5, 0.0, _ts("2024-01-01T01:00:00")),  # B
        (2, 2, -180.0, 0.0, _ts("2024-01-01T00:00:00")),  # A
        (2, 3, -157.5, 0.0, _ts("2024-01-01T01:00:00")),  # B
        (2, 4, -135.0, 0.0, _ts("2024-01-01T02:00:00")),  # C
        (3, 5, -180.0, 0.0, _ts("2024-01-01T00:00:00")),  # A
        (3, 6, -135.0, 0.0, _ts("2024-01-01T01:00:00"))]  # C
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon double, lat double, "
              "ts timestamp")
    out = ev.od_flow_lift(df, res=4).collect()
    by = {(r.from_cell, r.to_cell): r for r in out}
    assert len(by) == 3
    moves = sorted((r.n_moves, r.out_total, r.in_total, r.lift)
                   for r in out)
    # total=4; A->B: n=2 out(A)=3 in(B)=2 -> lift 8/6; A->C: 4/6;
    # B->C: n=1 out(B)=1 in(C)=2 -> lift 2
    assert moves == [(1, 1, 2, (1 * 4) / float(1 * 2)),
                     (1, 3, 2, (1 * 4) / float(3 * 2)),
                     (2, 3, 2, (2 * 4) / float(3 * 2))]


def test_colocation_quotient_handcase(spark):
    # every A point's nearest neighbor is a B point (planted pairs far
    # apart); B's global share is 4/7 -> CLQ = (4/4)/(4/6) = 1.5
    rows = []
    for i in range(4):
        x = i * 2.0
        rows.append((10 + i, 1, x, 0.0))        # A
        rows.append((20 + i, 0, x + 0.01, 0.0))  # its B partner
    rows = rows[:-1]  # drop last B -> 4 A, 3 B... recompute below
    df = spark.createDataFrame(
        rows, "event_id long, cls int, lon double, lat double")
    [r] = ev.colocation_quotient(df, "cls", 1, 0, 0.05, res=9).collect()
    n_total = len(rows)
    n_b = sum(1 for _, c, _, _ in rows if c == 0)
    # A #3 has no neighbor within 0.05 (its partner was dropped;
    # nearest other point is 2 deg away) -> drops from N_A'
    assert (r.n_total, r.n_b) == (n_total, n_b)
    assert (r.n_a_with_nn, r.c_ab) == (3, 3)
    assert r.clq == (3.0 / 3.0) / (n_b / float(n_total - 1))
    # reverse direction is a different quotient (asymmetry)
    [rv] = ev.colocation_quotient(df, "cls", 0, 1, 0.05, res=9).collect()
    assert rv.c_ab == rv.n_a_with_nn == 3
    assert rv.clq == (3.0 / 3.0) / (4.0 / float(n_total - 1))


def test_dwell_times_handcase(spark):
    # user 1: two pings in A (gap 300s), hop to B (transit 600s,
    # contributes nowhere), two pings in B (gap 60s), return to A
    # (gap 900s transit) + one more A ping (gap 30s)
    rows = [
        (1, 0, -179.0, 0.0, _ts("2024-01-01T00:00:00")),   # A
        (1, 1, -179.0, 0.0, _ts("2024-01-01T00:05:00")),   # A +300
        (1, 2, -150.0, 0.0, _ts("2024-01-01T00:15:00")),   # B (transit)
        (1, 3, -150.0, 0.0, _ts("2024-01-01T00:16:00")),   # B +60
        (1, 4, -179.0, 0.0, _ts("2024-01-01T00:31:00")),   # A (transit)
        (1, 5, -179.0, 0.0, _ts("2024-01-01T00:31:30")),   # A +30
        (2, 6, 0.0, 0.0, _ts("2024-01-01T00:00:00"))]      # lone ping
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon double, lat double, "
              "ts timestamp")
    got = {(r.user_id, r.cell): (r.n_stays, r.dwell_s)
           for r in ev.dwell_times(df, res=4).collect()}
    from fagi_spark import cells
    ca = cells.pack_cell_value(int((-179.0 + 180) / 360 * 16),
                               int(90 / 180 * 16), 4)
    cb = cells.pack_cell_value(int((-150.0 + 180) / 360 * 16),
                               int(90 / 180 * 16), 4)
    assert got == {(1, ca): (2, 330), (1, cb): (1, 60)}


def test_od_stationary_handcase(spark):
    # 3-cell cycle A->B->C->A with one user looping: transition matrix
    # is a pure rotation, so mass stays uniform at every step
    rows = []
    lons = [-179.0, -150.0, -120.0]
    t = 0
    for lap in range(3):
        for lon in lons:
            rows.append((1, t, lon, 0.0, _ts("2024-01-01T00:00:00")))
            t += 1
    rows = [(u, i, lon, lat,
             _ts("2024-01-01T00:00:00").replace(minute=i))
            for (u, i, lon, lat, _) in rows]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon double, lat double, "
              "ts timestamp")
    out = {r.cell: r.mass for r in
           ev.od_stationary(df, res=4, iters=4,
                            deterministic=True).collect()}
    assert len(out) == 3
    assert all(abs(m - 1.0 / 3.0) < 1e-15 for m in out.values())
    # absorbing sink: A->B only; all mass reaches B then leaks
    # (B has no out-moves), mirroring pagerank's dangling convention
    rows2 = [(1, 0, -179.0, 0.0, _ts("2024-01-01T00:00:00")),
             (1, 1, -150.0, 0.0, _ts("2024-01-01T00:01:00"))]
    df2 = spark.createDataFrame(
        rows2, "user_id long, event_id long, lon double, lat double, "
               "ts timestamp")
    m1 = {r.cell: r.mass for r in
          ev.od_stationary(df2, res=4, iters=1).collect()}
    m2 = {r.cell: r.mass for r in
          ev.od_stationary(df2, res=4, iters=2).collect()}
    assert sorted(m1.values()) == [0.0, 1.0]   # all mass at B
    assert sorted(m2.values()) == [0.0, 0.0]   # leaked (dangling)


def test_routine_index_handcase(spark):
    # user 1: 3 of 4 events Monday 9h (1970-01-05 was a Monday ->
    # wd=(d+4)%7 with 0=Sunday gives 1); user 2: flat across buckets
    rows = [
        (1, _ts("2024-01-01T09:10:00")),  # Mon 9h (2024-01-01 is Monday)
        (1, _ts("2024-01-08T09:50:00")),  # Mon 9h
        (1, _ts("2024-01-15T09:05:00")),  # Mon 9h
        (1, _ts("2024-01-02T14:00:00")),  # Tue 14h
        (2, _ts("2024-01-01T08:00:00")),
        (2, _ts("2024-01-02T09:00:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.user_id: r for r in ev.routine_index(df).collect()}
    r1 = got[1]
    assert (r1.n_events, r1.top_count) == (4, 3)
    assert (r1.top_weekday, r1.top_hour) == (1, 9)  # Monday=1, 9h UTC
    assert r1.routine_frac == 3.0 / 4.0
    # flat user: tie -> smallest (weekday, hour) bucket wins
    r2 = got[2]
    assert r2.top_count == 1 and r2.routine_frac == 0.5
    assert (r2.top_weekday, r2.top_hour) == (1, 8)


def test_cell_temporal_autocorr_handcase(spark):
    import math
    # one cell alternating 3,1,3,1 across 4 days (plus a second cell
    # to widen the global range is unnecessary here): pairs
    # (3,1),(1,3),(3,1) -> perfect negative-ish correlation r=-1
    rows = []
    for d, n in enumerate([3, 1, 3, 1]):
        for _ in range(n):
            rows.append((0.0, _ts(f"2024-01-0{d + 1}T12:00:00")))
    # rising cell 0,?: use second cell with strictly rising 1,2,3,4
    for d, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            rows.append((50.0, _ts(f"2024-01-0{d + 1}T12:00:00")))
    df = spark.createDataFrame(rows, "lon double, ts timestamp") \
        .withColumn("lat", F.lit(0.0))
    got = {r.cell: r for r in ev.cell_temporal_autocorr(
        df, res=4, period_s=86400).collect()}
    assert len(got) == 2
    vals = sorted((r.n_pairs, r.r1) for r in got.values())

    def tree(xs, ys):
        m = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        return float(m * sxy - sx * sy) / (
            math.sqrt(float(m * sxx - sx * sx))
            * math.sqrt(float(m * syy - sy * sy)))

    # alternating (3,1,3)/(1,3,1): r ~ -1 through the same IEEE tree
    want_neg = tree([3, 1, 3], [1, 3, 1])
    want_pos = tree([1, 2, 3], [2, 3, 4])
    assert any(r1 == want_neg for _, r1 in vals)
    assert any(r1 == want_pos for _, r1 in vals)
    assert abs(want_neg + 1.0) < 1e-12 and abs(want_pos - 1.0) < 1e-12
    assert all(n == 3 for n, _ in vals)
    # constant series -> NULL
    const = spark.createDataFrame(
        [(90.0, _ts(f"2024-01-0{d}T00:00:00")) for d in (1, 2, 3)],
        "lon double, ts timestamp").withColumn("lat", F.lit(0.0))
    [r] = ev.cell_temporal_autocorr(const, res=4, period_s=86400).collect()
    assert r.r1 is None


def test_cotravelers_handcase(spark):
    # users 1,2 meet in 2 distinct buckets; 1,3 once; crowd bucket
    # (users 10..19 all present) capped away
    rows = [
        (1, -179.0, _ts("2024-01-01T01:00:00")),
        (2, -179.0, _ts("2024-01-01T02:00:00")),   # bucket 0 meet
        (1, -150.0, _ts("2024-01-02T01:00:00")),
        (2, -150.0, _ts("2024-01-02T01:30:00")),   # second meet
        (3, -179.0, _ts("2024-01-01T03:00:00")),   # meets 1 once
    ]
    rows += [(10 + i, 0.0, _ts("2024-01-05T00:30:00")) for i in range(10)]
    df = spark.createDataFrame(rows, "user_id long, lon double, "
                               "ts timestamp").withColumn("lat", F.lit(0.0))
    got = {(r.user_a, r.user_b): r.n_meets for r in ev.cotravelers(
        df, res=4, window_s=6 * 3600, min_meets=2,
        max_bucket_users=5).collect()}
    assert got == {(1, 2): 2}
    # without the cap the crowd pairs flood in at min_meets=1
    uncapped = ev.cotravelers(df, res=4, window_s=6 * 3600,
                              min_meets=1).collect()
    assert len(uncapped) >= 45  # C(10,2) crowd pairs + the real ones


def test_place_concentration_handcase(spark):
    # user 1: cells A x3, B x2, C x1 -> top-2 share 5/6;
    # user 2: one cell -> 1.0
    rows = ([(1, -179.0)] * 3 + [(1, -150.0)] * 2 + [(1, -120.0)]
            + [(2, 0.0)] * 4)
    df = spark.createDataFrame(rows, "user_id long, lon double") \
        .withColumn("lat", F.lit(0.0)) \
        .withColumn("ts", F.lit(_ts("2024-01-01T00:00:00")))
    got = {r.user_id: r for r in ev.place_concentration(
        df, res=4, top_k=2).collect()}
    r1 = got[1]
    assert (r1.n_pings, r1.n_cells, r1.top_count) == (6, 3, 5)
    assert r1.top_frac == 5.0 / 6.0
    r2 = got[2]
    assert (r2.n_cells, r2.top_frac) == (1, 1.0)


def test_jump_lengths_handcase(spark):
    # user hops 0, 1, 1, 3 cells (res 4, 22.5-deg cells)
    rows = [
        (1, 0, -180.0 + 22.5 * 0, _ts("2024-01-01T00:00:00")),
        (1, 1, -180.0 + 22.5 * 0, _ts("2024-01-01T00:01:00")),  # 0
        (1, 2, -180.0 + 22.5 * 1, _ts("2024-01-01T00:02:00")),  # 1
        (1, 3, -180.0 + 22.5 * 2, _ts("2024-01-01T00:03:00")),  # 1
        (1, 4, -180.0 + 22.5 * 5, _ts("2024-01-01T00:04:00")),  # 3
        (2, 5, 0.0, _ts("2024-01-01T00:00:00"))]                # lone
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lon double, ts timestamp") \
        .withColumn("lat", F.lit(0.0))
    got = {r.jump_cells: r.n_moves for r in
           ev.jump_lengths(df, res=4).collect()}
    assert got == {0: 1, 1: 2, 3: 1}


def test_st_cube_levels_consistent(spark):
    from fagi_spark import events as ev
    import pyspark.sql.functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "user_id",
        ((F.col("user_id") * 37 % 1600) / 100.0 - 8.0).alias("lon"),
        ((F.col("user_id") * 53 % 800) / 100.0).alias("lat"))
    out = ev.st_cube(e, res=6).collect()
    by_lvl = {}
    for r in out:
        by_lvl.setdefault(r.lvl, []).append(r)
    assert set(by_lvl) == {0, 1, 2, 3}
    total = by_lvl[3][0]
    n = e.count()
    assert total.n_events == n
    assert total.n_users == e.select("user_id").distinct().count()
    # every roll-up level re-sums the finest level's event counts
    assert sum(r.n_events for r in by_lvl[0]) == n
    assert sum(r.n_events for r in by_lvl[1]) == n
    assert sum(r.n_events for r in by_lvl[2]) == n
    # cell-only level: NULL day, non-NULL cell
    assert all(r.day is None and r.cell_x is not None for r in by_lvl[1])
    assert all(r.cell_x is None and r.day is not None for r in by_lvl[2])


def test_mad_anomalies_planted_burst(spark):
    from fagi_spark import events as ev
    import datetime as dt
    import pyspark.sql.functions as F

    # one cell, 11 quiet days of 10 events, 1 burst day of 100
    rows = []
    for d in range(11):
        for i in range(10):
            rows.append((dt.datetime(2024, 1, 1 + d, 12, 0, 0),))
    for i in range(100):
        rows.append((dt.datetime(2024, 1, 12, 12, 0, 0),))
    df = spark.createDataFrame(rows, "ts timestamp").select(
        "ts", F.lit(1.0).alias("lon"), F.lit(2.0).alias("lat"))
    out = {r.day.isoformat(): r for r in
           ev.mad_anomalies(df, res=6).collect()}
    assert len(out) == 12
    assert all(r.med == 10 and r.mad == 0 for r in out.values())
    # MAD 0 (constant traffic): only the burst day deviates
    flags = {d: r.is_anomaly for d, r in out.items()}
    assert flags["2024-01-12"] is True
    assert sum(flags.values()) == 1


def test_od_ipf_balance_properties(spark):
    from fagi_spark import events as ev
    import pyspark.sql.functions as F

    flows = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 30), (2, 1, 5), (2, 3, 5),
         (3, 1, 20), (3, 2, 20)],
        "from_cell long, to_cell long, n_moves long")
    out = ev.od_ipf_balance(flows).collect()
    rows = {(r.from_cell, r.to_cell): r.w for r in out}
    # after the row pass each origin summed to 1; the column pass
    # rescales within each destination, so columns sum to exactly 1
    import collections
    cols = collections.defaultdict(float)
    for (f, t), w in rows.items():
        cols[t] += w
    for t, s in cols.items():
        assert abs(s - 1.0) < 1e-12, (t, s)
    # w preserves within-row ordering of the raw counts
    assert rows[(1, 3)] > rows[(1, 2)]
    # two rounds move row sums back toward 1 (Sinkhorn convergence)
    out2 = {(r.from_cell, r.to_cell): r.w
            for r in ev.od_ipf_balance(flows, n_rounds=2).collect()}
    rs1 = collections.defaultdict(float)
    rs2 = collections.defaultdict(float)
    for (f, t), w in rows.items():
        rs1[f] += w
    for (f, t), w in out2.items():
        rs2[f] += w
    worst1 = max(abs(s - 1) for s in rs1.values())
    worst2 = max(abs(s - 1) for s in rs2.values())
    assert worst2 <= worst1 + 1e-12


def test_theil_sen_outlier_resistant(spark):
    from fagi_spark import events as ev
    import datetime as dt
    import pyspark.sql.functions as F

    # linear growth 10,12,...,28 with one wild burst day
    rows = []
    for d in range(10):
        n = 500 if d == 5 else 10 + 2 * d
        for i in range(n):
            rows.append((dt.datetime(2024, 3, 1 + d, 8, 0, 0),))
    df = spark.createDataFrame(rows, "ts timestamp").select(
        "ts", F.lit(1.0).alias("lon"), F.lit(2.0).alias("lat"))
    out = ev.theil_sen_trend(df, res=6).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 10 and r.n_pairs == 45
    # robust slope stays at the underlying 2/day despite the 500-burst
    assert abs(r.slope - 2.0) < 0.75
    assert abs(r.slope_num / r.slope_den - r.slope) < 1e-12


def test_dtw_max_len_guard(spark):
    """r4 verdict item 7: the O(n*m) blowup guard. Long sequences fail
    loudly by default; overflow='truncate' cuts to the first max_len
    points in order; short sequences are unaffected by the guard."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [("a", i, 10 + i, 20) for i in range(30)]
    rows += [("b", i, 10 + i, 21) for i in range(30)]
    df = spark.createDataFrame(rows, "user_id string, us long, ix long, iy long")
    base = {(r.user_a, r.user_b): r.dtw_d2
            for r in ev.trajectory_dtw(df, 8).collect()}
    assert base  # a-b share a block

    guarded = ev.trajectory_dtw(df, 8, max_len=10)
    with pytest.raises((Py4JJavaError, Exception), match="max_len"):
        guarded.collect()

    # truncate: identical to running on the first-10-points input
    trunc = {(r.user_a, r.user_b): r.dtw_d2
             for r in ev.trajectory_dtw(
                 df, 8, max_len=10, overflow="truncate").collect()}
    short = spark.createDataFrame([r for r in rows if r[1] < 10],
                                  "user_id string, us long, ix long, iy long")
    want = {(r.user_a, r.user_b): r.dtw_d2
            for r in ev.trajectory_dtw(short, 8).collect()}
    assert trunc == want
    # guard is a no-op for in-bound sequences
    same = {(r.user_a, r.user_b): r.dtw_d2
            for r in ev.trajectory_dtw(df, 8, max_len=30).collect()}
    assert same == base

    with pytest.raises(ValueError, match="overflow"):
        ev.trajectory_dtw(df, 8, overflow="bogus")
