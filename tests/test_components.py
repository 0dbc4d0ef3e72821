"""Connected components + near-dup clustering (components.py)."""

import pytest
from pyspark.sql import functions as F

from fagi_spark import components, synth, textops


def _cc_bruteforce(edges, nodes=()):
    """Union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    for n in nodes:
        find(n)
    return {x: find(x) for x in parent}


def test_cc_long_chain(spark):
    """A 60-node chain converges (log^2 rounds, not diameter rounds)
    to a single min-rooted component."""
    edges = [(i, i + 1) for i in range(60)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in components.connected_components(e).collect()}
    assert got == {i: 0 for i in range(61)}


def test_cc_multi_cluster_dirty_edges(spark):
    """Duplicates, reversed orientation and self-loops do not change
    the result; isolated nodes from the nodes frame map to
    themselves."""
    edges = [(5, 3), (3, 5), (3, 3), (7, 9), (9, 11), (11, 7), (20, 21)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in [3, 5, 7, 9, 11, 20, 21, 99]],
                                  "doc_id long")
    got = {r["node"]: r["component"]
           for r in components.connected_components(
               e, nodes=nodes, node_col="doc_id").collect()}
    want = _cc_bruteforce([(a, b) for a, b in edges if a != b],
                          nodes=[3, 5, 7, 9, 11, 20, 21, 99])
    assert got == want
    assert got[99] == 99  # isolated


def test_cc_empty_edges(spark):
    e = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r["node"]: r["component"]
           for r in components.connected_components(
               e, nodes=nodes, node_col="doc_id").collect()}
    assert got == {1: 1, 2: 2}


def test_cc_random_graph_matches_union_find(spark):
    import random
    rnd = random.Random(7)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in components.connected_components(e).collect()}
    want = _cc_bruteforce([(a, b) for a, b in edges if a != b])
    assert got == want


def test_verify_pairs_matches_corpus_jaccard(spark):
    """Per-pair verification gives the same jaccard values as the
    corpus-wide shingle-join operator on the pairs both report."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),
         (3, "one two three four five six"),
         (4, "completely different words here now")],
        "doc_id long, text string")
    all_pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in components.verify_pairs(docs, all_pairs,
                                            threshold=0.1).collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in textops.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    for k, v in got.items():
        assert want[k] == v
    assert (1, 2) in got and (3, 4) not in got


def test_neardup_clusters_and_dedup(spark):
    """Planted duplicate family: base doc + two near-copies cluster
    together; dedup_near keeps exactly the min id of each cluster and
    every singleton."""
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    rows = [(0, base), (1, base + " extra"), (2, "prefix " + base)]
    rows += [(10 + i, f"unique document number {i} with words " +
              " ".join(f"w{i}x{j}" for j in range(20)))
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    comp = {r["node"]: r["component"]
            for r in components.neardup_clusters(
                docs, threshold=0.3).collect()}
    assert comp[0] == comp[1] == comp[2] == 0
    for i in range(5):
        assert comp[10 + i] == 10 + i
    kept = sorted(r["doc_id"]
                  for r in components.dedup_near(docs, threshold=0.3).collect())
    assert kept == [0, 10, 11, 12, 13, 14]


def test_dedup_near_longest_policy(spark):
    """policy="longest" keeps the fullest capture per cluster: doc 2
    (21 words: "prefix " + base) beats docs 0 (20) and 1 (21 words,
    tie broken by min id... doc 1 is base+" extra" = 21 words too, so
    the tie-break picks min(node)=1 over 2). Singletons all survive;
    min_key and longest differ on the planted cluster."""
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    rows = [(0, base), (1, base + " extra"), (2, "prefix " + base)]
    rows += [(10 + i, f"unique document number {i} with words " +
              " ".join(f"w{i}x{j}" for j in range(20)))
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in components.dedup_near(
        docs, policy="longest", threshold=0.3).collect())
    # docs 1 and 2 both have 21 words > doc 0's 20; tie -> min id 1
    assert kept == [1, 10, 11, 12, 13, 14]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        components.dedup_near(docs, policy="nope")


def test_cc_randomized_many_seeds_match_union_find(spark):
    """Randomized parity sweep (SURVEY §5.5 style): across graph shapes
    — sparse, dense, chain-heavy, star-heavy — the star-contraction
    result equals union-find exactly."""
    import random
    for seed, n_nodes, n_edges in [(1, 30, 10), (2, 50, 120), (3, 80, 40),
                                   (4, 120, 60), (5, 25, 300)]:
        rnd = random.Random(seed)
        edges = [(rnd.randrange(n_nodes), rnd.randrange(n_nodes))
                 for _ in range(n_edges)]
        if seed == 3:  # chain-heavy: splice in long paths
            edges += [(i, i + 1) for i in range(0, 70)]
        if seed == 4:  # star-heavy: one hub
            edges += [(0, i) for i in range(60, 110)]
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["node"]: r["component"]
               for r in components.connected_components(e).collect()}
        want = _cc_bruteforce([(a, b) for a, b in edges if a != b])
        assert got == want, f"seed {seed}"


def test_cc_max_iter_raises(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(40)],
                              "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        components.connected_components(e, max_iter=1)


def test_minhash_hot_bucket_guard_preserves_components(spark):
    """A planted mega-cluster of identical docs: the capped candidate
    set is linear (star edges) yet connected-components equals the
    uncapped result; normal-size buckets keep exhaustive pairs."""
    from fagi_spark import components, textops
    from pyspark.sql import functions as F
    rows = ([(i, "the same boilerplate mirror page body here") for i in range(40)]
            + [(100 + i, f"unique doc {i} talks about topic {i} alone x y z w")
               for i in range(10)]
            + [(200, "a near pair first variant alpha beta gamma delta"),
               (201, "a near pair first variant alpha beta gamma delta")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = textops.minhash_candidates(df, num_hashes=8, bands=2)
    capped = textops.minhash_candidates(df, num_hashes=8, bands=2,
                                        max_bucket=5)
    n_full, n_capped = full.count(), capped.count()
    assert n_full >= 40 * 39 // 2          # quadratic blowup uncapped
    assert n_capped < n_full / 5           # star edges are linear
    cc_full = components.connected_components(full, "id_a", "id_b")
    cc_capped = components.connected_components(capped, "id_a", "id_b")
    lab_full = {(r[0], r[1]) for r in cc_full.collect()}
    lab_capped = {(r[0], r[1]) for r in cc_capped.collect()}
    assert lab_full == lab_capped


def test_pagerank_cycle_and_star(spark):
    """Hand graphs: a 2-cycle converges to 0.5/0.5; in a star all
    leaves point at the hub, so the hub outranks every leaf and ranks
    sum to ~1 on dangling-free graphs (mass conserved)."""
    from fagi_spark import components
    cyc = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    r = {x.node: x.rank for x in
         components.pagerank(cyc, iters=20).collect()}
    assert abs(r[0] - 0.5) < 1e-12 and abs(r[1] - 0.5) < 1e-12
    # star with back-edges (hub -> each leaf) so nothing dangles
    edges = [(i, 9) for i in range(9)] + [(9, i) for i in range(9)]
    star = spark.createDataFrame(edges, "src long, dst long")
    ranks = {x.node: x.rank for x in
             components.pagerank(star, iters=30).collect()}
    assert all(ranks[9] > ranks[i] for i in range(9))
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_deterministic_equals_sum_path(spark):
    """The oracle-mode sorted fold and the scale-path plain SUM agree
    to float tolerance on a pseudo-random dangling-free graph, and the
    deterministic path is bit-stable across runs."""
    from fagi_spark import components
    n = 97
    edges = [(i, (i * 31 + 7) % n) for i in range(n)] \
        + [(i, (i * 17 + 3) % n) for i in range(n)]
    e = spark.createDataFrame(edges, "src long, dst long")
    det1 = {x.node: x.rank for x in
            components.pagerank(e, iters=4, deterministic=True).collect()}
    det2 = {x.node: x.rank for x in
            components.pagerank(e, iters=4, deterministic=True).collect()}
    fast = {x.node: x.rank for x in
            components.pagerank(e, iters=4, checkpoint_every=2).collect()}
    assert det1 == det2                      # bit-stable
    assert set(fast) == set(det1)
    assert all(abs(fast[k] - det1[k]) < 1e-12 for k in det1)


def test_hits_bipartite_and_sum_path(spark):
    """On a pure bipartite graph {0,1,2} -> {3,4}, the left side are
    pure hubs (auth 0) and the right pure authorities (hub 0); node 3
    with two in-edges out-scores node 4 with one; each L1-normalized
    score vector sums to ~1. The scale-path plain SUM matches the
    deterministic sorted fold to float tolerance, and the
    deterministic path is bit-stable across runs."""
    from fagi_spark import components
    bi = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 4)], "src long, dst long")
    r = {x.node: (x.hub, x.auth) for x in
         components.hits(bi, iters=3).collect()}
    assert r[0][1] == 0.0 and r[1][1] == 0.0 and r[2][1] == 0.0
    assert r[3][0] == 0.0 and r[4][0] == 0.0
    assert r[3][1] > r[4][1] > 0.0
    assert abs(sum(h for h, _ in r.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in r.values()) - 1.0) < 1e-9

    n = 97
    edges = [(i, (i * 31 + 7) % n) for i in range(n)] \
        + [(i, (i * 17 + 3) % n) for i in range(n)]
    e = spark.createDataFrame(edges, "src long, dst long")
    det1 = {x.node: (x.hub, x.auth) for x in
            components.hits(e, iters=3, deterministic=True).collect()}
    det2 = {x.node: (x.hub, x.auth) for x in
            components.hits(e, iters=3, deterministic=True).collect()}
    fast = {x.node: (x.hub, x.auth) for x in
            components.hits(e, iters=3, checkpoint_every=2).collect()}
    assert det1 == det2                      # bit-stable
    assert set(fast) == set(det1)
    assert all(abs(fast[k][0] - det1[k][0]) < 1e-12
               and abs(fast[k][1] - det1[k][1]) < 1e-12 for k in det1)
    # zero-edge graph: all scores 0, never NaN
    nodes = spark.createDataFrame([(0,), (1,)], "id long")
    empty = spark.createDataFrame([], "src long, dst long")
    z = components.hits(empty, iters=2, nodes=nodes,
                        node_col="id").collect()
    assert all(x.hub == 0.0 and x.auth == 0.0 for x in z)


def _bfs_bruteforce(edges, seeds, k):
    """Level-by-level BFS ground truth: node -> min hops (<= k)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    hops = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, k + 1):
        frontier = {v for u in frontier for v in adj.get(u, ())
                    if v not in hops}
        for v in frontier:
            hops[v] = h
    return hops


def test_khop_reachability_min_hops(spark):
    """Exact min-hop labels on a graph with a shortcut: the 2-hop
    shortcut must win over the 5-hop chain path, and nodes past the
    horizon must be absent."""
    # chain 0-1-2-3-4-5-6 plus shortcut 0-9-5
    edges = [(i, i + 1) for i in range(6)] + [(0, 9), (9, 5)]
    edges = edges + [(b, a) for a, b in edges]  # symmetrize
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"]
           for r in components.khop_reachability(e, seeds, 3).collect()}
    want = _bfs_bruteforce(edges, [0], 3)
    assert got == want
    assert got[5] == 2 and got[4] == 3 and got[6] == 3  # shortcut wins


def test_khop_reachability_random_graph(spark):
    """Random-ish deterministic digraph vs brute force, including an
    early-exit case (k larger than the graph's eccentricity)."""
    edges = [((i * 7) % 40, (i * 17 + 3) % 40) for i in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (13,)], "node long")
    for k in (1, 2, 50):
        got = {r["node"]: r["hops"]
               for r in components.khop_reachability(e, seeds, k).collect()}
        assert got == _bfs_bruteforce(edges, [0, 13], k), f"k={k}"


def _bf_bruteforce(edges, seeds, k):
    """k-round Bellman-Ford ground truth: node -> min cost walk <= k edges."""
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    return dist


def test_bounded_shortest_paths(spark):
    """Cheap long detour beats expensive direct edge; hop bound k=1
    must pick the expensive edge; early exit past convergence."""
    edges = [(0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1),  # detour cost 3
             (1, 4, 2), (5, 6, 7)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    for k in (1, 2, 3, 20):
        got = {r["node"]: r["dist"]
               for r in components.bounded_shortest_paths(e, seeds, k)
               .collect()}
        assert got == _bf_bruteforce(edges, [0], k), f"k={k}"
    got3 = {r["node"]: r["dist"]
            for r in components.bounded_shortest_paths(e, seeds, 3).collect()}
    assert got3[1] == 3  # detour 0-2-3-1 beats direct 10


def test_bounded_shortest_paths_parallel_edges(spark):
    """Parallel edges collapse to their min weight; multi-seed min."""
    edges = [(0, 1, 9), (0, 1, 4), (2, 1, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,), (2,)], "node long")
    got = {r["node"]: r["dist"]
           for r in components.bounded_shortest_paths(e, seeds, 2).collect()}
    assert got == {0: 0, 2: 0, 1: 1}


def _tri_bruteforce(edges):
    """Per-node triangle counts on the canonical simple graph."""
    es = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    nbr = {}
    for a, b in es:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    tri = {n: 0 for n in nbr}
    for a, b in es:
        for c in nbr[a] & nbr[b]:
            tri[a] += 1  # each triangle touches edge (a,b) once; the
            # common-neighbor scan credits a and b per closing vertex
            tri[b] += 1
    # every triangle was credited twice per vertex (once per incident
    # edge scanned), i.e. each vertex counted 2x -> halve
    return {n: t // 2 for n, t in tri.items()}, nbr


def test_triangle_count_hand_graphs(spark):
    """K4 (every node: deg 3, tri 3, lcc 1.0) glued to a 3-path tail
    (no triangles, middle node lcc 0); duplicate / reversed /
    self-loop edges collapse."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    dirty = k4 + [(1, 0), (2, 2), (0, 1), (3, 10), (10, 11)]
    e = spark.createDataFrame(dirty, "src long, dst long")
    got = {r["node"]: (r["degree"], r["triangles"], r["lcc"])
           for r in components.triangle_count(e).collect()}
    for n in (0, 1, 2):
        assert got[n] == (3, 3, 1.0)
    assert got[3] == (4, 3, 0.5)          # 6/(4*3)
    assert got[10] == (2, 0, 0.0)
    assert got[11] == (1, 0, 0.0)


def test_triangle_count_bruteforce_parity_and_isolated(spark):
    """Planted ring + two chord families vs a python brute force;
    isolated nodes from the nodes frame report all-zero."""
    n = 60
    edges = ([(i, (i + 1) % n) for i in range(n)]
             + [(i, (i + 2) % n) for i in range(n)]
             + [(i, (i * 7 + 3) % n) for i in range(n)])
    want, nbr = _tri_bruteforce(edges)
    e = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    nodes = spark.createDataFrame([(i,) for i in range(n + 5)],
                                  "doc_id long")
    rows = components.triangle_count(
        e, nodes=nodes, node_col="doc_id").collect()
    got = {r["node"]: (r["degree"], r["triangles"], r["lcc"]) for r in rows}
    assert len(got) == n + 5
    for i in range(n):
        d, t = len(nbr[i]), want[i]
        lcc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        assert got[i] == (d, t, lcc), i
    for i in range(n, n + 5):
        assert got[i] == (0, 0, 0.0)
    assert sum(t for _, t, _ in got.values()) % 3 == 0


# ---- label propagation ------------------------------------------------------

def _lpa_bruteforce(n_nodes, edges, iters):
    adj = {i: [] for i in range(n_nodes)}
    for a, b in edges:
        if a != b:
            if b not in adj[a]:
                adj[a].append(b)
            if a not in adj[b]:
                adj[b].append(a)
    lbl = {i: i for i in range(n_nodes)}
    for _ in range(iters):
        new = {}
        for v in range(n_nodes):
            if not adj[v]:
                new[v] = lbl[v]
                continue
            cnt = {}
            for u in adj[v]:
                cnt[lbl[u]] = cnt.get(lbl[u], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lbl = new
    return lbl


def test_label_propagation_matches_bruteforce(spark):
    # two dense 6-cliques joined by ONE bridge + an isolated node
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges += [(0, 6)]
    n = 13
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n).withColumnRenamed("id", "node_id")
    for iters in (1, 3):
        got = {r["node"]: r["label"]
               for r in components.label_propagation(
                   df, iters=iters, nodes=nodes, node_col="node_id")
               .collect()}
        assert got == _lpa_bruteforce(n, edges, iters)
    got3 = {r["node"]: r["label"]
            for r in components.label_propagation(
                df, iters=3, nodes=nodes, node_col="node_id").collect()}
    # communities stay separate (components would merge them via 0-6)
    assert len({got3[v] for v in range(6)}) == 1
    assert len({got3[v] for v in range(6, 12)}) == 1
    assert got3[0] != got3[7]
    assert got3[12] == 12  # isolated keeps own label
    cc = {r["node"]: r["component"]
          for r in components.connected_components(
              df, src="src", dst="dst", nodes=nodes,
              node_col="node_id").collect()}
    assert cc[0] == cc[7]  # reachability merges what LPA keeps apart


def test_label_propagation_random_graph_parity(spark):
    n = 60
    edges = [(i, (i * 17 + 3) % n) for i in range(n)] + \
            [(i, (i * 29 + 11) % n) for i in range(n) if i % 3 == 0]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n).withColumnRenamed("id", "node_id")
    got = {r["node"]: r["label"]
           for r in components.label_propagation(
               df, iters=4, nodes=nodes, node_col="node_id").collect()}
    assert got == _lpa_bruteforce(n, edges, 4)


def _kcore_bruteforce(edges, k, iters):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(iters):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in alive and b in alive}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_k_core_cascade(spark):
    # 5-clique (the k=3 core) + a pendant chain 5-6-7 that peels one
    # node per synchronous round: 7 (deg 1) falls in round 1, then 6,
    # then 5 -- distinguishing fixed-round sync semantics from a
    # one-shot degree filter.
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(0, 5), (1, 5), (5, 6), (6, 7)]
    edges = clique + chain
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 3, 4):
        got = {r["node"]: r["degree"]
               for r in components.k_core(df, k=3, iters=iters).collect()}
        assert got == _kcore_bruteforce(edges, 3, iters), iters
    got = {r["node"]: r["degree"]
           for r in components.k_core(df, k=3, iters=4).collect()}
    assert set(got) == set(range(5)) and all(d == 4 for d in got.values())


def test_k_core_random_parity(spark):
    n = 50
    edges = [(i, (i * 17 + 3) % n) for i in range(n)] + \
            [(i, (i * 29 + 11) % n) for i in range(n) if i % 2 == 0] + \
            [(a, b) for a in range(8) for b in range(a + 1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 4):
        got = {r["node"]: r["degree"]
               for r in components.k_core(df, k=k, iters=5).collect()}
        assert got == _kcore_bruteforce(edges, k, 5), k


def _ktruss_bruteforce(edges, k, iters):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def support(es):
        # count common neighbors per edge
        nbr = {}
        for a, b in es:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        return {(a, b): len(nbr[a] & nbr[b]) for a, b in es}

    for _ in range(iters):
        sup = support(e)
        e = {ed for ed in e if sup[ed] >= k - 2}
    return support(e) if e else {}


def test_k_truss_cascade(spark):
    # ring + chords + 6-clique: chords (support 1) peel in round 1,
    # the bare ring (support 0) in round 2, the clique (support 4)
    # survives -- one edge cohort per synchronous round.
    n = 30
    ring = [(i, (i + 1) % n) for i in range(n)]
    chords = [(i, (i + 2) % n) for i in range(n)]
    clique = [(a, b) for a in range(40, 46) for b in range(a + 1, 46)]
    edges = ring + chords + clique
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 3):
        got = {(r.node_a, r.node_b): r.support
               for r in components.k_truss(df, k=4, iters=iters).collect()}
        assert got == _ktruss_bruteforce(edges, 4, iters), iters
    got = {(r.node_a, r.node_b): r.support
           for r in components.k_truss(df, k=4, iters=3).collect()}
    assert set(got) == {(a, b) for a, b in clique}
    assert all(s == 4 for s in got.values())


def test_k_truss_random_parity(spark):
    n = 40
    edges = [(i, (i * 7 + 3) % n) for i in range(n)] + \
            [(i, (i + 1) % n) for i in range(n)] + \
            [(i, (i + 2) % n) for i in range(0, n, 2)] + \
            [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (3, 4):
        got = {(r.node_a, r.node_b): r.support
               for r in components.k_truss(df, k=k, iters=4).collect()}
        assert got == _ktruss_bruteforce(edges, k, 4), k


def test_degree_assortativity_values(spark):
    import numpy as np
    # star K1,5 -> r = -1 exactly
    star = [(0, i) for i in range(1, 6)]
    [r] = components.degree_assortativity(
        spark.createDataFrame(star, "src long, dst long")).collect()
    assert r.assortativity == -1.0
    # ring: degree-regular -> zero variance -> NULL
    ring = [(i, (i + 1) % 8) for i in range(8)]
    [r] = components.degree_assortativity(
        spark.createDataFrame(ring, "src long, dst long")).collect()
    assert r.assortativity is None
    # irregular graph vs numpy Pearson over the symmetrized stub list
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 1)]
    [r] = components.degree_assortativity(
        spark.createDataFrame(edges, "src long, dst long")).collect()
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    js = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ks = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    assert r.assortativity == pytest.approx(
        float(np.corrcoef(js, ks)[0, 1]), abs=1e-12)


def test_reciprocity_handcase(spark):
    # 0->1 and 1->0 reciprocated; 2->3 not; dup edge + self-loop drop
    edges = [(0, 1), (1, 0), (2, 3), (2, 3), (4, 4)]
    [r] = components.reciprocity(
        spark.createDataFrame(edges, "src long, dst long")).collect()
    assert (r.n_edges, r.n_reciprocated) == (3, 2)
    assert r.reciprocity == 2.0 / 3.0
    empty = spark.createDataFrame([], "src long, dst long")
    [r] = components.reciprocity(empty).collect()
    assert r.n_edges == 0 and r.reciprocity is None


def _modularity_bruteforce(edges, lab):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    e = {(a, b) for a, b in e if a in lab and b in lab}
    m = len(e)
    intra = sum(1 for a, b in e if lab[a] == lab[b])
    dc = {}
    for a, b in e:
        dc[lab[a]] = dc.get(lab[a], 0) + 1
        dc[lab[b]] = dc.get(lab[b], 0) + 1
    sum_dc2 = sum(d * d for d in dc.values())
    q = float(4 * m * intra - sum_dc2) / float(4 * m * m)
    return m, intra, sum_dc2, q


def test_modularity_handcase(spark):
    # two 5-cliques + one bridge: the true partition scores high, the
    # everything-in-one-community partition scores exactly 0.
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    edges += [(0, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    lab2 = {v: v // 5 for v in range(10)}
    labels = spark.createDataFrame(list(lab2.items()), "node long, label long")
    [r] = components.modularity(df, labels).collect()
    m, intra, dc2, q = _modularity_bruteforce(edges, lab2)
    assert (r.m_edges, r.intra_edges, r.sum_dc2) == (m, intra, dc2)
    assert r.modularity == q and q > 0.4
    one = spark.createDataFrame([(v, 0) for v in range(10)],
                                "node long, label long")
    [r1] = components.modularity(df, one).collect()
    assert r1.modularity == 0.0
    # random-ish labels score worse than the true partition
    rnd = spark.createDataFrame([(v, v % 2) for v in range(10)],
                                "node long, label long")
    [rr] = components.modularity(df, rnd).collect()
    assert rr.modularity == _modularity_bruteforce(
        edges, {v: v % 2 for v in range(10)})[3] < q


def test_modularity_with_label_propagation(spark):
    # end-to-end: LPA labels on the two-clique graph maximize Q vs
    # the degenerate single community
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges += [(0, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(12).withColumnRenamed("id", "node_id")
    lpa = components.label_propagation(df, iters=3, nodes=nodes,
                                       node_col="node_id")
    [r] = components.modularity(df, lpa).collect()
    assert r.modularity > 0.4


def test_personalized_pagerank(spark):
    n = 40
    edges = [(i, (i * 31 + 7) % n) for i in range(n)] + \
            [(i, (i * 17 + 3) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # seeds = all nodes -> identical to plain pagerank (same base)
    allseeds = spark.range(n).withColumnRenamed("id", "node")
    ppr = {r.node: r.rank for r in components.personalized_pagerank(
        df, allseeds, iters=3, deterministic=True).collect()}
    pr = {r.node: r.rank for r in components.pagerank(
        df, iters=3, deterministic=True).collect()}
    assert ppr == pr
    # single seed: seed outranks everything beyond its out-frontier;
    # nodes unreachable within iters hops score exactly 0
    seed = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.rank for r in components.personalized_pagerank(
        df, seed, iters=2, deterministic=True).collect()}
    reach = {0}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    frontier = {0}
    for _ in range(2):
        frontier = {d for s in frontier for d in adj.get(s, [])}
        reach |= frontier
    for v in range(n):
        if v not in reach:
            assert got[v] == 0.0, v
    assert got[0] > 0 and sum(got.values()) <= 1.0 + 1e-9


def test_rich_club_handcase(spark):
    # 4-clique hub club + pendant leaves on each hub
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, 10 + a) for a in range(4)]  # leaves: degree 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.k: r for r in components.rich_club(df, [0, 1, 3]).collect()}
    # k=0: all 8 nodes, all 10 edges: phi = 20/56
    assert (got[0].n_nodes, got[0].n_edges) == (8, 10)
    assert got[0].phi == 20.0 / 56.0
    # k=1: the 4 hubs (degree 4), 6 clique edges: phi = 1
    assert (got[1].n_nodes, got[1].n_edges) == (4, 6)
    assert got[1].phi == 1.0
    # k=3: degree > 3 = the hubs (degree 4) -> still 4 nodes
    assert got[3].n_nodes == 4 and got[3].phi == 1.0
    got5 = {r.k: r for r in components.rich_club(df, [5]).collect()}
    assert got5[5].n_nodes == 0 and got5[5].phi is None


def test_bipartite_project_handcase(spark):
    edges = [  # users u1,u2 share places A,B; u3 only C; hub visits all
        ("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"),
        ("u2", "B"),                       # dup incidence collapses
        ("u3", "C"),
        ("hub", "A"), ("hub", "B"), ("hub", "C"), ("hub", "D")]
    df = spark.createDataFrame(edges, "user string, item string")
    got = {(r.item_a, r.item_b): r.n_shared for r in
           components.bipartite_project(
               df, left="user", right="item", min_shared=1).collect()}
    assert got[("A", "B")] == 3  # u1, u2, hub
    assert got[("C", "D")] == 1  # hub only
    # hot-left guard: dropping the hub removes its everything-pairs
    capped = {(r.item_a, r.item_b): r.n_shared for r in
              components.bipartite_project(
                  df, left="user", right="item", min_shared=1,
                  max_left_degree=3).collect()}
    assert capped == {("A", "B"): 2}
    # min_shared prunes
    strong = {(r.item_a, r.item_b): r.n_shared for r in
              components.bipartite_project(
                  df, left="user", right="item", min_shared=2).collect()}
    assert set(strong) == {("A", "B")}


def test_negative_edges_properties(spark):
    n = 40
    edges = [(i, (i * 31 + 7) % n) for i in range(n)] + \
            [(i, (i * 17 + 3) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = components.negative_edges(df, n, per_node=2, probes=8).collect()
    pos = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    seen_pairs = [(r.src, r.dst) for r in got]
    # every sample is a verified non-edge, canonical, no self-loops
    for r in got:
        assert r.src < r.dst
        assert (r.src, r.dst) not in pos
    # determinism: re-running yields the identical multiset
    again = components.negative_edges(df, n, per_node=2, probes=8).collect()
    assert sorted((r.src, r.dst, r.probe) for r in got) == \
        sorted((r.src, r.dst, r.probe) for r in again)
    # per-owner cap holds (owners are probe sources; a pair can recur
    # for two owners but each owner contributes <= per_node rows)
    assert len(got) <= 2 * n and len(got) > n // 2


def test_graph_summary_and_degree_distribution(spark):
    # 4-clique + pendant: n=5, m=7, degrees 4,4,4,3(x0)... compute:
    # clique nodes 0-3 all deg 3 within; node 0 also links 4 -> deg 4
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(0, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    [s] = components.graph_summary(df).collect()
    assert (s.n_nodes, s.n_edges, s.max_degree) == (5, 7, 4)
    assert s.avg_degree == 14.0 / 5.0
    assert s.density == 14.0 / 20.0
    dist = {r.degree: r.n_nodes for r in
            components.degree_distribution(df).collect()}
    assert dist == {4: 1, 3: 3, 1: 1}
    # empty graph: NULL ratios
    [s0] = components.graph_summary(
        df.filter(F.lit(False))).collect()
    assert s0.n_nodes == 0 and s0.avg_degree is None
