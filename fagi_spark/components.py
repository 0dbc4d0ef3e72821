"""Distributed connected components + near-duplicate clustering.

The missing last stage of web-corpus dedup: MinHash/LSH emits candidate
PAIRS (textops.minhash_candidates), but real crawls contain duplicate
*clusters* (the same article mirrored on 40 hosts), and keeping one
canonical document per cluster requires the transitive closure of the
verified-pair graph. The reference has no analog (it is batch pairwise
fusion over explicit links); this is the task brief's
training-data-pipeline surface.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", ACM SoCC 2014 — published literature):
each round is two groupBy/join passes over the edge list, and the edge
set converges to per-component stars rooted at the component minimum in
O(log^2 n) rounds REGARDLESS of graph diameter — the property that
matters at 100 TB, where naive min-label propagation needs
O(diameter) rounds and a single 10M-long mirror chain would take 10M
shuffles. Every pass is a plain DataFrame groupBy + equi-join (shuffle
on node id, map-side partial min); the driver loop only compares two
scalar aggregates per round and ``localCheckpoint``s to truncate
lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textops


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Drop nulls/self-loops, orient (min, max), distinct."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b")))
    return e.select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(neighborhood of u, u)."""
    adj = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = (adj.groupBy("a")
            .agg(F.min("b").alias("_mn"))
            .select("a", F.least("a", "_mn").alias("_m")))
    return (adj.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low; for each node u connect its smaller
    neighbors (and u itself) to the minimum of them."""
    hi = e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
    mins = hi.groupBy("a").agg(F.min("b").alias("_m"))
    rewired = (hi.join(mins, "a")
               .filter(F.col("b") != F.col("_m"))
               .select(F.col("b").alias("a"), F.col("_m").alias("b")))
    roots = mins.select(F.col("a"), F.col("_m").alias("b"))
    return rewired.unionByName(roots).distinct()


def _edge_digest(e: DataFrame):
    """(count, hash-sum) — the cheap per-round convergence probe. Two
    scalar aggregates instead of a full except() shuffle; a false
    match needs a colliding xxhash64 SUM over the whole edge set
    (probability ~2^-64 per round, documented trade)."""
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h")).first()
    return row["n"], row["h"]


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25,
                         nodes: DataFrame | None = None,
                         node_col: str | None = None) -> DataFrame:
    """-> (node, component) with component = min node id reachable.

    ``edges`` may contain duplicates, self-loops and either
    orientation. Nodes appearing in no edge are absent from the result
    unless a ``nodes`` frame (+ ``node_col``) is passed, in which case
    isolated nodes map to themselves. Raises after ``max_iter``
    non-converged rounds (the algorithm needs O(log^2 n); 25 covers
    any realistic corpus — 2^25 star-halvings)."""
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=True)
    digest = _edge_digest(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        d2 = _edge_digest(e2)
        e = e2
        if d2 == digest:
            break
        digest = d2
    else:
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_iter} rounds")
    # converged edge set is per-component stars (node, root<node)
    members = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("node"),
                     F.col("b").alias("component")).distinct()
    out = members.unionByName(roots)
    if nodes is not None:
        assert node_col is not None, "node_col required with nodes"
        isolated = (nodes.select(F.col(node_col).alias("node")).distinct()
                    .join(out.select("node"), "node", "left_anti")
                    .select("node", F.col("node").alias("component")))
        out = out.unionByName(isolated)
    return out


def verify_pairs(df: DataFrame, pairs: DataFrame, key: str = "doc_id",
                 text: str = "text", k: int = 3,
                 threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs: join the
    two texts onto each pair and compare shingle SETS with
    array_intersect — per-candidate column math, never a corpus-wide
    shingle join (candidates are the tiny LSH output; the texts arrive
    via two hash joins on the doc key). Same Jaccard definition as
    textops.ngram_jaccard_pairs."""
    sh = df.select(F.col(key), textops._shingles(F.col(text), k).alias("_sh"))
    a = sh.select(F.col(key).alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(key).alias("id_b"), F.col("_sh").alias("_shb"))
    j = (pairs.join(a, "id_a").join(b, "id_b")
         .withColumn("_ni", F.size(F.array_intersect("_sha", "_shb")))
         .withColumn("jaccard",
                     F.col("_ni").cast("double")
                     / (F.size("_sha") + F.size("_shb") - F.col("_ni"))
                     .cast("double")))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def neardup_clusters(df: DataFrame, key: str = "doc_id", text: str = "text",
                     num_hashes: int = 32, bands: int = 8, shingle_k: int = 3,
                     threshold: float = 0.5,
                     hash_family: str = "xxhash") -> DataFrame:
    """The full near-dup clustering pipeline: LSH candidates ->
    exact-Jaccard verify -> connected components. -> (node, component)
    over ALL rows of ``df`` (non-duplicated docs are their own
    singleton component)."""
    cand = textops.minhash_candidates(df, key, text, num_hashes, bands,
                                      shingle_k, hash_family)
    edges = verify_pairs(df, cand, key, text, shingle_k, threshold)
    return connected_components(edges, "id_a", "id_b",
                                nodes=df, node_col=key)


def dedup_near(df: DataFrame, key: str = "doc_id", text: str = "text",
               policy: str = "min_key", **kwargs) -> DataFrame:
    """Keep one canonical row per near-dup cluster — the end-to-end
    Common-Crawl dedup. ``policy`` picks the survivor:

    - ``min_key``: the component-minimum key (rows survive iff their
      key IS their component id; singletons trivially qualify). Zero
      extra work — the component labeling already carries the answer.
    - ``longest``: the member with the most normalized words, ties
      broken by minimum key — the keep-the-fullest-capture rule used
      by production crawl dedup. One extra shuffle: a row_number
      window over (component) ordered by (n_words DESC, key ASC),
      which compiles to WindowGroupLimit (only per-partition leaders
      reach the shuffle), so component size never hits memory.
    """
    comp = neardup_clusters(df, key, text, **kwargs)
    if policy == "min_key":
        keep = (comp.filter(F.col("node") == F.col("component"))
                .select(F.col("node").alias(key)))
    elif policy == "longest":
        keep = keep_longest_keys(df, comp, key, text)
    else:
        raise ValueError(f"unknown dedup_near policy: {policy!r}")
    return df.join(keep, key, "leftsemi")


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             nodes: DataFrame | None = None, node_col: str | None = None,
             deterministic: bool = False,
             checkpoint_every: int = 0) -> DataFrame:
    """Distributed PageRank over an edge list -> (node, rank) — the
    link-graph centrality signal web-corpus curation pipelines use as
    a document/domain quality prior (the Common-Crawl host-rank idea).

    Semantics: parallel edges count separately (out-degree = outgoing
    edge ROWS); dangling nodes (no out-edges) leak their mass — the
    simplest variant of Page et al. 1999, fine when the RANKING is
    what's consumed. Each iteration is one equi-join of the edge list
    with the current ranks plus one groupBy(dst) aggregate — never a
    cartesian; N comes from one tiny count job up front.

    ``deterministic=True`` folds each target's contributions in
    src-sorted order (collect_list + F.aggregate) so the float ranks
    are bit-reproducible and SQL-mirrorable (the fagi contract's
    IEEE-fold rule); the default plain SUM is the scale path —
    map-side partial aggregation, no per-node arrays (a hub's
    in-degree never materializes in memory).

    ``checkpoint_every=k`` truncates lineage every k iterations
    (localCheckpoint) — at 10+ iterations the stacked join plan
    otherwise grows past what the optimizer re-analyzes cheaply."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nd = (nodes.select(F.col(node_col).alias("node")).distinct()
          if nodes is not None else
          e.select(F.col("src").alias("node"))
          .unionByName(e.select(F.col("dst").alias("node"))).distinct())
    n = nd.count()
    if n == 0:
        return nd.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / float(n)
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("_odeg"))
    ranks = nd.withColumn("rank", F.lit(1.0 / float(n)))
    for i in range(iters):
        contribs = (e.join(outdeg, "src")
                    .join(ranks, F.col("src") == F.col("node"))
                    .select("src", "dst",
                            (F.col("rank") / F.col("_odeg")).alias("_c")))
        if deterministic:
            agg = (contribs.groupBy("dst")
                   .agg(F.aggregate(
                       F.array_sort(F.collect_list(F.struct("src", "_c"))),
                       F.lit(0.0),
                       lambda acc, x: acc + x["_c"]).alias("_s")))
        else:
            agg = contribs.groupBy("dst").agg(F.sum("_c").alias("_s"))
        ranks = (nd.join(agg, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("_s"), F.lit(0.0)))
                         .alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def hits(edges: DataFrame, iters: int = 2,
         src: str = "src", dst: str = "dst",
         nodes: DataFrame | None = None, node_col: str | None = None,
         deterministic: bool = False,
         checkpoint_every: int = 2) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over an edge list ->
    (node, hub, auth) — the two-sided companion to ``pagerank`` for
    web-corpus curation: authorities are pages many good hubs point
    at (content quality prior), hubs are pages that point at many
    good authorities (directory/spam discrimination). Parallel edges
    count separately, like pagerank.

    Each iteration is the textbook two half-steps with L1 (sum)
    normalization — chosen over the usual L2 so every number stays
    inside the repo's oracle-safe op set (+ - * /, no data-dependent
    sqrt): a_j <- sum_{i->j} h_i then a <- a / sum(a); h_i <-
    sum_{i->j} a_j then h <- h / sum(h). Each half-step is one
    equi-join of the edge list with the current scores, one
    groupBy aggregate, and one single-row total broadcast back —
    never a cartesian, no driver-side loops over data.

    ``deterministic=True`` is the contract mode: per-node
    contributions fold in neighbor-sorted order (F.aggregate over
    array_sort(collect_list)) and the normalization totals fold the
    node-sorted score list, so the floats are bit-reproducible and
    SQL-mirrorable. The default plain SUM is the scale path —
    map-side partial aggregation, no per-node or global arrays (the
    deterministic global fold collects one float per NODE into a
    single row, fine at oracle scale only). Zero-edge graphs return
    all-zero scores rather than NaN.

    ``checkpoint_every=k`` truncates lineage every k iterations.
    Unlike pagerank it DEFAULTS ON (k=2): each HITS iteration stacks
    two half-step joins plus two normalization cross-joins, so the
    un-cut logical plan grows ~4 joins deep per iteration and
    Catalyst's analysis cost turns super-linear — measured on the
    dev box, 5 un-cut iterations exceed 7 minutes of pure planning
    while the same 5 with k=1 run in 28 s end-to-end. Pass 0 to
    disable (fine through ~3 iterations)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nd = (nodes.select(F.col(node_col).alias("node")).distinct()
          if nodes is not None else
          e.select(F.col("src").alias("node"))
          .unionByName(e.select(F.col("dst").alias("node"))).distinct())

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        if deterministic:
            tot = scores.agg(F.aggregate(
                F.array_sort(F.collect_list(F.struct("node", col))),
                F.lit(0.0),
                lambda acc, x: acc + x[col]).alias("_tot"))
        else:
            tot = scores.agg(F.sum(col).alias("_tot"))
        return (scores.crossJoin(F.broadcast(tot))
                .select("node",
                        F.when(F.col("_tot") != 0.0,
                               F.col(col) / F.col("_tot"))
                        .otherwise(F.lit(0.0)).alias(col)))

    def _half(scores: DataFrame, score_col: str, join_end: str,
              group_end: str, sort_end: str, out: str) -> DataFrame:
        contribs = (e.join(scores, F.col(join_end) == F.col("node"))
                    .select(F.col(group_end).alias("_g"),
                            F.col(sort_end).alias("_o"),
                            F.col(score_col).alias("_c")))
        if deterministic:
            agg = (contribs.groupBy("_g")
                   .agg(F.aggregate(
                       F.array_sort(F.collect_list(F.struct("_o", "_c"))),
                       F.lit(0.0),
                       lambda acc, x: acc + x["_c"]).alias("_s")))
        else:
            agg = contribs.groupBy("_g").agg(F.sum("_c").alias("_s"))
        return (nd.join(agg, F.col("node") == F.col("_g"), "left")
                .select("node",
                        F.coalesce(F.col("_s"), F.lit(0.0)).alias(out)))

    hubs = nd.withColumn("hub", F.lit(1.0))
    auths = nd.withColumn("auth", F.lit(0.0))
    for i in range(iters):
        # authority half-step: pull hub mass along in-edges
        auths = _norm(_half(hubs, "hub", "src", "dst", "src", "auth"),
                      "auth")
        # hub half-step: pull the fresh authority mass along out-edges
        hubs = _norm(_half(auths, "auth", "dst", "src", "dst", "hub"),
                     "hub")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            hubs = hubs.localCheckpoint()
            auths = auths.localCheckpoint()
    return (hubs.join(auths, "node")
            .select("node", "hub", "auth"))


def keep_longest_keys(df: DataFrame, clusters: DataFrame,
                      key: str = "doc_id", text: str = "text") -> DataFrame:
    """Keys of the longest member per component (most normalized
    words, ties broken by minimum key) — THE canonical-survivor policy,
    shared by ``dedup_near(policy="longest")`` and the committed-label
    path in jobs/dedup.py so the tie-break can never drift between
    them. ``clusters`` is ``connected_components`` output
    (node, component). Compiles to WindowGroupLimit: only
    per-partition leaders reach the shuffle, so component size never
    hits executor memory."""
    from pyspark.sql.window import Window
    n_words = F.size(
        F.split(textops.normalize_text(
            F.coalesce(F.col(text), F.lit(""))), " "))
    sized = (df.select(F.col(key), n_words.alias("_nw"))
             .join(clusters, F.col(key) == F.col("node")))
    w = Window.partitionBy("component").orderBy(
        F.desc("_nw"), F.asc("node"))
    return (sized.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(F.col("node").alias(key)))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst",
                   nodes: DataFrame | None = None,
                   node_col: str | None = None) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected simple graph -> (node, degree, triangles, lcc) — the
    cohesion companion to ``pagerank``/``hits`` for link-graph
    curation: link farms and boilerplate nav meshes are triangle-dense
    (lcc ~ 1) while organic editorial linking is sparse, so lcc is a
    standard spam / template-cluster discriminator. Input edges may
    carry duplicates, self-loops and either orientation; they collapse
    to the canonical simple graph first (same contract as
    ``connected_components``).

    Scale shape is the degree-ordered node-iterator (Schank &
    Wagner 2005; the MapReduce form in Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): every
    edge is oriented from its lower-(degree, id) endpoint to the
    higher, so a node's OUT-neighborhood — the only thing the wedge
    self-join fans out on — is bounded by O(sqrt(m)) regardless of how
    hot a hub is. That is THE difference between this and the naive
    adjacency self-join, whose wedge count on a 10M-degree crawl hub
    (m^2 on the hottest reducer) is the canonical last-reducer
    death. Three shuffles total: degree groupBy, wedge self-join on
    the oriented source, closure equi-join of wedges against the
    canonical edge set; each triangle materializes exactly once (its
    minimum-rank vertex is the wedge pivot, the other two ordered by
    id) and then explodes to its three member nodes for one final
    counting groupBy. No loops, no driver-side data.

    ``lcc`` = 2*triangles / (degree*(degree-1)) for degree >= 2 else
    0.0 — integer numerator and denominator with ONE IEEE division,
    so the float is oracle-comparable. Isolated nodes (only with a
    ``nodes`` frame) report degree 0, triangles 0, lcc 0.0."""
    e = _canon_edges(edges, src, dst)
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("_db"))
    # orient low-(deg, id) -> high; e already has a < b, so ties on
    # degree orient a -> b
    o = (e.join(da, "a").join(db, "b")
         .select(F.when(F.col("_da") <= F.col("_db"), F.col("a"))
                 .otherwise(F.col("b")).alias("u"),
                 F.when(F.col("_da") <= F.col("_db"), F.col("b"))
                 .otherwise(F.col("a")).alias("v")))
    x = o.select(F.col("u"), F.col("v").alias("_v1"))
    y = o.select(F.col("u"), F.col("v").alias("_v2"))
    wedges = (x.join(y, "u")
              .filter(F.col("_v1") < F.col("_v2")))
    tri = wedges.join(e, (wedges["_v1"] == e["a"])
                      & (wedges["_v2"] == e["b"]))
    per = (tri.select(F.explode(F.array("u", "_v1", "_v2")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    out = (deg.select(F.col("a").alias("node"), "deg")
           .join(per, "node", "left")
           .select("node", F.col("deg").alias("degree"),
                   F.coalesce(F.col("triangles"),
                              F.lit(0).cast("long")).alias("triangles")))
    if nodes is not None:
        assert node_col is not None, "node_col required with nodes"
        isolated = (nodes.select(F.col(node_col).alias("node")).distinct()
                    .join(out.select("node"), "node", "left_anti")
                    .select("node",
                            F.lit(0).cast("long").alias("degree"),
                            F.lit(0).cast("long").alias("triangles")))
        out = out.unionByName(isolated)
    return out.select(
        "node", "degree", "triangles",
        F.when(F.col("degree") >= 2,
               (F.lit(2.0) * F.col("triangles"))
               / (F.col("degree") * (F.col("degree") - 1)))
        .otherwise(F.lit(0.0)).alias("lcc"))


def khop_reachability(edges: DataFrame, seeds: DataFrame,
                      max_hops: int, src: str = "src", dst: str = "dst",
                      node_col: str = "node") -> DataFrame:
    """Bounded-hop BFS reachability over an edge list -> (node, hops)
    where ``hops`` is the MINIMUM hop count (0 for seeds) to reach the
    node from ANY seed within ``max_hops`` — the "entities within k
    link-hops of a trusted set" primitive (seed-based crawl frontier
    expansion, toponym neighbourhood harvesting, spam-distance
    labelling a la TrustRank seeds). The unbounded transitive closure
    is ``connected_components`` (log-round star contraction); this op
    exists precisely for the SMALL-k regime where hop distance itself
    is the signal, so the round count is k by definition, not a
    convergence property.

    Each round is one frontier-to-edges equi-join + distinct + one
    left-anti join against the reached set — all shuffle-partitioned
    on node id; the frontier never revisits a node, so level-by-level
    expansion yields exact min-hop labels without a per-node min
    aggregate over all paths (the path set, which the recursive-CTE
    oracle DOES enumerate, can be exponentially larger). Lineage is
    truncated per round (``localCheckpoint``, same discipline as
    ``connected_components``), and the loop early-exits on an empty
    frontier — at most ``max_hops`` jobs of edge-list size, never
    graph-diameter-many.

    ``edges`` is consumed as DIRECTED; callers wanting undirected
    reachability pass the symmetrized list (union of both
    orientations), which keeps one semantics instead of a flag that
    silently doubles the edge frame."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                 & (F.col("src") != F.col("dst")))
         .distinct()
         .localCheckpoint(eager=True))
    frontier = (seeds.select(F.col(node_col).alias("node")).distinct()
                .withColumn("hops", F.lit(0).cast("int"))
                .localCheckpoint(eager=True))
    reached = frontier
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .select(F.col("dst").alias("node")).distinct()
               .join(reached.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(h).cast("int"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached


def bounded_shortest_paths(edges: DataFrame, seeds: DataFrame,
                           max_hops: int, src: str = "src",
                           dst: str = "dst", weight: str = "w",
                           node_col: str = "node") -> DataFrame:
    """Weighted bounded-hop shortest paths -> (node, dist): the
    minimum total edge weight over all walks of at most ``max_hops``
    edges from any seed (0 for seeds) — the routing-flavoured
    companion to ``khop_reachability`` (nearest-depot distance,
    link-graph trust decay with real edge costs). Weights are
    NON-NEGATIVE integers so every distance is BIGINT-exact.

    This is ``max_hops`` rounds of distributed Bellman-Ford
    relaxation: each round joins the current distance frame to the
    edge list (shuffle on node id), unions the relaxed candidates with
    the standing distances, and takes one partial-aggregated MIN per
    node. After round h the frame holds the exact min cost over walks
    of <= h edges — no convergence subtlety, the bound IS the
    semantics. Parallel edges collapse to their MIN weight up front;
    lineage is cut per round (localCheckpoint) and the loop early-exits
    when a round changes nothing (two scalar aggregates, the
    ``connected_components`` discipline). For unbounded true shortest
    paths run it with max_hops >= the graph's weighted hop diameter —
    the early exit stops the loop as soon as a round is a no-op."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                 & (F.col("src") != F.col("dst")) & (F.col("w") >= 0))
         .groupBy("src", "dst").agg(F.min("w").alias("w"))
         .localCheckpoint(eager=True))
    dist = (seeds.select(F.col(node_col).alias("node")).distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    prev = None
    for _ in range(max_hops):
        relax = (dist.join(e, dist["node"] == e["src"])
                 .select(F.col("dst").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relax)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
        cur = dist.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("dist").alias("s")).first()
        cur = (cur["n"], cur["s"])
        if cur == prev:
            break
        prev = cur
    return dist


def label_propagation(edges: DataFrame, iters: int = 3,
                      nodes: DataFrame | None = None,
                      src: str = "src", dst: str = "dst",
                      node_col: str | None = None) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the
    deterministic fixed-round variant): every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors, ties broken by the smallest label, isolated nodes keep
    their own. Unlike ``connected_components`` (pure reachability)
    this respects edge DENSITY — bridges between dense blocks don't
    merge them in a few rounds — so it's the community structure pass
    of a host-graph analysis (spam clusters, mirror farms).

    Fixed ``iters`` synchronous rounds make the result deterministic
    and SQL-mirrorable (one groupBy + one argmax join per round — the
    same per-round shape as ``pagerank``); each round localCheckpoints
    to cut lineage. Per round: symmetrized-edge join on the label
    frame, count per (node, label) with map-side combine, max_by
    (count, -label) argmax — no windows over the node universe, no
    driver loops. Returns (node, label).
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .unionByName(edges.select(F.col(dst).alias("a"),
                                   F.col(src).alias("b")))
         .filter(F.col("a") != F.col("b"))
         .distinct().localCheckpoint(eager=True))
    if nodes is not None:
        assert node_col is not None, "node_col required with nodes"
        lab = (nodes.select(F.col(node_col).alias("node")).distinct()
               .select("node", F.col("node").alias("lbl")))
    else:
        lab = (e.select(F.col("a").alias("node"))
               .union(e.select("b")).distinct()
               .select("node", F.col("node").alias("lbl")))
    for _ in range(int(iters)):
        msgs = (e.join(lab.withColumnRenamed("node", "a"), "a")
                .select(F.col("b").alias("node"), "lbl"))
        cnt = msgs.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        best = cnt.groupBy("node").agg(
            F.max_by("lbl", F.struct(F.col("c"), (-F.col("lbl"))))
            .alias("new_lbl"))
        lab = (lab.join(best, "node", "left")
               .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
               .localCheckpoint(eager=True))
    return lab.select("node", F.col("lbl").alias("label"))


def k_core(edges: DataFrame, k: int = 3, iters: int = 4,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-round k-core peel: repeatedly delete nodes with degree
    < k (and their incident edges) from the undirected simple graph.
    The k-core is the quality backbone a link-graph curation pass
    keeps — spam farms and crawl tendrils peel off, densely
    interlinked hosts survive (Batagelj-Zaversnik semantics, realized
    as synchronous rounds).

    Each of the ``iters`` rounds is one degree rollup + two semi-join
    filters (both map-side combinable hash shuffles on the node key);
    lineage is cut per round. The peel converges once no round deletes
    a node; like label_propagation the round count is FIXED so the
    oracle can unroll the identical computation — pass iters at the
    graph's peel depth (pytest pins a cascade case).

    Returns (node, degree) for nodes alive after ``iters`` rounds,
    with degree counted in the surviving induced subgraph.
    """
    e = _canon_edges(edges, src, dst)
    kk = int(k)
    for _ in range(int(iters)):
        both = e.select(F.col("a").alias("node")).unionAll(
            e.select(F.col("b").alias("node")))
        deg = both.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= kk).select("node")
        e = (e.join(alive.withColumnRenamed("node", "a"), "a", "semi")
             .join(alive.withColumnRenamed("node", "b"), "b", "semi")
             .select("a", "b")
             .localCheckpoint(eager=True))
    both = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node")))
    return (both.groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree")))


def _edge_support(e: DataFrame) -> DataFrame:
    """Triangle support per canonical edge (a < b) of the simple
    graph ``e``: the number of triangles the edge participates in.
    Same degree-ordered wedge pivot as triangle_count (Suri &
    Vassilvitskii WWW'11) so the self-join fans out on O(sqrt(m))
    out-neighborhoods, never a hub's full adjacency; each triangle
    materializes once and explodes to its three member edges."""
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("_db"))
    o = (e.join(da, "a").join(db, "b")
         .select(F.when(F.col("_da") <= F.col("_db"), F.col("a"))
                 .otherwise(F.col("b")).alias("u"),
                 F.when(F.col("_da") <= F.col("_db"), F.col("b"))
                 .otherwise(F.col("a")).alias("v")))
    x = o.select(F.col("u"), F.col("v").alias("_v1"))
    y = o.select(F.col("u"), F.col("v").alias("_v2"))
    wedges = x.join(y, "u").filter(F.col("_v1") < F.col("_v2"))
    tri = (wedges.join(e, (wedges["_v1"] == e["a"])
                       & (wedges["_v2"] == e["b"]))
           .select("u", "_v1", "_v2"))
    member = tri.select(F.explode(F.array(
        F.struct(F.least("u", "_v1").alias("a"),
                 F.greatest("u", "_v1").alias("b")),
        F.struct(F.least("u", "_v2").alias("a"),
                 F.greatest("u", "_v2").alias("b")),
        F.struct(F.col("_v1").alias("a"), F.col("_v2").alias("b")),
    )).alias("p")).select("p.a", "p.b")
    return (member.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("support")))


def k_truss(edges: DataFrame, k: int = 4, iters: int = 3,
            src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-round k-truss peel: repeatedly delete edges in fewer
    than k-2 triangles (Cohen 2008) — the EDGE-granular backbone
    where k_core is node-granular. A link ring that inflates degrees
    without mutual corroboration survives a k-core but not a truss:
    every kept edge is embedded in k-2 triangles of the surviving
    subgraph, which is why trusses are the standard community-core /
    collusion-ring detector on host graphs.

    Each round is one support computation (three bounded shuffles via
    the degree-ordered wedge pivot of ``triangle_count``) + one edge
    filter; lineage is cut per round. The round count is FIXED so a
    declarative oracle can unroll the identical synchronous rounds —
    pass ``iters`` at the graph's peel depth (pytest pins a cascade).

    Returns surviving edges (node_a < node_b) with ``support``
    recomputed in the surviving subgraph.
    """
    e = _canon_edges(edges, src, dst)
    thr = int(k) - 2
    for _ in range(int(iters)):
        sup = _edge_support(e)
        e = (e.join(sup, ["a", "b"], "left")
             .filter(F.coalesce(F.col("support"), F.lit(0)) >= thr)
             .select("a", "b")
             .localCheckpoint(eager=True))
    sup = _edge_support(e)
    return (e.join(sup, ["a", "b"], "left")
            .select(F.col("a").alias("node_a"), F.col("b").alias("node_b"),
                    F.coalesce(F.col("support"), F.lit(0).cast("long"))
                    .alias("support")))


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    undirected simple graph: the Pearson correlation of endpoint
    degrees over directed edge stubs. Crawl link-graphs are famously
    DISassortative (hubs link to leaves, r < 0); a near-0/positive r
    over a host graph flags engineered mesh linking.

    Transcendental-free: with stubs symmetrized, sum(j) == sum(k) and
    sum(j^2) == sum(k^2), so Pearson's two sqrt denominators are equal
    and r collapses to ONE division of exact BIGINT accumulators:
    r = (m2*sum_jk - sum_j^2) / (m2*sum_j2 - sum_j^2), m2 = directed
    stub count. Degrees/sums must stay inside int64 (fine through
    ~10^5 avg degree at 10^9 edges — state checked by the caller).

    Returns one row (m2, sum_j, sum_jk, sum_j2, assortativity);
    assortativity is NULL for a degree-regular graph (0 variance).
    """
    e = _canon_edges(edges, src, dst)
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    dj = deg.select("a", F.col("deg").alias("_j"))
    dk = deg.select(F.col("a").alias("b"), F.col("deg").alias("_k"))
    s = (adj.join(dj, "a").join(dk, "b")
         .agg(F.count(F.lit(1)).cast("long").alias("m2"),
              F.sum("_j").cast("long").alias("sum_j"),
              F.sum(F.col("_j") * F.col("_k")).cast("long").alias("sum_jk"),
              F.sum(F.col("_j") * F.col("_j")).cast("long").alias("sum_j2")))
    num = F.col("m2") * F.col("sum_jk") - F.col("sum_j") * F.col("sum_j")
    den = F.col("m2") * F.col("sum_j2") - F.col("sum_j") * F.col("sum_j")
    return s.select(
        "m2", "sum_j", "sum_jk", "sum_j2",
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .alias("assortativity"))


def reciprocity(edges: DataFrame, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """Directed-edge reciprocity: the share of distinct directed
    edges whose reverse edge also exists — near 0 on organic crawl
    graphs (authority flows one way), near 1 inside link-exchange
    rings, so it pairs with assortativity as a host-graph health
    scalar. Self-loops drop; duplicates collapse.

    One distinct + one self-equi-join on the reversed key + two
    counts; ratio is a single IEEE division of exact BIGINTs.

    Returns one row (n_edges, n_reciprocated, reciprocity) with
    NULL reciprocity on an empty edge set.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b")))
         .distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    hit = e.join(rev, ["a", "b"], "semi")
    n = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    r = hit.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocated"))
    return (n.crossJoin(r)
            .select("n_edges", "n_reciprocated",
                    F.when(F.col("n_edges") > 0,
                           F.col("n_reciprocated").cast("double")
                           / F.col("n_edges").cast("double"))
                    .alias("reciprocity")))


def modularity(edges: DataFrame, labels: DataFrame,
               src: str = "src", dst: str = "dst",
               node_col: str = "node",
               label_col: str = "label") -> DataFrame:
    """Newman-Girvan modularity Q of a node partition over the
    canonical simple undirected graph — THE number that says whether
    a community assignment (label_propagation's output, a domain
    clustering, a spam-ring hypothesis) beats chance: Q = sum_c
    [L_c/m - (d_c/2m)^2], positive when communities are denser inside
    than the degree-preserving random graph predicts.

    Transcendental-free and sum-order-free: the algebra collapses to
    Q = (4m * intra - sum_c d_c^2) / (4m^2) with intra = edges whose
    endpoints share a label and d_c = community degree sum — ALL
    exact BIGINTs (no float accumulation over communities), then ONE
    IEEE division. int64 domain: 4m^2 < 2^63 caps m at ~1.5e9 edges;
    past that, compute the two integer terms distributed (they still
    fit) and divide in arbitrary precision driver-side.

    Unlabeled endpoints drop (inner joins) — pass a total labeling
    for textbook Q. Returns one row
    (m_edges, intra_edges, sum_dc2, modularity); NULL Q for an empty
    edge set.
    """
    e = _canon_edges(edges, src, dst)
    lab = labels.select(F.col(node_col).alias("_n"),
                        F.col(label_col).alias("_l"))
    la = lab.select(F.col("_n").alias("a"), F.col("_l").alias("_la"))
    lb = lab.select(F.col("_n").alias("b"), F.col("_l").alias("_lb"))
    ej = e.join(la, "a").join(lb, "b")
    m = ej.agg(
        F.count(F.lit(1)).cast("long").alias("m_edges"),
        F.sum((F.col("_la") == F.col("_lb")).cast("long"))
        .cast("long").alias("intra_edges"))
    adj = ej.select(F.col("a").alias("_n"), F.col("_la").alias("_l")) \
        .unionAll(ej.select(F.col("b").alias("_n"), F.col("_lb").alias("_l")))
    dc = (adj.groupBy("_l").agg(F.count(F.lit(1)).alias("_d"))
          .agg(F.sum(F.col("_d") * F.col("_d")).cast("long")
               .alias("sum_dc2")))
    j = m.crossJoin(dc)
    q = (F.lit(4) * F.col("m_edges") * F.col("intra_edges")
         - F.col("sum_dc2")).cast("double") \
        / (F.lit(4) * F.col("m_edges") * F.col("m_edges")).cast("double")
    return j.select(
        "m_edges", "intra_edges",
        F.coalesce(F.col("sum_dc2"), F.lit(0).cast("long")).alias("sum_dc2"),
        F.when(F.col("m_edges") > 0, q).alias("modularity"))


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iters: int = 2, damping: float = 0.85,
                          src: str = "src", dst: str = "dst",
                          node_col: str = "node",
                          deterministic: bool = False,
                          checkpoint_every: int = 0) -> DataFrame:
    """Personalized PageRank: teleportation returns to the SEED set
    (uniformly) instead of the whole graph — relevance-to-the-seeds
    centrality, the standard crawl-frontier prioritizer ("rank hosts
    by proximity to trusted seeds" — the TrustRank shape) and
    related-entity scorer. Same execution skeleton as ``pagerank``
    (edge join + dst rollup per iteration, dangling mass leaks, rank
    ordering is the consumable); r0 = 1/|S| on seeds, 0 elsewhere;
    each step adds (1-d)/|S| on seeds only.

    ``deterministic=True`` folds contributions in src-sorted order
    (the contract's IEEE-fold rule) so ranks are SQL-mirrorable;
    plain SUM is the scale path. Nodes never reachable from a seed
    report rank 0. Returns (node, rank) over all graph nodes.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nd = (e.select(F.col("src").alias("node"))
          .unionByName(e.select(F.col("dst").alias("node"))).distinct())
    sd = seeds.select(F.col(node_col).alias("node")).distinct()
    ns = sd.count()
    if ns == 0:
        raise ValueError("personalized_pagerank needs >= 1 seed")
    isseed = nd.join(sd.withColumn("_s", F.lit(True)), "node", "left") \
        .select("node", F.coalesce("_s", F.lit(False)).alias("_s"))
    base = (1.0 - damping) / float(ns)
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("_odeg"))
    ranks = isseed.select(
        "node", F.when(F.col("_s"), F.lit(1.0 / float(ns)))
        .otherwise(F.lit(0.0)).alias("rank"))
    for i in range(int(iters)):
        contribs = (e.join(outdeg, "src")
                    .join(ranks, F.col("src") == F.col("node"))
                    .select("src", "dst",
                            (F.col("rank") / F.col("_odeg")).alias("_c")))
        if deterministic:
            agg = (contribs.groupBy("dst")
                   .agg(F.aggregate(
                       F.array_sort(F.collect_list(F.struct("src", "_c"))),
                       F.lit(0.0),
                       lambda acc, x: acc + x["_c"]).alias("_s2")))
        else:
            agg = contribs.groupBy("dst").agg(F.sum("_c").alias("_s2"))
        ranks = (isseed.join(agg, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         (F.when(F.col("_s"), F.lit(base))
                          .otherwise(F.lit(0.0))
                          + F.lit(damping)
                          * F.coalesce(F.col("_s2"), F.lit(0.0)))
                         .alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def rich_club(edges: DataFrame, ks: list,
              src: str = "src", dst: str = "dst") -> DataFrame:
    """Rich-club coefficient ladder (Zhou & Mondragon 2004): for each
    degree threshold k, phi(k) = 2*E_k / (N_k*(N_k-1)) with N_k the
    nodes of degree > k and E_k the edges among them — "do the hubs
    of this crawl graph preferentially interlink" (phi -> 1: an
    oligarchy/link cartel; low phi: hubs are independent portals).

    One degree rollup + one edge-degree join; every threshold is a
    conditional BIGINT sum over the SAME joined frame (no per-k
    passes), stacked to rows; phi is one mirrored IEEE division.
    Returns (k, n_nodes, n_edges, phi) — phi NULL when N_k < 2.
    """
    e = _canon_edges(edges, src, dst)
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("_db"))
    ej = e.join(da, "a").join(db, "b")
    ks = sorted(int(k) for k in ks)
    ecnt = ej.agg(*[
        F.sum(((F.col("_da") > k) & (F.col("_db") > k)).cast("long"))
        .cast("long").alias(f"_e{i}") for i, k in enumerate(ks)])
    ncnt = deg.agg(*[
        F.sum((F.col("deg") > k).cast("long")).cast("long")
        .alias(f"_n{i}") for i, k in enumerate(ks)])
    j = ecnt.crossJoin(ncnt)
    stacked = j.select(F.explode(F.array(*[
        F.struct(F.lit(k).cast("long").alias("k"),
                 F.coalesce(F.col(f"_n{i}"), F.lit(0)).cast("long")
                 .alias("n_nodes"),
                 F.coalesce(F.col(f"_e{i}"), F.lit(0)).cast("long")
                 .alias("n_edges"))
        for i, k in enumerate(ks)])).alias("s")).select("s.*")
    return stacked.select(
        "k", "n_nodes", "n_edges",
        F.when(F.col("n_nodes") >= 2,
               (F.lit(2) * F.col("n_edges")).cast("double")
               / (F.col("n_nodes") * (F.col("n_nodes") - 1))
               .cast("double")).alias("phi"))


def bipartite_project(edges: DataFrame, left: str = "user",
                      right: str = "item", min_shared: int = 2,
                      max_left_degree: int | None = None) -> DataFrame:
    """Bipartite one-mode projection: from (left, right) incidence
    edges (user-host visits, doc-term containment, account-place
    check-ins) build the right-side co-occurrence graph — items
    connected by the number of DISTINCT left nodes they share. The
    workhorse behind co-visitation recommenders, host affiliation
    graphs, and coordinated-account detection (two places visited by
    the same 40 accounts are one community).

    Scale shape: distinct incidence -> self-equi-join ON THE LEFT KEY
    -> (item, item) count rollup. Pair volume is sum over left nodes
    of deg^2 — a power-user whose degree is 10^5 contributes 10^10
    pairs, the classic projection blow-up — so ``max_left_degree``
    drops left nodes above the cap via one degree rollup + semi-join
    (the minhash hot-bucket guard's shape; dropped hubs are
    boilerplate visitors that connect everything to everything and
    carry no signal). ``min_shared`` prunes the long noise tail
    after the rollup.

    Returns (item_a, item_b, n_shared) with item_a < item_b.
    """
    e = (edges.select(F.col(left).alias("_l"), F.col(right).alias("_r"))
         .filter(F.col("_l").isNotNull() & F.col("_r").isNotNull())
         .distinct())
    if max_left_degree is not None:
        keep = (e.groupBy("_l").agg(F.count(F.lit(1)).alias("_d"))
                .filter(F.col("_d") <= int(max_left_degree))
                .select("_l"))
        e = e.join(keep, "_l", "semi")
    a = e.select("_l", F.col("_r").alias("item_a"))
    b = e.select("_l", F.col("_r").alias("item_b"))
    return (a.join(b, "_l")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= int(min_shared)))


def negative_edges(edges: DataFrame, n_nodes: int, per_node: int = 2,
                   probes: int = 8, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Deterministic negative sampling for link-prediction training
    data: for every node id in [0, n_nodes), up to ``per_node``
    verified NON-edges — the other half of the (positive, negative)
    pair set a graph-ML pipeline feeds its ranking loss, made
    reproducible (no RNG) so the dataset regenerates bit-identically
    on every run. Node ids must be dense [0, n_nodes) (the corpus
    convention); partner candidates come from the affine probe family
    (u * (2i+3) + 7i + 1) % n, i < ``probes``.

    Plan: generate node x probe candidates map-side (explode of a
    literal sequence), canonicalize, ONE anti-join against the
    canonical edge set (the verification — no false negatives), then
    WindowGroupLimit keeps the first ``per_node`` by probe index.
    Nodes whose probes all collide with real edges or self-loops
    yield fewer rows (raise ``probes``).

    Returns (src, dst, probe) with (src, dst) canonical (src < dst).
    """
    from pyspark.sql.window import Window

    e = _canon_edges(edges, src, dst)
    n = int(n_nodes)
    nodes = e.sparkSession.range(n).select(F.col("id").alias("_u"))
    cand = (nodes
            .withColumn("_i", F.explode(F.sequence(
                F.lit(0), F.lit(int(probes) - 1))))
            .withColumn("_v", (F.col("_u") * (F.lit(2) * F.col("_i") + 3)
                               + F.lit(7) * F.col("_i") + 1) % n)
            .filter(F.col("_u") != F.col("_v"))
            .select("_i", F.least("_u", "_v").alias("a"),
                    F.greatest("_u", "_v").alias("b"),
                    F.col("_u").alias("_owner"))
            .distinct())
    neg = cand.join(e, ["a", "b"], "anti")
    w = Window.partitionBy("_owner").orderBy("_i")
    return (neg.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= int(per_node))
            .select(F.col("a").alias("src"), F.col("b").alias("dst"),
                    F.col("_i").cast("long").alias("probe")))


def graph_summary(edges: DataFrame, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """One-row graph overview — the first thing anyone asks of a new
    link dump: node/edge counts, density, average and maximum degree
    over the canonical simple graph. All exact BIGINTs plus two
    single divisions (avg_deg = 2m/n, density = 2m/(n(n-1))).

    Returns (n_nodes, n_edges, max_degree, avg_degree, density);
    ratios NULL for degenerate graphs (n < 2).
    """
    e = _canon_edges(edges, src, dst)
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    m = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    d = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.max("deg").cast("long").alias("max_degree"))
    j = d.crossJoin(m)
    return j.select(
        "n_nodes", "n_edges", "max_degree",
        F.when(F.col("n_nodes") > 0,
               (F.lit(2) * F.col("n_edges")).cast("double")
               / F.col("n_nodes").cast("double")).alias("avg_degree"),
        F.when(F.col("n_nodes") >= 2,
               (F.lit(2) * F.col("n_edges")).cast("double")
               / (F.col("n_nodes") * (F.col("n_nodes") - 1))
               .cast("double")).alias("density"))


def degree_distribution(edges: DataFrame, src: str = "src",
                        dst: str = "dst") -> DataFrame:
    """Degree histogram of the canonical simple graph — the
    power-law eyeball plot (and the input to any "is this crawl's
    tail heavier than last month's" comparison). Two rollups, pure
    integers. Returns (degree, n_nodes)."""
    e = _canon_edges(edges, src, dst)
    adj = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .select(F.col("degree").cast("long").alias("degree"),
                    "n_nodes"))
