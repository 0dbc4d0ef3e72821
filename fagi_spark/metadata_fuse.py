"""Metadata (attribute) fusion actions over EAV triples (SURVEY.md §2.6).

The reference dispatches per-property actions (FuseLinkServlet.java:
1058-1101; BatchFusionServlet.java:1622-1656; registry
FuserPanel.java:175-184): None, Keep A, Keep B, Keep Both,
Keep Concatenated A/B/Both, Concatenation, Keep Flattened A/B/Both —
all SPARQL INSERT...WHERE joins of the links graph with bounded-depth
property chains. Here: equi-joins of the links frame with the EAV
frames + predicate rename / concat_ws / union; chains via iterated
self-joins bounded by MAX_METADATA_DEPTH = 6 (Constants.java:76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_METADATA_DEPTH = 6  # Constants.java:76

EAV = ("subject", "predicate", "object", "lang", "dtype")


def _local_name(pred):
    """Predicate local name: text after the last '/' or '#'
    (Utilities.getPredicateName, Utilities.java:126-141)."""
    return F.element_at(F.split(pred, "[/#]"), -1)


def rename_into(pred, dom_onto: str):
    """domOnto + localName, commas/spaces -> '_'
    (BatchFusionServlet.java:2889-2983)."""
    return F.concat(F.lit(dom_onto),
                    F.regexp_replace(_local_name(pred), "[, ]", "_"))


def keep_left(links: DataFrame, meta_a: DataFrame, dom_onto: str,
              predicates: list[str] | None = None) -> DataFrame:
    """Keep A: copy A's properties onto the fused subject, predicate
    renamed into the dominant ontology (BatchFusionServlet.java:2889-2983).
    Output keyed by the link pair so downstream sinks can target either
    side's URI (dominant-side selection, VirtuosoImporter.java:504-507)."""
    m = meta_a
    if predicates is not None:
        m = m.filter(F.col("predicate").isin(predicates))
    j = links.join(m, links.node_a == m.subject, "inner")
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    rename_into(F.col("predicate"), dom_onto).alias("predicate"),
                    "object", "lang", "dtype")


def keep_right(links: DataFrame, meta_b: DataFrame, dom_onto: str,
               predicates: list[str] | None = None) -> DataFrame:
    m = meta_b
    if predicates is not None:
        m = m.filter(F.col("predicate").isin(predicates))
    j = links.join(m, links.node_b == m.subject, "inner")
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    rename_into(F.col("predicate"), dom_onto).alias("predicate"),
                    "object", "lang", "dtype")


def keep_both(links: DataFrame, meta_a: DataFrame, meta_b: DataFrame,
              dom_onto: str, predicates: list[str] | None = None) -> DataFrame:
    """Keep Both = union of both sides (FuseLinkServlet.java:1067-1071)."""
    return keep_left(links, meta_a, dom_onto, predicates).unionByName(
        keep_right(links, meta_b, dom_onto, predicates))


def concat_values(links: DataFrame, meta_a: DataFrame, meta_b: DataFrame,
                  pred_a: str, pred_b: str, dom_onto: str,
                  sep: str = " ") -> DataFrame:
    """Keep Concatenated: paired chain values concatenated into one
    literal (BatchFusionServlet.java:2107-2386)."""
    a = meta_a.filter(F.col("predicate") == pred_a).select(
        F.col("subject").alias("node_a"), F.col("object").alias("obj_a"))
    b = meta_b.filter(F.col("predicate") == pred_b).select(
        F.col("subject").alias("node_b"), F.col("object").alias("obj_b"))
    j = links.join(a, "node_a").join(b, "node_b")
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    rename_into(F.lit(pred_a), dom_onto).alias("predicate"),
                    F.concat_ws(sep, F.col("obj_a"), F.col("obj_b")).alias("object"))


def expand_chain(meta: DataFrame, depth: int) -> DataFrame:
    """Follow object->subject hops up to ``depth`` (<= 6), producing
    (subject, predicate_chain, object) rows where predicate_chain joins
    hop predicates with '=>' — the reference's chain separator
    (Constants.java:64; expandChain, VirtuosoImporter.java:1052-1166).
    Intermediate (blank-node) objects are chased; terminal literals stop.

    One lazy plan, no per-level driver jobs: a frontier that runs dry
    simply contributes empty join branches (bounded by depth <= 6) —
    the earlier eager ``isEmpty()`` early-exit cost an extra job per
    level and re-executed each frontier's lineage O(depth^2)."""
    depth = min(depth, MAX_METADATA_DEPTH)
    base = meta.select("subject", F.col("predicate").alias("predicate_chain"), "object")
    frontier = base
    out = base
    hop = meta.select(F.col("subject").alias("_hs"),
                      F.col("predicate").alias("_hp"),
                      F.col("object").alias("_ho"))
    for _ in range(1, depth):
        nxt = (frontier.join(hop, frontier.object == hop._hs, "inner")
               .select("subject",
                       F.concat_ws("=>", F.col("predicate_chain"), F.col("_hp")).alias("predicate_chain"),
                       F.col("_ho").alias("object")))
        out = out.unionByName(nxt)
        frontier = nxt
    return out


def keep_flattened(links: DataFrame, meta: DataFrame, dom_onto: str,
                   side: str = "a", depth: int = MAX_METADATA_DEPTH) -> DataFrame:
    """Keep Flattened: nested chains collapsed to depth-1 predicates on
    the fused subject (BatchFusionServlet.java:1778-2050) — chain
    predicates joined by '_' under the dominant namespace."""
    chains = expand_chain(meta, depth)
    key = "node_a" if side == "a" else "node_b"
    j = links.join(chains, F.col(key) == chains.subject, "inner")
    flat_pred = F.concat(F.lit(dom_onto),
                         F.regexp_replace(
                             F.concat_ws("_", F.transform(
                                 F.split(F.col("predicate_chain"), "=>"),
                                 lambda p: F.element_at(F.split(p, "[/#]"), -1))),
                             "[, ]", "_"))
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    flat_pred.alias("predicate"), "object")


def chain_paths(meta: DataFrame, depth: int = MAX_METADATA_DEPTH) -> DataFrame:
    """Chain instances WITH their hop triples: one row per chain
    instance, carrying (root, predicate_chain, hops array<struct
    <subject, predicate, object>>). The per-level shape matches
    expand_chain; the hops array (bounded by depth <= 6) lets
    keep_selected_chain re-emit the full subtree with one hop renamed."""
    depth = min(depth, MAX_METADATA_DEPTH)
    h = F.struct(F.col("subject"), F.col("predicate"), F.col("object"))
    base = meta.select(F.col("subject").alias("root"),
                       F.col("predicate").alias("predicate_chain"),
                       F.array(h).alias("hops"),
                       F.col("object").alias("_tail"))
    hop = meta.select(F.col("subject").alias("_hs"),
                      F.col("predicate").alias("_hp"),
                      F.col("object").alias("_ho"))
    out = base
    frontier = base
    for _ in range(1, depth):
        nh = F.struct(F.col("_hs").alias("subject"), F.col("_hp").alias("predicate"),
                      F.col("_ho").alias("object"))
        nxt = (frontier.join(hop, frontier._tail == hop._hs, "inner")
               .select("root",
                       F.concat_ws("=>", F.col("predicate_chain"), F.col("_hp")).alias("predicate_chain"),
                       F.concat(F.col("hops"), F.array(nh)).alias("hops"),
                       F.col("_ho").alias("_tail")))
        out = out.unionByName(nxt)
        frontier = nxt
    return out.drop("_tail")


def find_common_prefixed_chains(selected: str, patterns: list[str],
                                sep: str = "=>") -> list[str]:
    """Chains string-prefixed by ``selected``
    (Utilities.findCommonPrefixedPropertyChains, Utilities.java:188-209
    — the reference's two branches, deeper ``selected+sep`` chains and
    bare string prefixes, collapse to one test since the former is a
    subset of the latter; reference separator ',', ours '=>')."""
    return [s for s in patterns if s.startswith(selected)]


def keep_selected_chain(links: DataFrame, meta: DataFrame,
                        selected_chain: list[str], dom_onto: str,
                        side: str = "a",
                        depth: int = MAX_METADATA_DEPTH) -> DataFrame:
    """Chain-selected Keep with common-prefix expansion
    (BatchFusionServlet.metadataKeepLeft, BatchFusionServlet.java:
    2889-2983): the selected ``=>``-chain plus every chain it prefixes
    is copied for linked subjects, preserving the hop structure, with
    the predicate at the selected chain's LAST hop renamed into the
    dominant ontology (newPred = chain names joined '_', commas/spaces
    -> '_'); hops before and after keep their original predicates.
    Output: distinct (subject_a, subject_b, subject, predicate, object)
    triples keyed by the link pair (the reference's graph INSERT dedups
    identical triples across patterns — .distinct() mirrors that).

    The pattern inventory is a DISTINCT over chain strings (tiny by
    construction — schema-sized, not data-sized), collected once from
    the lighter ``expand_chain`` plan (no hops arrays), so the
    array-building ``chain_paths`` tower executes only once, at action
    time."""
    import re as _re
    sel = "=>".join(selected_chain)
    m = len(selected_chain)
    paths = chain_paths(meta, depth)
    patterns = [r[0] for r in
                expand_chain(meta, depth)
                .select("predicate_chain").distinct().collect()]
    matched = find_common_prefixed_chains(sel, patterns)
    new_local = "_".join(
        _re.sub("[, ]", "_", p.split("/")[-1].split("#")[-1])
        for p in selected_chain)
    renamed = F.lit(dom_onto + new_local)
    hops = (paths.filter(F.col("predicate_chain").isin(matched))
            .select("root", F.posexplode("hops").alias("hop_idx", "h")))
    key = "node_a" if side == "a" else "node_b"
    j = links.join(hops, F.col(key) == hops.root, "inner")
    return (j.select(F.col("node_a").alias("subject_a"),
                     F.col("node_b").alias("subject_b"),
                     F.col("h.subject").alias("subject"),
                     F.when(F.col("hop_idx") == m - 1, renamed)
                      .otherwise(F.col("h.predicate")).alias("predicate"),
                     F.col("h.object").alias("object"))
            .distinct())


def rest_action_keep(links: DataFrame, meta: DataFrame, side: str,
                     selected_predicates: list[str]) -> DataFrame:
    """Rest action: properties NOT explicitly selected keep their
    original predicate (graph ADD analog, BatchFusionServlet.java:656-708)."""
    key = "node_a" if side == "a" else "node_b"
    m = meta.filter(~F.col("predicate").isin(selected_predicates))
    j = links.join(m, F.col(key) == m.subject, "inner")
    return j.select(F.col("node_a").alias("subject_a"),
                    F.col("node_b").alias("subject_b"),
                    "predicate", "object", "lang", "dtype")
