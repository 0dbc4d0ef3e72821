"""Link discovery / conflation matching (SURVEY.md §2.7).

Reference flow (FindLinkServlet / BatchFindLinkServlet):
  1. radius candidate search around the source centroid with the
     0.01-degree width guard (joins.radius_join: J4 + F5);
  2. literal-kind filters on candidate metadata (F2,
     FindLinkServlet.java:254-264);
  3. term-frequency: literals appearing under >1 candidate are dropped
     as non-discriminative (A3, FindLinkServlet.java:271-277, 389-391);
  4. token Jaccard with Jaro-Winkler token equivalence (JW > 0.8 counts
     as an intersection; union = lowercased token set)
     (FindLinkServlet.java:478-510);
  5. emit links with index > 0.8 (interactive, :401) or > 0.2 (batch,
     BatchFindLinkServlet.java:712-713), carrying centroid distance in
     meters (distance_deg * 111195).

Scoring runs inside one ``applyInPandas`` per candidate group — the
token sets are tiny; the heavy lifting (candidate generation) is the
cell-partitioned join upstream.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import joins

# Patterns.java:17-38 analogs
INT_RE = r"^[0-9]+$"
WORD_BREAK_RE = re.compile(r"[^0-9a-zA-Z]+")  # PATTERN_WORD_BREAKER analog

JW_TOKEN_THRESHOLD = 0.8     # FindLinkServlet.java:502
INTERACTIVE_THRESHOLD = 0.8  # FindLinkServlet.java:401
BATCH_THRESHOLD = 0.2        # BatchFindLinkServlet.java:713

# stopWords.ser analog (VirtuosoImporter.java:1245-1261; filter applied
# by lowercase membership at :1105 before scoring) — the reference ships
# a serialized HashSet; here a standard public English stop list.
# Single-letter tokens are deliberately NOT stopped (the word breaker
# already yields them from possessives — "St. Mary's" -> {st, mary, s} —
# and the reference set does not drop them either).
STOP_WORDS = frozenset("""
a about above after again all an and any are as at be because been before
being below between both but by down during each few for from further had
has have having he her here hers him his how i if in into is it its just
me more most my no nor not now of off on once only or other our out over
own same she so some such than that the their them then there these they
this those through to too under until up very was we were what when where
which while who whom why will with you your
""".split())


def literal_kind_filter(meta: DataFrame, obj: str = "object") -> DataFrame:
    """F2: drop pure integers, drop URLs (contains 'http'), keep
    literals containing letters (FindLinkServlet.java:254-264)."""
    c = F.col(obj)
    return meta.filter(c.isNotNull()
                       & ~c.rlike(INT_RE)
                       & ~c.contains("http")
                       & c.rlike("[a-zA-Z]"))


def tf_unique_filter(cand_literals: DataFrame, group: str, obj: str = "object") -> DataFrame:
    """A3: within each source entity's candidate set, keep only literals
    whose frequency == 1 (FindLinkServlet.java:389-391). ``group`` is
    the source-entity column; frequency counts candidate subjects."""
    w = Window.partitionBy(group, obj)
    return (cand_literals.withColumn("_tf", F.count(F.lit(1)).over(w))
            .filter(F.col("_tf") == 1).drop("_tf"))


def jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler (prefix scale 0.1, max prefix 4) — the
    token-equivalence metric of FindLinkServlet.java:497-498."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < 4:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


def token_jaccard_jw(text_a: str, text_b: str,
                     stopwords: frozenset = STOP_WORDS) -> float:
    """Token Jaccard with JW>0.8 token equivalence: intersection counts
    token pairs with JW above threshold; union is the combined
    lowercased token set (FindLinkServlet.java:478-510). Stop words are
    dropped before scoring (stopWords.ser filter,
    VirtuosoImporter.java:1105) so a stop-word-only overlap scores 0;
    pass ``stopwords=frozenset()`` to disable."""
    ta = [t for t in WORD_BREAK_RE.split((text_a or "").lower())
          if t and t not in stopwords]
    tb = [t for t in WORD_BREAK_RE.split((text_b or "").lower())
          if t and t not in stopwords]
    if not ta or not tb:
        return 0.0
    sa, sb = set(ta), set(tb)
    inter = 0
    used = set()
    for x in sorted(sa):
        for y in sorted(sb):
            if y in used:
                continue
            if x == y or jaro_winkler(x, y) > JW_TOKEN_THRESHOLD:
                inter += 1
                used.add(y)
                break
    union = len(sa | sb)
    return inter / union if union else 0.0


SCORE_SCHEMA = ("a_subject string, b_subject string, similarity double, "
                "distance_m double")


def score_candidates(cands: DataFrame) -> DataFrame:
    """cands: (a_subject, b_subject, a_text, b_text, distance_m) ->
    similarity per pair. The score is a pure per-row function, so this
    is a shuffle-free ``mapInPandas`` over whatever partitioning the
    candidate join produced (an earlier ``groupBy(a_subject).
    applyInPandas`` version forced an extra full shuffle for no
    semantic gain — the reference's per-entity batching is an artifact
    of its HTTP request loop, not of the scoring math)."""

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                out.append((r.a_subject, r.b_subject,
                            token_jaccard_jw(r.a_text, r.b_text), r.distance_m))
            yield pd.DataFrame(out, columns=["a_subject", "b_subject",
                                             "similarity", "distance_m"])

    return (cands.select("a_subject", "b_subject", "a_text", "b_text", "distance_m")
            .mapInPandas(run, SCORE_SCHEMA))


def candidate_frame(geo_a: DataFrame, geo_b: DataFrame,
                    meta_a: DataFrame, meta_b: DataFrame,
                    radius_m: float) -> DataFrame:
    """The pre-scoring sub-pipeline of link discovery — everything up to
    (but excluding) the Python JW scorer, so it is pure SQL and
    driver-oracle-checkable: radius candidates (J4+F5) -> literal-kind
    filter (F2) -> TF-unique filter (A3) -> per-pair sorted literal
    concat. Returns (a_subject, b_subject, a_text, b_text, distance_m)."""
    cand = joins.radius_join(geo_a, geo_b, radius_m)

    lits_b = literal_kind_filter(meta_b).select(
        F.col("subject").alias("b_subject"), "object")
    cand_lits = cand.select("a_subject", "b_subject").join(lits_b, "b_subject")
    cand_lits = tf_unique_filter(cand_lits, group="a_subject")
    b_text = (cand_lits.groupBy("a_subject", "b_subject")
              .agg(F.concat_ws(" ", F.sort_array(F.collect_list("object"))).alias("b_text")))

    lits_a = literal_kind_filter(meta_a).select(
        F.col("subject").alias("a_subject"), "object")
    a_text = (lits_a.groupBy("a_subject")
              .agg(F.concat_ws(" ", F.sort_array(F.collect_list("object"))).alias("a_text")))

    return (cand.select("a_subject", "b_subject", "distance_m")
            .join(b_text, ["a_subject", "b_subject"])
            .join(a_text, "a_subject"))


def token_set_col(col, stopwords: frozenset = STOP_WORDS):
    """Column twin of the tokenizer inside ``token_jaccard_jw``:
    lowercase, word-break split (WORD_BREAK_RE), drop empties and stop
    words, distinct. Pure JVM array math — the SQL-expressible half of
    the scoring stage."""
    toks = F.split(F.lower(col), r"[^0-9a-zA-Z]+")
    stop = sorted(stopwords)
    return F.array_distinct(
        F.filter(toks, lambda x: (x != F.lit("")) & ~x.isin(*stop)))


def discover_links_exact(geo_a: DataFrame, geo_b: DataFrame,
                         meta_a: DataFrame, meta_b: DataFrame,
                         radius_m: float, threshold: float = BATCH_THRESHOLD,
                         stopwords: frozenset = STOP_WORDS) -> DataFrame:
    """Link discovery with JW token equivalence DISABLED: a token pair
    counts toward the intersection only on exact equality, so the
    entire flow — candidates, filters, token Jaccard, threshold — is
    pure Spark SQL (array_intersect/array_union over the token sets)
    and value-exact oracle-checkable. The reference's JW>0.8 token
    equivalence (FindLinkServlet.java:497-510) is the superset scorer
    in ``discover_links`` (Python kernel; exact-value pytest fixtures);
    this variant is what you deploy when literal vocabularies are clean
    enough that fuzzy token matching buys nothing — and it never leaves
    whole-stage codegen."""
    pairs = candidate_frame(geo_a, geo_b, meta_a, meta_b, radius_m)
    ta = token_set_col(F.col("a_text"), stopwords)
    tb = token_set_col(F.col("b_text"), stopwords)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    sim = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (pairs.withColumn("similarity", sim)
            .filter(F.col("similarity") > threshold)
            .select(F.col("a_subject").alias("node_a"),
                    F.col("b_subject").alias("node_b"),
                    "similarity", "distance_m"))


def discover_links(geo_a: DataFrame, geo_b: DataFrame,
                   meta_a: DataFrame, meta_b: DataFrame,
                   radius_m: float, threshold: float = BATCH_THRESHOLD,
                   label_pred_suffix: str = "label") -> DataFrame:
    """End-to-end batch link discovery. meta_{a,b} are EAV frames;
    literals are concatenated per subject after kind + TF filtering.
    Returns (node_a, node_b, similarity, distance_m)."""
    pairs = candidate_frame(geo_a, geo_b, meta_a, meta_b, radius_m)
    scored = score_candidates(pairs)
    return (scored.filter(F.col("similarity") > threshold)
            .select(F.col("a_subject").alias("node_a"),
                    F.col("b_subject").alias("node_b"),
                    "similarity", "distance_m"))


def fs_weights(a: DataFrame, b: DataFrame, links: DataFrame, attrs: list,
               key: str = "id", link_a: str = "id_a",
               link_b: str = "id_b") -> DataFrame:
    """Fellegi-Sunter agreement statistics per attribute: m-probability
    (P(values agree | pair is a true match), from the labeled links)
    and u-probability (P(agree | non-match), from the closed-form
    all-pairs census) — the weights a probabilistic record-linkage
    scorer multiplies per field. Reported as the raw likelihood ratio
    w_agree = m/u (no logarithms — the oracle-float contract), NULL
    when u is 0.

    The u-side NEVER enumerates the n_a x n_b cross product: total
    agreeing pairs per attribute = sum over attribute values v of
    count_a(v) * count_b(v), i.e. two per-side value rollups and one
    equi-join on the value — the same counts-product trick that makes
    this estimable at corpus scale. NULL attribute values never agree
    (equi-join semantics on both engines).

    Returns one row per attribute: (attr, n_pairs, n_matched,
    agree_m, agree_all, agree_u, m_prob, u_prob, w_agree).
    """
    na = a.agg(F.count(F.lit(1)).alias("_na"))
    nb = b.agg(F.count(F.lit(1)).alias("_nb"))
    nm = links.agg(F.count(F.lit(1)).alias("_nm"))
    out = None
    for attr in attrs:
        av = a.select(F.col(key).alias("_ka"), F.col(attr).alias("_va"))
        bv = b.select(F.col(key).alias("_kb"), F.col(attr).alias("_vb"))
        am = (links.select(F.col(link_a).alias("_ka"),
                           F.col(link_b).alias("_kb"))
              .join(av, "_ka").join(bv, "_kb")
              .filter(F.col("_va") == F.col("_vb"))
              .agg(F.count(F.lit(1)).alias("_am")))
        ca = (av.filter(F.col("_va").isNotNull())
              .groupBy("_va").agg(F.count(F.lit(1)).alias("_ca")))
        cb = (bv.filter(F.col("_vb").isNotNull())
              .groupBy(F.col("_vb").alias("_va"))
              .agg(F.count(F.lit(1)).alias("_cb")))
        aa = (ca.join(cb, "_va")
              .agg(F.coalesce(F.sum(F.col("_ca") * F.col("_cb")),
                              F.lit(0)).alias("_aa")))
        row = (na.crossJoin(nb).crossJoin(nm)
               .crossJoin(am).crossJoin(aa)
               .select(F.lit(attr).alias("attr"),
                       (F.col("_na") * F.col("_nb")).cast("long")
                       .alias("n_pairs"),
                       F.col("_nm").cast("long").alias("n_matched"),
                       F.col("_am").cast("long").alias("agree_m"),
                       F.col("_aa").cast("long").alias("agree_all")))
        out = row if out is None else out.unionByName(row)
    au = (F.col("agree_all") - F.col("agree_m")).cast("long")
    nu = (F.col("n_pairs") - F.col("n_matched")).cast("long")
    # NULL (not a 0/0 crash under ANSI) when a denominator is empty
    m = F.when(F.col("n_matched") > 0,
               F.col("agree_m").cast("double")
               / F.col("n_matched").cast("double"))
    u = F.when(nu > 0,
               F.col("agree_u").cast("double") / nu.cast("double"))
    return (out.withColumn("agree_u", au)
            .withColumn("m_prob", m)
            .withColumn("u_prob", u)
            .withColumn("w_agree",
                        F.when(F.col("u_prob") > 0,
                               F.col("m_prob") / F.col("u_prob"))))


def blocking_quality(cand: DataFrame, truth: DataFrame, n_total: int,
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Blocking-scheme audit: pair completeness (share of ground-truth
    duplicate pairs the candidate set covers — blocking recall) and
    reduction ratio (share of the all-pairs quadratic the blocker
    avoided) — the two numbers that justify ANY blocking choice (LSH
    bands, grid cells, sorted neighborhood) before the expensive
    verify stage runs.

    Both inputs are canonicalized to unordered distinct (lo, hi)
    pairs, so orientation conventions don't skew the counts; the
    denominator n_total*(n_total-1)/2 comes from the caller (a
    bounded scalar). Two count rollups + one pair equi-join — never
    the cross product.

    Returns one row: (n_candidates, n_truth, n_hit,
    pair_completeness, reduction_ratio).
    """
    def _canon(df):
        return (df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("_lo"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi")).distinct())

    c = _canon(cand)
    t = _canon(truth)
    nc = c.agg(F.count(F.lit(1)).alias("n_candidates"))
    nt = t.agg(F.count(F.lit(1)).alias("n_truth"))
    nh = c.join(t, ["_lo", "_hi"]).agg(F.count(F.lit(1)).alias("n_hit"))
    total = int(n_total) * (int(n_total) - 1) // 2
    return (nc.crossJoin(nt).crossJoin(nh)
            .select(F.col("n_candidates").cast("long").alias("n_candidates"),
                    F.col("n_truth").cast("long").alias("n_truth"),
                    F.col("n_hit").cast("long").alias("n_hit"),
                    F.when(F.col("n_truth") > 0,
                           F.col("n_hit").cast("double")
                           / F.col("n_truth").cast("double"))
                    .alias("pair_completeness"),
                    (F.lit(1.0) - F.col("n_candidates").cast("double")
                     / F.lit(float(total))).alias("reduction_ratio")))


def fs_score_pairs(cand: DataFrame, a: DataFrame, b: DataFrame,
                   weights: DataFrame, attrs: list, key: str = "id",
                   id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Fellegi-Sunter candidate-pair scoring: the likelihood ratio
    prod over attributes of (m/u if the pair AGREES on the attribute
    else (1-m)/(1-u)), with (m, u) taken from a ``fs_weights``
    output frame — the verify-stage scorer that turns blocking
    candidates into ranked link decisions. Ratios multiply in the
    LISTED attrs order, left-associatively, so the float is
    reproducible; no logarithms (the log-odds form is a monotone
    transform — thresholds translate).

    NULL semantics: a NULL on either side is a DISAGREEMENT (the
    conservative convention); an attribute with a degenerate u
    (NULL, <= 0, or >= 1) poisons the score to NULL rather than
    inventing an infinity.

    Scale shape: the weights frame is len(attrs) rows — pivoted by
    conditional aggregation and broadcast; the candidate frame joins
    each side's attribute projection on its key (two hash joins) and
    every ratio is a map-side expression. Returns
    (id_a, id_b, n_agree, fs_score).
    """
    w = weights.agg(*[f for attr in attrs for f in (
        F.max(F.when(F.col("attr") == attr, F.col("m_prob")))
        .alias(f"_m_{attr}"),
        F.max(F.when(F.col("attr") == attr, F.col("u_prob")))
        .alias(f"_u_{attr}"))])
    av = a.select(F.col(key).alias(id_a),
                  *[F.col(c).alias(f"_a_{c}") for c in attrs])
    bv = b.select(F.col(key).alias(id_b),
                  *[F.col(c).alias(f"_b_{c}") for c in attrs])
    j = (cand.select(id_a, id_b)
         .join(av, id_a).join(bv, id_b)
         .crossJoin(F.broadcast(w)))
    score = None
    n_agree = F.lit(0)
    for attr in attrs:
        m, u = F.col(f"_m_{attr}"), F.col(f"_u_{attr}")
        agree = (F.col(f"_a_{attr}").isNotNull()
                 & F.col(f"_b_{attr}").isNotNull()
                 & (F.col(f"_a_{attr}") == F.col(f"_b_{attr}")))
        ratio = F.when((u > 0) & (u < 1),
                       F.when(agree, m / u)
                       .otherwise((F.lit(1.0) - m) / (F.lit(1.0) - u)))
        score = ratio if score is None else score * ratio
        n_agree = n_agree + agree.cast("int")
    return j.select(F.col(id_a), F.col(id_b),
                    n_agree.cast("long").alias("n_agree"),
                    score.alias("fs_score"))
