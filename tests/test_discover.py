"""Link discovery: JW/token-Jaccard exact values + end-to-end recovery.

SURVEY.md §5.1: similarity index values on handcrafted strings; §2.7
pipeline: candidates -> literal-kind filter -> TF filter -> token
Jaccard with JW>0.8 token equivalence -> threshold.
"""

import pytest
from pyspark.sql import functions as F

from fagi_spark import discover, fuse, synth
from fagi_spark.discover import jaro_winkler, token_jaccard_jw


# classic Jaro-Winkler reference pairs (Winkler 1990 examples)
@pytest.mark.parametrize("s1,s2,expected", [
    ("MARTHA", "MARHTA", 0.9611),
    ("DIXON", "DICKSONX", 0.8133),
    ("JELLYFISH", "SMELLYFISH", 0.8963),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("", "abc", 0.0),
])
def test_jaro_winkler_reference_values(s1, s2, expected):
    assert jaro_winkler(s1, s2) == pytest.approx(expected, abs=1e-4)


def test_token_jaccard_jw_handcrafted():
    # identical -> 1.0
    assert token_jaccard_jw("Central Park", "Central Park") == 1.0
    # one token JW-equivalent (park/parks JW > 0.8), one exact:
    # intersection 2, union = |{central, park, parks}| = 3
    assert token_jaccard_jw("Central Park", "Central Parks") == pytest.approx(2 / 3)
    # disjoint -> 0
    assert token_jaccard_jw("Alpha Beta", "Gamma Delta") == 0.0
    # word breaking strips punctuation/case (PATTERN_WORD_BREAKER
    # analog): {st, mary, s} vs {st, marys} -> st exact + mary~marys JW,
    # orphan 's' unmatched; union of 4 distinct tokens -> 2/4
    assert token_jaccard_jw("St. Mary's", "st marys") == pytest.approx(0.5)
    # empty / None safe
    assert token_jaccard_jw("", "x") == 0.0
    assert token_jaccard_jw(None, "x") == 0.0


def test_stop_word_only_overlap_does_not_link():
    """stopWords.ser analog: overlap consisting solely of stop words
    must score 0 (previously 'the of' matched and inflated the index)."""
    assert token_jaccard_jw("The House of Bread", "The Temple of Stone") == 0.0
    # informative overlap still scores, stop words excluded from union:
    # {house, bread} vs {house, stone} -> 1/3
    assert token_jaccard_jw("The House of Bread",
                            "The House of Stone") == pytest.approx(1 / 3)
    # disabling the filter restores raw behavior
    assert token_jaccard_jw("The House of Bread", "The Temple of Stone",
                            stopwords=frozenset()) > 0.0


def test_thresholds_match_reference_constants():
    assert discover.JW_TOKEN_THRESHOLD == 0.8       # FindLinkServlet.java:502
    assert discover.INTERACTIVE_THRESHOLD == 0.8    # FindLinkServlet.java:401
    assert discover.BATCH_THRESHOLD == 0.2          # BatchFindLinkServlet.java:713


def test_discover_links_recovers_golden_pairs(spark):
    """B entities are jittered copies of A with near-dup labels
    (synth fixture); batch discovery must recover i<->i pairs and must
    NOT link via the shared decoy label (TF filter)."""
    geo_a, geo_b, links, meta_a, meta_b = synth.synth_fixture(spark, 200, 150)
    ga, gb = fuse.prepare_geoms(geo_a), fuse.prepare_geoms(geo_b)
    found = discover.discover_links(ga, gb, meta_a, meta_b,
                                    radius_m=3000.0, threshold=0.2)
    rows = found.collect()
    assert rows, "discovery found nothing"
    pairs = {(r["node_a"], r["node_b"]) for r in rows}
    golden = {(f"http://linkedgeodata.org/triplify/way{i}",
               f"http://geoknow.eu/geodata#place_{i}") for i in range(200)}
    hits = pairs & golden
    # the radius gate drops far-jittered pairs; of the discovered links,
    # the overwhelming majority must be golden
    assert len(hits) / len(pairs) > 0.8
    assert len(hits) > 50
    for r in rows:
        assert r["similarity"] > 0.2
        assert r["distance_m"] <= 3000.0 + 1e-9


def test_interactive_threshold_is_stricter(spark):
    geo_a, geo_b, _, meta_a, meta_b = synth.synth_fixture(spark, 150, 100)
    ga, gb = fuse.prepare_geoms(geo_a), fuse.prepare_geoms(geo_b)
    batch = discover.discover_links(ga, gb, meta_a, meta_b, 3000.0,
                                    threshold=discover.BATCH_THRESHOLD)
    strict = discover.discover_links(ga, gb, meta_a, meta_b, 3000.0,
                                     threshold=discover.INTERACTIVE_THRESHOLD)
    b = {(r["node_a"], r["node_b"]) for r in batch.collect()}
    s = {(r["node_a"], r["node_b"]) for r in strict.collect()}
    assert s.issubset(b) and len(s) < len(b)


def exact_token_jaccard_py(a, b, stop=discover.STOP_WORDS):
    """Reference implementation of the JW-disabled score (plain Python)."""
    ta = {t for t in discover.WORD_BREAK_RE.split((a or "").lower())
          if t and t not in stop}
    tb = {t for t in discover.WORD_BREAK_RE.split((b or "").lower())
          if t and t not in stop}
    u = len(ta | tb)
    return len(ta & tb) / u if u else 0.0


def test_token_set_col_matches_python_tokenizer(spark):
    texts = ["The Quick brown-fox", "st. Mary's  Church", "", "the and of",
             "Caffè 42 http x", "One one ONE two"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(discover.token_set_col(F.col("t")).alias("toks")).collect()
    for t, r in zip(texts, got):
        want = {w for w in discover.WORD_BREAK_RE.split(t.lower())
                if w and w not in discover.STOP_WORDS}
        assert set(r["toks"]) == want, t


def test_discover_links_exact_matches_python_and_bounds_jw(spark):
    """The SQL-only exact-token variant equals the Python reference
    score pairwise, and never exceeds the JW-equivalence score (JW
    admits a superset of token matches)."""
    geo_a, geo_b, _, meta_a, meta_b = synth.synth_fixture(spark, 120, 80)
    ga, gb = fuse.prepare_geoms(geo_a), fuse.prepare_geoms(geo_b)
    pairs = discover.candidate_frame(ga, gb, meta_a, meta_b, radius_m=3000.0)
    pr = pairs.collect()
    assert pr, "fixture produced no candidates"
    exact = {(r["node_a"], r["node_b"]): r["similarity"]
             for r in discover.discover_links_exact(
                 ga, gb, meta_a, meta_b, radius_m=3000.0, threshold=-1.0).collect()}
    for r in pr:
        key = (r["a_subject"], r["b_subject"])
        want = exact_token_jaccard_py(r["a_text"], r["b_text"])
        assert abs(exact[key] - want) < 1e-12, key
        jw = discover.token_jaccard_jw(r["a_text"], r["b_text"])
        assert exact[key] <= jw + 1e-12, key


def test_fs_weights_handcase(spark):
    a = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, None)], "id long, lang string")
    b = spark.createDataFrame(
        [(10, "en"), (11, "de"), (12, None)], "id long, lang string")
    links = spark.createDataFrame(
        [(1, 10), (3, 11), (2, 11)], "id_a long, id_b long")
    [r] = discover.fs_weights(a, b, links, ["lang"]).collect()
    # n_pairs = 4*3; matched pairs agreeing on lang: (1,10) en==en,
    # (3,11) de==de -> 2 of 3.  census: en 2*1 + de 1*1 = 3 (NULLs
    # never agree).  u-side = (3-2)/(12-3).
    assert (r.attr, r.n_pairs, r.n_matched, r.agree_m,
            r.agree_all, r.agree_u) == ("lang", 12, 3, 2, 3, 1)
    assert r.m_prob == 2.0 / 3.0
    assert r.u_prob == 1.0 / 9.0
    assert r.w_agree == (2.0 / 3.0) / (1.0 / 9.0)


def test_fs_weights_zero_u_is_null(spark):
    # the only agreeing pair is a matched link -> u = 0 -> NULL w
    a = spark.createDataFrame([(1, "x"), (5, "y")], "id long, k string")
    b = spark.createDataFrame([(2, "x")], "id long, k string")
    links = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = discover.fs_weights(a, b, links, ["k"]).collect()
    assert (r.n_pairs, r.n_matched, r.agree_m, r.agree_u) == (2, 1, 1, 0)
    assert r.u_prob == 0.0 and r.w_agree is None


def test_fs_weights_empty_denominators_null(spark):
    # all pairs are matched -> non-match universe empty -> u_prob NULL
    a = spark.createDataFrame([(1, "x")], "id long, k string")
    b = spark.createDataFrame([(2, "x")], "id long, k string")
    links = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = discover.fs_weights(a, b, links, ["k"]).collect()
    assert r.u_prob is None and r.w_agree is None
    # and no labeled links at all -> m_prob NULL (not an ANSI 0/0)
    empty = links.filter(F.lit(False))
    [r2] = discover.fs_weights(a, b, empty, ["k"]).collect()
    assert r2.m_prob is None and r2.w_agree is None


def test_blocking_quality_handcase(spark):
    # cand: (1,2) given twice in both orientations + a self-loop that
    # must be dropped; truth has one pair the blocker missed.
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 5)], "id_a long, id_b long")
    truth = spark.createDataFrame(
        [(1, 2), (4, 3), (7, 8)], "id_a long, id_b long")
    [r] = discover.blocking_quality(cand, truth, n_total=10).collect()
    assert (r.n_candidates, r.n_truth, r.n_hit) == (2, 3, 2)
    assert r.pair_completeness == 2.0 / 3.0
    assert r.reduction_ratio == 1.0 - 2.0 / 45.0


def test_fs_score_pairs_handcase(spark):
    a = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, None)], "id long, lang string")
    b = spark.createDataFrame(
        [(10, "en"), (11, "de"), (12, None)], "id long, lang string")
    links = spark.createDataFrame(
        [(1, 10), (3, 11), (2, 11)], "id_a long, id_b long")
    w = discover.fs_weights(a, b, links, ["lang"])
    cand = spark.createDataFrame(
        [(1, 10), (2, 11), (4, 12)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r for r in
           discover.fs_score_pairs(cand, a, b, w, ["lang"]).collect()}
    m, u = 2.0 / 3.0, 1.0 / 9.0
    assert got[(1, 10)].n_agree == 1 and got[(1, 10)].fs_score == m / u
    assert got[(2, 11)].n_agree == 0
    assert got[(2, 11)].fs_score == (1.0 - m) / (1.0 - u)
    # NULL attr on both sides is a DISAGREEMENT, not an agreement
    assert got[(4, 12)].n_agree == 0
    assert got[(4, 12)].fs_score == (1.0 - m) / (1.0 - u)


def test_fs_score_pairs_order_and_degenerate_u(spark):
    a = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "web"), (5, "de", "web")],
        "id long, lang string, src string")
    b = spark.createDataFrame(
        [(10, "en", "web"), (11, "de", "book")],
        "id long, lang string, src string")
    links = spark.createDataFrame([(1, 10)], "id_a long, id_b long")
    w = discover.fs_weights(a, b, links, ["lang", "src"])
    cand = spark.createDataFrame([(2, 10), (5, 11)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r for r in
           discover.fs_score_pairs(cand, a, b, w, ["lang", "src"]).collect()}
    wrow = {r.attr: r for r in w.collect()}
    def ratio(attr, agree):
        m, u = wrow[attr].m_prob, wrow[attr].u_prob
        if u is None or u <= 0 or u >= 1:
            return None
        return m / u if agree else (1.0 - m) / (1.0 - u)
    r1 = ratio("lang", True)    # (2,10): en==en, web==web
    r2 = ratio("src", True)
    exp = None if r1 is None or r2 is None else r1 * r2
    assert got[(2, 10)].fs_score == exp and got[(2, 10)].n_agree == 2
    r1 = ratio("lang", True)    # (5,11): de==de agree, web!=book
    r2 = ratio("src", False)
    exp = None if r1 is None or r2 is None else r1 * r2
    assert got[(5, 11)].fs_score == exp and got[(5, 11)].n_agree == 1
