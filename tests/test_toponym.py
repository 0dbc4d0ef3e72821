"""Toponym disambiguation: anchor-proximity + importance fallback."""

from fagi_spark import toponym


def _fixture(spark):
    gaz = spark.createDataFrame(
        [(1, "paris", 2.35, 48.85, 900),     # Paris, FR (important)
         (2, "paris", -95.55, 33.66, 30),    # Paris, TX
         (3, "eiffel tower", 2.29, 48.86, 500),
         (4, "dallas", -96.80, 32.78, 700)],
        "place_id long, name string, lon double, lat double, "
        "importance long")
    mentions = spark.createDataFrame(
        [(10, 100, "eiffel tower"),   # page 10 anchored in France
         (10, 101, "paris"),
         (20, 200, "dallas"),         # page 20 anchored in Texas
         (20, 201, "paris"),
         (30, 300, "paris")],         # page 30: no anchor -> importance
        "page_id long, mention_id long, name string")
    return mentions, gaz


def test_anchor_proximity_separates_paris(spark):
    mentions, gaz = _fixture(spark)
    got = {r["mention_id"]: (r["place_id"], r["method"])
           for r in toponym.resolve_toponyms(mentions, gaz).collect()}
    assert got[100] == (3, "unique")
    assert got[200] == (4, "unique")
    assert got[101] == (1, "anchor")       # near the Eiffel Tower
    assert got[201] == (2, "anchor")       # near Dallas -> Paris, TX
    assert got[300] == (1, "importance")   # default sense: FR
    assert len(got) == 5


def test_tie_breaks_are_total_orders(spark):
    """Equidistant candidates pick the smaller place_id; equal
    importance picks the smaller place_id."""
    gaz = spark.createDataFrame(
        [(7, "twin", 1.00, 0.0, 50), (5, "twin", -1.00, 0.0, 50),
         (9, "anchorpt", 0.0, 0.0, 10)],
        "place_id long, name string, lon double, lat double, "
        "importance long")
    mentions = spark.createDataFrame(
        [(1, 11, "anchorpt"), (1, 12, "twin"),   # equidistant twins
         (2, 21, "twin")],                       # anchorless, equal imp
        "page_id long, mention_id long, name string")
    got = {r["mention_id"]: (r["place_id"], r["method"])
           for r in toponym.resolve_toponyms(mentions, gaz).collect()}
    assert got[12] == (5, "anchor")
    assert got[21] == (5, "importance")
