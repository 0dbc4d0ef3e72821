"""Chain-selected metadata Keep with common-prefix expansion (§2.6;
Utilities.findCommonPrefixedPropertyChains + BatchFusionServlet
metadataKeepLeft)."""

from fagi_spark import metadata_fuse as mf


def test_find_common_prefixed_chains():
    pats = ["p1", "p1=>p2", "p1=>p2=>p3", "p1x", "q1", "q1=>p1"]
    assert mf.find_common_prefixed_chains("p1", pats) == [
        "p1", "p1=>p2", "p1=>p2=>p3", "p1x"]  # string-prefix incl. p1x (reference semantics)
    assert mf.find_common_prefixed_chains("p1=>p2", pats) == [
        "p1=>p2", "p1=>p2=>p3"]
    assert mf.find_common_prefixed_chains("q2", pats) == []


def test_keep_selected_chain_depth1_expands_prefixes(spark):
    """Selecting the depth-1 chain [hasAddress] must also copy the
    deeper hasAddress=>streetName instances: the head hop renamed, the
    tail hop preserved — and the head triple deduped across patterns."""
    links = spark.createDataFrame([("w1", "pl1")], "node_a string, node_b string")
    meta = spark.createDataFrame(
        [("w1", "http://a.org/hasAddress", "bn1"),
         ("bn1", "http://a.org/streetName", "Main Street"),
         ("w1", "http://a.org/label", "unrelated")],
        "subject string, predicate string, object string")
    out = mf.keep_selected_chain(links, meta, ["http://a.org/hasAddress"],
                                 dom_onto="http://dom.org/")
    rows = {(r["subject"], r["predicate"], r["object"]) for r in out.collect()}
    assert rows == {
        ("w1", "http://dom.org/hasAddress", "bn1"),          # renamed head (deduped)
        ("bn1", "http://a.org/streetName", "Main Street"),   # preserved tail
    }
    assert all((r["subject_a"], r["subject_b"]) == ("w1", "pl1")
               for r in out.collect())


def test_keep_selected_chain_depth2_renames_last_hop(spark):
    links = spark.createDataFrame([("w1", "pl1")], "node_a string, node_b string")
    meta = spark.createDataFrame(
        [("w1", "http://a.org/hasAddress", "bn1"),
         ("bn1", "http://a.org/streetName", "Main Street")],
        "subject string, predicate string, object string")
    out = mf.keep_selected_chain(
        links, meta, ["http://a.org/hasAddress", "http://a.org/streetName"],
        dom_onto="http://dom.org/")
    rows = {(r["subject"], r["predicate"], r["object"]) for r in out.collect()}
    assert rows == {
        ("w1", "http://a.org/hasAddress", "bn1"),
        ("bn1", "http://dom.org/hasAddress_streetName", "Main Street"),
    }


def test_expand_chain_no_early_exit_jobs(spark):
    """expand_chain is a single lazy plan — building it must launch no
    Spark jobs (the old isEmpty early-exit ran one per level)."""
    meta = spark.createDataFrame(
        [("s1", "p1", "o1")], "subject string, predicate string, object string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = mf.expand_chain(meta, depth=6)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no jobs until an action runs
    assert df.count() == 1  # single non-chaining triple
