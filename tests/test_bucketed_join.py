"""Bucketed co-located join: no shuffle exchange, identical results."""

import io as _io
import contextlib

import pytest
from pyspark.sql import functions as F

from fagi_spark import io as fio


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    ents = spark.range(0, 5000).select(
        F.col("id").alias("subject"),
        (F.col("id") % 97).alias("cell"),
        (F.col("id") * 3 % 100).alias("payload"))
    gaz = spark.range(0, 800).select(
        F.col("id").alias("place"),
        (F.col("id") % 97).alias("cell"))
    fio.write_bucketed(ents, "t_ents_b", str(base / "ents"), "cell", 8)
    fio.write_bucketed(gaz, "t_gaz_b", str(base / "gaz"), "cell", 8)
    yield (fio.read_bucketed(spark, "t_ents_b"),
           fio.read_bucketed(spark, "t_gaz_b"), ents, gaz)
    spark.sql("DROP TABLE IF EXISTS t_ents_b")
    spark.sql("DROP TABLE IF EXISTS t_gaz_b")


def test_bucketed_join_has_no_shuffle(bucketed_pair, spark):
    be, bg, _, _ = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = be.join(bg, "cell")
        text = _plan(joined)
        assert "SortMergeJoin" in text
        assert "Exchange" not in text, text
        # bucket-sorted on the key -> no extra Sort node needed either
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_shuffle(bucketed_pair, spark):
    # control: the same join over plain frames plans an Exchange
    _, _, ents, gaz = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        text = _plan(ents.join(gaz, "cell"))
        assert "Exchange" in text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_plain(bucketed_pair):
    be, bg, ents, gaz = bucketed_pair
    a = sorted(tuple(r) for r in be.join(bg, "cell")
               .select("cell", "subject", "place").collect())
    b = sorted(tuple(r) for r in ents.join(gaz, "cell")
               .select("cell", "subject", "place").collect())
    assert a == b
