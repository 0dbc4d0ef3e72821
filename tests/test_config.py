"""FusionConfig parse + validation (FusionState.checkConfiguration analog)."""

import pytest

from fagi_spark.config import FusionConfig, parse_conf


CONF = """
# fusion.conf shape
links_path = /warehouse/links
geo_a_path = /warehouse/geo_a   # inline comment
geo_b_path = /warehouse/geo_b
out_path = /warehouse/fused
action = shift-a-to-b
shift = 75
rotation_deg = 15.0
custom_key = custom_value
"""


def test_parse_conf_fields_and_extra():
    cfg = parse_conf(CONF)
    assert cfg.geo_a_path == "/warehouse/geo_a"
    assert cfg.action == "shift-a-to-b"
    assert cfg.shift == 75.0 and cfg.rotation_deg == 15.0
    assert cfg.extra == {"custom_key": "custom_value"}
    assert cfg.validate() == []
    assert cfg.require_valid() is cfg


def test_parse_conf_keeps_uri_fragments():
    cfg = parse_conf("dom_onto = http://ex.org/onto#  # trailing comment\n"
                     "graph_uri = http://ex.org/g#main\n")
    assert cfg.dom_onto == "http://ex.org/onto#"
    assert cfg.extra == {"graph_uri": "http://ex.org/g#main"}


def test_validation_catches_problems():
    cfg = FusionConfig(action="nope", link_threshold=1.5, radius_m=-1)
    errs = cfg.validate()
    assert any("links_path" in e for e in errs)
    assert any("unknown action" in e for e in errs)
    assert any("link_threshold" in e for e in errs)
    assert any("radius_m" in e for e in errs)
    with pytest.raises(ValueError, match="invalid fusion config"):
        cfg.require_valid()


def test_fuse_cluster_matches_filtered_fuse(spark):
    from pyspark.sql import functions as F

    from fagi_spark import fuse, synth

    geo_a, geo_b, links, _, _ = synth.synth_fixture(spark, 60, 40)
    cluster = links.filter(F.xxhash64("node_a") % 2 == 0)
    a = fuse.fuse("keep-most-points", cluster, geo_a, geo_b).collect()
    b = fuse.fuse_cluster("keep-most-points", cluster, geo_a, geo_b).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert 0 < len(a) < fuse.fuse("keep-most-points", links, geo_a, geo_b).count()
