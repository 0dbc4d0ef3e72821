"""Config-file-driven fusion job (FusionGISCLI analog): conf -> run ->
export, .nt roundtrip, checkpointed resume."""
import os

from fagi_spark import fuse, io as fio, synth
from fagi_spark.config import parse_conf
from fagi_spark.jobs import fusion


def _setup(spark, tmp_path, extra=""):
    base = str(tmp_path)
    ga, gb, links, ma, mb = synth.synth_fixture(spark, 120, 90)
    ga.write.parquet(f"{base}/geo_a")
    gb.write.parquet(f"{base}/geo_b")
    links.write.parquet(f"{base}/links")
    conf = (f"links_path = {base}/links\n"
            f"geo_a_path = {base}/geo_a\n"
            f"geo_b_path = {base}/geo_b\n"
            f"out_path = {base}/fused.nt\n"
            f"action = keep-most-points\n" + extra.format(base=base))
    return base, parse_conf(conf).require_valid(), (ga, gb, links, ma, mb)


def test_fusion_job_matches_direct_api(spark, tmp_path):
    base, cfg, (ga, gb, links, *_t) = _setup(spark, tmp_path)
    out = fusion.run(spark, cfg)
    direct = fuse.export_fused(
        fuse.fuse("keep-most-points", links, fuse.prepare_geoms(ga),
                  fuse.prepare_geoms(gb)))
    assert out["exported"].count() == direct.count()
    assert out["exported"].exceptAll(direct).count() == 0
    # .nt output parses back to exactly the fused link pairs
    parsed = fio.parse_nt_links(spark.read.text(f"{base}/fused.nt"))
    assert parsed.count() == direct.select("subject_a", "subject_b").distinct().count()


def test_fusion_job_metadata_and_resume(spark, tmp_path):
    base, cfg, (ga, gb, links, ma, mb) = _setup(
        spark, tmp_path,
        "metadata_action = keep-both\ncheckpoint_root = {base}/ckpt\n")
    out = fusion.run(spark, cfg, meta_a=ma, meta_b=mb)
    assert out["meta"] is not None and out["meta"].count() > 0
    snap = out["fused"]  # committed through the store
    first_id = fusion.CheckpointStore(cfg.checkpoint_root).latest("fused")
    out2 = fusion.run(spark, cfg, meta_a=ma, meta_b=mb)
    assert fusion.CheckpointStore(cfg.checkpoint_root).latest("fused") == first_id
    assert out2["exported"].count() == out["exported"].count()
    assert os.path.exists(f"{base}/fused.nt")
