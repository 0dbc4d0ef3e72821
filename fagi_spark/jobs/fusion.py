"""Config-file-driven fusion run — the FusionGISCLI analog.

The reference's CLI lifecycle (FusionGISCLI.java: parse config ->
import A/B -> fuse -> export; SURVEY.md §3.1) takes a ``key = value``
conf file, not flags. This job closes that loop for a migrating user:
bring your fusion.conf (fagi_spark.config.parse_conf understands the
fusion.conf.template keys), point the paths at your tables, run

    spark-submit --py-files dist/fagi_spark.zip fagi_spark/jobs/fusion.py \
        --conf my_fusion.conf [--master local[8]]

Inputs:
  links_path  — sameAs links: an N-Triples .nt file or a parquet table
                with (node_a, node_b)
  geo_a_path / geo_b_path — parquet with (subject, geom_wkt)
  out_path    — geometry export destination: .nt writes an N-Triples
                dump of the fused pairs, anything else writes parquet
Knobs: action (fuse_Transformation), metadata_action
(mfuse_Transformation), threshold_m, shift/scale/rotation for the
shift-family actions, dom_onto for predicate renaming. When
``checkpoint_root`` is set, the fuse and export stages commit through
CheckpointStore (resumable, per-partition lineage).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import fuse, io as fio, metadata_fuse
from fagi_spark.checkpoint import CheckpointStore
from fagi_spark.config import parse_conf
from fagi_spark.session import get_spark

# actions whose kernels take the config's shift/scale/rotation factors
_PARAM_KEYS = {
    "shift-a-to-b": ("shift",),
    "shift-b-to-a": ("shift",),
    "scale": ("scale",),
}


def _read_links(spark, path: str):
    if path.endswith(".nt"):
        return fio.read_nt_links(spark, path)
    return spark.read.parquet(path).select("node_a", "node_b")


def run(spark, cfg, meta_a=None, meta_b=None):
    """Execute one configured fusion; returns {fused, exported, meta}.

    ``meta_a``/``meta_b`` (optional EAV frames: subject, predicate,
    object, lang, dtype) feed the metadata action; geometry-only runs
    skip it, like the reference with mfuse 'none'.
    """
    links = _read_links(spark, cfg.links_path)
    ga = fuse.prepare_geoms(spark.read.parquet(cfg.geo_a_path))
    gb = fuse.prepare_geoms(spark.read.parquet(cfg.geo_b_path))

    params = {k: getattr(cfg, k) for k in _PARAM_KEYS.get(cfg.action, ())}
    store = CheckpointStore(cfg.checkpoint_root) if cfg.checkpoint_root else None

    def _fused():
        return fuse.fuse(cfg.action, links, ga, gb, late_fetch=True, **params)

    if store is not None:
        fused = store.run_stage(spark, "fused", _fused,
                                observe={"n_fused": F.count(F.lit(1))})
    else:
        fused = _fused()

    exported = fuse.export_fused(fused)

    meta = None
    if cfg.metadata_action != "none" and meta_a is not None:
        act = cfg.metadata_action
        if act == "keep-left":
            meta = metadata_fuse.keep_left(links, meta_a, cfg.dom_onto)
        elif act == "keep-right":
            meta = metadata_fuse.keep_right(links, meta_b, cfg.dom_onto)
        elif act == "keep-both":
            meta = metadata_fuse.keep_both(links, meta_a, meta_b, cfg.dom_onto)
        elif act == "concat":
            meta = metadata_fuse.concat_values(links, meta_a, meta_b,
                                               cfg.dom_onto)
        elif act == "flatten":
            meta = metadata_fuse.keep_flattened(links, meta_a, cfg.dom_onto)

    if cfg.out_path.endswith(".nt"):
        nt = fio.links_to_nt(exported.select("subject_a", "subject_b")
                             .withColumnRenamed("subject_a", "node_a")
                             .withColumnRenamed("subject_b", "node_b"))
        nt.coalesce(1).write.mode("overwrite").text(cfg.out_path)
    else:
        exported.write.mode("overwrite").parquet(cfg.out_path)
    return {"fused": fused, "exported": exported, "meta": meta}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    with open(args.conf) as f:
        cfg = parse_conf(f.read()).require_valid()
    spark = get_spark("fagi_fusion", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    out = run(spark, cfg)
    print(f"fused: {out['fused'].count()} pairs -> {cfg.out_path} "
          f"(action={cfg.action})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
