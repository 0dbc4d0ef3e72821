"""spark-submit job: geometry + metadata fusion (FusionGISCLI analog).

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.fuse_job \
        --links ... --geo-a ... --geo-b ... --out ... \
        [--action keep-most-points] [--links-nt links.nt]

``--links`` reads a parquet (node_a, node_b) table; ``--links-nt``
instead parses an N-Triples sameAs file (S1 scan). The action registry
mirrors FuserPanel.java:130-173 (see fuse.ACTIONS).
"""

from __future__ import annotations

import argparse
import sys

from fagi_spark import fuse, io
from fagi_spark.session import get_spark


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--links")
    p.add_argument("--links-nt")
    p.add_argument("--geo-a", required=True)
    p.add_argument("--geo-b", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--action", default="keep-most-points",
                   choices=sorted(fuse.ACTIONS))
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if not args.links and not args.links_nt:
        p.error("one of --links / --links-nt is required")
    spark = get_spark("fagi_fuse", master=args.master)
    links = (io.read_nt_links(spark, args.links_nt) if args.links_nt
             else spark.read.parquet(args.links))
    ga = fuse.prepare_geoms(spark.read.parquet(args.geo_a)).persist()
    gb = fuse.prepare_geoms(spark.read.parquet(args.geo_b)).persist()
    ga.count(), gb.count()
    fused = fuse.fuse(args.action, links, ga, gb)
    fuse.export_fused(fused).write.mode("overwrite").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
