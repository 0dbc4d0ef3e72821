"""spark-submit job: batch link discovery (SURVEY.md §3.3 analog).

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.discover_links \
        --geo-a ... --geo-b ... --meta-a ... --meta-b ... --out ... \
        [--radius-m 3000] [--threshold 0.2]

Inputs are parquet tables: geo_* as (subject, geom_wkt [, stats]),
meta_* as EAV (subject, predicate, object, lang, dtype). Output:
(node_a, node_b, similarity, distance_m) above the batch threshold
(BatchFindLinkServlet.java:713 default 0.2).
"""

from __future__ import annotations

import argparse
import sys

from fagi_spark.discover import discover_links
from fagi_spark.fuse import prepare_geoms
from fagi_spark.session import get_spark


def main(argv=None):
    p = argparse.ArgumentParser()
    for name in ("--geo-a", "--geo-b", "--meta-a", "--meta-b", "--out"):
        p.add_argument(name, required=True)
    p.add_argument("--radius-m", type=float, default=3000.0)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_discover", master=args.master)
    ga = prepare_geoms(spark.read.parquet(args.geo_a)).persist()
    gb = prepare_geoms(spark.read.parquet(args.geo_b)).persist()
    ga.count(), gb.count()  # materialize UDF-derived stats before joins
    links = discover_links(ga, gb,
                           spark.read.parquet(args.meta_a),
                           spark.read.parquet(args.meta_b),
                           radius_m=args.radius_m, threshold=args.threshold)
    links.write.mode("overwrite").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
