"""spark-submit job: raster<->vector tile assignment + rollup.

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.assign_tiles \
        --entities /warehouse/entities --out /warehouse/tiles \
        [--res 10] [--bbox xmin ymin xmax ymax]

Assigns every entity to its grid tile at ``--res`` (F4/J5 viewport
semantics; optional bbox prefilter with cell-range pruning) and writes
per-tile entity rollups.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from fagi_spark import cells, joins
from fagi_spark.session import get_spark


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--entities", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--res", type=int, default=10)
    p.add_argument("--bbox", nargs=4, type=float, default=None,
                   metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    p.add_argument("--pyramid", default=None, metavar="LEVELS",
                   help="comma-separated coarser resolutions (e.g. 10,7): "
                        "write the multi-resolution tile pyramid with "
                        "--res as the base level instead of one flat "
                        "rollup (cells.tile_pyramid: one scan, one "
                        "shuffle across all levels)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_tiles", master=args.master)
    ents = spark.read.parquet(args.entities)
    geo = ents.select("url", F.col("lon").alias("cx"), F.col("lat").alias("cy"))
    if args.bbox:
        geo = joins.bbox_join(geo, *args.bbox, res=args.res)
    if args.pyramid:
        levels = tuple(int(x) for x in args.pyramid.split(","))
        tiles = cells.tile_pyramid(geo, base_res=args.res, levels=levels,
                                   lon="cx", lat="cy")
    else:
        tiles = (geo.groupBy(cells.cell_col(F.col("cx"), F.col("cy"), args.res)
                             .alias("tile"))
                 .agg(F.count(F.lit(1)).alias("n_entities")))
    tiles.write.mode("overwrite").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
