"""spark-submit job: ingest/geocode pages -> entity table.

    spark-submit --py-files fagi_spark.zip -m fagi_spark.jobs.ingest \
        --pages /warehouse/pages --out /warehouse/entities [--no-dedup]

Reads the Common-Crawl-style page table, runs the Arrow-UDF geocoding
(extraction + precedence dedup + multi-res cells, extract.py) and
writes the entity table partitioned by coarse cell — the layout every
downstream cell join prunes against.
"""

from __future__ import annotations

import argparse
import sys

from fagi_spark.extract import geocode_pages
from fagi_spark.session import get_spark


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("fagi_ingest", master=args.master)
    pages = spark.read.parquet(args.pages)
    ents = geocode_pages(pages, dedup=not args.no_dedup)
    ents.write.mode("overwrite").partitionBy("cell_r7").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
