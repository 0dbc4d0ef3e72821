"""Z-order layout: interleave correctness + file-locality payoff."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fagi_spark import cells


def _py_morton(ix, iy, res):
    z = 0
    for k in range(res):
        z |= ((ix >> k) & 1) << (2 * k + 1)
        z |= ((iy >> k) & 1) << (2 * k)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(i, (i * 37) % 1024, (i * 91) % 1024) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "ix", "iy"])
    got = {r["id"]: r["z"] for r in df.select(
        "id", cells.zorder_col(F.col("ix"), F.col("iy"), 10).alias("z")
    ).collect()}
    for i, ix, iy in rows:
        assert got[i] == _py_morton(ix, iy, 10)


def test_zorder_res_guard(spark):
    with pytest.raises(ValueError):
        cells.zorder_col(F.lit(0), F.lit(0), 29)


def test_zorder_adjacent_cells_nearby():
    # The defining property vs the pack_cell key: the four cells of a
    # 2x2 block are CONSECUTIVE z values, while pack_cell puts the
    # (ix+1, iy) neighbor 2^res ids away.
    res = 10
    base = _py_morton(100, 200, res)
    block = {_py_morton(100 + dx, 200 + dy, res)
             for dx in (0, 1) for dy in (0, 1)}
    assert block == set(range(min(block), min(block) + 4))
    assert base % 4 != 0 or min(block) == base


def test_zorder_layout_shrinks_file_bboxes(spark, tmp_path):
    # Clustered points (city-like blobs). Write (a) z-ordered and
    # (b) ordered by an unrelated id; per-file lon/lat bbox area —
    # the parquet min/max stats a scan prunes on — must shrink a lot.
    import random
    rnd = random.Random(7)
    rows = []
    for b in range(20):
        cx, cy = rnd.uniform(-170, 170), rnd.uniform(-80, 80)
        for i in range(500):
            rows.append((b * 1000 + i,
                         cx + rnd.uniform(-0.5, 0.5),
                         cy + rnd.uniform(-0.5, 0.5)))
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, ["id", "lon", "lat"]).repartition(8)

    zpath = str(tmp_path / "zorder")
    ipath = str(tmp_path / "byid")
    cells.write_zordered(df, zpath, res=13, num_files=16)
    (df.repartitionByRange(16, "id").sortWithinPartitions("id")
       .write.mode("overwrite").parquet(ipath))

    def total_bbox_area(path):
        area = 0.0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            part = spark.read.parquet(f)
            r = part.agg(F.min("lon"), F.max("lon"),
                         F.min("lat"), F.max("lat")).collect()[0]
            area += (r[1] - r[0]) * (r[3] - r[2])
        return area

    za, ia = total_bbox_area(zpath), total_bbox_area(ipath)
    assert za < 0.35 * ia, (za, ia)
