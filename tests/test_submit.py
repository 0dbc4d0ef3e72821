"""spark-submit --py-files deployment (north rule: the pipeline ships
as spark-submit jobs). Builds dist/fagi_spark.zip, copies the job entry
script to a foreign cwd, and runs the REAL spark-submit binary with the
zip as the only source of the package — proving the artifact is
self-contained (no repo checkout on any python path)."""
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.package import build  # noqa: E402

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_py_files_pipeline(tmp_path):
    zip_path = build(str(tmp_path / "fagi_spark.zip"))
    entry = tmp_path / "entry_pipeline.py"
    shutil.copy(os.path.join(ROOT, "fagi_spark", "jobs", "pipeline.py"),
                entry)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = tmp_path / "ckpt"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, str(entry),
         "--out", str(out_dir), "--n-pages", "300"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # every stage committed a snapshot with lineage
    out = proc.stdout
    for stage in ("pages", "entities", "links", "fused", "tiles"):
        assert f"{stage}:" in out, out[-2000:]
    assert (out_dir / "pages" / "LATEST").exists()
