"""Build dist/fagi_spark.zip for spark-submit --py-files deployment.

The north rule ships the engine as ``spark-submit --py-files`` jobs;
this packages the pure-Python ``fagi_spark`` package into a zip that
executors and the driver can import without the repo checkout:

    python tools/package.py                 # -> dist/fagi_spark.zip
    spark-submit --py-files dist/fagi_spark.zip path/to/job.py ...

tests/test_submit.py proves the artifact works by running the real
``spark-submit`` binary from a foreign cwd with only the zip on the
python path.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "fagi_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "fagi_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
