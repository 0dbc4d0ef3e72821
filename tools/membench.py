#!/usr/bin/env python
"""No-Spark host control for the scaling evidence (BENCH/BASELINE.md).

Two microbenchmarks, each run at the same process counts as the Spark
scaling pairs (2, 4, 8, 16, 32):

- **mem**: a STREAM-triad-like kernel (``a = b + 0.5*c`` over arrays
  far larger than L3) — pure memory-bandwidth demand. If the box's
  single memory controller is what caps the high-thread Spark pair,
  this kernel's aggregate GB/s must flatten over the same range.
- **cpu**: a compute-bound kernel on an L1-resident array (many
  passes of fused multiply-adds over 32 KB) — near-zero DRAM traffic.
  If cores themselves were the constraint, THIS would flatten too;
  if it keeps scaling while mem flattens, the bandwidth attribution
  stands falsified-or-confirmed on measurement, not narrative.

Each worker process pins nothing and shares the box like Spark's
local[N] task threads do. Workers run a fixed per-process workload;
aggregate throughput = sum of per-worker throughputs over the
measured window. min-of-PASSES against co-tenant noise (CLAUDE.md).

Writes BENCH/membench.json; bench.py --scaling folds the numbers into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

LEVELS = (2, 4, 8, 16, 32)
PASSES = int(os.environ.get("MEMBENCH_PASSES", "3"))

MEM_N = 32 * 1024 * 1024        # 32M doubles = 256 MB/array, 3 arrays
MEM_ITERS = 4
CPU_N = 4 * 1024                # 32 KB — L1-resident
CPU_ITERS = 120_000


def _mem_worker(q):
    b = np.full(MEM_N, 1.0)
    c = np.full(MEM_N, 2.0)
    a = np.empty(MEM_N)
    # touch to fault pages in before timing
    a[:] = 0.0
    t0 = time.perf_counter()
    for _ in range(MEM_ITERS):
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # the two-ufunc form moves FIVE array traversals per iteration:
    # multiply reads c + writes a (2), add reads a,b + writes a (3) —
    # not the 3 of a fused single-pass STREAM triad (numpy can't fuse)
    gb = MEM_ITERS * 5 * MEM_N * 8 / 1e9
    q.put(gb / dt)


def _cpu_worker(q):
    a = np.full(CPU_N, 1.000001)
    t0 = time.perf_counter()
    for _ in range(CPU_ITERS):
        np.multiply(a, 1.000001, out=a)
        np.add(a, 1e-9, out=a)
    dt = time.perf_counter() - t0
    flops = CPU_ITERS * 2 * CPU_N
    q.put(flops / dt / 1e9)  # GFLOP/s


def run_level(worker, n: int) -> float:
    """Aggregate throughput of n concurrent worker processes."""
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> None:
    os.environ.setdefault("OMP_NUM_THREADS", "1")  # no BLAS threading
    out = {"levels": list(LEVELS), "passes": PASSES, "kernels": {}}
    for name, worker in (("mem_triad_gbps", _mem_worker),
                         ("cpu_fma_gflops", _cpu_worker)):
        best: dict[int, float] = {}
        for _ in range(PASSES):
            for n in LEVELS:
                v = run_level(worker, n)
                if n not in best or v > best[n]:
                    best[n] = v
        out["kernels"][name] = {str(n): round(best[n], 2) for n in LEVELS}
        pairs = {}
        lv = list(LEVELS)
        for i in range(len(lv) - 2):
            lo, hi = lv[i], lv[i + 2]
            pairs[f"{lo}->{hi}"] = round(best[hi] / best[lo] / (hi / lo), 3)
        out["kernels"][name]["efficiency"] = pairs
        print(name, out["kernels"][name])
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "membench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("written", os.path.normpath(path))


if __name__ == "__main__":
    main()
