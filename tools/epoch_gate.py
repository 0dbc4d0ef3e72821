#!/usr/bin/env python
"""Quick host-epoch gate: measure the 32-process pure-python FLOP rate
for ~3 s and print one line. The full-capacity epoch (BENCH/
membench.json) sustains ~55 GFLOP/s numpy-FMA at n=32; this cheap
python-loop proxy is calibrated RELATIVELY — run it once in a known
epoch and compare runs to each other. Used to decide whether a
scaling probe invocation is worth launching (probes in a capped epoch
always land below the stored bests and waste ten minutes).

    python tools/epoch_gate.py          # prints e.g. "gate 41.2 Mops/proc"
"""
from __future__ import annotations

import multiprocessing as mp
import time


def _spin(q, seconds=3.0):
    t_end = time.time() + seconds
    x, n = 1.0000001, 0
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-12
        n += 10000
    q.put(n / seconds)


def measure(seconds: float = 3.0, n_procs: int = 32):
    """(median Mops/proc, steal %) — importable so bench.py can stamp
    the host epoch into its JSON (round-over-round bench comparisons
    are meaningless without it; the ceiling itself swings 2-3x)."""
    q = mp.Queue()
    procs = [mp.Process(target=_spin, args=(q, seconds))
             for _ in range(n_procs)]
    with open("/proc/stat") as f:
        p0 = [int(x) for x in f.readline().split()[1:]]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    with open("/proc/stat") as f:
        p1 = [int(x) for x in f.readline().split()[1:]]
    steal = 100.0 * (p1[7] - p0[7]) / (sum(p1) - sum(p0))
    rates = sorted(q.get() for _ in procs)
    med = rates[len(rates) // 2] / 1e6
    return med, steal


def main() -> None:
    med, steal = measure()
    print(f"gate {med:.1f} Mops/proc median, steal {steal:.2f}%")


if __name__ == "__main__":
    main()
