"""Hardware-ceiling control for the scaling protocol (BASELINE.md).

This container throttles per-core throughput as more cores engage, so a
raw N->4N efficiency for the ENGINE under-reports unless compared to the
box's own ceiling: the same measurement run on pure, shuffle-free,
perfectly parallel CPU work. This script measures that ceiling.

Each worker process runs a fixed numpy kernel (sort + matmul mix,
~100% CPU, zero IPC) K times; a side's throughput is (procs * K) /
wall. Trials interleave lo/hi and each side takes its best (max
throughput), mirroring bench.py --scaling's min-time-per-side.

Usage: python tools/cpu_burn_control.py [lo hi rounds]   (default 8 32 3)
Prints one JSON line: {"thr_lo":..., "thr_hi":..., "efficiency":...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _kernel(seed: int) -> None:
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.rand(384, 384)
    v = rng.rand(1 << 19)
    for _ in range(8):
        a = a @ a.T / 384.0
        np.sort(v)


def _worker(seed: int, iters: int) -> None:
    for i in range(iters):
        _kernel(seed + i)


def run_side(procs: int, iters: int = 6) -> float:
    t0 = time.perf_counter()
    ps = [
        mp.Process(target=_worker, args=(1000 * procs + i, iters))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    return procs * iters / wall


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    best_lo = best_hi = 0.0
    for _ in range(rounds):
        best_lo = max(best_lo, run_side(lo))
        best_hi = max(best_hi, run_side(hi))
    eff = (best_hi / best_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "cpus_lo": lo,
                "cpus_hi": hi,
                "thr_lo": round(best_lo, 2),
                "thr_hi": round(best_hi, 2),
                "efficiency": round(eff, 3),
                "unit": "kernel-iters/sec",
            }
        )
    )


if __name__ == "__main__":
    main()
