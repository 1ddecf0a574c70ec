#!/usr/bin/env python
"""DRAM-bandwidth ceiling measurement for the scaling-efficiency analysis.

The north rule asks for ≥0.8 throughput scaling from N to 4N EXECUTORS —
on a real cluster each node contributes its own memory system, so total
bandwidth scales with nodes.  This sandbox runs every "executor" thread on
ONE socket: if the socket's aggregate copy bandwidth at 32 workers is only
~B32/B8 of its 8-worker bandwidth, then ANY shuffle/sort-bound job is
capped at that ratio regardless of code.  This script measures exactly
that ratio with plain numpy memcpy in separate PROCESSES (no GIL, no JVM):
each worker repeatedly copies a 256 MB buffer (far beyond L3) for a fixed
wall window; aggregate GB/s per worker count is reported.

Usage: python BENCH/membw.py [--seconds 4] [--mb 256]
Writes BENCH/membw.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(mb: int, seconds: float, q, start_at: float) -> None:
    import numpy as np

    src = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault in both buffers before the window
    while time.time() < start_at:  # loose barrier so windows overlap
        time.sleep(0.01)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # a copy reads src and writes dst → 2×mb of bus traffic per iteration
    q.put(n * mb * 2 / 1024.0 / dt)


def measure(workers: int, mb: int, seconds: float) -> float:
    q = mp.Queue()
    start_at = time.time() + 2.0 + workers * 0.05  # after every init
    procs = [
        mp.Process(target=_worker, args=(mb, seconds, q, start_at))
        for _ in range(workers)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]  # each is that worker's GB/s
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 2, 8, 32])
    args = ap.parse_args()

    out = {"buffer_mb": args.mb, "window_sec": args.seconds, "gbps": {}}
    for w in args.workers:
        gb = measure(w, args.mb, args.seconds)
        out["gbps"][str(w)] = round(gb, 1)
        print(f"# {w:3d} workers: {gb:8.1f} GB/s aggregate")
    g = out["gbps"]
    if "8" in g and "32" in g:
        out["bw_ratio_8_to_32"] = round(g["32"] / g["8"], 3)
        out["bw_scaling_efficiency_8_to_32"] = round(g["32"] / g["8"] / 4, 3)
    if "2" in g and "8" in g:
        out["bw_ratio_2_to_8"] = round(g["8"] / g["2"], 3)
        out["bw_scaling_efficiency_2_to_8"] = round(g["8"] / g["2"] / 4, 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "membw.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
