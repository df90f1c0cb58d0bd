#!/usr/bin/env python
"""Host memory-bandwidth scaling probe (the workload-representative
calibration the CPU-burn misses).

The index build's JVM stages stream gigabytes (Arrow transfer, parquet
encode, shuffle) — cache-hostile work whose cost is bus traffic, not
instructions.  A register-only CPU burn shows this VM delivering an
ideal 4× from 2→8 pinned cores, yet bandwidth-bound stages cannot: this
probe measures aggregate streaming copy throughput at both parallelism
levels on the same pinned CPU sets used by scaling.py.

Observed on this host (2026-08-17): 2 procs ≈ 25-32 GB/s aggregate,
8 procs ≈ 64 GB/s — a ~2.3× ceiling for bandwidth-bound work, i.e. a
0.57-0.65 efficiency ceiling REGARDLESS of the plan.  A real 4N-executor
cluster adds memory controllers with every node; this ceiling is a
single-box artifact the north rule's cluster criterion does not have.

Usage: python BENCH/membw.py [--n 2] [--secs 6]
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import time

import numpy as np


def _stream(args):
    cpus, secs = args
    os.sched_setaffinity(0, cpus)
    a = np.random.default_rng(1).integers(0, 255, 200_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault b's pages BEFORE timing: concurrent first-touch
    # can be pathologically slow on this host and poisons the first window
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.copyto(b, a)
        n += 1
    return n * 0.4  # GB moved (read + write)


def leg(nproc: int, secs: float) -> float:
    cpus = list(range(32 - nproc, 32))  # same top-of-range sets as scaling.py
    with mp.Pool(nproc) as p:
        res = p.map(_stream, [([c], secs) for c in cpus])
    return sum(res) / secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--secs", type=float, default=6.0)
    args = ap.parse_args()
    for nproc in (args.n, 4 * args.n, args.n):
        print(f"procs={nproc}: aggregate stream {leg(nproc, args.secs):.1f} GB/s")


if __name__ == "__main__":
    main()
