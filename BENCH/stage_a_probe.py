#!/usr/bin/env python
"""Stage-A (tokenize) scaling probe with task-level attribution.

Round-3 verdict: "if stage A still misses its own kernel ceiling on a
healthy host, profile it".  This runs ONLY the tokenize pass (the
mapInPandas stage that dominates the build) at each requested
parallelism — fresh pinned JVM each, Spark UI enabled — and prints per
leg: wall, task count, per-task duration quantiles, scheduler delay, GC
time, and the executor-run-time sum, so "doesn't scale" can be split
into its possible causes (too few tasks / skewed tasks / per-task
inflation / scheduling gaps).

Usage: python BENCH/stage_a_probe.py [--convs 60000] [--cpus 1,4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time, urllib.request
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
from holi_search_engine_spark.session import get_spark
from holi_search_engine_spark.corpus import generate_transcripts_df, make_vocabulary
from holi_search_engine_spark.plans.index_build import tokenize_terms

spark = get_spark("stageA-{cpus}", shuffle_partitions={cpus},
                  extra_conf={{"spark.ui.enabled": "true"}})
vocab = frozenset(make_vocabulary())
corpus_dir = "/dev/shm/holi_stageA_corpus_{cpus}"
shutil.rmtree(corpus_dir, ignore_errors=True)
generate_transcripts_df(spark, {convs}).write.parquet(corpus_dir)
corpus_bytes = sum(
    os.path.getsize(os.path.join(r, f))
    for r, _, fs in os.walk(corpus_dir) for f in fs if f.endswith(".parquet")
)
spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(4 << 20, corpus_bytes // (2 * {cpus}))))
spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))
corpus = spark.read.parquet(corpus_dir)
n_turns = corpus.count()
# warm: JIT + python worker spawn excluded, as the scaling protocol does
warm = generate_transcripts_df(spark, 1000, partitions={cpus})
tokenize_terms(warm, vocab, ["conv_id", "turn_idx"], "text",
               with_stats=True, emit_doc_key=True
               ).write.format("noop").mode("overwrite").save()
t0 = time.time()
tokenize_terms(corpus, vocab, ["conv_id", "turn_idx"], "text",
               with_stats=True, emit_doc_key=True
               ).write.format("noop").mode("overwrite").save()
wall = time.time() - t0
base = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
with urllib.request.urlopen(f"{{base}}/api/v1/applications/{{app}}/stages?status=complete") as r:
    stages = json.load(r)
big = max(stages, key=lambda s: s.get("executorRunTime", 0))
with urllib.request.urlopen(
    f"{{base}}/api/v1/applications/{{app}}/stages/{{big['stageId']}}/0/taskSummary?quantiles=0.0,0.5,0.95,1.0"
) as r:
    tq = json.load(r)
print("RESULT " + json.dumps({{
    "cpus": {cpus}, "n_turns": n_turns, "wall": wall,
    "tps": n_turns / wall,
    "stage_name": big.get("name"), "num_tasks": big.get("numCompleteTasks"),
    "executor_run_ms": big.get("executorRunTime"),
    "executor_cpu_ms": (big.get("executorCpuTime") or 0) // 1000000,
    "gc_ms": big.get("jvmGcTime"),
    "task_duration_q": tq.get("duration"),
    "sched_delay_q": tq.get("schedulerDelay"),
    "deser_q": tq.get("executorDeserializeTime"),
}}))
spark.stop()
"""


def run_once(cpus: int, convs: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, convs=convs)
    start = 32 - cpus
    # 3g/core, matching scaling.py's legs: at 6g/core the 4-core leg's
    # 24g-Xmx JVM measurably de-optimized (~2.2x), and the probe must run
    # the exact JVM shape whose stage-A scaling it is meant to explain
    env = dict(os.environ, SPARK_DRIVER_MEM=f"{3 * cpus}g")
    proc = subprocess.run(
        ["taskset", "-c", f"{start}-{31}", sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT (cpus={cpus}); stderr:\n" + proc.stderr[-3000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--cpus", default="1,4")
    args = ap.parse_args()
    res = []
    for c in (int(x) for x in args.cpus.split(",")):
        r = run_once(c, args.convs)
        res.append(r)
        print(json.dumps(r), file=sys.stderr)
    if len(res) == 2 and res[0]["cpus"] < res[1]["cpus"]:
        a, b = res
        ratio = b["tps"] / a["tps"]
        ideal = b["cpus"] / a["cpus"]
        print(json.dumps({
            "speedup": round(ratio, 3), "ideal": ideal,
            "efficiency": round(ratio / ideal, 3),
            "runtime_inflation": round(
                (b["executor_run_ms"] or 1) / (a["executor_run_ms"] or 1), 3
            ),
        }))


if __name__ == "__main__":
    main()
