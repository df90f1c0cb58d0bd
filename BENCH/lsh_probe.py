#!/usr/bin/env python
"""One-off probe: per-stage shuffle writes of the production k=128 LSH
path at a reduced scale tier, to attribute BENCH_r04's 7.7 GB before
optimizing.  Usage: python BENCH/lsh_probe.py [n_docs]."""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000


def stages(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return json.load(r)


def main():
    from pyspark.sql import functions as F

    from holi_search_engine_spark.corpus import generate_transcripts_df
    from holi_search_engine_spark.operators.dedup import lsh_near_dup_pairs
    from holi_search_engine_spark.session import get_spark

    spark = get_spark("lsh-probe", extra_conf={"spark.ui.enabled": "true"})
    sc_dir = "/dev/shm/lsh_probe"
    shutil.rmtree(sc_dir, ignore_errors=True)
    convs = max(1, N_DOCS * 20000 // 129984)
    docs_src = generate_transcripts_df(spark, convs).select(
        F.xxhash64(F.concat_ws(":", "conv_id", "turn_idx")).alias("doc_id"),
        "text",
    )
    docs_src.write.parquet(f"{sc_dir}/docs")
    docs = spark.read.parquet(f"{sc_dir}/docs")
    n = docs.count()
    before = {s["stageId"] for s in stages(spark)}
    t0 = time.time()
    pairs = lsh_near_dup_pairs(docs, n_hashes=128, threshold=0.5)
    n_pairs = pairs.count()
    wall = time.time() - t0
    new = [s for s in stages(spark) if s["stageId"] not in before]
    new.sort(key=lambda s: -s.get("shuffleWriteBytes", 0))
    print(f"n_docs={n} pairs={n_pairs} wall={wall:.1f}s")
    total = sum(s.get("shuffleWriteBytes", 0) for s in new)
    print(f"total shuffle write: {total/1e6:.1f} MB over {len(new)} stages")
    for s in new[:14]:
        print(
            f"  stage {s['stageId']:>4} write={s.get('shuffleWriteBytes',0)/1e6:>8.1f}MB "
            f"read={s.get('shuffleReadBytes',0)/1e6:>8.1f}MB tasks={s.get('numTasks')} "
            f"name={s.get('name','')[:70]}"
        )
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    print("by executor run time:")
    for s in new[:14]:
        print(
            f"  stage {s['stageId']:>4} run={s.get('executorRunTime',0)/1e3:>8.1f}s "
            f"cpu={s.get('executorCpuTime',0)/1e9:>8.1f}s "
            f"spillMB={s.get('memoryBytesSpilled',0)/1e6:>8.1f} tasks={s.get('numTasks')} "
            f"name={s.get('name','')[:60]}"
        )
    shutil.rmtree(sc_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
