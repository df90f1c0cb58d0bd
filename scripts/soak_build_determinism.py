"""Build-determinism sweep: same corpus at two parallelism levels must
produce BYTE-IDENTICAL index artifacts.

Builds the same deterministic transcripts corpus (default 20,000 convs =
129,984 turns) in two fresh Spark sessions — local[8] and local[32],
shuffle partitions matched to cores — and compares an order-insensitive
content hash (sum + count + modular sum of per-row ``xxhash64`` over all
columns cast to string) of every persistent artifact: blocks, doc_stats,
wmetric, doc_meta.

This is the invariant the north rule's two-cluster-size throughput
comparison implicitly assumes (the N and 4N legs must be doing the same
work on the same output), promoted to a measured check.  It is also the
sweep that caught the round-5 block-numbering defect: block_no restarted
when an Arrow batch boundary landed exactly on a posting-block boundary
— a function of the partition count, so same-parallelism runs agreed
while 8-vs-32 differed (see BENCH/BASELINE.md "Late-round-5 find" and
``tests/test_compression.py::test_blocks_from_sorted_block_aligned_batch_boundary``).

Run from the repo root:

    python scripts/soak_build_determinism.py [n_convs]

Exits nonzero if any artifact's content hash differs between the legs.
"""
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from holi_search_engine_spark.corpus import (  # noqa: E402
    generate_transcripts_df, make_vocabulary,
)
from holi_search_engine_spark.plans.index_build import build_index  # noqa: E402

ARTIFACTS = ("blocks", "doc_stats", "wmetric", "doc_meta")


def content_hash(spark, path):
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h")
    )
    row = h.agg(
        # decimal sum: a long sum of 64-bit hashes overflows under ANSI
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
        F.sum(F.pmod(F.col("h"), F.lit(1000003))).alias("m"),
    ).first()
    return (str(row["s"]), int(row["n"]), int(row["m"]))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    vocab = make_vocabulary()
    results = {}
    for par in (8, 32):
        spark = (
            SparkSession.builder.master(f"local[{par}]")
            .config("spark.sql.shuffle.partitions", str(par))
            .config("spark.driver.memory", "20g")
            .appName(f"det{par}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        d = tempfile.mkdtemp(prefix=f"det_{par}_")
        t0 = time.time()
        docs = generate_transcripts_df(spark, n_convs)
        paths = build_index(spark, docs, d, frozenset(vocab), buckets=8)
        arts = {a: content_hash(spark, getattr(paths, a)) for a in ARTIFACTS}
        dup = (
            spark.read.parquet(paths.blocks)
            .groupBy("term", "block_no")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        print(
            f"par={par} build {time.time()-t0:.1f}s "
            f"dup_block_labels={dup} hashes={arts}",
            flush=True,
        )
        results[par] = arts
        assert dup == 0, "duplicate (term, block_no) labels"
        spark.stop()
    ok = results[8] == results[32]
    print("DETERMINISTIC ACROSS PARALLELISM:", ok, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
