"""Structured Streaming ingestion: incremental index maintenance and
windowed event aggregation.

The reference has no streaming at all (SURVEY.md §2.6) — its crawler loop
is iterative batch with resume-from-table (``jobs/Crawler.java:26-51``).
This module is the Spark-native upgrade of that pattern: new transcript
files land in a directory, each micro-batch is tokenized with the SAME
vectorized kernel as the batch build, and its (term, doc, tf) delta is
appended to the bucket-partitioned term stream.  Postings/blocks for the
touched buckets are then rebuilt by the ordinary resumable stage-B jobs
(delete the touched buckets' manifests → ``build_index`` redoes only
them), which is exactly the SPIMI "segments then merge" lifecycle with
Spark's shuffle as the merge.

``stream_events_windowed`` is the watermarked windowed-agg operator over
an event stream (late data dropped beyond the watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.index_build import (
    IndexPaths,
    _manifest_path,
    build_doc_meta,
    build_wmetric,
    read_meta,
    tokenize_terms,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcript_deltas(
    spark: SparkSession,
    input_dir: str,
    paths: IndexPaths,
    dictionary: frozenset[str],
    buckets: int,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """File-source stream → tokenize per micro-batch → append term_tf
    deltas partitioned by term-hash bucket, and invalidate the touched
    buckets' stage-B manifests so the next ``build_index`` call rebuilds
    exactly those posting lists.

    Returns the StreamingQuery (caller awaits termination).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(paths.root, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.compression import doc_cols_from_key_exprs

        batch_df = batch_df.cache()
        # with_stats + emit_doc_key keep the delta's schema identical to
        # the batch build's term_tf (doc_key-native; fd dropped pre-write)
        term_tf = tokenize_terms(
            batch_df, dictionary, with_stats=True, emit_doc_key=True
        ).cache()
        bucketed = term_tf.drop("fd").withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
        )
        touched = [r["bucket"] for r in bucketed.select("bucket").distinct().collect()]
        (
            bucketed.repartition(F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(paths.term_tf)
        )
        # doc-local stats append cleanly (new (conv,turn) keys never
        # overlap already-indexed docs — the doc key is the table's PK)
        doc_stats = (
            term_tf.where(F.col("fd") == 1)
            .select(*doc_cols_from_key_exprs(["conv_id", "turn_idx"]), "ntf", "dl", "doc_key")
            .cache()
        )
        # paths.ntf / paths.doc_len are column views of doc_stats — one write
        doc_stats.write.mode("append").parquet(paths.doc_stats)
        doc_stats.unpersist()
        build_doc_meta(batch_df).write.mode("append").parquet(paths.doc_meta)
        term_tf.unpersist()
        batch_df.unpersist()
        # invalidate stage-B outputs for the touched buckets → the next
        # resumable build_index() run re-merges only these
        for b in touched:
            for stage in ("postings", "blocks"):
                p = _manifest_path(paths, stage, b)
                if os.path.exists(p):
                    os.remove(p)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh_global_stats(spark: SparkSession, paths: IndexPaths) -> None:
    """Recompute the corpus-global statistics (df/idf, n_docs, avgdl) from
    the appended term stream after a streaming ingest session.  Doc-local
    stats (ntf, dl, meta) were appended per micro-batch; only the global
    aggregates need a refresh pass."""
    import json

    term_tf = spark.read.parquet(paths.term_tf)
    n_docs = spark.read.parquet(paths.ntf).count()
    build_wmetric(term_tf, n_docs).write.mode("overwrite").parquet(paths.wmetric)
    avgdl = spark.read.parquet(paths.doc_len).agg(F.avg("dl")).collect()[0][0] or 0.0
    meta = read_meta(paths)
    meta.update({"n_docs": n_docs, "n_for_idf": n_docs, "avgdl": float(avgdl)})
    with open(paths.meta_json, "w") as f:
        json.dump(meta, f)


def stream_events_windowed(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked tumbling-window aggregation over a parquet event stream
    (schema of the driver's ``events`` table); append-mode sink emits each
    window once its watermark passes."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
