"""Structured Streaming: incremental index deltas converge to the batch
build, and watermarked windowed aggregation matches the batch window agg."""

import os
import shutil

import pytest
from pyspark.sql import functions as F


def test_incremental_index_converges_to_batch(
    spark, xs_pdf, dictionary, tmp_path
):
    """Stream the corpus in two file drops; after stage-B rebuild the
    postings must equal a one-shot batch build over the full corpus."""
    from holi_search_engine_spark.plans.index_build import build_index
    from holi_search_engine_spark.streaming.incremental import (
        stream_transcript_deltas,
    )

    pdf = xs_pdf.copy()
    pdf["ts"] = pdf["ts"].dt.tz_localize(None)
    half = pdf["conv_id"] < "conv-00000025"
    part1, part2 = pdf[half], pdf[~half]

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    idx_dir = str(tmp_path / "idx_stream")

    # bootstrap: batch-build on the first half
    df1 = spark.createDataFrame(part1)
    paths = build_index(spark, df1, idx_dir, dictionary, buckets=2, build_blocks=False)

    # drop the second half as a new file; stream it in
    spark.createDataFrame(part2).coalesce(1).write.mode("overwrite").parquet(
        str(inbox / "drop2")
    )
    q = stream_transcript_deltas(
        spark, str(inbox / "drop2"), paths, dictionary, buckets=2
    )
    q.awaitTermination(120)

    # stage-B manifests were invalidated → resumable build redoes them;
    # stage A must NOT rerun (its manifest still stands)
    stage_a = os.path.join(paths.manifest, "stage_a.json")
    mtime = os.path.getmtime(stage_a)
    df_all = spark.createDataFrame(pdf)
    build_index(spark, df_all, idx_dir, dictionary, buckets=2, build_blocks=False)
    assert os.path.getmtime(stage_a) == mtime

    # compare to a fresh one-shot batch build
    batch_dir = str(tmp_path / "idx_batch")
    batch = build_index(spark, df_all, batch_dir, dictionary, buckets=2, build_blocks=False)

    def canon(p):
        return (
            spark.read.parquet(p.postings)
            .select("term", F.to_json("postings").alias("p"))
            .orderBy("term")
            .toPandas()
        )

    a, b = canon(paths), canon(batch)
    assert len(a) == len(b)
    assert (a["term"].to_numpy() == b["term"].to_numpy()).all()
    assert (a["p"].to_numpy() == b["p"].to_numpy()).all()


def test_windowed_stream_matches_batch(spark, tmp_path):
    from holi_search_engine_spark.streaming.incremental import stream_events_windowed

    # the file stream source requires a directory of files
    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "part-0.parquet")
    src = str(src_dir)
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    q = stream_events_windowed(spark, src, out, ckpt, watermark="0 seconds")
    q.awaitTermination(120)
    got = (
        spark.read.parquet(out)
        .groupBy("window_start", "event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("total"))
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    exp = (
        spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    # append mode withholds windows the watermark has not passed — the
    # final window per event_type may be absent; every EMITTED window must
    # match the batch aggregation exactly
    n_types = exp["event_type"].nunique()
    assert len(got) >= len(exp) - n_types
    merged = got.merge(
        exp, on=["window_start", "event_type"], suffixes=("_s", "_b"), how="left"
    )
    assert merged["n_b"].notna().all()  # no spurious windows
    assert (merged["n_s"].to_numpy() == merged["n_b"].to_numpy()).all()
    assert (abs(merged["total_s"].to_numpy() - merged["total_b"].to_numpy()) < 1e-6).all()


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions close when a later
    event exceeds the gap (within or across micro-batches); open sessions
    persist as state between batches."""
    import pandas as pd

    from holi_search_engine_spark.streaming.incremental import stream_sessionize

    inbox = tmp_path / "events_in"
    inbox.mkdir()
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(inbox / name)
        )

    t0 = "2026-01-01 10:00:00"
    # user 1: two events 5 min apart (one session), then a gap > 30 min
    # inside the SAME batch closes it and opens a second
    drop(
        "b1",
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, "2026-01-01 10:05:00", 1, "click", 2.0, "{}"),
            (3, "2026-01-01 11:00:00", 1, "click", 4.0, "{}"),
            (4, t0, 2, "view", 10.0, "{}"),
        ],
    )
    q = stream_sessionize(spark, str(inbox / "*"), out, ckpt, gap_sec=1800)
    q.awaitTermination(120)

    got = spark.read.parquet(out).toPandas()
    # only user 1's FIRST session is closed; user 1's second and user 2's
    # sessions are still open state
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["user_id"], r["n_events"], r["total_value"]) == (1, 2, 3.0)
    assert str(r["session_start"]).startswith("2026-01-01 10:00:00")
    assert str(r["session_end"]).startswith("2026-01-01 10:05:00")

    # batch 2: a much-later event for user 2 closes their open session
    drop("b2", [(5, "2026-01-01 13:00:00", 2, "view", 7.0, "{}")])
    q = stream_sessionize(spark, str(inbox / "*"), out, ckpt, gap_sec=1800)
    q.awaitTermination(120)

    got = spark.read.parquet(out).toPandas().sort_values("user_id")
    closed2 = got[got["user_id"] == 2]
    assert len(closed2) == 1
    assert (closed2.iloc[0]["n_events"], closed2.iloc[0]["total_value"]) == (1, 10.0)


def test_stream_dedup_across_batches(spark, tmp_path):
    # e2 is re-delivered in a LATER file (a separate micro-batch under
    # availableNow's file ordering) within the watermark window: state
    # carried across batches must drop it; e4's id is new and survives
    import datetime as dt

    from holi_search_engine_spark.streaming.incremental import stream_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch1 = spark.createDataFrame(
        [
            (1, t0, 10, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=1), 10, "click", 2.0, "{}"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (2, t0 + dt.timedelta(minutes=2), 10, "click", 2.0, "{}"),  # dupe
            (4, t0 + dt.timedelta(minutes=3), 11, "view", 4.0, "{}"),
        ],
        schema,
    )
    inbox = tmp_path / "in"
    inbox.mkdir()
    batch1.coalesce(1).write.parquet(str(inbox / "f1.parquet"))
    batch2.coalesce(1).write.parquet(str(inbox / "f2.parquet"))
    q = stream_dedup(
        spark, str(inbox / "*"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    got = sorted(
        r.event_id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [1, 2, 4]


def test_gate_stream_entries_drain_within_budget(spark):
    """The correctness-gate streaming entries must finish their seeded
    availableNow drains well inside the gate's 600 s budget (round-2
    verdict #9: a driver-side hang here would eat the verification
    window).  The 300 s cap is a hang guard sized for the host's
    documented >2x wall-time drift, not a latency target — the dev-box
    numbers are ~30-45 s each."""
    import time

    from holi_search_engine_spark.operators.events import (
        STREAM_USER_CAP,
        events_stream_dedup,
        events_stream_sessionize,
    )

    sf = "/root/testdata/sf0.01"
    t0 = time.time()
    sess = events_stream_sessionize(spark, sf)
    n_sess = sess.count()
    t_sess = time.time() - t0
    assert t_sess < 300, f"sessionize drain took {t_sess:.0f}s"
    assert n_sess > 100
    assert sess.where(f"user_id >= {STREAM_USER_CAP}").count() == 0

    t0 = time.time()
    ded = events_stream_dedup(spark, sf)
    n_ded = ded.count()
    t_ded = time.time() - t0
    assert t_ded < 300, f"dedup drain took {t_ded:.0f}s"
    # dedup must collapse the seeded re-deliveries back to the originals
    exp = (
        spark.read.parquet(f"{sf}/events.parquet")
        .where(f"user_id < {STREAM_USER_CAP}")
        .count()
    )
    assert n_ded == exp
