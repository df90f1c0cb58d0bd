"""Posting-list compression: delta-gap + varbyte + block-max metadata.

The scale path of the index (SURVEY.md §4 custom work #2): instead of one
potentially-huge ``array<struct>`` row per term (a Zipf-head term at
10^12-turn scale has ~10^11 postings — no single row/task may hold it),
posting lists are stored as fixed-size **blocks**: one row per (term,
block_no) with varbyte-compressed doc-key gaps and tfs plus skip metadata
(min/max doc key, max tf, max tf/ntf partial-score bound for WAND).

All encode/decode is numpy array math over Arrow batches — no per-row
Python.  The reference has no compression at all (postings are ASCII
``"url:tf,..."`` strings, ``jobs/Indexer.java:142-176``); this is the part
the north rule adds on top.

Doc keys: a 64-bit orderable key per document.  For the transcripts corpus
``doc_key = conv_num * 64 + turn_idx`` (conv ids embed their index;
turn_idx < 12 < 64), a pure-expression mapping that needs no global sort at
any scale.  Corpora without numeric ids supply their own key expression.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

BLOCK_SIZE = 128
TURN_BITS = 6  # doc_key = conv_num << TURN_BITS | turn_idx


def doc_key_expr(doc_cols: list[str]):
    """64-bit orderable doc key as a Catalyst expression (no UDF)."""
    if doc_cols == ["conv_id", "turn_idx"]:
        conv_num = F.regexp_extract(F.col("conv_id"), r"(\d+)", 1).cast("long")
        return F.shiftleft(conv_num, TURN_BITS) + F.col("turn_idx")
    if len(doc_cols) == 1:
        return F.col(doc_cols[0]).cast("long")
    raise ValueError(f"no doc-key mapping for {doc_cols}")


def doc_key_to_cols(keys: np.ndarray, doc_cols: list[str]) -> pd.DataFrame:
    """Inverse of :func:`doc_key_expr` for surfacing results."""
    if doc_cols == ["conv_id", "turn_idx"]:
        conv = keys >> TURN_BITS
        turn = keys & ((1 << TURN_BITS) - 1)
        return pd.DataFrame(
            {
                "conv_id": [f"conv-{int(c):08d}" for c in conv],
                "turn_idx": turn.astype("int32"),
            }
        )
    return pd.DataFrame({doc_cols[0]: keys})


# ---------------------------------------------------------------- varbyte

def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128-style encoding of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    n = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        n += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(n)
    total = int(ends[-1])
    starts = ends - n
    idx = np.arange(total, dtype=np.int64)
    pos = idx - np.repeat(starts, n)
    vals = np.repeat(v, n)
    chunk = (vals >> (pos.astype(np.uint64) * np.uint64(7))) & np.uint64(0x7F)
    is_last = pos == np.repeat(n - 1, n)
    out = chunk.astype(np.uint8) | np.where(is_last, 0, 0x80).astype(np.uint8)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized decode; inverse of :func:`varbyte_encode`."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    group_start = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    grp = np.zeros(len(b), dtype=np.int64)
    grp[group_start[1:]] = 1
    grp = np.cumsum(grp)
    pos = np.arange(len(b), dtype=np.int64) - group_start[grp]
    shifted = (b & np.uint8(0x7F)).astype(np.uint64) << (
        pos.astype(np.uint64) * np.uint64(7)
    )
    return np.bitwise_or.reduceat(shifted, group_start)


def encode_block(doc_keys: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Delta-gap doc keys (first stored absolute) + tfs, both varbyte."""
    keys = np.ascontiguousarray(doc_keys, dtype=np.uint64)
    gaps = np.empty_like(keys)
    gaps[0] = keys[0]
    np.subtract(keys[1:], keys[:-1], out=gaps[1:])
    return varbyte_encode(gaps), varbyte_encode(tfs.astype(np.uint64))


def decode_block(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    gaps = varbyte_decode(doc_bytes)
    return np.cumsum(gaps, dtype=np.uint64), varbyte_decode(tf_bytes)


# ------------------------------------------------------------ block build

BLOCK_SCHEMA = (
    "term string, block_no int, n int, key_min long, key_max long, "
    "max_tf int, ub_tf_ntf double, ub_bm25 double, doc_bytes binary, tf_bytes binary"
)

# BM25 knobs pinned at build time — the stored per-block upper bound
# ``ub_bm25`` = max over the block of tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
# is only valid for these values (different knobs ⇒ rebuild or exhaustive
# scoring; the reference-mode scorer is unaffected).
BM25_K1 = 1.2
BM25_B = 0.75


def _blocks_from_sorted(pdf_iter):
    """mapInPandas kernel: consumes (term, doc_key, tf, ntf) rows sorted by
    (term, doc_key) within the partition and emits block rows.

    Terms never span partitions (partitioned by term hash), but may span
    Arrow batches — a per-term tail carries over between batches, bounded
    by BLOCK_SIZE + batch size.
    """
    carry: pd.DataFrame | None = None

    def emit(group: pd.DataFrame, flush_all: bool) -> tuple[list[dict], pd.DataFrame | None]:
        rows: list[dict] = []
        n = len(group)
        full = (n // BLOCK_SIZE) * BLOCK_SIZE
        cut = n if flush_all else full
        term = group["term"].iloc[0]
        keys_all = group["doc_key"].to_numpy(dtype=np.int64)
        tfs_all = group["tf"].to_numpy(dtype=np.int64)
        tf_f = group["tf"].to_numpy(dtype=np.float64)
        ratio_all = tf_f / group["ntf"].to_numpy(dtype=np.float64)
        norm = group["bm25_norm"].to_numpy(dtype=np.float64)
        bm25_all = tf_f * (BM25_K1 + 1.0) / (tf_f + BM25_K1 * norm)
        bno = (
            int(group["_bno"].iloc[0])
            if "_bno" in group and pd.notna(group["_bno"].iloc[0])
            else 0
        )
        for s in range(0, cut, BLOCK_SIZE):
            e = min(s + BLOCK_SIZE, cut)
            keys, tfs = keys_all[s:e], tfs_all[s:e]
            db, tb = encode_block(keys.astype(np.uint64), tfs)
            rows.append(
                {
                    "term": term,
                    "block_no": bno,
                    "n": int(e - s),
                    "key_min": int(keys[0]),
                    "key_max": int(keys[-1]),
                    "max_tf": int(tfs.max()),
                    "ub_tf_ntf": float(ratio_all[s:e].max()),
                    "ub_bm25": float(bm25_all[s:e].max()),
                    "doc_bytes": db,
                    "tf_bytes": tb,
                }
            )
            bno += 1
        rest = group.iloc[cut:].copy()
        if len(rest):
            rest["_bno"] = bno
        return rows, (rest if len(rest) else None)

    for pdf in pdf_iter:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        out_rows: list[dict] = []
        terms = pdf["term"].to_numpy()
        # boundary of the last term in the batch: it may continue next batch
        last_term = terms[-1]
        is_last_term = terms == last_term
        head = pdf[~is_last_term]
        tail = pdf[is_last_term]
        if len(head):
            for _, group in head.groupby("term", sort=False):
                rows, _ = emit(group.reset_index(drop=True), flush_all=True)
                out_rows.extend(rows)
        rows, carry = emit(tail.reset_index(drop=True), flush_all=False)
        out_rows.extend(rows)
        if out_rows:
            yield pd.DataFrame(out_rows)
    if carry is not None and len(carry):
        rows, _ = emit(carry.reset_index(drop=True), flush_all=True)
        if rows:
            yield pd.DataFrame(rows)


def build_block_index(
    spark: SparkSession,
    paths,
    bucket: int | list[int] | None,
    doc_cols: list[str],
    buckets: int | None = None,
    partitions: int | None = None,
) -> None:
    """Build the compressed block index (``bucket=None`` → all buckets in
    one job, a list/int → only those, pruned to their term_tf partitions).

    Plan shape: bucket-pruned parquet scan → shuffle-join ntf (doc-keyed)
    → repartition by term → sortWithinPartitions(term, doc_key) →
    mapInPandas block encoder → parquet partitioned by bucket.  No stage
    materializes a whole posting list in memory; the sort is Spark's
    spillable external sort.
    """
    term_tf = spark.read.parquet(paths.term_tf)
    if bucket is not None:
        wanted = [bucket] if isinstance(bucket, int) else list(bucket)
        term_tf = term_tf.where(F.col("bucket").isin(wanted))
    doc_stats = spark.read.parquet(paths.doc_stats)
    from .index_build import read_meta as _read_meta

    avgdl = _read_meta(paths).get("avgdl") or 1.0
    key = doc_key_expr(doc_cols)
    # bm25_norm = 1 − b + b·dl/avgdl, precomputed per doc (pinned knobs);
    # ntf and dl ride in one doc-keyed join (doc_stats), not two
    norm = (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / F.lit(avgdl)
    ).alias("bm25_norm")
    joined = term_tf.join(doc_stats, on=doc_cols).select(
        "term", key.alias("doc_key"), "tf", "ntf", norm
    )
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)
    sorted_stream = joined.repartition(parts, "term").sortWithinPartitions(
        "term", "doc_key"
    )
    blocks = sorted_stream.mapInPandas(_blocks_from_sorted, schema=BLOCK_SCHEMA)
    if buckets is None:
        from .index_build import read_meta

        buckets = read_meta(paths)["buckets"]
    blocks = blocks.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
    )
    (
        blocks.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(paths.blocks)
    )
