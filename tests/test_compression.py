"""Varbyte / delta-gap / block codec roundtrip + property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from holi_search_engine_spark.plans.compression import (
    decode_block,
    encode_block,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0


def test_varbyte_known_values():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(vals))
    assert (out == vals).all()
    # single small value = one byte
    assert len(varbyte_encode(np.array([5], dtype=np.uint64))) == 1
    assert len(varbyte_encode(np.array([128], dtype=np.uint64))) == 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=256,
        unique_by=lambda t: t[0],
    )
)
def test_block_roundtrip(pairs):
    pairs.sort()
    keys = np.array([k for k, _ in pairs], dtype=np.uint64)
    tfs = np.array([t for _, t in pairs], dtype=np.uint64)
    db, tb = encode_block(keys, tfs)
    k2, t2 = decode_block(db, tb)
    assert (k2 == keys).all()
    assert (t2 == tfs).all()


def test_compression_is_compact():
    # dense doc keys → ~1 byte/gap
    keys = np.arange(10_000, 20_000, dtype=np.uint64)
    tfs = np.ones(10_000, dtype=np.uint64)
    db, tb = encode_block(keys, tfs)
    assert len(db) < 10_100  # first absolute key + 1 byte per gap
    assert len(tb) == 10_000


def test_doc_key_exprs_roundtrip(spark):
    """doc_key_expr ∘ doc_cols_from_key_exprs == identity on (conv_id,
    turn_idx) — the hot path carries only the key, so the Catalyst inverse
    must reconstruct the exact strings the tokenizer's pandas mirror saw."""
    from pyspark.sql import functions as F

    from holi_search_engine_spark.plans.compression import (
        doc_cols_from_key_exprs,
        doc_key_expr,
    )

    src = spark.createDataFrame(
        [(f"conv-{i:08d}", t) for i in (0, 7, 12345, 99999999) for t in (0, 1, 11)],
        "conv_id string, turn_idx int",
    )
    key = doc_key_expr(["conv_id", "turn_idx"])
    back = (
        src.select(key.alias("doc_key"), F.col("conv_id").alias("c0"), F.col("turn_idx").alias("t0"))
        .select("c0", "t0", *doc_cols_from_key_exprs(["conv_id", "turn_idx"]))
        .collect()
    )
    for r in back:
        assert r["conv_id"] == r["c0"], r
        assert r["turn_idx"] == r["t0"], r
