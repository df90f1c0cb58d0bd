"""Training-corpus curation: decontamination and sequence packing."""

from __future__ import annotations

from holi_search_engine_spark.operators.curation import (
    SEQ_LEN,
    corpus_pack_sequences,
    decontaminate_against,
)


def test_decontaminate_flags_seeded_leak(spark):
    # t1 quotes eval doc e1's 8-gram verbatim; t2 shares nothing
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    train = spark.createDataFrame(
        [
            ("t1", f"intro words then {leak} and a tail"),
            ("t2", " ".join(f"u{i}" for i in range(20))),
        ],
        "doc_id string, text string",
    )
    eval_set = spark.createDataFrame(
        [("e1", f"question: {leak} ?")], "doc_id string, text string"
    )
    got = {r.doc_id: r.n_contaminated_ngrams for r in
           decontaminate_against(train, eval_set).collect()}
    assert got == {"t1": 1}


def test_decontaminate_counts_distinct_ngrams(spark):
    # nine shared tokens → two distinct shared 8-grams
    leak = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    train = spark.createDataFrame([("t1", leak)], "doc_id string, text string")
    eval_set = spark.createDataFrame([("e1", leak)], "doc_id string, text string")
    got = decontaminate_against(train, eval_set).collect()
    assert [(r.doc_id, r.n_contaminated_ngrams) for r in got] == [("t1", 2)]


def test_pack_sequences_shard_local_cumsum(spark):
    df = corpus_pack_sequences(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    # per shard, docs in doc_id order tile [0, total) without gaps
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.seq_in_shard == off // SEQ_LEN, (shard, r)
            assert r.offset_in_seq == off % SEQ_LEN, (shard, r)
            off += r.n_tokens


def test_pack_sequences_deterministic_across_parallelism(spark):
    a = corpus_pack_sequences(spark, "/root/testdata/sf0.001")
    b = corpus_pack_sequences(spark, "/root/testdata/sf0.001").repartition(3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
