"""End-to-end Spark index build vs the pandas oracle (SURVEY.md §5), plus
resumability and the per-row invariant."""

import glob
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from holi_search_engine_spark.plans.compression import decode_block


def _postings_as_dict(spark, paths):
    pp = spark.read.parquet(paths.postings).toPandas()
    return {
        r.term: [((p["conv_id"], p["turn_idx"]), p["tf"]) for p in r.postings]
        for r in pp.itertuples()
    }


def test_postings_match_oracle(spark, built_index, oracle_index):
    got = _postings_as_dict(spark, built_index)
    assert set(got) == set(oracle_index.postings)
    for term, plist in oracle_index.postings.items():
        assert got[term] == plist, term


def test_postings_doc_ordered(spark, built_index):
    pp = spark.read.parquet(built_index.postings).toPandas()
    for r in pp.itertuples():
        keys = [(p["conv_id"], p["turn_idx"]) for p in r.postings]
        assert keys == sorted(keys), r.term


def test_ntf_matches_oracle(spark, built_index, oracle_index):
    ntf = spark.read.parquet(built_index.ntf).toPandas()
    got = {(r.conv_id, int(r.turn_idx)): r.ntf for r in ntf.itertuples()}
    assert set(got) == set(oracle_index.ntf)
    for k, v in oracle_index.ntf.items():
        assert abs(got[k] - v) < 1e-12, k


def test_wmetric_matches_oracle(spark, built_index, oracle_index):
    wm = spark.read.parquet(built_index.wmetric).toPandas()
    got = {r.term: (int(r.df), r.idf) for r in wm.itertuples()}
    assert set(got) == set(oracle_index.wmetric)
    for t, (df, idf) in oracle_index.wmetric.items():
        assert got[t][0] == df, t
        assert abs(got[t][1] - idf) < 1e-12, t


def test_doc_meta_matches_oracle(spark, built_index, oracle_index):
    dm = spark.read.parquet(built_index.doc_meta).toPandas()
    got_t = {(r.conv_id, int(r.turn_idx)): r.title for r in dm.itertuples()}
    got_s = {(r.conv_id, int(r.turn_idx)): r.snippet for r in dm.itertuples()}
    for k, title in oracle_index.titles.items():
        assert got_t[k] == title, k
    for k, snip in oracle_index.snippets.items():
        assert got_s[k] == snip, k


def test_df_equals_distinct_term_doc(spark, built_index):
    # invariant: stored df == distinct (term, doc) count + 1 (quirk Q3)
    tf = spark.read.parquet(built_index.term_tf)
    counts = tf.groupBy("term").count().toPandas().set_index("term")["count"]
    wm = spark.read.parquet(built_index.wmetric).toPandas().set_index("term")
    assert ((wm["df"] - 1) == counts.reindex(wm.index)).all()


def test_blocks_roundtrip_to_postings(spark, built_index, oracle_index):
    bl = spark.read.parquet(built_index.blocks).toPandas()
    for term, g in bl.groupby("term"):
        g = g.sort_values("block_no")
        keys = np.concatenate(
            [decode_block(d, t)[0] for d, t in zip(g.doc_bytes, g.tf_bytes)]
        )
        tfs = np.concatenate(
            [decode_block(d, t)[1] for d, t in zip(g.doc_bytes, g.tf_bytes)]
        )
        exp = oracle_index.postings[term]
        exp_keys = np.array(
            [(int(c.split("-")[1]) << 6) + t for (c, t), _ in exp], dtype=np.uint64
        )
        exp_tfs = np.array([tf for _, tf in exp], dtype=np.uint64)
        assert (keys == exp_keys).all(), term
        assert (tfs == exp_tfs).all(), term
        # skip metadata correct
        assert (g["key_min"].to_numpy()[0] == int(exp_keys[0]))
        assert (g["key_max"].to_numpy()[-1] == int(exp_keys[-1]))


def test_manifest_written_and_resume_skips(spark, built_index, xs_df, dictionary):
    from holi_search_engine_spark.plans.index_build import build_index

    manifest_files = sorted(glob.glob(os.path.join(built_index.manifest, "*.json")))
    assert manifest_files
    stage_a = json.load(open(os.path.join(built_index.manifest, "stage_a.json")))
    assert stage_a["status"] == "done"
    assert stage_a["n_turns"] > 0 and stage_a["turns_per_sec"] > 0
    bucket_manifests = [m for m in manifest_files if "postings_bucket" in m]
    assert len(bucket_manifests) == 2
    rec = json.load(open(bucket_manifests[0]))
    assert rec["n_terms"] > 0 and rec["n_postings"] > 0
    # resume: all stages done → rebuild touches nothing (mtimes unchanged)
    mtimes = {m: os.path.getmtime(m) for m in manifest_files}
    build_index(
        spark, xs_df, built_index.root, dictionary, buckets=2, build_blocks=True
    )
    for m, t in mtimes.items():
        assert os.path.getmtime(m) == t, f"resume re-ran {m}"


def test_resume_rebuilds_only_invalidated_bucket(spark, xs_df, dictionary, tmp_path):
    """Deleting one bucket's manifest → rebuild touches only that bucket."""
    from holi_search_engine_spark.plans.index_build import build_index

    out = str(tmp_path / "idx_resume")
    paths = build_index(spark, xs_df, out, dictionary, buckets=2, build_blocks=False)
    m0 = os.path.join(paths.manifest, "postings_bucket_0000.json")
    m1 = os.path.join(paths.manifest, "postings_bucket_0001.json")
    t0_before = os.path.getmtime(m0)
    os.remove(m1)
    before = _postings_as_dict(spark, paths)
    build_index(spark, xs_df, out, dictionary, buckets=2, build_blocks=False)
    assert os.path.getmtime(m0) == t0_before  # untouched bucket skipped
    assert os.path.exists(m1)  # invalidated bucket rebuilt
    after = _postings_as_dict(spark, paths)
    assert before == after  # content identical after partial rebuild


def test_per_row_invariant_roundtrip(spark, xs_df, xs_pdf):
    """North-rule per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after a Spark round-trip."""
    back = (
        xs_df.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    src = (
        xs_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (back["conv_id"] == src["conv_id"]).all()
    assert (back["turn_idx"].to_numpy() == src["turn_idx"].to_numpy()).all()
    assert (back["text"] == src["text"]).all()


def test_build_deterministic_across_parallelism(
    spark, xs_df, dictionary, tmp_path, built_index
):
    """Same input at different shuffle parallelism ⇒ identical index content
    (needed for the scaling-efficiency comparison to be valid)."""
    from holi_search_engine_spark.plans.index_build import build_index

    out2 = str(tmp_path / "idx_par2")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        p2 = build_index(
            spark, xs_df.repartition(3), out2, dictionary, buckets=2, build_blocks=False
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    def canon(paths):
        return (
            spark.read.parquet(paths.postings)
            .select("term", F.to_json("postings").alias("p"))
            .orderBy("term")
            .toPandas()
        )

    a, b = canon(p2), canon(built_index)
    assert len(a) == len(b)
    assert (a["term"].to_numpy() == b["term"].to_numpy()).all()
    assert (a["p"].to_numpy() == b["p"].to_numpy()).all()


def test_degenerate_corpus_builds_empty_index(spark, dictionary, tmp_path):
    """A corpus whose texts tokenize to nothing must still produce
    schema-full artifacts every reader can open, plus empty query results
    (not a schema-inference crash on bare directories)."""
    from holi_search_engine_spark.plans.index_build import build_index
    from holi_search_engine_spark.query.bm25 import BM25Engine
    from holi_search_engine_spark.query.ranker import RankerEngine

    df = spark.createDataFrame(
        [(f"conv-{i:08d}", 0, "user", "", None, None) for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path / "idx_degenerate")
    paths = build_index(spark, df, out, dictionary, buckets=2)
    for p in (paths.term_tf, paths.doc_stats, paths.blocks, paths.wmetric, paths.postings):
        assert spark.read.parquet(p).count() == 0, p
    assert len(RankerEngine(spark, paths).search("anything at all")) == 0
    assert len(BM25Engine(spark, paths).search("anything at all")) == 0


def test_nonconforming_conv_ids_fall_back_to_string_keys(spark, dictionary, tmp_path):
    """conv_ids outside the 'conv-%08d' contract ('a7'/'b7' would COLLIDE
    under first-digit-run packing) must disable the packed doc_key and
    come back verbatim in every artifact."""
    from holi_search_engine_spark.plans.index_build import build_index

    pdf = pd.DataFrame(
        {
            "conv_id": ["a7", "b7", "conv-00000001"],
            "turn_idx": [0, 0, 0],
            "text": ["hello world", "hello hello", "world"],
        }
    )
    out = str(tmp_path / "idx_strkeys")
    # the block index REQUIRES the packed key, so a non-conforming corpus
    # must fail fast instead of silently merging 'a7'/'b7' postings
    import pytest

    with pytest.raises(ValueError, match="round-trip"):
        build_index(spark, spark.createDataFrame(pdf), out, dictionary, buckets=2)
    out = str(tmp_path / "idx_strkeys2")
    paths = build_index(
        spark, spark.createDataFrame(pdf), out, dictionary, buckets=2,
        build_blocks=False,
    )
    assert "doc_key" not in spark.read.parquet(paths.term_tf).columns
    stats = spark.read.parquet(paths.doc_stats).toPandas()
    assert set(stats["conv_id"]) == {"a7", "b7", "conv-00000001"}


def test_turn_idx_overflow_falls_back_to_string_keys(spark, dictionary, tmp_path):
    """turn_idx >= 2^TURN_BITS would corrupt packed keys silently — the
    round-trip gate must route the build to string doc columns instead."""
    from holi_search_engine_spark.plans.compression import TURN_BITS
    from holi_search_engine_spark.plans.index_build import build_index

    over = 1 << TURN_BITS
    pdf = pd.DataFrame(
        {
            "conv_id": ["conv-00000001"] * 2,
            "turn_idx": [0, over],
            "text": ["alpha beta", "beta gamma"],
        }
    )
    out = str(tmp_path / "idx_turnover")
    paths = build_index(
        spark, spark.createDataFrame(pdf), out, dictionary, buckets=2,
        build_blocks=False,
    )
    assert "doc_key" not in spark.read.parquet(paths.term_tf).columns
    stats = spark.read.parquet(paths.doc_stats).toPandas()
    assert set(int(t) for t in stats["turn_idx"]) == {0, over}


def test_digitless_conv_id_falls_back_not_throws(spark, dictionary, tmp_path):
    """A conv_id with NO digits makes regexp_extract yield '' — under
    Spark 4's default ANSI mode a plain cast('' as long) THROWS inside
    the round-trip validation itself, crashing the build before the
    fallback it guards could trigger; try_cast must route such corpora
    to string doc columns."""
    from holi_search_engine_spark.plans.index_build import build_index

    pdf = pd.DataFrame(
        {
            "conv_id": ["alpha", "conv-00000001"],
            "turn_idx": [0, 1],
            "text": ["alpha beta", "beta gamma"],
        }
    )
    out = str(tmp_path / "idx_digitless")
    paths = build_index(
        spark, spark.createDataFrame(pdf), out, dictionary, buckets=2,
        build_blocks=False,
    )
    assert "doc_key" not in spark.read.parquet(paths.term_tf).columns
    stats = spark.read.parquet(paths.doc_stats).toPandas()
    assert set(stats["conv_id"]) == {"alpha", "conv-00000001"}


def test_tokenize_terms_doc_key_guard_raises(spark):
    """Kernel defense-in-depth: forcing emit_doc_key on a non-conforming
    batch raises instead of corrupting keys."""
    import pytest

    from holi_search_engine_spark.plans.compression import TURN_BITS
    from holi_search_engine_spark.plans.index_build import tokenize_terms

    df = spark.createDataFrame(
        [("conv-00000001", 1 << TURN_BITS, "some words")],
        "conv_id string, turn_idx int, text string",
    )
    out = tokenize_terms(df, frozenset(), ["conv_id", "turn_idx"], emit_doc_key=True)
    with pytest.raises(Exception, match="doc_key packing violated"):
        out.collect()


def test_resume_legacy_term_tf_without_stats(spark, xs_df, dictionary, tmp_path):
    """Resuming over a term_tf written by a pre-stats build (no ntf/dl
    columns) must recompute doc_stats the old way, not crash."""
    from holi_search_engine_spark.plans.index_build import build_index

    out = str(tmp_path / "idx_legacy")
    paths = build_index(spark, xs_df, out, dictionary, buckets=2, build_blocks=False)
    expected = (
        spark.read.parquet(paths.doc_stats)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    legacy = spark.read.parquet(paths.term_tf).drop("ntf", "dl", "fd").toPandas()
    import shutil

    shutil.rmtree(paths.term_tf)
    spark.createDataFrame(legacy).write.partitionBy("bucket").parquet(paths.term_tf)
    os.remove(os.path.join(paths.manifest, "doc_stats.json"))
    build_index(spark, xs_df, out, dictionary, buckets=2, build_blocks=False)
    got = (
        spark.read.parquet(paths.doc_stats)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (got["conv_id"] == expected["conv_id"]).all()
    assert np.allclose(got["ntf"], expected["ntf"])
    assert (got["dl"].to_numpy() == expected["dl"].to_numpy()).all()


def test_salted_postings_zipf_head_term(spark):
    # a head term present in EVERY doc: the salted two-phase assembly must
    # return one complete, doc-ordered posting list identical to a plain
    # single-phase groupBy, at any salt and any input partitioning
    from pyspark.sql import functions as F

    from holi_search_engine_spark.plans.index_build import build_postings

    rows = [(f"conv-{i:08d}", i % 7, "the", 1 + (i % 3)) for i in range(500)]
    rows += [(f"conv-{i:08d}", i % 7, f"rare{i}", 1) for i in range(0, 500, 50)]
    tf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, term string, tf int"
    ).repartition(13)

    got = {
        r["term"]: (r["df"], [tuple(p) for p in r["postings"]])
        for r in build_postings(tf, ["conv_id", "turn_idx"], salt=4).collect()
    }
    assert got["the"][0] == 500
    expect = sorted((f"conv-{i:08d}", i % 7, 1 + (i % 3)) for i in range(500))
    assert got["the"][1] == expect
    # rare terms survive alongside the head term
    assert got["rare0"] == (1, [("conv-00000000", 0, 1)])
