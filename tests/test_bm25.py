"""Block-max WAND BM25: exact top-k equality vs brute-force scoring."""

import numpy as np
import pytest

from holi_search_engine_spark.corpus import make_query_fixtures
from holi_search_engine_spark.query.bm25 import BM25Engine


@pytest.fixture(scope="session")
def bm25(spark, built_index):
    return BM25Engine(spark, built_index)


def _assert_equal(got, exp, label):
    assert list(got["conv_id"]) == list(exp["conv_id"]), label
    assert list(got["turn_idx"]) == list(exp["turn_idx"]), label
    assert np.allclose(got["score"], exp["score"], atol=1e-12), label


def test_wand_matches_bruteforce_fixture_queries(bm25, vocabulary):
    for qid, q in make_query_fixtures(vocabulary):
        for k in (1, 5, 10):
            _assert_equal(bm25.search(q, k), bm25.search_bruteforce(q, k), f"{qid} k={k}")


def test_wand_matches_bruteforce_hot_terms(bm25, vocabulary):
    # Zipf-head terms (incl. stopwords — longest posting lists)
    hot = vocabulary[:5]
    queries = [
        " ".join(hot),
        hot[0],
        f"{hot[0]} {vocabulary[4000]}",  # hot + rare
        " ".join(vocabulary[100:110]),  # 10 terms
    ]
    for q in queries:
        for k in (1, 10, 50, 250):
            _assert_equal(bm25.search(q, k), bm25.search_bruteforce(q, k), f"{q[:30]} k={k}")


def test_k_larger_than_candidates(bm25, vocabulary):
    rare = vocabulary[4999]
    got = bm25.search(rare, 10_000)
    exp = bm25.search_bruteforce(rare, 10_000)
    _assert_equal(got, exp, "k>candidates")


def test_absent_term_empty(bm25):
    assert len(bm25.search("zzzznotaterm", 10)) == 0


@pytest.fixture(scope="module")
def bm25_skip(spark, tmp_path_factory):
    """An index engineered so block-max skipping is OBSERVABLE: a hot term
    in all 4096 docs (32 blocks at BLOCK_SIZE=128) and a high-idf rare term
    in 4 of them, with total postings (4100) under the TAAT crossover so
    the query stays on the WAND path."""
    import pandas as pd

    from holi_search_engine_spark.plans.index_build import build_index

    rows = []
    for i in range(4096):
        text = "common " * (1 + i % 3)
        if i % 1024 == 500:
            text += "rareterm " * 8
        rows.append((f"conv-{i:08d}", 0, text))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    out = str(tmp_path_factory.mktemp("bm25skip") / "idx")
    paths = build_index(
        spark,
        spark.createDataFrame(pdf),
        out,
        frozenset({"common", "rareterm"}),
        buckets=2,
    )
    return BM25Engine(spark, paths)


def test_wand_skips_blocks(bm25_skip):
    """Block-max skipping must decode STRICTLY fewer blocks than a
    skip-free scorer for a hot+rare query at k=1: once a rare doc is
    scored, θ exceeds every hot-only block bound and the hot cursor jumps
    straight between the rare docs' blocks."""
    q = "common rareterm"
    total = bm25_skip.total_blocks(q)
    assert total >= 16  # 32 hot blocks + the rare block(s)
    before = bm25_skip.blocks_decoded
    got = bm25_skip.search(q, 1)
    decoded = bm25_skip.blocks_decoded - before
    assert 0 < decoded < total
    _assert_equal(
        got, bm25_skip.search_bruteforce(q, 1), "skip query still exact"
    )


def test_scores_positive_and_sorted(bm25, vocabulary):
    got = bm25.search(f"{vocabulary[500]} {vocabulary[600]}", 20)
    s = got["score"].to_numpy()
    assert (s > 0).all()
    assert (np.diff(s) <= 1e-15).all()


def test_auto_degraded_mode_identical(spark, built_index, bm25, vocabulary):
    # force the preload threshold to 0 bytes: the engine must fall back to
    # term-pruned per-query reads and return identical results
    deg = BM25Engine(spark, built_index, preload_max_bytes=0)
    assert not deg.preloaded and bm25.preloaded
    for qid, q in make_query_fixtures(vocabulary)[:12]:
        _assert_equal(deg.search(q, 10), bm25.search(q, 10), qid)
        _assert_equal(
            deg.search_bruteforce(q, 10), bm25.search_bruteforce(q, 10), qid
        )
    assert deg.total_blocks("the") == bm25.total_blocks("the")
