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


def test_wand_skips_blocks(bm25, vocabulary):
    """Block-max skipping must decode strictly fewer blocks than a
    skip-free scorer would for a hot+rare query at small k (the rare
    term's high-idf docs raise θ past most hot-term block bounds)."""
    q = f"{vocabulary[0]} {vocabulary[4000]}"  # hot + rare
    if bm25.total_blocks(q) < 4:
        pytest.skip("fixture too small for block skipping to be observable")
    before = bm25.blocks_decoded
    got = bm25.search(q, 1)
    decoded = bm25.blocks_decoded - before
    if decoded == 0:
        pytest.skip("query routed to the dense TAAT path")
    assert decoded <= bm25.total_blocks(q)
    _assert_equal(got, bm25.search_bruteforce(q, 1), "skip query still exact")


def test_scores_positive_and_sorted(bm25, vocabulary):
    got = bm25.search(f"{vocabulary[500]} {vocabulary[600]}", 20)
    s = got["score"].to_numpy()
    assert (s > 0).all()
    assert (np.diff(s) <= 1e-15).all()
