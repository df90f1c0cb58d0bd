"""Distributed (Spark-job) search path: rank-identity vs the oracle on a
representative query subset (full 38-query identity is covered by the
driver-mode ranker; each distributed query costs several Spark jobs)."""

import pytest

from holi_search_engine_spark.corpus import make_query_fixtures
from holi_search_engine_spark.oracle import pandas_oracle as O
from holi_search_engine_spark.query.distributed import DistributedRanker

SUBSET = [
    "q_single_hot", "q_multi_hot", "q_multi_mixed", "q_repeated",
    "q_all_stop", "q_stop_mix", "q_absent", "q_single_rare",
    "q_punct_case", "q_ten_terms",
]


@pytest.fixture(scope="session")
def dranker(spark, built_index):
    return DistributedRanker(spark, built_index)


def test_distributed_rank_identity(dranker, oracle_index, vocabulary):
    queries = dict(make_query_fixtures(vocabulary))
    for qid in SUBSET:
        q = queries[qid]
        got = dranker.search(q)
        exp = O.search(oracle_index, q)
        got_keys = list(zip(got["conv_id"], got["turn_idx"])) if len(got) else []
        assert got_keys == [c.doc for c in exp], qid
        for g, c in zip(got["score"], exp):
            assert abs(g - c.score()) < 1e-9, qid


def test_distributed_bm25_matches_engine(spark, built_index, vocabulary):
    """Doc-range-partitioned distributed BM25 must be rank-identical
    (docs AND scores) to the single-node engine for every fixture query,
    at several range counts (1 range = the degenerate single-task case;
    many ranges force blocks to split across tasks)."""
    import numpy as np

    from holi_search_engine_spark.corpus import make_query_fixtures
    from holi_search_engine_spark.query.bm25 import BM25Engine
    from holi_search_engine_spark.query.distributed import distributed_bm25_topk

    eng = BM25Engine(spark, built_index)
    for qid, q in make_query_fixtures(vocabulary)[:8]:
        exp = eng.search(q, 10)
        for nr in (1, 7):
            got = distributed_bm25_topk(spark, built_index, q, 10, n_ranges=nr)
            assert list(got["conv_id"]) == list(exp["conv_id"]), (qid, nr)
            assert list(got["turn_idx"]) == list(exp["turn_idx"]), (qid, nr)
            assert np.allclose(got["score"], exp["score"], atol=1e-9), (qid, nr)
