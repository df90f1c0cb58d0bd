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
