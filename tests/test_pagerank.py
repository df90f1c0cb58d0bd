"""PageRank: Spark iterative loop vs the Python transliteration of the
reference semantics (undamped transfer, dropped sink mass, self-pairs)."""

import pytest

from holi_search_engine_spark.plans.pagerank import pagerank, pagerank_python

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d has no inlinks → survives via self-pair
    ("e", "f"),            # f is a sink → its mass is dropped
    ("a", "b"),            # duplicate edge → deduped
]


def test_matches_python_oracle(spark):
    edges_df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(edges_df).collect()}
    exp = pagerank_python(EDGES)
    assert set(got) == set(exp)
    for v, r in exp.items():
        assert abs(got[v] - r) < 1e-9, v


def test_zero_indegree_floor(spark):
    # vertices with no inlinks converge to exactly 1 - d = 0.15
    edges_df = spark.createDataFrame([("x", "y")], "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(edges_df).collect()}
    assert abs(got["x"] - 0.15) < 1e-9


def test_cycle_conserves_reasonably(spark):
    ring = [("a", "b"), ("b", "c"), ("c", "a")]
    got = {r["vertex"]: r["rank"] for r in pagerank(
        spark.createDataFrame(ring, "src string, dst string")
    ).collect()}
    exp = pagerank_python(ring)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9
