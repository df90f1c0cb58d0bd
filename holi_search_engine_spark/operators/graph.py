"""Graph operators over the driver's tables: PageRank on the
supplier→customer shipment graph (edges derived from lineitem⋈orders).

Reference parity: ``jobs/PageRank.java`` is one of the reference's three
core batch jobs (SURVEY.md §2.3); the iteration semantics live in
``plans/pagerank.py`` and are pytest-verified against a Python
transliteration.  No SQL oracle entry — a fixed-point iteration isn't
expressible as a deterministic single DuckDB query (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.pagerank import pagerank
from .common import load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, max_iter=10)
    return ranks.select("vertex", F.round("rank", 6).alias("rank"))


QUERIES["graph_pagerank"] = graph_pagerank
