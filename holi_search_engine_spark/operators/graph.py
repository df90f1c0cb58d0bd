"""Graph operators over the driver's tables: PageRank on the
supplier→customer shipment graph (edges derived from lineitem⋈orders).

Reference parity: ``jobs/PageRank.java`` is one of the reference's three
core batch jobs (SURVEY.md §2.3); the iteration semantics live in
``plans/pagerank.py`` and are pytest-verified against a Python
transliteration on general (cyclic) graphs.

The DuckDB oracle here exploits the fixture graph's shape: supplier→
customer edges are BIPARTITE, so the reference iteration reaches its
fixed point at iteration 2 and the maxΔ<0.01 gate stops it there —
suppliers (no in-edges) settle at 1−d = 0.15 after one step, and each
customer (a sink) at 0.15 + d·Σ_{s→c} 0.15/outdeg(s).  That closed form
IS the converged output, checkable as one SQL query; the general
iterative machinery stays pytest-gated (tests/test_pagerank.py).
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
ORACLE["graph_pagerank"] = """
WITH edges AS (
  SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src, 'c' || o_custkey::VARCHAR AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
verts AS (SELECT DISTINCT src AS vertex FROM edges UNION SELECT DISTINCT dst FROM edges),
contrib AS (
  SELECT e.dst AS vertex, sum(0.15 / od) AS s
  FROM edges e JOIN outdeg USING (src) GROUP BY e.dst
)
SELECT v.vertex, round(0.15 + 0.85 * coalesce(c.s, 0), 6) AS rank
FROM verts v LEFT JOIN contrib c USING (vertex)
"""
