"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fulltext search plan at sf0.001.
``queries()`` exposes one entry per implemented operator (SURVEY.md §2 +
the training-data-pipeline additions); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one.  The quirk-exact pipeline paths
that SQL cannot express (dictionary filter, Porter stemming, HashSet-order
candidate generation) are verified in tests/ against a pure-Python oracle
instead (see holi_search_engine_spark/oracle/pandas_oracle.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from holi_search_engine_spark.operators import (  # noqa: E402
    curation,
    dedup,
    events,
    flame_ops,
    fulltext,
    graph,
    multimodal,
    similarity,
    textstats,
    urlops,
)

# Registration order IS the driver's verification order (the correctness
# gate records the first 50 entries).  The previously-unverified and
# highest-risk operators register first: events/graph/multimodal/urlops/
# curation (driver-unseen in round 2), then the search/index/dedup core,
# with the compound flame entries last.
_MODULES = [
    events, graph, multimodal, urlops, curation,
    fulltext, dedup, textstats, similarity, flame_ops,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Ranker-semantics top-k search over documents at
    sf0.001 (candidate gen → occurrence cut → quirk-Q5 tf-idf scoring →
    title bonus)."""
    return fulltext.search_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
