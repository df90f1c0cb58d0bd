"""Distributed reference-semantics search: the same Ranker steps 1-11 as
``query/ranker.py`` executed as a Spark job over the block index — the
path a 10^12-turn corpus needs when a Zipf-head term's posting list cannot
sit in driver memory.

Plan shape per query:
- block scan pruned TWICE: partition pruning on ``bucket`` (computed for
  the query's terms) + predicate pushdown on ``term``;
- mapInPandas decode of only those blocks → (term, doc_key, tf) rows;
- candidate aggregation (occurrence, first-term-order for quirk Q5) —
  one shuffle keyed by doc;
- top-250 occurrence cut (TakeOrdered, no full sort);
- scoring joins against broadcast idf + doc-keyed ntf/doc_meta.

The two-step expansion control flow (re-run with stopwords included when
candidates < 50, ``Ranker.java:177-200``) costs one extra count() action,
exactly mirroring the reference's behavior.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.javacompat import java_hashset_order
from ..oracle.pandas_oracle import _RE_PUNCT
from ..plans.compression import decode_block, doc_key_expr
from ..plans.index_build import IndexPaths, read_meta
from ..sources.catalog import read_table
from .ranker import EXPAND_THRESHOLD, TOP_CUT
from .stopwords import STOPWORDS

_DECODE_SCHEMA = "term string, doc_key long, tf double"


def _decode_blocks(batches):
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        outs = []
        for term, db, tb in zip(pdf["term"], pdf["doc_bytes"], pdf["tf_bytes"]):
            keys, tfs = decode_block(db, tb)
            outs.append(
                pd.DataFrame(
                    {
                        "term": term,
                        "doc_key": keys.astype(np.int64),
                        "tf": tfs.astype(np.float64),
                    }
                )
            )
        yield pd.concat(outs, ignore_index=True)


class DistributedRanker:
    def __init__(self, spark: SparkSession, paths: IndexPaths) -> None:
        self.spark = spark
        self.paths = paths
        meta = read_meta(paths)
        self.doc_cols: list[str] = meta["doc_cols"]
        self.buckets: int = meta["buckets"]

    def _term_buckets(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        tdf = self.spark.createDataFrame([(t,) for t in terms], "term string")
        rows = tdf.select(
            "term", F.pmod(F.xxhash64("term"), F.lit(self.buckets)).cast("int").alias("b")
        ).collect()
        return {r["term"]: r["b"] for r in rows}

    def _postings_df(self, lookup_terms: list[str]) -> DataFrame:
        """(term, ord, doc_key, tf) for the query terms, bucket-pruned."""
        order = {t: i for i, t in enumerate(java_hashset_order(lookup_terms))}
        tb = self._term_buckets(list(order))
        blocks = (
            read_table(self.spark, self.paths.blocks)
            .where(F.col("bucket").isin(sorted(set(tb.values()))))
            .where(F.col("term").isin(list(order)))
            .select("term", "doc_bytes", "tf_bytes")
        )
        decoded = blocks.mapInPandas(_decode_blocks, schema=_DECODE_SCHEMA)
        odf = self.spark.createDataFrame(
            [(t, o) for t, o in order.items()], "term string, ord int"
        )
        return decoded.join(F.broadcast(odf), "term")

    def _candidates(self, hits: DataFrame) -> DataFrame:
        return hits.groupBy("doc_key").agg(
            F.count(F.lit(1)).alias("occurrence"), F.min("ord").alias("first_ord")
        )

    def search(self, query: str, limit: int | None = None) -> pd.DataFrame:
        words = _RE_PUNCT.sub(" ", query).strip().lower().split()
        if not words:
            return self._empty()
        words_set_order = java_hashset_order(words, initial_from_collection=True)
        words_sw = [w for w in words_set_order if w not in STOPWORDS]
        removed = [w for w in words_set_order if w in STOPWORDS]
        if not words_sw:
            words_sw = removed

        hits = self._postings_df(words_sw).cache()
        cand = self._candidates(hits)
        n_cand = cand.count()
        if n_cand < EXPAND_THRESHOLD:  # expansion branch (Q4 stemming is ∅)
            hits.unpersist()
            hits = self._postings_df(words_set_order).cache()
            cand = self._candidates(hits)
            n_cand = cand.count()
        if n_cand == 0:
            hits.unpersist()
            return self._empty()

        cut = cand.orderBy(F.col("occurrence").desc(), "doc_key").limit(TOP_CUT)

        key = doc_key_expr(self.doc_cols)
        ntf = read_table(self.spark, self.paths.ntf).select(
            key.alias("doc_key"), "ntf"
        )
        word_count: dict[str, int] = {}
        for w in words:
            word_count[w] = word_count.get(w, 0) + 1
        wm = (
            read_table(self.spark, self.paths.wmetric)
            .where(F.col("term").isin(list(word_count)))
            .select("term", "idf")
        )
        qdf = self.spark.createDataFrame(
            [(t, c) for t, c in word_count.items()], "term string, qtf int"
        ).join(wm, "term", "left").na.fill({"idf": 0.0})  # Q8: absent → 0

        # Q5: rows whose ord == first_ord contribute 0 (tf dropped)
        scored_hits = (
            cut.join(hits, "doc_key")
            .join(F.broadcast(qdf), "term")
            .join(ntf, "doc_key")
            .groupBy("doc_key")
            .agg(
                F.sum(
                    F.when(F.col("ord") == F.col("first_ord"), F.lit(0.0)).otherwise(
                        F.col("qtf") * F.pow("idf", 1.5) * F.col("tf") / F.col("ntf")
                    )
                ).alias("weight")
            )
        )
        meta_df = read_table(self.spark, self.paths.doc_meta).select(
            key.alias("doc_key"), "title"
        )
        sw_set = list(dict.fromkeys(words_sw))
        padded = F.concat(F.lit(" "), F.lower("title"), F.lit(" "))
        ov = None
        for t in sw_set:
            hit = padded.contains(f" {t} ").cast("int")
            ov = hit if ov is None else ov + hit
        overlap = (ov.cast("double") / F.lit(len(sw_set))) if sw_set else F.lit(0.0)
        kw = (
            F.when(F.col("title").contains(query), F.lit(10.0))
            .when(overlap >= 0.6, overlap * 10)
            .otherwise(F.lit(0.0))
        )
        result = (
            cut.join(scored_hits, "doc_key", "left")
            .na.fill({"weight": 0.0})
            .join(meta_df, "doc_key", "left")
            .select(
                "doc_key",
                "occurrence",
                F.col("weight").alias("tf_idf_weight"),
                F.lit(0.0).alias("page_rank"),
                kw.alias("keyword_match"),
                (3 * F.col("weight") + kw).alias("score"),
            )
            .orderBy(F.col("score").desc(), "doc_key")
        )
        if limit is not None:
            result = result.limit(limit)
        pdf = result.toPandas()
        hits.unpersist()
        from ..plans.compression import doc_key_to_cols
        import numpy as np

        keys = pdf["doc_key"].to_numpy(dtype=np.int64)
        out = doc_key_to_cols(keys, self.doc_cols)
        return pd.concat([out.reset_index(drop=True), pdf.reset_index(drop=True)], axis=1)

    def _empty(self) -> pd.DataFrame:
        cols = [*self.doc_cols, "doc_key", "occurrence", "tf_idf_weight",
                "page_rank", "keyword_match", "score"]
        return pd.DataFrame(columns=cols)
