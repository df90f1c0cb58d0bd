"""The TermFrequency job (the wd-metric path) as a single-pass Spark plan.

Reference: ``/root/reference/src/cis5550/jobs/TermFrequency.java:29-183`` —
the legacy tf/normalized-tf job whose output the shipped Ranker does not
read, reproduced quirk-for-quirk (SURVEY.md §2.3):

- the CLEANED page is truncated to its first ¾ before splitting
  (``TermFrequency.java:67``);
- pass 2 feeds the ORIGINAL-case token to the stemmer — the ``toLowerCase``
  at ``:110`` runs after ``s.stem()`` and its result is never used
  (``:105-112``), so stem terms can carry uppercase, unlike the Indexer;
- tf is the size of the union of positions recorded by both passes into one
  shared map (``:74-117``), exactly as the Indexer's quirk Q6;
- the norm is the single-sqrt L2 over the per-doc tfs (``:120-125``) — NOT
  the Indexer's double-sqrt quirk Q1 — and ``normalized_tf = tf / l2``
  (``:135``).

Shape at scale: ONE ``mapInPandas`` pass (Arrow batches, vectorized kernel,
dictionary shipped per-executor via broadcast); both aggregates are
batch-local because a doc never spans batches, so there is no downstream
shuffle at all — the job is embarrassingly parallel, the same shape the
reference gets from its per-worker flatMapToPair.  The reference then
copies the rows into the ``wd-metric`` KVS table (``:160-169``); the Spark
sink is a partitioned parquet write of the returned frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def term_frequency_stage(
    df: DataFrame,
    dictionary: frozenset[str],
    doc_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus → one row per (doc, term): ``doc_cols + [term, tf,
    normalized_tf]``.  Map-only; no shuffle."""
    doc_cols = doc_cols or ["conv_id", "turn_idx"]
    spark = df.sparkSession
    bdict = spark.sparkContext.broadcast(dictionary)

    src_schema = dict(
        zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields])
    )
    doc_schema = ", ".join(f"{c} {src_schema[c]}" for c in doc_cols)
    out_schema = f"{doc_schema}, term string, tf long, normalized_tf double"

    def job(batches):
        from ..functions.tokenizer import term_frequency_batch

        d = bdict.value
        for pdf in batches:
            if len(pdf):
                yield term_frequency_batch(pdf, d, doc_cols, text_col)

    return df.select(*doc_cols, text_col).mapInPandas(job, schema=out_schema)
