"""Training-corpus curation operators: eval-set decontamination and
fixed-window sequence packing (SURVEY.md §2.7 "rebuild additions").

Two steps every LLM training-data pipeline runs downstream of dedup:

- **decontamination**: drop (or flag) training documents that share long
  word n-grams with a held-out evaluation set, the standard guard against
  benchmark leakage (the 8-gram rule popularized by GPT-3 appendix C /
  Gopher §A.3 — here word-8-grams, exact match).
- **sequence packing**: bin documents into fixed token-budget training
  windows.  Packing is embarrassingly parallel per shard — a GLOBAL
  running sum would serialize the corpus through one partition, so the
  pack key is (shard, seq) with shard = doc_id % N_SHARDS; at cluster
  scale each shard packs independently and seq ids stay deterministic at
  any parallelism.

Both are pure Catalyst (no Python in the data path) and both carry a
DuckDB oracle twin.  Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load
from .dedup import shingles_of, shingles_sql

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ------------------------------------------------------------ decontaminate

#: production word n-gram length for contamination matching (the 8-gram
#: rule, GPT-3 appendix C / Gopher §A.3)
CONTAM_NGRAM = 8
#: n-gram length the DRIVER ENTRY pins: the deterministic synthetic corpus
#: has zero cross-doc 8-grams, and a 0-row oracle match is vacuous — at
#: n=4 the sf tables yield a small non-empty contaminated set, so the
#: check exercises the join/agg for real (production callers use
#: decontaminate_against with the default 8)
ENTRY_NGRAM = 4
#: deterministic stand-in eval set: every 97th doc (≈1% of the corpus)
EVAL_MOD = 97

_CONTAM_SHINGLES = shingles_sql(ENTRY_NGRAM, cte_name="dsh", shingle_col="ng")


@q(
    "corpus_decontaminate",
    f"""
    WITH {_CONTAM_SHINGLES},
    eval_ng AS (
      SELECT DISTINCT ng FROM dsh WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT d.doc_id,
           count(*) AS n_contaminated_ngrams
    FROM dsh d JOIN eval_ng e ON d.ng = e.ng
    WHERE d.doc_id % {EVAL_MOD} <> 0
    GROUP BY d.doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any word n-gram (n = ENTRY_NGRAM) with
    the eval split.

    The eval split (doc_id % 97 == 0, ≈1%) stands in for a benchmark
    suite; real use passes any eval DataFrame to
    :func:`decontaminate_against` (default: the production 8-gram rule).  Scale shape: the eval side's distinct
    n-grams are millions of int64 hashes even for large suites
    (``dedup.shingles_of`` hashes n-grams at generation) — they
    broadcast; the training side never shuffles (hash-join against the
    broadcast, then one partial-agg groupBy on doc_id)."""
    docs = load(spark, sf_dir, "documents")
    eval_docs = docs.where(F.col("doc_id") % EVAL_MOD == 0)
    train_docs = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    return decontaminate_against(train_docs, eval_docs, ngram=ENTRY_NGRAM)


def decontaminate_against(
    train: DataFrame, eval_set: DataFrame, ngram: int = CONTAM_NGRAM
) -> DataFrame:
    """(doc_id, n_contaminated_ngrams) for every train doc sharing at
    least one word-``ngram``-gram with ``eval_set``.

    The eval n-gram set is broadcast (eval suites are tiny next to the
    corpus); joining flagged docs back to drop them is the caller's
    one-line anti-join.  Reference point: the Indexer's shingle machinery
    (``jobs/Indexer.java`` tokenize loop) — reused via
    :func:`dedup.shingles_of`."""
    eval_ng = shingles_of(eval_set, ngram).select("shingle").distinct()
    train_ng = shingles_of(train, ngram)
    return (
        train_ng.join(F.broadcast(eval_ng), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )


# ------------------------------------------------------------ pack sequences

#: token budget per packed training sequence
SEQ_LEN = 512
#: independent packing shards — each packs its docs with a local running
#: sum; at cluster scale every shard is one partition's worth of window
#: work instead of a corpus-wide single-partition cumsum
N_SHARDS = 32


@q(
    "corpus_pack_sequences",
    f"""
    WITH counted AS (
      SELECT doc_id, doc_id % {N_SHARDS} AS shard,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
      FROM counted
    )
    SELECT doc_id, shard, n_tokens::BIGINT AS n_tokens,
           (start_off // {SEQ_LEN})::BIGINT AS seq_in_shard,
           (start_off % {SEQ_LEN})::BIGINT AS offset_in_seq
    FROM packed
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc a (shard, seq_in_shard, offset) under a greedy
    doc_id-ordered packing into SEQ_LEN-token windows.

    The running sum is windowed PER SHARD (doc_id % 32): a global
    ORDER BY cumsum would funnel the corpus through one partition — the
    classic window-function scale trap — while per-shard packing is one
    parallel exchange on the shard key and stays deterministic at any
    parallelism.  Docs longer than SEQ_LEN simply span windows
    (offset + n_tokens > SEQ_LEN), matching how packed pretraining data
    crosses sequence boundaries."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    counted = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = counted.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("start_off") / SEQ_LEN).cast("long").alias("seq_in_shard"),
        (F.col("start_off") % SEQ_LEN).cast("long").alias("offset_in_seq"),
    )


# ------------------------------------------------------- curation pipeline

#: quality floor for the curated corpus (same formula as text_quality)
CURATE_MIN_QUALITY = 0.5
#: prefix-fingerprint length (tokens): cheap boilerplate/lead dedup — the
#: URL-prefix-style exact stage web pipelines run BEFORE MinHash (full-text
#: md5 dedup is vacuous on the synthetic corpus: zero exact dupes; the
#: 8-token prefix collides for ~5% of docs, so the stage does real work)
CURATE_PREFIX_TOKENS = 8

from .textstats import STOP_PROBE as _CURATE_STOP_LIST  # noqa: E402
from .textstats import _PUNCT_CLASS as _CURATE_PUNCT  # noqa: E402

_CURATE_STOPS = ", ".join(f"'{w}'" for w in _CURATE_STOP_LIST)


@q(
    "corpus_curate_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '{_CURATE_PUNCT}', '', 'g')) AS n_punct
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             (SELECT count(*) FROM unnest(toks) AS u(t)
              WHERE lower(u.t) IN ({_CURATE_STOPS})) AS n_stop,
             n_punct::DOUBLE / greatest(n_chars, 1) AS punct_ratio,
             md5(array_to_string(list_transform(
                   toks[1:{CURATE_PREFIX_TOKENS}], t -> lower(t)), ' '))
               AS fingerprint
      FROM scored
    ),
    quality AS (
      SELECT doc_id, fingerprint,
             round(0.4 * least(n_tokens / 100.0, 1.0)
                   + 0.3 * (1 - punct_ratio)
                   + 0.3 * least(4 * n_stop::DOUBLE / greatest(n_tokens, 1), 1.0),
                   6) AS quality,
             n_stop::DOUBLE / greatest(n_tokens, 1) AS stop_ratio
      FROM feats
    ),
    kept AS (
      SELECT doc_id, fingerprint, quality,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM quality
      WHERE quality >= {CURATE_MIN_QUALITY} AND stop_ratio >= 0.05
    )
    SELECT doc_id, fingerprint, quality FROM kept WHERE rn = 1
    """,
)
def corpus_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation: quality filter → language gate → exact prefix
    dedup, composed exactly as a pretraining pipeline runs them (filter
    cheap-to-compute signals first, dedup the survivors, emit the curated
    doc set).  All pure Catalyst: one scan computes every signal, the
    dedup is one hash-partitioned window (keep the smallest doc_id per
    fingerprint) — no Python, no extra scans, one shuffle.

    Stages share the exact formulas of their standalone entries
    (``text_quality``'s 0.4/0.3/0.3 blend, ``text_langid``'s
    stop-ratio≥0.05 gate) so the composition is the integration test of
    those signals; the fingerprint is the {CURATE_PREFIX_TOKENS}-token
    lowercase prefix (see CURATE_PREFIX_TOKENS note)."""
    from .textstats import STOP_PROBE, _PUNCT_CLASS

    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOP_PROBE)))
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", _PUNCT_CLASS, ""))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    quality = F.round(
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1 - punct_ratio)
        + 0.3 * F.least(4 * stop_ratio, F.lit(1.0)),
        6,
    )
    fingerprint = F.md5(
        F.concat_ws(
            " ",
            F.transform(
                F.slice(toks, 1, CURATE_PREFIX_TOKENS), lambda t: F.lower(t)
            ),
        )
    )
    scored = docs.select(
        "doc_id",
        fingerprint.alias("fingerprint"),
        quality.alias("quality"),
        stop_ratio.alias("stop_ratio"),
    ).where(
        (F.col("quality") >= CURATE_MIN_QUALITY) & (F.col("stop_ratio") >= 0.05)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "quality")
    )
