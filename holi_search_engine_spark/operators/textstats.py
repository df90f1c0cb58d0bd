"""Text-analysis operators for a training-data pipeline over ``documents``:
language-ID heuristic, quality scoring, token counting (whitespace +
BPE-ish regex), and document fingerprinting.  Everything is pure Catalyst
expressions (whole-stage codegen; zero Python in the data path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load, portable_hash32, portable_hash32_sql

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

# small fixed stopword probe set (subset of the reference ranker list,
# Ranker.java:127-144) — inlined in the SQL oracle as VALUES
STOP_PROBE = ["a", "the", "and", "of", "to", "in", "is", "it", "on", "for"]
_STOP_SQL = ", ".join(f"('{w}')" for w in STOP_PROBE)

_PUNCT_CLASS = "[^.,:;!?]"
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


_STATS_SQL = f"""
    tok AS (
      SELECT doc_id, t.token
      FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(token)
      WHERE t.token <> ''
    ),
    stop(word) AS (VALUES {_STOP_SQL}),
    stats AS (
      SELECT d.doc_id,
             length(d.text) AS n_chars,
             (SELECT count(*) FROM tok WHERE tok.doc_id = d.doc_id) AS n_tokens,
             (SELECT count(*) FROM tok JOIN stop ON lower(tok.token) = stop.word
              WHERE tok.doc_id = d.doc_id) AS n_stop,
             length(regexp_replace(d.text, '{_PUNCT_CLASS}', '', 'g')) AS n_punct
      FROM documents d
    )"""


@q(
    "text_quality",
    f"""
    WITH {_STATS_SQL}
    SELECT doc_id, n_chars, n_tokens,
           round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
           round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
           round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.3 * (1 - n_punct::DOUBLE / greatest(n_chars, 1))
                 + 0.3 * least(4 * n_stop::DOUBLE / greatest(n_tokens, 1), 1.0),
                 6) AS quality
    FROM stats
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length / punctuation / stopword ratios — the
    standard cheap pre-filter for web-scale training corpora."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOP_PROBE)))
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", _PUNCT_CLASS, ""))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1 - punct_ratio)
        + 0.3 * F.least(4 * stop_ratio, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@q(
    "text_langid",
    f"""
    WITH {_STATS_SQL}
    SELECT doc_id,
           CASE WHEN n_stop::DOUBLE / greatest(n_tokens, 1) >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_guess
    FROM stats
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language-ID heuristic: English stopword density.  (A
    real system swaps in a char-n-gram model; the Spark plumbing — per-doc
    vectorized classification — is identical.)"""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOP_PROBE)))
    ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.05, "en").otherwise("unknown").alias("lang_guess"),
    )


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs, single digits, single punctuation) — the unit used for
    corpus token budgeting."""
    docs = load(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (lowercase, collapsed whitespace →
    md5): the doc-identity key for exact dedup across formatting noise."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")).alias(
            "fingerprint"
        ),
    )


@q(
    "text_tokens_fingerprint",
    f"""
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))
             AS ws_tokens,
           len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS bpe_tokens,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def text_tokens_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound driver entry for :func:`text_token_counts` +
    :func:`text_fingerprint` — both are map-only per-doc projections of the
    same scan, so one select carries all four columns and a wrong answer
    from either operator flips the compound hash (the same consolidation
    pattern as the ``flame_*`` entries).  Consolidated in round 5 to free a
    slot in the driver's 50-entry window for ``search_bm25_distributed``,
    the cogroup/applyInPandas distributed query plan.

    Built FROM the constituent functions (doc_id equi-join of two
    projections of the same scan) so their actual code paths are what the
    hash gates; the join is verification scaffolding — each constituent
    stays map-only in production use."""
    return text_token_counts(spark, sf_dir).join(
        text_fingerprint(spark, sf_dir), "doc_id"
    )


# ---------------------------------------------------------------------------
# Round-2 additions: repetition detection, PII masking, stratified sampling —
# the remaining staples of a pretraining-data pipeline.  All pure Catalyst.

_NG = 3  # word n-gram size for the repetition metric


@q(
    "text_repetition",
    f"""
    WITH ng AS (
      SELECT doc_id, array_to_string(toks[i : i + {_NG - 1}], ' ') AS ng
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents),
           unnest(range(1, greatest(len(toks) - {_NG - 1}, 0) + 1)) AS r(i)
    )
    SELECT doc_id, count(*) AS total_ngrams,
           count(DISTINCT ng) AS distinct_ngrams,
           round(1 - count(DISTINCT ng)::DOUBLE / count(*), 6) AS dup_frac
    FROM ng GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicate word-3-gram
    occurrences per doc (Rae et al. 2021 §A1.1 quality rules).  High
    dup_frac marks boilerplate / degenerate repetition for filtering.
    Map-side n-gram expansion + one groupBy(doc) — no joins, scale-safe
    (the n-gram stream is ~|tokens| rows, partitioned by doc hash)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    idx = F.when(n >= _NG, F.sequence(F.lit(0), n - _NG)).otherwise(
        F.array().cast("array<int>")
    )
    ng = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, _NG)))
    return (
        docs.select("doc_id", F.explode(ng).alias("ng"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_ngrams"),
            F.countDistinct("ng").alias("distinct_ngrams"),
            F.round(1 - F.countDistinct("ng") / F.count("*"), 6).alias("dup_frac"),
        )
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded repetition only, no
# backreferences or lookaround.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

#: deterministic PII injection (the corpus itself is PII-free): every 3rd
#: doc gets an email, every 4th a phone number, derived from doc_id.
_PII_TEXT_SQL = (
    "text || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || (doc_id % 50)"
    " || '@mail' || (doc_id % 7) || '.example.com' ELSE '' END)"
    " || (CASE WHEN doc_id % 4 = 0 THEN ' call ' || (100 + doc_id % 900)"
    " || '-' || (100 + doc_id % 877) || '-' || (1000 + doc_id % 9000) ELSE '' END)"
)


@q(
    "text_pii_mask",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS masked
    FROM aug
    """,
)
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and mask emails / phone numbers (deterministic
    injection from doc_id since the corpus is synthetic).  Patterns are
    Java-regex/RE2-portable; masking is a map-only regexp_replace chain in
    whole-stage codegen — at 100 TB this runs at scan speed."""
    docs = load(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_PII_TEXT_SQL).alias("text"))
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("masked"),
    )


#: language-rebalancing rates (per-mille): downsample dominant English,
#: keep tail languages — the standard training-mix knob.
_STRATA_RATES = {"en": 300, "de": 800, "es": 800, "fr": 800, "zh": 1000}
_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())
    + " ELSE 1000 END"
)


@q(
    "corpus_stratified_sample",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {portable_hash32_sql("'smp:' || doc_id")} % 1000 < {_RATE_SQL}
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (per-language) sampling via the portable
    md5 hash — the data-mixing primitive for training-set composition.
    Hash-gated filter, no shuffle, identical sample at any parallelism
    (unlike Bernoulli df.sample, which is partition-layout-dependent)."""
    docs = load(spark, sf_dir, "documents")
    gate = portable_hash32(F.concat(F.lit("smp:"), F.col("doc_id"))) % 1000
    return docs.where(gate < F.expr(_RATE_SQL)).select("doc_id", "lang", "source")
