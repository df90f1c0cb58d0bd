"""Shared helpers for the operator suite: table loading and cross-engine
portable expressions (used by both the Spark implementations and the DuckDB
oracle SQL strings so results hash-match bit-for-bit)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def portable_hash32(col):
    """Deterministic 32-bit hash identical in Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 8), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 8))::bigint
    Input must already be a string with identical rendering in both engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    return f"cast(('0x' || substr(md5({expr}), 1, 8)) as bigint)"


def portable_hash60(col):
    """60-bit variant of :func:`portable_hash32` (15 hex chars — the most
    md5 bits that fit a signed 64-bit int without overflow in either
    engine).  Use where the keyed population is large enough that 32-bit
    birthday collisions have real cost: at 10⁹ keys, 32 bits expect
    ~10⁸ colliding pairs per bucket space, 60 bits expect ~0.4."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    return f"cast(('0x' || substr(md5({expr}), 1, 15)) as bigint)"


# The reference tokenizer chain (Indexer.java:55-72) as Spark expressions
# (Spark regexp_replace is Java regex, i.e. byte-identical to the reference)
# and as DuckDB RE2 equivalents.  Stages 3/5 are subsumed by stage 4.
_MSL = r"<(meta|script|link)(\s[^>]*)?>.*?</(meta|script|link)>"
_MSL_CI = "(?is)" + _MSL
_TAG = r"<.*?>"
_TAG_RE2 = r"<[^\n\r]*?>"  # RE2 lacks Java's extra line terminators; ASCII-equal
_NON_ALNUM = "[^a-zA-Z0-9]"


def clean_expr(col):
    c = F.regexp_replace(col, "(?is)" + _MSL, " ")
    c = F.regexp_replace(c, _TAG, " ")
    c = F.regexp_replace(c, _NON_ALNUM, " ")
    return c


def clean_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '(?is)<(meta|script|link)(\\s[^>]*)?>.*?</(meta|script|link)>', ' ', 'g'),"
        " '<[^\\n\\r]*?>', ' ', 'g'),"
        " '[^a-zA-Z0-9]', ' ', 'g')"
    )


def surface_tokens(df: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc → one row per token (lowercased, non-empty, ≤512 chars): the
    SQL-expressible surface subset of the tokenizer (no dictionary filter,
    no stem pass — those are pytest-gated against the pandas oracle)."""
    return (
        df.select(doc_col, F.explode(F.split(clean_expr(F.col(text_col)), r"\s+")).alias("token"))
        .where("token <> ''")
        .where(F.length("token") <= 512)
        .select(doc_col, F.lower("token").alias("term"))
    )


SURFACE_TOKENS_SQL = (
    "SELECT doc_id, lower(t.token) AS term "
    "FROM documents, unnest(string_split_regex(" + clean_sql("text") + ", '\\s+')) AS t(token) "
    "WHERE t.token <> '' AND length(t.token) <= 512"
)
