"""URL-function and spell-suggest query entries (SURVEY.md §2.5 rows
"URL parse/normalize/encode" and "spell-suggest").

The reference's URL machinery serves the crawler, which is out of scope —
but the *functions* themselves (``tools/URLParser.java:105-128``,
``jobs/UrlNormalizer.java:8-96``) and the frontend's Trie prefix
suggestions (``webserver/TestServer.java:129-146``,
``jobs/Trie.java:57-68,107-133``) are pure scalar/set semantics, so they
get quirk-exact Catalyst implementations with driver oracles here.

Inputs are synthesized *deterministically inside the query* from the
driver's ``documents`` table (no external data): each ``doc_id`` yields a
base URL and one of nine link shapes covering every normalize branch
(relative, ``../`` climbs, rooted + fragment, protocol-relative, absolute
with port, rejected protocol, rejected extension, fragment-only).

Both the Spark plan and the DuckDB oracle execute the *same* SQL text
(`functions/urltools.py` emits engine-portable SQL), so the driver row
checks engine portability; the semantic gate against an independent
Python transliteration of the Java lives in tests/test_urltools.py.

Scale note: all three queries are pure whole-stage-codegen string
expressions over a single scan — no joins, no Python, one shuffle only
where the semantics demand it (the suggest window's partition-by-prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.urltools import normalize_sql, parse_cte
from .common import SURFACE_TOKENS_SQL, load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


#: Deterministic (base_url, link) synthesis from `documents` — the nine
#: link shapes cover every branch of UrlNormalizer.normalize.
SYNTH_SQL = """SELECT doc_id,
  'http' || (CASE WHEN doc_id % 3 = 0 THEN 's' ELSE '' END) ||
  '://h' || (doc_id % 5) || '.example.com' ||
  (CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END) ||
  '/d' || (doc_id % 7) || '/p' || (doc_id % 11) || '/base.html' AS base_url,
  CASE doc_id % 9
    WHEN 0 THEN 'rel/page' || (doc_id % 13) || '.html'
    WHEN 1 THEN '../up.html'
    WHEN 2 THEN '../../two.html?x=1'
    WHEN 3 THEN '/rooted/path.html#frag'
    WHEN 4 THEN '//cdn.example.org/lib.js'
    WHEN 5 THEN 'https://abs.example.net:444/x/y.html'
    WHEN 6 THEN 'ftp://files.example.com/a'
    WHEN 7 THEN 'image.png'
    ELSE '#frag-only'
  END AS link
FROM {src}"""


def _parse_sql(src: str) -> str:
    """Portable SQL: parse both synthesized URLs per doc through
    URLParser.parseURL semantics; '∅' stands in for Java null."""
    synth = SYNTH_SQL.format(src=src)
    both = (
        f"SELECT doc_id * 2 AS row_id, 'base' AS side, base_url AS u FROM ({synth}) sy1 "
        f"UNION ALL "
        f"SELECT doc_id * 2 + 1, 'link', link FROM ({synth}) sy2"
    )
    parsed = parse_cte(f"({both}) AS uu", "u", "p_", "row_id, side")
    return (
        f"SELECT row_id, side, u AS url, coalesce(p_proto, '∅') AS protocol, "
        f"coalesce(p_host, '∅') AS host, coalesce(p_port, '∅') AS port, "
        f"coalesce(p_path, '∅') AS path FROM ({parsed}) AS pp"
    )


def _normalize_sql(src: str) -> str:
    synth = SYNTH_SQL.format(src=src)
    pipeline = normalize_sql(f"({synth}) AS sy", carry="doc_id")
    return (
        f"SELECT doc_id, base_url, link, coalesce(normalized, '∅') AS normalized "
        f"FROM ({pipeline}) AS nn"
    )


_SUGGEST_PREFIXES = ["s", "b", "f", "the", "qu"]


def _suggest_sql(vocab: str) -> str:
    """Portable SQL: Trie.getSuggestions over the corpus vocabulary.

    Quirk-exact to the reference: suggestions are the sorted *suffixes*
    below the prefix's subtrie (the recursion's StringBuilder starts empty
    at the subtrie root, Trie.java:107-133 — the prefix itself is NOT
    prepended, and a vocabulary word equal to the prefix contributes the
    empty string), cut to the first 5 in TreeSet (lexicographic) order
    (TestServer.java:137-141 subList(0, 5)).
    """
    prefixes = " UNION ALL ".join(f"SELECT '{p}' AS prefix" for p in _SUGGEST_PREFIXES)
    return f"""
SELECT prefix, rnk, suggestion FROM (
  SELECT prefix, suggestion,
         row_number() OVER (PARTITION BY prefix ORDER BY suggestion) AS rnk
  FROM (
    SELECT DISTINCT p.prefix,
           substr(v.term, length(p.prefix) + 1) AS suggestion
    FROM {vocab} v, ({prefixes}) p
    WHERE substr(v.term, 1, length(p.prefix)) = p.prefix
  ) d
) r WHERE rnk <= 5"""


@q("url_parse", _parse_sql("documents"))
def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URLParser.parseURL (tools/URLParser.java:105-128) as a pure
    Catalyst plan over deterministically synthesized URLs."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("__url_docs")
    return spark.sql(_parse_sql("__url_docs"))


@q("url_normalize", _normalize_sql("documents"))
def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UrlNormalizer.normalize (jobs/UrlNormalizer.java:8-96) quirk-exact:
    dangling-else protocol check, pre-fragment extension filter,
    empty-path → base URL, 'null' port rendering, unrolled ../ climb."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("__url_docs")
    return spark.sql(_normalize_sql("__url_docs"))


_SUGGEST_ORACLE = (
    f"WITH tok AS ({SURFACE_TOKENS_SQL}), "
    "vocab AS (SELECT DISTINCT term FROM tok)"
    + _suggest_sql("vocab")
)


@q("spell_suggest", _SUGGEST_ORACLE)
def spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontend spell suggestions (TestServer.java:129-146): first-5
    TreeSet-ordered suffix suggestions per query prefix, over the corpus
    vocabulary (the reference loads words_alpha.txt, absent from its repo;
    the corpus vocabulary is the rebuild's dictionary source)."""
    from .common import surface_tokens

    docs = load(spark, sf_dir, "documents")
    surface_tokens(docs).select("term").distinct().createOrReplaceTempView("__vocab")
    return spark.sql(_suggest_sql("__vocab"))
