"""URL parse/normalize, custom SHA-1 hasher, and spell-suggest semantics.

The Spark implementations are portable-SQL / Catalyst expressions; the
oracles here are *independent* Python transliterations of the Java
(`urltools.parse_url_py` / `normalize_url_py`, `hasher.hash_py` over
hashlib) so the cross-check is engine-vs-transliteration, not
engine-vs-itself.
"""

from __future__ import annotations

import pytest

from holi_search_engine_spark.functions import hasher, urltools

# Handwritten URL corpus: every parseURL/normalize branch + quirk edges.
PARSE_URLS = [
    "http://example.com/a/b.html",
    "https://example.com:8443/a",
    "http://example.com",                # no path → "/"
    "//host/protocol-relative",          # indexOf("//")==0 quirk: all path
    "relative/path.html",
    "/rooted.html",
    "",
    "ftp://files.example.com/x",
    "x//host/one-char-protocol",         # protocol becomes "" (substring(0,0))
    "http://:8080/leading-colon",        # colon at host pos 0: NOT a port split
    "http://h:80:81/two-colons",         # port takes everything after 1st colon
    "http://h#frag",                     # fragment inside host (no next slash)
    "weird//x",                          # protocol "weird"[:-1] minus colon slot
]

BASES = [
    "http://base.com/a/b/c.html",
    "https://base.com:9090/a/b/c.html",
    "http://base.com",                   # path "/"
    "ftp://base.com/a/b.html",           # non-http base
]
LINKS = [
    "page.html",
    "sub/dir/page.html",
    "../one-up.html",
    "../../two-up.html",
    "../../../../beyond-root.html",      # more ../ than base depth
    "/rooted.html",
    "/rooted.html#frag",
    "//proto.relative/x.js",
    "http://abs.com/x.html",
    "https://abs.com:444/x.html",
    "ftp://rejected.com/x",
    "mailto:someone@example.com",
    "photo.jpg",
    "photo.jpeg",
    "pic.png",
    "anim.gif",
    "notes.txt",
    "not-an-image.jpgx",                 # endsWith miss → allowed
    "#fragment-only",
    "a#frag",
    "",
]


def test_parse_py_matches_java_examples():
    assert urltools.parse_url_py("http://h:81/p") == ["http", "h", "81", "/p"]
    assert urltools.parse_url_py("//h/p") == [None, None, None, "//h/p"]
    assert urltools.parse_url_py("http://h") == ["http", "h", None, "/"]
    # colon at host index 0 is NOT a port split (indexOf > 0 guard)
    assert urltools.parse_url_py("http://:8080/p") == ["http", ":8080", None, "/p"]


def _spark_sql_rows(spark, sql):
    return {tuple(r) for r in spark.sql(sql).collect()}


def test_parse_sql_matches_transliteration(spark):
    union = " UNION ALL ".join(
        f"SELECT {i} AS rid, '{u}' AS u" for i, u in enumerate(PARSE_URLS)
    )
    sql = urltools.parse_cte(f"({union}) AS src", "u", "p_", "rid")
    got = {
        r["rid"]: (r["p_proto"], r["p_host"], r["p_port"], r["p_path"])
        for r in spark.sql(f"SELECT * FROM ({sql}) q").collect()
    }
    for i, u in enumerate(PARSE_URLS):
        assert got[i] == tuple(urltools.parse_url_py(u)), f"url={u!r}"


def test_normalize_sql_matches_transliteration(spark):
    rows = []
    rid = 0
    expected = {}
    for b in BASES:
        for l in LINKS:
            expected[rid] = urltools.normalize_url_py(b, l)
            rows.append(f"SELECT {rid} AS doc_id, '{b}' AS base_url, '{l}' AS link")
            rid += 1
    union = " UNION ALL ".join(rows)
    sql = urltools.normalize_sql(f"({union}) AS src", carry="doc_id")
    got = {r["doc_id"]: r["normalized"] for r in spark.sql(sql).collect()}
    mismatches = {
        i: (got[i], expected[i]) for i in expected if got[i] != expected[i]
    }
    assert not mismatches, mismatches


def test_normalize_dangling_else_quirk():
    # link with http protocol + non-http base → rejected (inner else-if runs)
    assert urltools.normalize_url_py("ftp://b.com/a.html", "http://x.com/y.html") is None
    # relative link + non-http base → NOT rejected (dangling else skips the
    # base check), resolves with port rendered as the literal "null"
    assert (
        urltools.normalize_url_py("ftp://b.com/a/b.html", "x.html")
        == "ftp://b.com:null/a/x.html"
    )


def test_normalize_ext_filter_precedes_fragment_strip():
    # raw path ends with ".png" only before the fragment is stripped? No:
    # Java tests the path BEFORE stripping, so "x.png#f" is NOT filtered
    # (endsWith sees "#f") while "x.png" is.
    assert urltools.normalize_url_py("http://b.com/a/", "x.png") is None
    got = urltools.normalize_url_py("http://b.com/a/", "x.png#f")
    assert got == "http://b.com:80/a/x.png"


def test_normalize_sql_fuzz_seeded(spark):
    """300 seeded random URL-ish (base, link) pairs — structural fuzz over
    the branch space (protocols, ports, fragments, ../ runs, //, empty
    segments), batched into one Spark job."""
    import random

    rng = random.Random(20260817)
    protos = ["http", "https", "ftp", "h2", ""]

    def rand_path(depth):
        segs = ["".join(rng.choice("abcz09._-") for _ in range(rng.randint(1, 4)))
                for _ in range(depth)]
        return "/" + "/".join(segs) if segs else "/"

    def rand_base():
        if rng.random() < 0.12:
            # protocol-less base: the Java NPEs at entry; both twins must
            # agree on the documented NULL-propagating continuation
            return rng.choice(["foo", "relative/path", "//host.ex/p", ""])
        p = rng.choice(protos[:3])
        port = f":{rng.randint(1, 9999)}" if rng.random() < 0.3 else ""
        return f"{p}://host{rng.randint(0, 9)}.ex{port}{rand_path(rng.randint(0, 4))}"

    def rand_link():
        r = rng.random()
        if r < 0.15:
            return "../" * rng.randint(1, 6) + "x.html"
        if r < 0.3:
            return rand_path(rng.randint(1, 3))[1:]  # relative
        if r < 0.45:
            return rand_path(rng.randint(1, 3))      # rooted
        if r < 0.55:
            return "//cdn.ex" + rand_path(rng.randint(0, 2))
        if r < 0.7:
            p = rng.choice(protos)
            return f"{p}://abs.ex{rand_path(rng.randint(0, 2))}"
        if r < 0.8:
            return rand_path(rng.randint(1, 2)) + "#" + rng.choice(["f", "", "a#b"])
        if r < 0.9:
            return rng.choice(["a.jpg", "b.jpeg", "c.png", "d.gif", "e.txt",
                               "f.jpg#frag", "g.txt?x=1"])
        return rng.choice(["", "#", "x", ":", "::", "a:b/c"])

    pairs = [(rand_base(), rand_link()) for _ in range(300)]
    rows = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{b}' AS base_url, '{l}' AS link"
        for i, (b, l) in enumerate(pairs)
    )
    sql = urltools.normalize_sql(f"({rows}) AS src", carry="doc_id")
    got = {r["doc_id"]: r["normalized"] for r in spark.sql(sql).collect()}
    bad = {}
    for i, (b, l) in enumerate(pairs):
        want = urltools.normalize_url_py(b, l)
        if got[i] != want:
            bad[i] = (b, l, got[i], want)
    assert not bad, dict(list(bad.items())[:5])


def test_hasher_alphabet_matches_reference_table():
    # spot-check the generated table against Hasher.java:8-25 entries
    t = hasher.BYTE2CHARS
    assert t[0] == "aa" and t[15] == "pa" and t[16] == "qa" and t[25] == "za"
    assert t[26] == "ac" and t[51] == "zc" and t[52] == "ae"
    assert t[255] == "vs" and t[254] == "us"
    assert len(t) == 256 and len(set(t)) == 256


def test_hasher_bug_index():
    assert hasher._bug_index(0) == 255     # 0 is not > 0 → 255+0
    assert hasher._bug_index(1) == 1
    assert hasher._bug_index(127) == 127
    assert hasher._bug_index(128) == 127   # signed -128 → 255-128
    assert hasher._bug_index(255) == 254
    # the collision the bug creates: bytes 127 and 128 share an index
    assert hasher._bug_index(127) == hasher._bug_index(128)


def test_hasher_expr_matches_hashlib(spark):
    # 300 strings: digest bytes cover 0x00 and >=0x80 with certainty
    vals = [f"doc-{i}" for i in range(300)] + ["", "a", "緑", "x" * 600]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", hasher.hash_expr("s").alias("h")).collect()
    }
    for v in vals:
        assert got[v] == hasher.hash_py(v), f"input={v!r}"
    assert all(len(h) == 40 for h in got.values())


def test_hasher_expr_is_jvm_only(spark):
    df = spark.createDataFrame([("x",)], ["s"]).select(hasher.hash_expr("s"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("prefix", ["s", "the", "zzz"])
def test_spell_suggest_semantics(spark, prefix):
    """Spark suggest SQL ≡ a literal Trie-walk oracle: sorted suffixes
    (empty string when the word equals the prefix), first 5."""
    from holi_search_engine_spark.operators.urlops import _suggest_sql

    vocab = [
        "the", "then", "there", "theta", "thermal", "these", "threw",
        "sort", "scan", "spark", "stream", "slow", "small", "sun",
        "batch", "big",
    ]
    union = " UNION ALL ".join(f"SELECT '{w}' AS term" for w in sorted(set(vocab)))
    import holi_search_engine_spark.operators.urlops as urlops

    old = urlops._SUGGEST_PREFIXES
    urlops._SUGGEST_PREFIXES = [prefix]
    try:
        sql = _suggest_sql(f"({union})")
    finally:
        urlops._SUGGEST_PREFIXES = old
    got = [
        (r["rnk"], r["suggestion"])
        for r in spark.sql(sql).orderBy("rnk").collect()
    ]
    # oracle: TreeSet of suffixes under the prefix subtrie, first 5
    suffixes = sorted({w[len(prefix):] for w in vocab if w.startswith(prefix)})[:5]
    assert got == [(i + 1, s) for i, s in enumerate(suffixes)]
