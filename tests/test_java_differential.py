"""Cross-language differential test: the container ships OpenJDK 17, so we
compile the reference ranker's actual normalization expression
(``Ranker.java:152-153`` / ``:223``) and diff it against
``functions/javacompat.java_query_tokens`` on adversarial inputs — the
"Java-exact" claim becomes evidence instead of belief.

The single deliberate divergence is sigma folding: Java's ``toLowerCase()``
applies a BreakIterator-conditioned final-sigma rule that neither Python
nor Spark reproduces, so this repo folds ς→σ on BOTH sides of the
query↔title overlap (see ``javacompat.java_query_tokens``).  The
comparison below therefore folds the Java output the same way; everything
else (trim class, ASCII-only ``\\s``, punctuation alphabet, empty-string
split, full-casing like İ→i̇) must match bit-exactly.
"""

from __future__ import annotations

import base64
import random
import shutil
import subprocess

import pytest

from holi_search_engine_spark.functions.javacompat import java_query_tokens
from holi_search_engine_spark.oracle.pandas_oracle import _java_query_tokens

_JAVA_SRC = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;

// The reference ranker's normalization expression, verbatim
// (cis5550/ranker/Ranker.java:152-153 for the query, :223 for titles).
// Protocol: line 1 prints Math.pow/NaN probes; then each stdin line is a
// base64 input whose tokens are emitted base64-encoded, comma-joined.
public class RefTok {
    public static void main(String[] args) throws Exception {
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        out.println(Math.pow(-0.18232155679395463, 1.5) + "|" +
                    (Double.NaN * 0.0) + "|" + Math.pow(0.0, 1.5));
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        java.util.Base64.Decoder dec = java.util.Base64.getDecoder();
        java.util.Base64.Encoder enc = java.util.Base64.getEncoder();
        String line;
        while ((line = in.readLine()) != null) {
            String s = new String(dec.decode(line), StandardCharsets.UTF_8);
            String[] words = s.replaceAll("[.,:;!?'\"\\(\\)-]", " ")
                    .trim().toLowerCase().split("\\s+");
            StringBuilder sb = new StringBuilder();
            for (int i = 0; i < words.length; i++) {
                if (i > 0) sb.append(",");
                sb.append(enc.encodeToString(
                    words[i].getBytes(StandardCharsets.UTF_8)));
            }
            out.println(sb.toString());
        }
    }
}
"""


def _cases() -> list[str]:
    rng = random.Random(42)
    # the punctuation class, ASCII whitespace + controls, and exotic
    # Unicode: NBSP, NEL, en/ideographic space, ZWSP, BOM, dotted/dotless
    # I, sharp s, sigma forms, emoji, CJK, accents
    alphabet = list("abZ09 .,:;!?'\"()-\t\n\x0b\f\r\x00\x01\x1f\x7f") + [
        " ", "", " ", "　", "​", "﻿",
        "İ", "ı", "ß", "Σ", "σ", "ς",
        "\U0001f600", "中", "é",
    ]
    cases = ["", " ", "   ", "a", "Hello, world", "\x01Hi  there\x1f",
             "x\ty\x0bz", "A'B(C)D", "-edge.case-", " ", "İIı",
             "ΣΣ 0Σ αΣ", "οδός"]
    for _ in range(600):
        n = rng.randint(0, 12)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    return cases


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK in this environment",
)
def test_tokenization_matches_compiled_java_reference(tmp_path):
    (tmp_path / "RefTok.java").write_text(_JAVA_SRC, encoding="utf-8")
    subprocess.run(
        ["javac", "RefTok.java"], cwd=tmp_path, check=True,
        capture_output=True, timeout=120,
    )
    cases = _cases()
    payload = "\n".join(
        base64.b64encode(c.encode()).decode() for c in cases
    ) + "\n"
    p = subprocess.run(
        ["java", "-cp", str(tmp_path), "RefTok"],
        input=payload.encode(), capture_output=True, timeout=120, check=True,
    )
    lines = p.stdout.decode().splitlines()
    # the NaN quirk the rankers reproduce: Math.pow(negative, 1.5) is NaN
    # and NaN * 0.0 stays NaN (unlike Python's complex ** / 0-product)
    assert lines[0] == "NaN|NaN|0.0"
    assert len(lines) == len(cases) + 1
    mismatches = []
    for c, out in zip(cases, lines[1:]):
        jtoks = [
            base64.b64decode(t).decode().replace("ς", "σ")
            for t in out.split(",")
        ]
        if jtoks != java_query_tokens(c):
            mismatches.append((c, jtoks, java_query_tokens(c)))
        # the oracle's independent twin must agree with the engine's too
        assert _java_query_tokens(c) == java_query_tokens(c), repr(c)
    assert not mismatches, mismatches[:5]


_JAVA_SET_SRC = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;

// HashSet iteration-order probe (cis5550/ranker/Ranker.java:156 builds
// words_set as new HashSet<>(Arrays.asList(words)); :160-168 builds
// words_sw by add() into a default-capacity set).  Protocol: each stdin
// line is a comma-joined list of base64 words ("-" for the empty list);
// prints two lines per input — iteration order of new HashSet<>(list) and
// of a default-capacity HashSet populated by add() — as
// "<count>|<comma-joined base64 tokens>".
public class RefSet {
    static String fmt(Iterable<String> it, Base64.Encoder enc) {
        StringBuilder sb = new StringBuilder();
        int n = 0;
        for (String w : it) {
            if (n > 0) sb.append(",");
            sb.append(enc.encodeToString(w.getBytes(StandardCharsets.UTF_8)));
            n++;
        }
        return n + "|" + sb.toString();
    }
    public static void main(String[] args) throws Exception {
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        BufferedReader in = new BufferedReader(
            new InputStreamReader(System.in, StandardCharsets.UTF_8));
        Base64.Decoder dec = Base64.getDecoder();
        Base64.Encoder enc = Base64.getEncoder();
        String line;
        while ((line = in.readLine()) != null) {
            List<String> words = new ArrayList<>();
            if (!line.equals("-")) {
                for (String t : line.split(",", -1)) {
                    words.add(new String(dec.decode(t), StandardCharsets.UTF_8));
                }
            }
            out.println(fmt(new HashSet<>(words), enc));
            HashSet<String> s2 = new HashSet<>();
            for (String w : words) s2.add(w);
            out.println(fmt(s2, enc));
        }
    }
}
"""


def _set_cases() -> list[list[str]]:
    rng = random.Random(7)
    pool = [
        "the", "a", "hello", "world", "spark", "shuffle", "partition",
        "idf", "query", "ranker", "index", "term", "doc", "weight",
        "title", "bonus", "occurrence", "doc_key", "", "z", "zz", "zzz",
        "narzar", "qavicu", "0", "42", "2026",
    ]
    # duplicates matter: new HashSet<>(coll) presizes from the RAW list
    # length, so a repeated word changes the table size and the order
    cases = [[], [""], ["a"], ["a", "a"], ["hello", "world"],
             ["world", "hello", "world"],
             ["the"] * 13 + ["a"]]  # 14 raw / 2 distinct: cap 32, not 16
    for _ in range(400):
        n = rng.randint(0, 40)
        cases.append([
            rng.choice(pool) + (str(rng.randint(0, 99)) if rng.random() < 0.5 else "")
            for _ in range(n)
        ])
    return cases


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK in this environment",
)
def test_hashset_order_matches_compiled_java(tmp_path):
    """java_hashset_order — the Q5 determinizer — against a real JVM
    HashSet in both construction modes.  This differential caught a real
    bug: the presized mode must size from the raw list length INCLUDING
    duplicates (HashMap(Collection) sizes before deduplication), so a
    query with a repeated word lands in a bigger table than its distinct
    count suggests, which permutes iteration order."""
    from holi_search_engine_spark.functions.javacompat import (
        java_hashset_order,
    )

    (tmp_path / "RefSet.java").write_text(_JAVA_SET_SRC, encoding="utf-8")
    subprocess.run(
        ["javac", "RefSet.java"], cwd=tmp_path, check=True,
        capture_output=True, timeout=120,
    )
    cases = _set_cases()
    payload = "\n".join(
        ",".join(base64.b64encode(w.encode()).decode() for w in c) if c else "-"
        for c in cases
    ) + "\n"
    p = subprocess.run(
        ["java", "-cp", str(tmp_path), "RefSet"],
        input=payload.encode(), capture_output=True, timeout=120, check=True,
    )
    lines = p.stdout.decode().splitlines()
    assert len(lines) == 2 * len(cases)

    def parse(ln: str) -> list[str]:
        cnt, _, body = ln.partition("|")
        if int(cnt) == 0:
            return []
        toks = body.split(",")
        assert len(toks) == int(cnt), ln
        return [base64.b64decode(t).decode() for t in toks]

    for i, c in enumerate(cases):
        assert parse(lines[2 * i]) == java_hashset_order(
            c, initial_from_collection=True
        ), ("coll", c)
        assert parse(lines[2 * i + 1]) == java_hashset_order(
            c, initial_from_collection=False
        ), ("add", c)
