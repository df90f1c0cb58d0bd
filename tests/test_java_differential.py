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
