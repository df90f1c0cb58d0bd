"""Vectorized tokenizer replicating the reference indexer's chain exactly.

Reference: ``/root/reference/src/cis5550/jobs/Indexer.java:44-128``.
Stages (Java regex semantics preserved — see notes per stage):

1. strip ``<(meta|script|link)(\\s[^>]*)?>.*?</(meta|script|link)>``
   CASE_INSENSITIVE|DOTALL  (``Indexer.java:55-60``; note the opening and
   closing tag names match independently, so ``<script>..</link>`` strips);
2. strip ``<.*?>`` — NOT dotall: Java ``.`` excludes the five line
   terminators, so multi-line tags survive (``Indexer.java:63``);
3. punctuation ``[.,:;!?'"()-]`` → space (``:66``);
4. non-alphanumeric ``[^a-zA-Z0-9]`` → space (``:69``; subsumes 3 and 5);
5. non-ASCII → space (``:72``; no-op after 4, kept for parity);
6. split on whitespace (``:78``).

Token passes (quirk Q6, SURVEY.md §7): pass 1 records *dictionary-accepted*
surface terms with a position counter that advances only on accepted tokens
(``Indexer.java:85-107``); pass 2 Porter-stems every lowercased token with a
counter advancing on all tokens (``:109-128``); a term's tf is the size of
the union of its recorded positions.  Tokens longer than 512 chars are
skipped by both passes (``:87-89``).

Dictionary-filter rules (quirk Q7, ``jobs/Trie.java:141-152``): token with
uppercase first char → accept; token mixing letters and digits → reject;
digit-bearing token of length ≤ 4 → accept; else dictionary membership of
the lowercased token.

Everything here is pandas/numpy column math over an Arrow batch — no
per-row Python in the Spark hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Java's default (non-DOTALL) `.` excludes these five line terminators;
# Python's excludes only \n. Step 2 must match Java exactly.
_JAVA_NOT_DOT = "\\n\\r\\u0085\\u2028\\u2029"

# Java \s is ASCII-only [ \t\n\x0B\f\r]; Python \s is unicode-aware — spell
# the Java class out so behavior matches on exotic whitespace inside tags.
_JAVA_WS = r"[ \t\n\x0b\f\r]"

RE_META_SCRIPT_LINK = re.compile(
    rf"<(meta|script|link)({_JAVA_WS}[^>]*)?>.*?</(meta|script|link)>",
    re.IGNORECASE | re.DOTALL,
)
RE_TAG = re.compile(rf"<[^{_JAVA_NOT_DOT}]*?>")
RE_PUNCT = re.compile(r"[.,:;!?'\"\(\)-]")
RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")
RE_NON_ASCII = re.compile(r"[^\x00-\x7f]")

MAX_TOKEN_LEN = 512  # Indexer.java:87


def clean_text(s: pd.Series) -> pd.Series:
    """Apply the five replace stages; output contains only [A-Za-z0-9 ]."""
    s = s.fillna("")
    s = s.str.replace(RE_META_SCRIPT_LINK, " ", regex=True)
    s = s.str.replace(RE_TAG, " ", regex=True)
    s = s.str.replace(RE_PUNCT, " ", regex=True)
    s = s.str.replace(RE_NON_ALNUM, " ", regex=True)
    s = s.str.replace(RE_NON_ASCII, " ", regex=True)
    return s


def accept_mask(tokens: pd.Series, dictionary: frozenset[str]) -> pd.Series:
    """Boolean mask: would ``Trie.containsWord(token)`` return true."""
    first = tokens.str[0]
    upper_first = first.str.isupper() & first.str.isalpha()
    has_alpha = tokens.str.contains(r"[a-zA-Z]", regex=True)
    has_digit = tokens.str.contains(r"[0-9]", regex=True)
    mixed = has_alpha & has_digit
    short_number = has_digit & (tokens.str.len() <= 4)
    in_dict = tokens.str.lower().isin(dictionary)
    return upper_first | (~mixed & (short_number | in_dict))


def explode_tokens(pdf: pd.DataFrame, doc_cols: list[str], text_col: str = "text") -> pd.DataFrame:
    """Clean + split + explode a batch into one row per surviving token.

    Output columns: ``doc_cols`` + ``token``; ordered by original token
    position within each doc (length-filtered rows already dropped, as both
    reference passes skip them before any counter advances).
    """
    cleaned = clean_text(pdf[text_col])
    toks = cleaned.str.split()
    out = pdf[doc_cols].copy()
    out["token"] = toks
    out = out.explode("token", ignore_index=True)
    out = out[out["token"].notna()]
    out = out[out["token"].str.len() <= MAX_TOKEN_LEN]
    return out.reset_index(drop=True)


def tokenize_batch(
    pdf: pd.DataFrame,
    dictionary: frozenset[str],
    doc_cols: list[str],
    text_col: str = "text",
) -> pd.DataFrame:
    """Full two-pass tokenization of a batch of documents.

    Returns one row per (doc, term) with its tf (position-union size).
    """
    from .stemmer import stem_series

    tok = explode_tokens(pdf, doc_cols, text_col)
    if len(tok) == 0:
        return pd.DataFrame(columns=[*doc_cols, "term", "tf"]).astype(
            {c: pdf[c].dtype for c in doc_cols} | {"term": object, "tf": "int64"}
        )

    grp = tok.groupby(doc_cols, sort=False, dropna=False)
    accepted = accept_mask(tok["token"], dictionary)
    # pass-1 position counter advances only on accepted tokens
    pos1 = accepted.groupby([tok[c] for c in doc_cols], sort=False).cumsum()
    # pass-2 counter advances on every surviving token
    pos2 = grp.cumcount() + 1

    lower = tok["token"].str.lower()
    pass1 = pd.DataFrame(
        {**{c: tok[c][accepted] for c in doc_cols},
         "term": lower[accepted],
         "pos": pos1[accepted].astype("int64")}
    )
    pass2 = pd.DataFrame(
        {**{c: tok[c] for c in doc_cols},
         "term": stem_series(lower),
         "pos": pos2.astype("int64")}
    )
    both = pd.concat([pass1, pass2], ignore_index=True)
    both = both.drop_duplicates(subset=[*doc_cols, "term", "pos"])
    tf = (
        both.groupby([*doc_cols, "term"], sort=False, dropna=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    tf["tf"] = tf["tf"].astype("int64")
    return tf


def ntf_from_tf(tf_pdf: pd.DataFrame, doc_cols: list[str]) -> pd.DataFrame:
    """Quirk Q1: ntf = (Σ tf²)^¼ (``Indexer.java:131-139`` applies sqrt to
    the L2 norm a second time)."""
    sq = tf_pdf.assign(sq=tf_pdf["tf"].astype("float64") ** 2)
    agg = sq.groupby(doc_cols, sort=False)["sq"].sum().reset_index()
    agg["ntf"] = np.sqrt(np.sqrt(agg["sq"]))
    return agg.drop(columns=["sq"])
