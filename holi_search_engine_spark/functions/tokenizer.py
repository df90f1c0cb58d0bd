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

    Output columns: ``doc_cols`` + ``token``, with the ORIGINAL batch row
    number as the index (one batch row = one doc); ordered by token
    position within each doc (length-filtered rows already dropped, as both
    reference passes skip them before any counter advances).
    """
    cleaned = clean_text(pdf.reset_index(drop=True)[text_col])
    toks = cleaned.str.split()
    out = pdf.reset_index(drop=True)[doc_cols].copy()
    out["token"] = toks
    out = out.explode("token")  # index = original batch row (the doc)
    out = out[out["token"].notna()]
    out = out[out["token"].str.len() <= MAX_TOKEN_LEN]
    return out


# bit layout of the packed (doc, term, pos) key used for the position-set
# union: 23 bits batch row + 20 bits term code + 21 bits position
_POS_BITS = 21
_TERM_BITS = 20


def tokenize_batch(
    pdf: pd.DataFrame,
    dictionary: frozenset[str],
    doc_cols: list[str],
    text_col: str = "text",
    with_stats: bool = False,
    doc_keys: np.ndarray | None = None,
) -> pd.DataFrame:
    """Full two-pass tokenization of a batch of documents.

    Returns one row per (doc, term) with its tf (position-union size).
    When ``doc_keys`` (one int64 per input row) is given, the output
    carries a single ``doc_key`` column instead of ``doc_cols`` — 8 bytes
    per row instead of a string, which narrows every downstream Arrow
    transfer, parquet file, and shuffle of the token stream.
    With ``with_stats`` the per-doc aggregates ride along on every row —
    ``ntf`` (quirk Q1: (Σtf²)^¼), ``dl`` (Σtf) and ``fd`` (1 on the doc's
    first row, for exact doc counting via ``Observation``) — computed here
    because a doc never spans Arrow batches, which is what lets the index
    build run a SINGLE tokenize pass with no doc-stats join downstream.

    All per-token work is numpy array math: after ``explode`` each doc's
    tokens are one contiguous run, so the two reference position counters
    (pass 1 advances on accepted tokens only, pass 2 on all —
    ``Indexer.java:85-128``) are cumsum arithmetic, and the TreeSet
    position-union + tf count collapse to two ``np.unique`` calls over a
    packed ``(doc, term, pos)`` integer key.
    """
    from .stemmer import stem_word

    stat_cols = {"ntf": "float64", "dl": "int64", "fd": "int8"} if with_stats else {}
    key_cols = (
        {"doc_key": "int64"}
        if doc_keys is not None
        else {c: pdf[c].dtype for c in doc_cols}
    )
    empty = pd.DataFrame(columns=[*key_cols, "term", "tf", *stat_cols]).astype(
        key_cols | {"term": object, "tf": "int64"} | stat_cols
    )
    cleaned = clean_text(pdf.reset_index(drop=True)[text_col])
    tok = cleaned.str.split().explode()  # index = original batch row (doc)
    tok = tok[tok.notna()]
    if len(tok) == 0:
        return empty

    # Every per-token string operation (length cap, Trie rules, lowercase,
    # stem) runs on the batch's UNIQUE tokens and is indexed back — tokens
    # repeat heavily (Zipf), so this is ~100× less string work per batch.
    row_id = tok.index.to_numpy(dtype=np.int64)
    tcodes, uniq = pd.factorize(tok.to_numpy())
    uniq_s = pd.Series(uniq)
    keep = (uniq_s.str.len().to_numpy(np.int64) <= MAX_TOKEN_LEN)[tcodes]
    if not keep.all():
        row_id, tcodes = row_id[keep], tcodes[keep]
    if len(row_id) == 0:
        return empty
    n = len(row_id)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = row_id[1:] != row_id[:-1]
    rs = np.flatnonzero(run_start)
    run_id = np.cumsum(run_start) - 1

    acc_u = accept_mask(uniq_s, dictionary).to_numpy(dtype=bool)
    acc = acc_u[tcodes]
    c = np.cumsum(acc)
    pos1 = c - (c - acc)[rs][run_id]  # per-doc count of accepted tokens so far
    pos2 = np.arange(n, dtype=np.int64) - rs[run_id] + 1  # per-doc 1-based index

    lower_u = uniq_s.str.lower()
    stem_u = lower_u.map(stem_word)
    union = np.concatenate([lower_u.to_numpy(), stem_u.to_numpy()])
    ucodes, uniq_terms = pd.factorize(union)
    lcode_u, scode_u = ucodes[: len(uniq)], ucodes[len(uniq) :]

    rows_all = np.concatenate([row_id[acc], row_id])
    codes = np.concatenate([lcode_u[tcodes[acc]], scode_u[tcodes]])
    pos_all = np.concatenate([pos1[acc], pos2])

    if (
        len(uniq_terms) < (1 << _TERM_BITS)
        and (pos_all.max() if len(pos_all) else 0) < (1 << _POS_BITS)
    ):
        key = (
            (rows_all << (_TERM_BITS + _POS_BITS))
            | (codes.astype(np.int64) << _POS_BITS)
            | pos_all
        )
        uk = np.unique(key)  # (doc, term, pos) union across the two passes
        doc_term = uk >> _POS_BITS
        pairs, tf = np.unique(doc_term, return_counts=True)
        out_rows = (pairs >> _TERM_BITS).astype(np.int64)
        out_terms = uniq_terms[(pairs & ((1 << _TERM_BITS) - 1)).astype(np.int64)]
    else:  # degenerate batch (¬ 1M distinct terms / 2M-token doc): pandas path
        both = pd.DataFrame({"r": rows_all, "t": codes, "p": pos_all})
        both = both.drop_duplicates()
        g = both.groupby(["r", "t"], sort=True).size().reset_index(name="tf")
        out_rows = g["r"].to_numpy(dtype=np.int64)
        out_terms = uniq_terms[g["t"].to_numpy(dtype=np.int64)]
        tf = g["tf"].to_numpy()

    if doc_keys is not None:
        out = pd.DataFrame({"doc_key": np.asarray(doc_keys, dtype=np.int64)[out_rows]})
    else:
        base = pdf.reset_index(drop=True)[doc_cols]
        out = base.iloc[out_rows].reset_index(drop=True)
    out["term"] = out_terms
    out["tf"] = tf.astype("int64")
    if with_stats:
        # rows are sorted by doc (out_rows ascending), so each doc is one
        # contiguous run: per-doc aggregates are reduceat over run starts
        n_o = len(out_rows)
        start = np.empty(n_o, dtype=bool)
        start[0] = True
        start[1:] = out_rows[1:] != out_rows[:-1]
        ds = np.flatnonzero(start)
        gid = np.cumsum(start) - 1
        tf64 = tf.astype(np.float64)
        out["ntf"] = np.sqrt(np.sqrt(np.add.reduceat(tf64 * tf64, ds)))[gid]
        out["dl"] = np.add.reduceat(tf.astype(np.int64), ds)[gid]
        out["fd"] = start.astype("int8")
    return out


def term_frequency_batch(
    pdf: pd.DataFrame,
    dictionary: frozenset[str],
    doc_cols: list[str],
    text_col: str = "text",
) -> pd.DataFrame:
    """The TermFrequency job's tokenization of a batch (the wd-metric
    path, ``/root/reference/src/cis5550/jobs/TermFrequency.java:44-139``).

    Same regex chain as the Indexer, plus the job's own quirks:

    - the CLEANED page is truncated to its first ¾ (integer division)
      before splitting (``TermFrequency.java:67``);
    - pass 2 stems the ORIGINAL-CASE token: the stemmer runs before the
      ``toLowerCase`` at ``:110``, whose result is then never used
      (``:105-112``) — so stem terms can carry uppercase, unlike the
      Indexer which lowercases first (``Indexer.java:118-120``);
    - pass 1 advances its position counter only on dictionary-accepted
      tokens, pass 2 on all length-capped tokens; tf = |union of recorded
      positions| per (doc, term), as in the Indexer;
    - the norm is the single-sqrt L2 (``:120-125``), NOT the Indexer's
      double-sqrt quirk Q1; ``normalized_tf = tf / l2`` (``:135``).

    Returns one row per (doc, term): ``doc_cols + [term, tf,
    normalized_tf]``.  Vectorization mirrors :func:`tokenize_batch`
    (unique-token factorization + packed-key position union); the ¾
    truncation is a per-DOC slice (pandas has no varying-stop ``str.slice``
    — O(docs) Python, not O(tokens), outside the per-token hot path).
    """
    from .stemmer import stem_word

    empty = pd.DataFrame(
        columns=[*doc_cols, "term", "tf", "normalized_tf"]
    ).astype({c: pdf[c].dtype for c in doc_cols} | {"term": object, "tf": "int64", "normalized_tf": "float64"})
    cleaned = clean_text(pdf.reset_index(drop=True)[text_col])
    cut = 3 * cleaned.str.len().to_numpy(np.int64) // 4
    truncated = pd.Series(
        [s[:c] for s, c in zip(cleaned.to_numpy(), cut)], index=cleaned.index
    )
    tok = truncated.str.split().explode()
    tok = tok[tok.notna()]
    if len(tok) == 0:
        return empty
    row_id = tok.index.to_numpy(dtype=np.int64)
    tcodes, uniq = pd.factorize(tok.to_numpy())
    uniq_s = pd.Series(uniq)
    keep = (uniq_s.str.len().to_numpy(np.int64) <= MAX_TOKEN_LEN)[tcodes]
    if not keep.all():
        row_id, tcodes = row_id[keep], tcodes[keep]
    if len(row_id) == 0:
        return empty
    n = len(row_id)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = row_id[1:] != row_id[:-1]
    rs = np.flatnonzero(run_start)
    run_id = np.cumsum(run_start) - 1

    acc_u = accept_mask(uniq_s, dictionary).to_numpy(dtype=bool)
    acc = acc_u[tcodes]
    c = np.cumsum(acc)
    pos1 = c - (c - acc)[rs][run_id]  # accepted-token counter (pass 1)
    pos2 = np.arange(n, dtype=np.int64) - rs[run_id] + 1  # all-token counter

    lower_u = uniq_s.str.lower()
    stem_u = uniq_s.map(stem_word)  # ORIGINAL-case input — the :105-110 quirk
    union = np.concatenate([lower_u.to_numpy(), stem_u.to_numpy()])
    ucodes, uniq_terms = pd.factorize(union)
    lcode_u, scode_u = ucodes[: len(uniq)], ucodes[len(uniq) :]

    rows_all = np.concatenate([row_id[acc], row_id])
    codes = np.concatenate([lcode_u[tcodes[acc]], scode_u[tcodes]])
    pos_all = np.concatenate([pos1[acc], pos2])

    if (
        len(uniq_terms) < (1 << _TERM_BITS)
        and (pos_all.max() if len(pos_all) else 0) < (1 << _POS_BITS)
    ):
        key = (
            (rows_all << (_TERM_BITS + _POS_BITS))
            | (codes.astype(np.int64) << _POS_BITS)
            | pos_all
        )
        uk = np.unique(key)
        doc_term = uk >> _POS_BITS
        pairs, tf = np.unique(doc_term, return_counts=True)
        out_rows = (pairs >> _TERM_BITS).astype(np.int64)
        out_terms = uniq_terms[(pairs & ((1 << _TERM_BITS) - 1)).astype(np.int64)]
    else:  # degenerate batch: pandas fallback (as in tokenize_batch)
        both = pd.DataFrame({"r": rows_all, "t": codes, "p": pos_all}).drop_duplicates()
        g = both.groupby(["r", "t"], sort=True).size().reset_index(name="tf")
        out_rows = g["r"].to_numpy(dtype=np.int64)
        out_terms = uniq_terms[g["t"].to_numpy(dtype=np.int64)]
        tf = g["tf"].to_numpy()

    base = pdf.reset_index(drop=True)[doc_cols]
    out = base.iloc[out_rows].reset_index(drop=True)
    out["term"] = out_terms
    out["tf"] = tf.astype("int64")
    # per-doc single-sqrt L2 over contiguous doc runs (out_rows ascending)
    n_o = len(out_rows)
    start = np.empty(n_o, dtype=bool)
    start[0] = True
    start[1:] = out_rows[1:] != out_rows[:-1]
    ds = np.flatnonzero(start)
    gid = np.cumsum(start) - 1
    tf64 = tf.astype(np.float64)
    l2 = np.sqrt(np.add.reduceat(tf64 * tf64, ds))[gid]
    out["normalized_tf"] = tf64 / l2
    return out


def ntf_from_tf(tf_pdf: pd.DataFrame, doc_cols: list[str]) -> pd.DataFrame:
    """Quirk Q1: ntf = (Σ tf²)^¼ (``Indexer.java:131-139`` applies sqrt to
    the L2 norm a second time)."""
    sq = tf_pdf.assign(sq=tf_pdf["tf"].astype("float64") ** 2)
    agg = sq.groupby(doc_cols, sort=False)["sq"].sum().reset_index()
    agg["ntf"] = np.sqrt(np.sqrt(agg["sq"]))
    return agg.drop(columns=["sq"])
