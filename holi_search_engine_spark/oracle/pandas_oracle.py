"""Pure-Python oracle: a naive, loop-style transliteration of the reference
pipeline, used as the source of truth for rank-identity tests.

Deliberately NOT shared with the engine's vectorized code paths — the whole
point is an independent implementation to check the Spark engine against.

Transliterated from:
- ``/root/reference/src/cis5550/jobs/Indexer.java:44-176`` (tokenize, ntf,
  postings),
- ``/root/reference/src/cis5550/jobs/Idf.java:33-70`` (df+1 quirk Q3),
- ``/root/reference/src/cis5550/ranker/CrawlProcess.java:44-56`` (title /
  snippet),
- ``/root/reference/src/cis5550/ranker/Ranker.java:146-279`` (scoring steps
  1-11 with quirks Q4/Q5/Q8),

with the two documented normalizations (SURVEY.md §7): postings are
doc-ordered (Q2) and sorts tie-break on ``(score DESC, doc ASC)`` (Q10).
Quirk Q5's "first matching term" is made deterministic by iterating query
terms in Java ``HashSet`` order (see ``functions/javacompat.py``).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any

from ..functions.javacompat import java_hashmap_value_order, java_hashset_order
from ..functions.stemmer import stem_word
from ..query.stopwords import STOPWORDS

DocId = Any  # orderable, hashable (tuple for transcripts, int for documents)

_RE_MSL = re.compile(
    r"<(meta|script|link)([ \t\n\x0b\f\r][^>]*)?>.*?</(meta|script|link)>",
    re.IGNORECASE | re.DOTALL,
)
_RE_TAG = re.compile("<[^\n\r\u0085\u2028\u2029]*?>")
_RE_PUNCT = re.compile(r"[.,:;!?'\"\(\)-]")
_RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")
_RE_NON_ASCII = re.compile(r"[^\x00-\x7f]")
# CrawlProcess punctuation class additionally strips control chars
_RE_PUNCT_CTRL = re.compile(r"[.,:;!?'\"()\-\x00-\x1f\x7f]")


def _java_query_tokens(s: str) -> list[str]:
    """``s.replaceAll(punct, " ").trim().toLowerCase().split("\\s+")`` with
    Java semantics (``Ranker.java:152-153`` query, ``:223`` title): trim
    strips chars <= U+0020 only, and ``\\s`` is ASCII-only — Unicode
    whitespace (NBSP etc.) stays INSIDE tokens; "" splits to ``['']``.
    Loop-style and deliberately independent of the engine's
    ``functions/javacompat.java_query_tokens``.  Final-form sigma folds
    ς→σ — the deliberate normalization documented there (Java's
    BreakIterator-conditioned final-sigma is not reproducible across
    Python/Spark, so both sides of the overlap fold instead)."""
    s = _RE_PUNCT.sub(" ", s)
    i, j = 0, len(s)
    while i < j and s[i] <= "\x20":  # Java String.trim()
        i += 1
    while j > i and s[j - 1] <= "\x20":
        j -= 1
    return re.split(r"[ \t\n\x0b\f\r]+", s[i:j].lower().replace("ς", "σ"))


def trie_contains(word: str, dictionary: frozenset[str]) -> bool:
    """``Trie.containsWord`` (``jobs/Trie.java:141-152``), quirk Q7."""
    if word[0].isupper():
        return True
    has_alpha = any(c.isalpha() for c in word)
    has_digit = any(c.isdigit() for c in word)
    if has_alpha and has_digit:
        return False
    if has_digit and len(word) <= 4:
        return True
    return word.lower() in dictionary


def clean_page(page: str) -> list[str]:
    page = _RE_MSL.sub(" ", page)
    page = _RE_TAG.sub(" ", page)
    page = _RE_PUNCT.sub(" ", page)
    page = _RE_NON_ALNUM.sub(" ", page)
    page = _RE_NON_ASCII.sub(" ", page)
    return page.split()


def tokenize_doc(page: str, dictionary: frozenset[str]) -> dict[str, set[int]]:
    """Two-pass word→positions map (``Indexer.java:44-128``, quirk Q6)."""
    words = clean_page(page)
    positions: dict[str, set[int]] = {}
    pos = 1
    for w in words:  # pass 1: dictionary-filtered surface terms
        if len(w) > 512:
            continue
        if not trie_contains(w, dictionary):
            continue
        lw = w.lower()
        positions.setdefault(lw, set()).add(pos)
        pos += 1
    pos = 1
    for w in words:  # pass 2: stems of every token
        if len(w) > 512:
            continue
        sw = stem_word(w.lower())
        positions.setdefault(sw, set()).add(pos)
        pos += 1
    return positions


def term_frequency_doc(
    page: str, dictionary: frozenset[str]
) -> dict[str, tuple[int, float]]:
    """Loop transliteration of the TermFrequency job's per-page body
    (``jobs/TermFrequency.java:44-139``): same clean chain as the Indexer,
    then the job's own quirks — the CLEANED page is cut to its first ¾
    (``:67``), pass 2 stems the ORIGINAL-case token (the ``toLowerCase`` at
    ``:110`` lands after ``s.stem()`` and its result is discarded,
    ``:105-112``), and the norm is the single-sqrt L2 (``:120-125``).
    Returns term -> (tf, normalized_tf)."""
    page = _RE_MSL.sub(" ", page)
    page = _RE_TAG.sub(" ", page)
    page = _RE_PUNCT.sub(" ", page)
    page = _RE_NON_ALNUM.sub(" ", page)
    page = _RE_NON_ASCII.sub(" ", page)
    page = page[: 3 * len(page) // 4]
    words = page.split()
    positions: dict[str, set[int]] = {}
    pos = 1
    for w in words:  # pass 1: dictionary-accepted, counter on accepts only
        if len(w) > 512:
            continue
        if not trie_contains(w, dictionary):
            continue
        positions.setdefault(w.lower(), set()).add(pos)
        pos += 1
    pos = 1
    for w in words:  # pass 2: stem of the ORIGINAL-case word, all tokens
        if len(w) > 512:
            continue
        positions.setdefault(stem_word(w), set()).add(pos)
        pos += 1
    l2 = math.sqrt(sum(len(p) * len(p) for p in positions.values()))
    return {t: (len(p), len(p) / l2) for t, p in positions.items()}


@dataclass
class OracleIndex:
    postings: dict[str, list[tuple[DocId, int]]]  # doc-ordered (Q2 normalized)
    ntf: dict[DocId, float]
    wmetric: dict[str, tuple[int, float]]  # term -> (df, idf)
    titles: dict[DocId, str]
    snippets: dict[DocId, str]
    static_rank: dict[DocId, float] = field(default_factory=dict)
    n_docs: int = 0


def title_snippet(text: str) -> tuple[str, str]:
    """CrawlProcess default path (no <title>/<body> in transcripts):
    ``CrawlProcess.java:49-56``."""
    default_text = _RE_TAG.sub(" ", text)
    default_text = _RE_PUNCT_CTRL.sub(" ", default_text)
    return default_text[:60], default_text[:300]


def build_index(
    docs: list[tuple[DocId, str]],
    dictionary: frozenset[str],
    n_for_idf: int | None = None,
) -> OracleIndex:
    postings: dict[str, list[tuple[DocId, int]]] = {}
    ntf: dict[DocId, float] = {}
    titles: dict[DocId, str] = {}
    snippets: dict[DocId, str] = {}
    for doc_id, text in docs:
        wp = tokenize_doc(text, dictionary)
        l2 = 0.0
        for positions in wp.values():
            tf = len(positions)
            l2 += tf * tf
        ntf[doc_id] = math.sqrt(math.sqrt(l2))  # Q1: (Σtf²)^¼
        for term, positions in wp.items():
            postings.setdefault(term, []).append((doc_id, len(positions)))
        t, s = title_snippet(text)
        titles[doc_id] = t
        snippets[doc_id] = s
    for term in postings:
        postings[term].sort(key=lambda p: p[0])  # Q2 normalization
    n = n_for_idf if n_for_idf is not None else len(docs)
    wmetric = {}
    for term, plist in postings.items():
        df = len(plist) + 1  # Q3: off-by-one
        wmetric[term] = (df, math.log(n / df))
    return OracleIndex(postings, ntf, wmetric, titles, snippets, {}, len(docs))


@dataclass
class Candidate:
    doc: DocId
    occurrence: int = 1
    word2tf: dict[str, float] = field(default_factory=dict)
    page_rank: float = 0.0
    keyword_match: float = 0.0
    tf_idf_weight: float = 0.0

    def score(self) -> float:
        return 3 * self.tf_idf_weight + 0.75 * self.page_rank + self.keyword_match


def find_matching(index: OracleIndex, terms_in_order: list[str]) -> dict[DocId, Candidate]:
    """``Ranker.findAllMatchingURLs`` (``Ranker.java:83-111``) including Q5:
    the first term that hits a doc creates the candidate WITHOUT recording
    its tf."""
    cands: dict[DocId, Candidate] = {}
    for term in terms_in_order:
        for doc, tf in index.postings.get(term, []):
            if doc in cands:
                cands[doc].occurrence += 1
                cands[doc].word2tf[term] = float(tf)
            else:
                cands[doc] = Candidate(doc)  # Q5: tf dropped, occurrence=1
    return cands


def search(
    index: OracleIndex,
    query: str,
    page: int = 1,
    top_cut: int = 250,
    expand_threshold: int = 50,
) -> list[Candidate]:
    """Ranker steps 1-11; returns the full ranked candidate list (the caller
    paginates 10/page as the reference does)."""
    # step 1: normalize query (Java trim + ASCII-\s split; Ranker.java:152)
    words = _java_query_tokens(query)
    if not words:  # unreachable, like Java's words.length < 1 guard
        return []
    # Java: words_set = new HashSet<>(Arrays.asList(words))
    words_set_order = java_hashset_order(words, initial_from_collection=True)
    # step 3 (Q4): stemming is a broken no-op → empty set
    stemmed_words: list[str] = []
    # step 2: stopword split, preserving words_set iteration order
    words_sw = [w for w in words_set_order if w not in STOPWORDS]
    removed = [w for w in words_set_order if w in STOPWORDS]
    if not words_sw:
        words_sw = removed
    # candidate generation in HashSet iteration order (Q5 determinization)
    cands = find_matching(index, java_hashset_order(words_sw))
    # step 5: expansion
    if len(cands) < expand_threshold:
        pass  # stemmed lookup: empty by Q4
    if len(cands) < expand_threshold:
        cands = find_matching(index, words_set_order)
    if not cands:
        return []
    # step 6: pre-rank by occurrence desc, cut to 250
    # (normalized tie-break: doc key asc — SURVEY.md §7 Q10 note)
    arr = sorted(cands.values(), key=lambda c: (-c.occurrence, c.doc))
    arr = arr[:top_cut]
    # step 7: static rank
    for c in arr:
        c.page_rank = index.static_rank.get(c.doc, 0.0)
    # qtf over ALL raw query words, stopwords included (Ranker.java:207-210)
    word_count: dict[str, int] = {}
    for w in words:
        word_count[w] = word_count.get(w, 0) + 1
    for c in arr:
        title = index.titles.get(c.doc, "")
        # step 8: title bonus — raw query substring, case-sensitive
        if query in title:
            c.keyword_match = 10.0
        else:
            title_set = set(_java_query_tokens(title))
            inter = set(words_sw) & title_set
            overlap = len(inter) / len(words_sw) if words_sw else 0.0
            if overlap >= 0.6:
                c.keyword_match = overlap * 10
        # step 9: TF-IDF weight
        weight = 0.0
        den = index.ntf.get(c.doc, 0.0)
        # HashMap entrySet order (Ranker.java:232): float addition is
        # non-associative, so the accumulation order is part of
        # bit-exactness vs the compiled reference
        for w in java_hashmap_value_order(list(word_count)):
            qtf = word_count[w]
            idf = index.wmetric.get(w, (0, 0.0))[1]  # Q8: absent → 0
            num = c.word2tf.get(w)
            wf = (num / den) if (num is not None and den) else 0.0
            # Java Math.pow: negative base ^ fractional exponent is NaN
            # (reachable — Q3's df+1 gives a corpus-ubiquitous term
            # idf = ln(n/(n+1)) < 0); Python ** would return a complex
            # and break the final score sort
            idf_pow = idf ** 1.5 if idf >= 0.0 else float("nan")
            weight += qtf * idf_pow * wf
        c.tf_idf_weight = weight
    # step 10: final sort (normalized tie-break on doc key)
    arr.sort(key=lambda c: (-c.score(), c.doc))
    return arr
