"""BM25 top-k with block-max WAND over the compressed block index.

This is the scale-mode query path the north rule asks for on top of the
reference-semantics ranker: proper Robertson BM25 with k1/b knobs (pinned
at index build — see ``plans/compression.py``) and document-at-a-time WAND
with per-block upper bounds, so hot terms' posting lists are skipped in
block units rather than decoded in full.

Correctness: pivot selection uses each cursor's SUFFIX-max block bound
(valid for every remaining doc); the current block's own bound is only
used as the tighter block-max refinement at the pivot.  Pruning uses
``< θ`` (not ``≤``) so exact score ties still resolve by the doc-asc
tie-break, making the top-k exactly equal to brute force —
``tests/test_bm25.py`` asserts doc-and-score equality.
"""

from __future__ import annotations

import heapq
import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from ..plans.compression import (
    BM25_B,
    BM25_K1,
    decode_block,
    doc_key_expr,
    doc_key_to_cols,
)
from ..plans.index_build import IndexPaths, read_meta

INF = np.iinfo(np.int64).max
_RE_PUNCT = re.compile(r"[.,:;!?'\"\(\)-]")


def bm25_idf(n_docs: int, df: int) -> float:
    """Robertson-Sparck-Jones idf with the +1 floor (Lucene form)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class _NormLookup:
    """doc_key → BM25 length norm via sorted-array binary search (a pandas
    reindex here costs ~1µs/key in hash lookups; searchsorted is ~20ns)."""

    __slots__ = ("keys", "vals")

    def __init__(self, keys: np.ndarray, vals: np.ndarray) -> None:
        order = np.argsort(keys)
        self.keys = keys[order]
        self.vals = vals[order]

    def __call__(self, want: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.keys, want)
        return self.vals[np.minimum(idx, len(self.vals) - 1)]


class _Cursor:
    """Posting cursor over one term's block list; decodes lazily per block."""

    __slots__ = (
        "key_max_arr", "ub_arr", "suffix_ub", "doc_bytes", "tf_bytes",
        "weight", "dl_norm", "n_blocks", "bi", "keys", "scores", "pos",
        "decode_counter",
    )

    def __init__(
        self,
        blocks: pd.DataFrame,
        weight: float,
        dl_norm: "_NormLookup",
        decode_counter: list[int] | None = None,
    ) -> None:
        self.key_max_arr = blocks["key_max"].to_numpy(dtype=np.int64)
        self.ub_arr = blocks["ub_bm25"].to_numpy(dtype=np.float64)
        # suffix max: ub valid for ALL docs at or after block i
        self.suffix_ub = np.maximum.accumulate(self.ub_arr[::-1])[::-1]
        self.doc_bytes = blocks["doc_bytes"].tolist()
        self.tf_bytes = blocks["tf_bytes"].tolist()
        self.weight = weight
        self.dl_norm = dl_norm
        self.n_blocks = len(blocks)
        self.keys: np.ndarray | None = None
        self.scores: np.ndarray | None = None
        self.pos = 0
        self.bi = self.n_blocks
        self.decode_counter = decode_counter if decode_counter is not None else [0]
        if self.n_blocks:
            self._load_block(0)

    def _load_block(self, bi: int) -> None:
        self.bi = bi
        self.decode_counter[0] += 1
        keys, tfs = decode_block(self.doc_bytes[bi], self.tf_bytes[bi])
        self.keys = keys.astype(np.int64)
        tf = tfs.astype(np.float64)
        norm = self.dl_norm(self.keys)
        self.scores = self.weight * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * norm)
        self.pos = 0

    def exhausted(self) -> bool:
        return self.bi >= self.n_blocks

    def cur_doc(self) -> int:
        return INF if self.bi >= self.n_blocks else int(self.keys[self.pos])

    def tail_ub(self) -> float:
        """Bound on this term's score for any doc ≥ cur_doc()."""
        if self.bi >= self.n_blocks:
            return 0.0
        return self.weight * float(self.suffix_ub[self.bi])

    def block_ub(self) -> float:
        """Bound for docs within the current block only."""
        if self.bi >= self.n_blocks:
            return 0.0
        return self.weight * float(self.ub_arr[self.bi])

    def block_covers(self, doc: int) -> bool:
        return self.bi < self.n_blocks and doc <= int(self.key_max_arr[self.bi])

    def next_geq(self, target: int) -> None:
        """Advance to the first posting ≥ target; skips whole blocks via
        key_max metadata without decoding."""
        if self.bi >= self.n_blocks:
            return
        if int(self.key_max_arr[self.bi]) >= target:
            if int(self.keys[self.pos]) >= target:
                return
            self.pos = int(np.searchsorted(self.keys, target, side="left"))
            if self.pos < len(self.keys):
                return
            nxt = self.bi + 1  # unreachable in practice (key_max >= target)
        else:
            nxt = int(np.searchsorted(self.key_max_arr, target, side="left"))
        if nxt >= self.n_blocks:
            self.bi = self.n_blocks
            return
        self._load_block(nxt)
        self.pos = int(np.searchsorted(self.keys, target, side="left"))

    def score_at(self, doc: int) -> float:
        if self.bi < self.n_blocks and int(self.keys[self.pos]) == doc:
            return float(self.scores[self.pos])
        return 0.0


class BM25Engine:
    """Driver-side BM25 engine over a built index.

    Preloaded mode (small indexes) holds the block BYTES in-process and
    decodes lazily per touched block.  Above the block-table size
    threshold (see ``ranker.PRELOAD_MAX_BYTES``) the engine auto-degrades:
    each query batch-fetches only its own terms' blocks and df rows via
    term-pruned parquet reads (one Spark job each per query, LRU-cached) —
    identical results, no caller change.  Doc-length norms stay preloaded
    in both modes: at 16 B/doc they are orders of magnitude smaller than
    the block table, and WAND consults them per decoded posting; the
    corpus size where *they* no longer fit is the documented hand-off to
    ``query/distributed.py``."""

    def __init__(
        self,
        spark: SparkSession,
        paths: IndexPaths,
        preload: bool | None = None,
        preload_max_bytes: int | None = None,
    ) -> None:
        from .ranker import _should_preload

        self.spark = spark
        self.paths = paths
        meta = read_meta(paths)
        self.doc_cols: list[str] = meta["doc_cols"]
        self.n_docs: int = meta["n_docs"]
        self.avgdl: float = meta.get("avgdl") or 1.0
        self.preloaded = _should_preload(paths, preload, preload_max_bytes)
        self._blocks: dict[str, pd.DataFrame] | None = None
        self._df: dict[str, int] | None = None
        self._block_cache: dict[str, pd.DataFrame | None] = {}
        self._df_cache: dict[str, int] = {}
        if self.preloaded:
            blocks = spark.read.parquet(paths.blocks).toPandas()
            self._blocks = {
                t: g.sort_values("block_no").reset_index(drop=True)
                for t, g in blocks.groupby("term", sort=False)
            }
            wm = spark.read.parquet(paths.wmetric).toPandas()
            # stored df carries the reference's +1 quirk; undo it for BM25 idf
            self._df = {t: int(d) - 1 for t, d in zip(wm["term"], wm["df"])}
        key = doc_key_expr(self.doc_cols)
        dl = (
            spark.read.parquet(paths.doc_len)
            .select(key.alias("doc_key"), "dl")
            .toPandas()
        )
        self._dl_norm = _NormLookup(
            dl["doc_key"].to_numpy(dtype=np.int64),
            1.0 - BM25_B + BM25_B * dl["dl"].to_numpy(dtype=np.float64) / self.avgdl,
        )
        # instrumentation for skip-rate tests: count of blocks actually
        # decoded by WAND cursors (shared mutable cell, summed per search)
        self._decode_counter: list[int] = [0]
        self._score_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    SCORE_CACHE_TERMS = 64

    @property
    def blocks_decoded(self) -> int:
        return self._decode_counter[0]

    def _ensure_terms(self, terms: list[str]) -> None:
        """Degraded mode: one term-pruned read of blocks and one of
        wmetric fetches every still-missing query term (batched — two
        Spark jobs per query, not two per term)."""
        if self._blocks is not None:
            return
        missing = [t for t in terms if t not in self._block_cache]
        if not missing:
            return
        pdf = (
            self.spark.read.parquet(self.paths.blocks)
            .where(F.col("term").isin(missing))
            .toPandas()
        )
        wm = (
            self.spark.read.parquet(self.paths.wmetric)
            .where(F.col("term").isin(missing))
            .toPandas()
        )
        dfmap = {t: int(d) - 1 for t, d in zip(wm["term"], wm["df"])}
        for t in missing:
            g = pdf[pdf["term"] == t]
            self._block_cache[t] = (
                g.sort_values("block_no").reset_index(drop=True) if len(g) else None
            )
            self._df_cache[t] = dfmap.get(t, 0)
        while len(self._block_cache) > self.SCORE_CACHE_TERMS:
            self._block_cache.pop(next(iter(self._block_cache)))
        while len(self._df_cache) > self.SCORE_CACHE_TERMS:
            self._df_cache.pop(next(iter(self._df_cache)))

    def _term_blocks(self, term: str) -> pd.DataFrame | None:
        if self._blocks is not None:
            return self._blocks.get(term)
        if term not in self._block_cache:
            self._ensure_terms([term])
        return self._block_cache.get(term)

    def _term_df(self, term: str) -> int:
        if self._df is not None:
            return self._df.get(term, 0)
        if term not in self._df_cache:
            self._ensure_terms([term])
        return self._df_cache.get(term, 0)

    def total_blocks(self, query: str) -> int:
        """Number of index blocks the query's terms hold in total (the
        decode count a skip-free scorer would pay)."""
        terms = self._tokenize(query)
        self._ensure_terms(terms)
        return sum(
            len(g) for g in (self._term_blocks(t) for t in terms) if g is not None
        )

    def _tokenize(self, query: str) -> list[str]:
        words = _RE_PUNCT.sub(" ", query).strip().lower().split()
        seen: set[str] = set()
        out: list[str] = []
        for w in words:
            if w not in seen:
                seen.add(w)
                out.append(w)
        return out

    def _weight(self, term: str) -> float:
        return bm25_idf(self.n_docs, self._term_df(term))

    def search_bruteforce(self, query: str, k: int = 10) -> pd.DataFrame:
        """Exhaustive vectorized term-at-a-time scoring — exact, and faster
        than WAND when the query's posting mass is dense (stopword-heavy
        queries score nearly every document, so skipping buys nothing and
        the per-pivot loop loses to array math)."""
        terms = self._tokenize(query)
        self._ensure_terms(terms)
        key_parts: list[np.ndarray] = []
        score_parts: list[np.ndarray] = []
        for t in terms:
            if self._term_blocks(t) is None:
                continue
            keys, scores = self._term_scores(t)
            key_parts.append(keys)
            score_parts.append(scores)
        if not key_parts:
            return self._to_frame([])
        uniq, inv = np.unique(np.concatenate(key_parts), return_inverse=True)
        acc = np.bincount(inv, weights=np.concatenate(score_parts))
        if len(acc) > k:
            thr = np.partition(acc, len(acc) - k)[len(acc) - k]
            cand = np.flatnonzero(acc >= thr)  # ≥ keeps score ties for the
        else:  # doc-asc tie-break below
            cand = np.arange(len(acc))
        order = cand[np.lexsort((uniq[cand], -acc[cand]))][:k]
        return self._to_frame([(int(uniq[i]), float(acc[i])) for i in order])

    def _term_scores(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (doc_keys, bm25_scores) for one term; small LRU since
        Zipf-head terms recur across queries and dominate decode cost."""
        hit = self._score_cache.get(term)
        if hit is not None:
            self._score_cache[term] = self._score_cache.pop(term)  # refresh
            return hit
        g = self._term_blocks(term)
        parts = [decode_block(d, b) for d, b in zip(g["doc_bytes"], g["tf_bytes"])]
        keys = np.concatenate([p[0] for p in parts]).astype(np.int64)
        tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
        norm = self._dl_norm(keys)
        w = self._weight(term)
        scores = w * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * norm)
        if len(self._score_cache) >= self.SCORE_CACHE_TERMS:
            self._score_cache.pop(next(iter(self._score_cache)))
        self._score_cache[term] = (keys, scores)
        return keys, scores

    # Above this many total postings across the query's terms, the
    # vectorized exhaustive path beats the per-pivot WAND loop: when the
    # block-max bounds cannot prune (uniform score mass), WAND degenerates
    # to per-document Python over the posting union (~8µs/doc) while the
    # numpy path costs ~50ns/posting — the crossover is a few thousand.
    TAAT_THRESHOLD = 5_000

    def search(self, query: str, k: int = 10) -> pd.DataFrame:
        """Exact BM25 top-k: block-max WAND with block-granular skipping,
        switching to the vectorized exhaustive path for dense queries
        (both are exact with the same doc-asc tie-break)."""
        terms = self._tokenize(query)
        self._ensure_terms(terms)
        term_blocks = [(t, self._term_blocks(t)) for t in terms]
        total = sum(self._term_df(t) for t, g in term_blocks if g is not None)
        if total > self.TAAT_THRESHOLD:
            return self.search_bruteforce(query, k)
        cursors = [
            _Cursor(g, self._weight(t), self._dl_norm, self._decode_counter)
            for t, g in term_blocks
            if g is not None
        ]
        cursors = [c for c in cursors if not c.exhausted()]
        if not cursors:
            return self._to_frame([])
        heap: list[tuple[float, int]] = []  # (score, -doc), min-heap of k best
        theta = -math.inf

        def push(doc: int, score: float) -> None:
            nonlocal theta
            item = (score, -doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    theta = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                theta = heap[0][0]

        while True:
            live = [c for c in cursors if not c.exhausted()]
            if not live:
                break
            live.sort(key=_Cursor.cur_doc)
            # pivot: shortest prefix whose suffix bounds can reach θ
            acc = 0.0
            pivot_idx = None
            for i, c in enumerate(live):
                acc += c.tail_ub()
                if acc >= theta:  # >= so exact ties can still win by doc asc
                    pivot_idx = i
                    break
            if pivot_idx is None:
                break
            pivot = live[pivot_idx].cur_doc()
            if live[0].cur_doc() == pivot:
                # align all cursors before the pivot, then refine the bound
                # with the blocks actually containing it
                for c in live[:pivot_idx]:
                    c.next_geq(pivot)
                bound = 0.0
                for c in live:
                    if c.cur_doc() > pivot and not c.block_covers(pivot):
                        continue
                    bound += c.block_ub()
                if bound >= theta:
                    score = sum(c.score_at(pivot) for c in live)
                    push(pivot, score)
                for c in live:
                    if c.cur_doc() == pivot:
                        c.next_geq(pivot + 1)
            else:
                live[0].next_geq(pivot)
        top = sorted(((s, -negd) for s, negd in heap), key=lambda kv: (-kv[0], kv[1]))
        return self._to_frame([(d, s) for s, d in top])

    def _to_frame(self, pairs: list[tuple[int, float]]) -> pd.DataFrame:
        if not pairs:
            out = doc_key_to_cols(np.array([], dtype=np.int64), self.doc_cols)
            out["score"] = pd.Series([], dtype="float64")
            return out
        keys = np.array([d for d, _ in pairs], dtype=np.int64)
        out = doc_key_to_cols(keys, self.doc_cols)
        out["score"] = [s for _, s in pairs]
        return out
