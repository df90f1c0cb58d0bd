"""Block-max WAND BM25: exact top-k equality vs brute-force scoring."""

import numpy as np
import pytest

from holi_search_engine_spark.corpus import make_query_fixtures
from holi_search_engine_spark.query.bm25 import BM25Engine


@pytest.fixture(scope="session")
def bm25(spark, built_index):
    return BM25Engine(spark, built_index)


def _assert_equal(got, exp, label):
    assert list(got["conv_id"]) == list(exp["conv_id"]), label
    assert list(got["turn_idx"]) == list(exp["turn_idx"]), label
    assert np.allclose(got["score"], exp["score"], atol=1e-12), label


def test_wand_matches_bruteforce_fixture_queries(bm25, vocabulary):
    for qid, q in make_query_fixtures(vocabulary):
        for k in (1, 5, 10):
            _assert_equal(bm25.search(q, k), bm25.search_bruteforce(q, k), f"{qid} k={k}")


def test_wand_matches_bruteforce_hot_terms(bm25, vocabulary):
    # Zipf-head terms (incl. stopwords — longest posting lists)
    hot = vocabulary[:5]
    queries = [
        " ".join(hot),
        hot[0],
        f"{hot[0]} {vocabulary[4000]}",  # hot + rare
        " ".join(vocabulary[100:110]),  # 10 terms
    ]
    for q in queries:
        for k in (1, 10, 50, 250):
            _assert_equal(bm25.search(q, k), bm25.search_bruteforce(q, k), f"{q[:30]} k={k}")


def test_k_larger_than_candidates(bm25, vocabulary):
    rare = vocabulary[4999]
    got = bm25.search(rare, 10_000)
    exp = bm25.search_bruteforce(rare, 10_000)
    _assert_equal(got, exp, "k>candidates")


def test_absent_term_empty(bm25):
    assert len(bm25.search("zzzznotaterm", 10)) == 0


@pytest.fixture(scope="module")
def bm25_skip(spark, tmp_path_factory):
    """An index engineered so block-max skipping is OBSERVABLE: a hot term
    in all 4096 docs (32 blocks at BLOCK_SIZE=128) and a high-idf rare term
    in 4 of them, with total postings (4100) under the TAAT crossover so
    the query stays on the WAND path."""
    import pandas as pd

    from holi_search_engine_spark.plans.index_build import build_index

    rows = []
    for i in range(4096):
        text = "common " * (1 + i % 3)
        if i % 1024 == 500:
            text += "rareterm " * 8
        rows.append((f"conv-{i:08d}", 0, text))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    out = str(tmp_path_factory.mktemp("bm25skip") / "idx")
    paths = build_index(
        spark,
        spark.createDataFrame(pdf),
        out,
        frozenset({"common", "rareterm"}),
        buckets=2,
    )
    return BM25Engine(spark, paths)


def test_wand_skips_blocks(bm25_skip):
    """Block-max skipping must decode STRICTLY fewer blocks than a
    skip-free scorer for a hot+rare query at k=1: once a rare doc is
    scored, θ exceeds every hot-only block bound and the hot cursor jumps
    straight between the rare docs' blocks."""
    q = "common rareterm"
    total = bm25_skip.total_blocks(q)
    assert total >= 16  # 32 hot blocks + the rare block(s)
    before = bm25_skip.blocks_decoded
    got = bm25_skip.search(q, 1)
    decoded = bm25_skip.blocks_decoded - before
    assert 0 < decoded < total
    _assert_equal(
        got, bm25_skip.search_bruteforce(q, 1), "skip query still exact"
    )


def test_scores_positive_and_sorted(bm25, vocabulary):
    got = bm25.search(f"{vocabulary[500]} {vocabulary[600]}", 20)
    s = got["score"].to_numpy()
    assert (s > 0).all()
    assert (np.diff(s) <= 1e-15).all()


def test_auto_degraded_mode_identical(spark, built_index, bm25, vocabulary):
    # force the preload threshold to 0 bytes: the engine must fall back to
    # term-pruned per-query reads and return identical results
    deg = BM25Engine(spark, built_index, preload_max_bytes=0)
    assert not deg.preloaded and bm25.preloaded
    for qid, q in make_query_fixtures(vocabulary)[:12]:
        _assert_equal(deg.search(q, 10), bm25.search(q, 10), qid)
        _assert_equal(
            deg.search_bruteforce(q, 10), bm25.search_bruteforce(q, 10), qid
        )
    assert deg.total_blocks("the") == bm25.total_blocks("the")


# ---------------------------------------------------------------- property

from hypothesis import given, settings
from hypothesis import strategies as st


def _make_sweep(postings, weight, block_size, counter):
    """Encode a (doc -> tf) dict into a blocks frame and wrap a _TermSweep."""
    import pandas as pd

    from holi_search_engine_spark.plans.compression import BM25_K1, encode_block
    from holi_search_engine_spark.query.bm25 import _NormLookup, _TermSweep

    keys = np.array(sorted(postings), dtype=np.uint64)
    tfs = np.array([postings[k] for k in sorted(postings)], dtype=np.uint64)
    rows = []
    for bno, s in enumerate(range(0, len(keys), block_size)):
        bk, bt = keys[s : s + block_size], tfs[s : s + block_size]
        db, tb = encode_block(bk, bt)
        ub = float(np.max(bt * (BM25_K1 + 1.0) / (bt + BM25_K1)))
        rows.append((bno, len(bk), int(bk[0]), int(bk[-1]), ub, db, tb))
    blocks = pd.DataFrame(
        rows,
        columns=["block_no", "n", "key_min", "key_max", "ub_bm25", "doc_bytes", "tf_bytes"],
    )
    norms = _NormLookup(np.array([0], dtype=np.int64), np.array([1.0]))
    return _TermSweep(blocks, weight, norms, counter)


@settings(max_examples=60, deadline=None)
@given(
    terms=st.lists(
        st.tuples(
            st.dictionaries(  # doc -> tf
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=1, max_value=5),
                min_size=1,
                max_size=30,
            ),
            st.floats(min_value=0.05, max_value=4.0, allow_nan=False),
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=12),
    block_size=st.integers(min_value=1, max_value=6),
)
def test_block_sweep_matches_bruteforce_property(terms, k, block_size):
    """The sweep must equal brute force exactly — scores AND the doc-asc
    tie-break — on arbitrary posting sets, weights, k, and block sizes
    (tiny blocks force many ranges, partial consumption, and floor skips)."""
    from holi_search_engine_spark.plans.compression import BM25_K1
    from holi_search_engine_spark.query.bm25 import block_sweep_topk

    counter = [0]
    sweeps = [_make_sweep(p, w, block_size, counter) for p, w in terms]
    got = block_sweep_topk(sweeps, k)

    truth: dict[int, float] = {}
    for postings, w in terms:
        for d, tf in postings.items():
            truth[d] = truth.get(d, 0.0) + w * tf * (BM25_K1 + 1.0) / (tf + BM25_K1)
    exp = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert np.allclose([s for _, s in got], [s for _, s in exp], atol=1e-12)


def test_and_matches_bruteforce(bm25, vocabulary):
    for qid, q in make_query_fixtures(vocabulary):
        for k in (1, 10):
            _assert_equal(
                bm25.search_and(q, k), bm25.search_bruteforce_and(q, k),
                f"AND {qid} k={k}",
            )
    hot = vocabulary[:3]
    _assert_equal(
        bm25.search_and(" ".join(hot), 25),
        bm25.search_bruteforce_and(" ".join(hot), 25),
        "AND hot",
    )


def test_and_absent_term_empty(bm25, vocabulary):
    assert len(bm25.search_and(f"{vocabulary[10]} zzzznotaterm", 10)) == 0


def test_and_gap_prune_skips_blocks(bm25_skip):
    """hot AND rare: only the 4 rare docs can match; the gap prune must
    jump the hot list's blocks between them without decoding."""
    q = "common rareterm"
    total = bm25_skip.total_blocks(q)
    before = bm25_skip.blocks_decoded
    got = bm25_skip.search_and(q, 10)
    decoded = bm25_skip.blocks_decoded - before
    assert 0 < decoded < total
    exp = bm25_skip.search_bruteforce_and(q, 10)
    _assert_equal(got, exp, "AND skip query exact")
    assert len(got) == 4  # exactly the seeded rare docs


@settings(max_examples=40, deadline=None)
@given(
    terms=st.lists(
        st.tuples(
            st.dictionaries(
                st.integers(min_value=0, max_value=25),
                st.integers(min_value=1, max_value=5),
                min_size=1,
                max_size=18,
            ),
            st.floats(min_value=0.05, max_value=4.0, allow_nan=False),
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=8),
    block_size=st.integers(min_value=1, max_value=5),
)
def test_block_sweep_and_matches_truth_property(terms, k, block_size):
    from holi_search_engine_spark.plans.compression import BM25_K1
    from holi_search_engine_spark.query.bm25 import block_sweep_topk_and

    counter = [0]
    sweeps = [_make_sweep(p, w, block_size, counter) for p, w in terms]
    got = block_sweep_topk_and(sweeps, k, len(terms))

    common = set(terms[0][0])
    for postings, _ in terms[1:]:
        common &= set(postings)
    truth = {
        d: sum(
            w * p[d] * (BM25_K1 + 1.0) / (p[d] + BM25_K1) for p, w in terms
        )
        for d in common
    }
    exp = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert np.allclose([s for _, s in got], [s for _, s in exp], atol=1e-12)


def test_and_rareish_vs_enormous_routes_to_sweep(bm25_skip):
    """Routing regression (round-2 verdict #5): when the rarest list
    exceeds TAAT_THRESHOLD but the union dwarfs it, search_and must still
    take the gap-pruned sweep (old routing brute-forced on the rarest df
    alone).  Forced here by dropping the threshold below the rare df:
    rarest=4 > threshold=2, union=4100 ≥ 8·rarest → sweep, exact, and
    strictly fewer blocks decoded than the skip-free union."""
    old = bm25_skip.TAAT_THRESHOLD
    bm25_skip.TAAT_THRESHOLD = 2
    try:
        q = "common rareterm"
        total = bm25_skip.total_blocks(q)
        before = bm25_skip.blocks_decoded
        got = bm25_skip.search_and(q, 10)
        decoded = bm25_skip.blocks_decoded - before
        assert 0 < decoded < total, (decoded, total)
        _assert_equal(got, bm25_skip.search_bruteforce_and(q, 10), "exact")
        # single-term conjunctions still route to the vectorized path
        # (no cursor decodes; "common common" dedups to one term)
        before = bm25_skip.blocks_decoded
        bm25_skip.search_and("common common", 5)
        assert bm25_skip.blocks_decoded == before
    finally:
        bm25_skip.TAAT_THRESHOLD = old
