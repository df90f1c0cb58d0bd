"""Dedup-operator tests on a seeded near-dup corpus: LSH parameter
tuning, candidate precision/recall at production signature sizes, and the
heavy-cluster fallback of the n-gram Jaccard path."""

from __future__ import annotations

import random

import pytest

from holi_search_engine_spark.operators.dedup import (
    SHINGLE,
    lsh_near_dup_pairs,
    lsh_params_for_threshold,
    ngram_jaccard_pairs,
    shingles_of,
)


def _shingle_set(text: str, n: int = SHINGLE) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


def _seeded_corpus(n_base: int = 40, n_dups: int = 15, doc_len: int = 60):
    """Deterministic corpus: ``n_base`` random-token docs (pairwise
    Jaccard ~0), plus a near-dup of the first ``n_dups`` (3% of tokens
    perturbed → shingle Jaccard ~0.75)."""
    rng = random.Random(20260817)
    vocab = [f"w{i:04d}" for i in range(3000)]
    rows = []
    for i in range(n_base):
        toks = [rng.choice(vocab) for _ in range(doc_len)]
        rows.append((f"base-{i:03d}", " ".join(toks)))
        if i < n_dups:
            dup = list(toks)
            for _ in range(max(1, doc_len // 33)):
                dup[rng.randrange(doc_len)] = rng.choice(vocab)
            rows.append((f"dup--{i:03d}", " ".join(dup)))
    return rows


def _truth_pairs(rows, threshold: float) -> set[tuple[str, str]]:
    sets = {d: _shingle_set(t) for d, t in rows}
    ids = sorted(sets)
    return {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _jaccard(sets[a], sets[b]) >= threshold
    }


def test_lsh_params_for_threshold_tuning():
    # 128 hashes at a 0.5 target: 32 bands of 4 (midpoint 0.420) beats
    # 16x8 (0.707) and 64x2 (0.125).
    assert lsh_params_for_threshold(0.5, 128) == (32, 4)
    # factorization always holds, and higher thresholds pick wider rows
    for thr in (0.3, 0.5, 0.7, 0.9):
        bands, rows = lsh_params_for_threshold(thr, 128)
        assert bands * rows == 128
    b_lo, r_lo = lsh_params_for_threshold(0.3, 128)
    b_hi, r_hi = lsh_params_for_threshold(0.9, 128)
    assert r_lo < r_hi  # steeper curve for stricter thresholds


def test_lsh_near_dup_precision_recall(spark):
    rows = _seeded_corpus()
    truth = _truth_pairs(rows, 0.5)
    assert len(truth) == 15  # exactly the seeded dup pairs
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in lsh_near_dup_pairs(docs, n_hashes=128, threshold=0.5).collect()
    }
    # exact verification makes precision 1.0 by construction
    assert got <= truth
    # 128-hash banding at s~0.75: per-pair miss probability < 1e-3
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}: {truth - got}"


def test_lsh_candidate_precision(spark):
    # unrelated random docs share no shingles; candidates should be
    # (almost) only the true near-dups, so verification work is bounded
    rows = _seeded_corpus()
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    from holi_search_engine_spark.operators.dedup import lsh_candidate_pairs

    cands = lsh_candidate_pairs(shingles_of(docs), 128, 32, 4).count()
    truth = _truth_pairs(rows, 0.5)
    assert cands <= 2 * len(truth)


def test_ngram_heavy_cluster_fallback(spark):
    # a 12-doc near-identical cluster: every shingle has df > cap=10, so
    # the capped (oracle) variant finds nothing; the star fallback
    # surfaces every member via the hub doc
    base = " ".join(f"tok{i:03d}" for i in range(40))
    rows = [(f"c{i:02d}", base + f" tail{i}") for i in range(12)]
    rows += [(f"solo{i}", " ".join(f"z{i}x{j}" for j in range(40))) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    capped = ngram_jaccard_pairs(docs, heavy_fallback=False)
    assert capped.count() == 0

    surfaced = ngram_jaccard_pairs(docs, heavy_fallback=True)
    got = {(r.doc_a, r.doc_b) for r in surfaced.collect()}
    hub_pairs = {("c00", f"c{i:02d}") for i in range(1, 12)}
    assert hub_pairs <= got
    assert all(a.startswith("c") and b.startswith("c") for a, b in got)


def _py_embedding_pairs(rows, dims, planes, cos_min):
    """Pure-Python oracle of the embedding-cosine near-dup algorithm:
    same md5 feature hash, same ±1 planes, same bucket packing, same
    round-6 cosine — asserts the Spark plan is bit-exact, not just close."""
    import hashlib
    import math

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    w = [
        [1.0 if h32(f"{j}:{d}") & 1 else -1.0 for d in range(dims)]
        for j in range(planes)
    ]
    vecs, buckets = {}, {}
    for doc_id, text in rows:
        v = [0] * dims
        for t in text.split():
            v[h32(t) % dims] += 1
        vecs[doc_id] = v
        b = 0
        for j in range(planes):
            if sum(x * y for x, y in zip(v, w[j])) > 0:
                b |= 1 << (planes - 1 - j)
        buckets[doc_id] = b
    out = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b_ in ids[i + 1 :]:
            if buckets[a] != buckets[b_]:
                continue
            va, vb = vecs[a], vecs[b_]
            dot = sum(x * y for x, y in zip(va, vb))
            cos = round(
                dot
                / (
                    math.sqrt(sum(x * x for x in va))
                    * math.sqrt(sum(x * x for x in vb))
                ),
                6,
            )
            if cos >= cos_min:
                out.add((a, b_, cos))
    return out


def test_embedding_near_dup_bit_exact(spark):
    from holi_search_engine_spark.operators.dedup import (
        EMB_DIMS,
        EMB_PLANES,
        embedding_near_dup_pairs,
    )

    rows = _seeded_corpus()
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.doc_a, r.doc_b, r.cosine)
        for r in embedding_near_dup_pairs(docs, cos_min=0.9).collect()
    }
    expect = _py_embedding_pairs(rows, EMB_DIMS, EMB_PLANES, 0.9)
    assert got == expect
    # precision vs the seeded truth: bag-of-words cosine between
    # unrelated 60-token docs over 64 hashed dims sits near 0.5, the
    # seeded 3%-perturbed dups near 0.97 — every surfaced pair must be a
    # seeded (base, dup) pair, and the single-band 8-plane bucketing
    # must surface at least one
    assert len(got) >= 1
    for a, b, _ in got:
        assert a.replace("base-", "") == b.replace("dup--", ""), (a, b)


def test_embedding_near_dup_empty_docs_excluded(spark):
    # two empty docs share bucket 0 with cosine 0/0 = NaN; Spark orders
    # NaN above every double, so without the norm guard they would pair
    from holi_search_engine_spark.operators.dedup import embedding_near_dup_pairs

    rows = [("e1", ""), ("e2", "   "), ("d1", "x y z x"), ("d2", "x y z x")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r.doc_a, r.doc_b) for r in embedding_near_dup_pairs(docs, cos_min=0.9).collect()}
    assert got == {("d1", "d2")}


def test_connected_components_two_clusters(spark):
    # two components: a 4-node chain (a-b-c-d) whose min label must
    # propagate the full diameter, and a 2-node pair; a singleton edge
    # endpoint keeps its own label
    from holi_search_engine_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("a", "b"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }


def test_connected_components_empty(spark):
    from holi_search_engine_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(pairs).count() == 0


def test_lsh_hashed_join_matches_string_join(spark):
    """The candidate self-join keys on the portable 60-bit signature hash;
    on collision-free data (certain at this size) it must produce exactly
    the pairs a band-signature STRING join produces."""
    from pyspark.sql import functions as F

    from holi_search_engine_spark.operators.dedup import (
        _minhash_wide,
        lsh_candidate_pairs,
        shingles_of,
    )

    rows = _seeded_corpus()
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    sh = shingles_of(docs)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sh, 16, 8, 2).collect()
    }

    wide = _minhash_wide(sh, 16)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",", *[F.col(f"_m{j}").cast("string") for j in range(2 * b, 2 * b + 2)]
            ).alias("band_sig"),
        )
        for b in range(8)
    ]
    banded = wide.select("doc_id", F.explode(F.array(*band_structs)).alias("_bs")).select(
        "doc_id", "_bs.band", "_bs.band_sig"
    )
    a, b = banded.alias("a"), banded.alias("b")
    want = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert got == want and len(want) > 0


def test_shingle_hash_spark_duckdb_twin_adversarial(spark):
    """The 62-bit generation-time shingle hash must be bit-identical
    between :func:`shingles_of` and the DuckDB ``shingles_sql`` CTE on
    adversarial inputs — unicode tokens, repeated tokens (in-doc dedup),
    exactly-k / k-1 token docs, empty and whitespace-only text, and a
    pathological 1000-char token.  A divergence here silently desyncs
    every dedup/curation oracle downstream."""
    import duckdb
    import pandas as pd

    from holi_search_engine_spark.operators.dedup import shingles_sql

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "a a a a a a a a"),  # repeated token: one distinct shingle
        (3, "один два три четыре五 六 七"),  # unicode + mixed scripts
        (4, " ".join(f"t{i}" for i in range(SHINGLE))),  # exactly k -> one
        (5, " ".join(f"t{i}" for i in range(SHINGLE - 1))),  # k-1 -> none
        (6, ""),  # empty text
        (7, "   "),  # whitespace only
        (8, "x" * 1000 + " y z w v u"),  # pathological long token
        (9, "Tab\tand  double  space mixed\nnewline tokens here"),
        (10, "punct, tokens! with? marks; and:colons end."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.shingle) for r in shingles_of(docs).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        (int(a), int(b))
        for a, b in con.execute(
            f"WITH {shingles_sql()} SELECT doc_id, shingle FROM shingles"
        ).fetchall()
    }
    assert got == want
    # sanity on the shape itself, not just twin agreement
    assert {d for d, _ in got} == {1, 2, 3, 4, 8, 9, 10}
    assert len({s for d, s in got if d == 2}) == 1  # in-doc dedup collapses
    assert all(0 <= s < 1 << 62 for _, s in got)


def test_minhash_k128_spark_duckdb_twin(spark):
    """Production-signature-size (k=128) MinHash twin: the wide Spark
    aggregate must match the DuckDB affine-family CTE hash-for-hash on a
    small corpus — the driver oracle only exercises k=8, so this is the
    one place the 128-coefficient family itself is cross-engine checked."""
    import duckdb
    import pandas as pd

    from holi_search_engine_spark.operators.dedup import (
        _minhash_sql,
        _minhash_wide,
        shingles_of,
        shingles_sql,
    )

    rows = _seeded_corpus(n_base=12, n_dups=4, doc_len=30)
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    wide = _minhash_wide(shingles_of(docs), 128).collect()
    got = {
        (r["doc_id"], j, r[f"_m{j}"]) for r in wide for j in range(128)
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        (d, int(j), int(m))
        for d, j, m in con.execute(
            f"WITH {shingles_sql(src='documents')}, {_minhash_sql(128)} "
            "SELECT doc_id, j, minhash FROM mh"
        ).fetchall()
    }
    assert got == want and len(got) == 16 * 128
