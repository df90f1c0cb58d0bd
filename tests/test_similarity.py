"""ANN/IVF: k-means centroid training recovers seeded cluster structure,
and k-means-IVF search matches brute-force cosine top-k on it."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clustered(spark):
    """4 well-separated 8-dim clusters x 40 vectors, seeded."""
    rng = np.random.default_rng(20260817)
    centers = np.eye(4, 8, dtype=np.float64) * 10.0
    vecs, labels = [], []
    for c in range(4):
        pts = centers[c] + rng.normal(0, 0.5, size=(40, 8))
        vecs.append(pts)
        labels.extend([c] * 40)
    mat = np.vstack(vecs)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, mat, np.array(labels)


def test_kmeans_recovers_clusters(clustered):
    from holi_search_engine_spark.operators.similarity import (
        _assign_nearest,
        kmeans_centroids,
    )

    df, _mat, labels = clustered
    cent = kmeans_centroids(df, k=4, iters=4)
    assert cent.count() == 4
    got = _assign_nearest(df, cent).select("vec_id", "cid").toPandas()
    got["label"] = labels[got["vec_id"].to_numpy()]
    # every learned cell is pure: one true cluster per cid
    purity = got.groupby("cid")["label"].agg(
        lambda s: s.value_counts().iloc[0] / len(s)
    )
    assert (purity >= 0.95).all(), purity.to_dict()


def test_ivf_kmeans_matches_bruteforce(clustered):
    from holi_search_engine_spark.operators.similarity import ann_ivf_topk_kmeans

    df, mat, _labels = clustered
    q = 7  # a vector inside cluster 0
    sims = (mat @ mat[q]) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[q])
    )
    truth = set(sorted(range(len(mat)), key=lambda i: (-round(sims[i], 6), i))[:10])
    got = ann_ivf_topk_kmeans(df, query_vec_id=q, k_cells=4, nprobe=2, top_k=10)
    got_ids = [r.vec_id for r in got.collect()]
    assert len(got_ids) == 10
    recall = len(set(got_ids) & truth) / 10
    assert recall >= 0.9, (sorted(got_ids), sorted(truth))


def test_assign_nearest_null_and_ragged_rows(spark):
    """Rows the matmul kernel cannot stack — NULL embeddings, wrong-length
    arrays, null elements — must fall to the smallest cid (the expression
    form's null-cosine sentinel path), not crash the job; an empty
    centroid frame yields an empty assignment."""
    from pyspark.sql import functions as F

    from holi_search_engine_spark.operators.similarity import _assign_nearest

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, None),               # NULL embedding
            (2, [1.0, 0.0]),         # ragged length
            (3, [0.0, 0.0, 0.0]),    # zero norm
            (4, [1.0, None, 0.0]),   # null element
            (5, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0]), (9, [0.0, 1.0, 0.0])],
        "cid long, cvec array<float>",
    )
    got = {r["vec_id"]: r["cid"] for r in _assign_nearest(emb, cent).collect()}
    assert got == {0: 7, 1: 7, 2: 7, 3: 7, 4: 7, 5: 9}
    empty = cent.where(F.lit(False))
    assert _assign_nearest(emb, empty).count() == 0


def test_assign_nearest_matches_bruteforce_random(spark):
    """Property check on seeded random data: the Arrow matmul kernel's
    assignment equals an independent per-row brute force applying the
    documented rules — float64 cosine rounded to 6dp, argmax with
    smallest-cid tie-break, zero-norm rows/centroids to the sentinel.

    INTENTIONALLY UNTESTED: the kernel's documented rounding-mode
    divergence from Spark's round() (numpy half-to-even vs Spark HALF_UP)
    on a cosine landing EXACTLY on a 0.5e-6 boundary.  This oracle uses
    Python round() (also half-to-even), so it cannot detect it; crafting
    a float32-ingested vector pair whose cosine (a quotient involving a
    sqrt) is exactly representable at a x.xxxxxx5 decimal boundary is not
    meaningfully constructible, and the divergence is measure-zero for
    real-valued embeddings (see the _assign_nearest docstring; the driver
    contract gate cross-checks the DuckDB oracle end-to-end)."""
    from holi_search_engine_spark.operators.similarity import _assign_nearest

    rng = np.random.default_rng(7)
    for trial in range(3):
        n, k, dim = 200, 7, 5
        mat = rng.integers(-3, 4, size=(n, dim)).astype(np.float64)
        mat[rng.integers(0, n, 5)] = 0.0  # some zero-norm rows
        cmat = rng.integers(-3, 4, size=(k, dim)).astype(np.float64)
        cmat[0] = 0.0  # one zero-norm centroid
        cids = sorted(int(c) for c in rng.choice(1000, size=k, replace=False))
        emb = spark.createDataFrame(
            [(i, [float(x) for x in mat[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        cent = spark.createDataFrame(
            [(cids[j], [float(x) for x in cmat[j]]) for j in range(k)],
            "cid long, cvec array<float>",
        )
        got = {r["vec_id"]: r["cid"] for r in _assign_nearest(emb, cent).collect()}

        # independent brute force — float32 ingest like the Spark schema
        m32 = mat.astype(np.float32).astype(np.float64)
        c32 = cmat.astype(np.float32).astype(np.float64)
        for i in range(n):
            best = (-2.0, None)
            for j in range(k):
                na, nb = np.linalg.norm(m32[i]), np.linalg.norm(c32[j])
                sim = -1.5 if na * nb == 0 else round(
                    float(m32[i] @ c32[j] / (na * nb)), 6
                )
                if sim > best[0]:
                    best = (sim, cids[j])
            assert got[i] == best[1], (trial, i, got[i], best)


def test_ann_knn_join_matches_bruteforce(spark):
    """Property check: the IVF kNN JOIN (batch form) equals an
    independent numpy brute force applying the documented rules — corpus
    assigned to argmax-round6-min-cid cells, each query probing its
    nprobe stable-top cells, candidates restricted to those cells,
    pairs with undefined cosine omitted, top-k by (cosine desc, vec_id
    asc).  Includes zero-norm corpus/query vectors, a zero-norm
    centroid, and the exclude_self kNN-graph mode."""
    import numpy as np
    import pandas as pd

    from holi_search_engine_spark.operators.similarity import ann_knn_join

    rng = np.random.default_rng(31)
    n, m, dim, kc, nprobe, k = 300, 40, 8, 6, 3, 5
    mat = rng.integers(-3, 4, size=(n, dim)).astype(np.float64)
    mat[rng.integers(0, n, 6)] = 0.0
    cmat = rng.integers(-3, 4, size=(kc, dim)).astype(np.float64)
    cmat[0] = 0.0
    cids = sorted(int(c) for c in rng.choice(100, size=kc, replace=False))

    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [list(map(float, v)) for v in mat]}
        ),
        "vec_id long, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in zip(cids, cmat)],
        "cid long, cvec array<float>",
    )
    q_ids = np.sort(rng.choice(n, size=m, replace=False))
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": q_ids,
                "embedding": [list(map(float, mat[i])) for i in q_ids],
            }
        ),
        "vec_id long, embedding array<float>",
    )

    # float32 ingestion round-trip, as Spark stores array<float>
    mat32 = mat.astype(np.float32).astype(np.float64)
    cmat32 = cmat.astype(np.float32).astype(np.float64)

    def sims_vs_cents(rows):
        rn = np.sqrt((rows * rows).sum(axis=1))
        cn = np.sqrt((cmat32 * cmat32).sum(axis=1))
        denom = rn[:, None] * cn[None, :]
        s = np.full(denom.shape, -1.5)
        np.divide(rows @ cmat32.T, denom, out=s, where=denom > 0)
        s[~np.isfinite(s)] = -1.5
        return np.round(s, 6)

    cid_arr = np.asarray(cids, dtype=np.int64)
    assign = cid_arr[np.argmax(sims_vs_cents(mat32), axis=1)]
    probe_cells = cid_arr[
        np.argsort(-sims_vs_cents(mat32[q_ids]), axis=1, kind="stable")[:, :nprobe]
    ]

    for excl, salt in ((False, 1), (True, 1), (False, 4), (True, 3)):
        got = (
            ann_knn_join(emb, queries, cent, nprobe=nprobe, top_k=k,
                         exclude_self=excl, cell_salt=salt)
            .toPandas()
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True])
            .reset_index(drop=True)
        )
        exp_rows = []
        for qi, qid in enumerate(q_ids):
            cand = np.where(np.isin(assign, probe_cells[qi]))[0]
            if excl:
                cand = cand[cand != qid]
            qv = mat32[qid]
            qn = np.sqrt((qv * qv).sum())
            cn = np.sqrt((mat32[cand] * mat32[cand]).sum(axis=1))
            denom = qn * cn
            s = np.full(len(cand), -np.inf)
            np.divide(mat32[cand] @ qv, denom, out=s, where=denom > 0)
            s[~np.isfinite(s)] = -np.inf
            s = np.round(s, 6)
            keep = np.isfinite(s)
            cand, s = cand[keep], s[keep]
            order = np.lexsort((cand, -s))[:k]
            for ci, sc in zip(cand[order], s[order]):
                exp_rows.append((int(qid), int(ci), float(sc)))
        exp = pd.DataFrame(exp_rows, columns=["query_id", "vec_id", "cosine"])
        assert len(got) == len(exp), (excl, salt, len(got), len(exp))
        assert list(got["query_id"]) == list(exp["query_id"]), excl
        assert list(got["vec_id"]) == list(exp["vec_id"]), excl
        assert np.allclose(got["cosine"], exp["cosine"], atol=0), excl


def test_ann_knn_join_overlength_vector_does_not_poison_cell(spark):
    """Regression: validity is pinned to the QUANTIZER's dimension.  A
    single over-length malformed corpus vector used to raise the
    kernel's per-cell max-length dim, invalidating every well-formed
    vector and probe in its cell and silently dropping all of that
    cell's candidates.  The join over a corpus with one dim-6 row among
    dim-4 rows must equal the join over the same corpus without it."""
    import numpy as np
    import pandas as pd

    from holi_search_engine_spark.operators.similarity import ann_knn_join

    rng = np.random.default_rng(5)
    mat = rng.integers(-3, 4, size=(20, 4)).astype(float)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    bad = (99, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    schema = "vec_id long, embedding array<float>"
    clean = spark.createDataFrame(rows, schema)
    dirty = spark.createDataFrame(rows + [bad], schema)
    cent = spark.createDataFrame(
        [(0, [float(x) for x in mat[0]]), (1, [float(x) for x in mat[7]])],
        "cid long, cvec array<float>",
    )
    queries = spark.createDataFrame(rows[:5], schema)
    a = (
        ann_knn_join(clean, queries, cent, nprobe=1, top_k=3)
        .toPandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    b = (
        ann_knn_join(dirty, queries, cent, nprobe=1, top_k=3)
        .toPandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
