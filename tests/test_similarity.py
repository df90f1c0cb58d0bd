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
