"""Similarity search over the ``embeddings`` table (``vec_id,
embedding: array<float>, label``): brute-force cosine top-k as the exact
baseline, and a sign-bit LSH bucketing as the sublinear scale path.

Scale shape: brute-force is one map-only pass (vector math in Catalyst
higher-order functions, no shuffle) + a global top-k (tree-aggregated
TakeOrdered, not a full sort).  The LSH variant buckets vectors once
(map-only) and restricts candidate scoring to the probe's bucket."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load, portable_hash32, portable_hash32_sql

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

QUERY_VEC_ID = 0
TOP_K = 10
LSH_PLANES = 8


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    # try_divide, not `/`: under Spark 4's default ANSI mode a plain
    # division THROWS on a zero-norm vector instead of yielding the null
    # every caller's coalesce/filter branch is written for
    return F.try_divide(dot, na * nb)


@q(
    "ann_cosine_topk",
    f"""
    WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], qv.embedding::DOUBLE[]), 6)
             AS cosine
    FROM embeddings e, qv
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k vs a fixed probe vector — JVM-side
    ``zip_with``/``aggregate`` vector math, no UDF."""
    emb = load(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("probe")
    )
    return (
        emb.crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("probe")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@q(
    "ann_lsh_topk",
    f"""
    WITH grid AS (
      SELECT p.range::INT AS j, u.dim::INT AS dim
      FROM range({LSH_PLANES}) p,
           (SELECT unnest(range(0, len(embedding))) AS dim
            FROM (SELECT embedding FROM embeddings LIMIT 1)) u
    ),
    planes AS (
      SELECT j, list(CASE WHEN {portable_hash32_sql("j::VARCHAR || ':' || dim::VARCHAR")} & 1 = 1
                          THEN 1.0 ELSE -1.0 END ORDER BY dim) AS w
      FROM grid GROUP BY j
    ),
    bits AS (
      SELECT e.vec_id, e.embedding, p.j,
             CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.w::DOUBLE[]) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings e, planes p
    ),
    buckets AS (
      SELECT vec_id, any_value(embedding) AS embedding,
             sum(bit << ({LSH_PLANES - 1} - j))::BIGINT AS bucket
      FROM bits GROUP BY vec_id
    ),
    probe AS (SELECT bucket AS pb, embedding AS pv FROM buckets
              WHERE vec_id = {QUERY_VEC_ID})
    SELECT b.vec_id, b.bucket,
           round(list_cosine_similarity(b.embedding::DOUBLE[], probe.pv::DOUBLE[]), 6)
             AS cosine
    FROM buckets b, probe WHERE b.bucket = probe.pb
    ORDER BY cosine DESC, b.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH: 8 pseudo-random ±1 hyperplanes (deterministic from the
    portable hash of (plane, dim)); vectors sharing the probe's bucket are
    scored exactly.  Recall < 1 by construction — the scale path answer.
    Falls back to brute force within the bucket.  The DuckDB oracle
    reproduces the planes from the same md5 parity, so the sign bits (and
    hence buckets) are portable: each ±1·float32 product is exact in
    double, leaving sign agreement down to summation rounding on a
    |dot| ~ √dims quantity — no observed flips on the deterministic
    test data."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).first()["d"]
    # ±1 plane weights, deterministic: parity of portable_hash32(f"{j}:{d}")
    planes = (
        spark.range(LSH_PLANES)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(dims).select(F.col("id").cast("int").alias("d")))
        .select(
            "j",
            "d",
            F.when(
                portable_hash32(
                    F.concat(F.col("j").cast("string"), F.lit(":"), F.col("d").cast("string"))
                ).bitwiseAND(F.lit(1))
                == 1,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("w"),
        )
        .groupBy("j")
        .agg(F.sort_array(F.collect_list(F.struct("d", "w"))).alias("ws"))
        .select("j", F.transform("ws", lambda s: s.w).alias("w"))
    )

    with_bits = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "embedding",
            "j",
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding"), F.col("w"), lambda x, y: x.cast("double") * y
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy("vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", "bit"))), lambda s: s.bit
                ),
                F.lit(0).cast("long"),
                lambda acc, b: acc * 2 + b,
            ).alias("bucket"),
            F.first("embedding").alias("embedding"),
        )
    )
    probe = with_bits.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("probe_bucket"), F.col("embedding").alias("probe")
    )
    return (
        with_bits.join(
            F.broadcast(probe), F.col("bucket") == F.col("probe_bucket")
        )
        .select(
            "vec_id",
            "bucket",
            F.round(_cosine(F.col("embedding"), F.col("probe")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


IVF_CELLS = 16
IVF_NPROBE = 4


@q(
    "ann_ivf_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
                  FROM embeddings WHERE vec_id < {IVF_CELLS}),
    qv AS (SELECT embedding AS probe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]), 6) AS sim
      FROM embeddings e, cent c
    ),
    best AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        FROM assign
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT c.cid FROM cent c, qv
      ORDER BY round(list_cosine_similarity(c.cvec::DOUBLE[], qv.probe::DOUBLE[]), 6)
               DESC, c.cid
      LIMIT {IVF_NPROBE}
    )
    SELECT b.vec_id,
           round(list_cosine_similarity(b.embedding::DOUBLE[], qv.probe::DOUBLE[]), 6)
             AS cosine
    FROM best b JOIN qcells q ON b.cid = q.cid, qv
    ORDER BY cosine DESC, b.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization, oracle entry: DETERMINISTIC centroids (the
    first ``IVF_CELLS`` vectors) so the DuckDB twin is expressible; the
    production path trains real centroids with :func:`kmeans_centroids`
    and runs the identical search body (:func:`_ivf_search`).  Each vector
    is assigned to its nearest centroid once (map-only vs a broadcast
    centroid table), the query probes its ``IVF_NPROBE`` nearest cells and
    re-ranks exactly inside them.  At scale the assignment is written
    bucketed by ``cid`` so a probe prunes to nprobe/cells of the corpus.
    Similarities are rounded to 6dp before the argmin so both engines
    break near-ties identically."""
    emb = load(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return _ivf_search(emb, cent, QUERY_VEC_ID, IVF_NPROBE, TOP_K)


def _centroid_matrix(cent: DataFrame):
    """Collect the centroid table driver-side ONCE (bounded — the IVF
    cell count) and build the shared matmul operands: ``(C, cids, cnorm,
    dim)``, or None for an empty table.  cid normalized to long: callers
    hand int cids (k-means init) or long cids (hash-seed oracle path
    where cid aliases vec_id).  None / null-element / length-mismatched
    centroid vectors become NaN rows: their denom is NaN, every sim
    stays at the sentinel, and they can win only the all-sentinel tie —
    exactly the expression form's null-cosine path."""
    import numpy as np

    crows = sorted(
        cent.select(F.col("cid").cast("long"), "cvec").collect(),
        key=lambda r: r[0],
    )
    if not crows:
        return None
    dim = max((len(r[1]) for r in crows if r[1] is not None), default=0)
    C = np.vstack(
        [
            np.asarray(r[1], dtype=np.float64)
            if r[1] is not None and len(r[1]) == dim
            else np.full(dim, np.nan)
            for r in crows
        ]
    ) if dim else np.zeros((len(crows), 0))
    cids = np.asarray([r[0] for r in crows], dtype=np.int64)
    cnorm = np.sqrt((C * C).sum(axis=1))
    return C, cids, cnorm, dim


def _assign_nearest(emb: DataFrame, cent: DataFrame, cmat=None) -> DataFrame:
    """(vec_id, embedding, cid): each vector's nearest centroid, fully
    MAP-SIDE: the k centroids are collected driver-side (bounded — k is
    the IVF cell count, ≤ a few thousand rows; the same class of
    documented tiny driver materialization as a broadcast-join build
    side) and shipped in the closure of an Arrow-batched mapInPandas
    kernel that computes the whole batch's cosines as ONE numpy matmul
    and takes the argmax of round(cosine, 6) with the smallest-cid
    tie-break.

    Why a Python kernel when `zip_with`/`aggregate` can express it:
    dense argmax-over-centroids is BLAS-shaped work, and Catalyst's
    higher-order folds evaluate per element with no SIMD — the
    expression form measured 34 s for 300k×64 vectors × 64 cells on 32
    cores vs 4 s for the numpy matmul, and the gap widens with k·dim.
    The kernel is map-side (no shuffle, no row amplification): the old
    crossJoin-to-n·k-rows + window shape pushed ~40 GB through an
    exchange at 1.3M vectors × 64 cells.

    Semantics match the expression form bit-for-bit on every tested
    input: cosine in float64, rounded to 6dp; ties → smallest cid;
    zero-norm vectors (null cosine) fall to the smallest cid; an empty
    centroid frame yields an empty assignment.  (numpy rounds
    half-to-even where Spark rounds half-up — a divergence only for a
    cosine EXACTLY on a 0.5e-6 boundary, measure-zero for real-valued
    embeddings; the driver contract gate re-verifies the oracle match.)
    """
    import numpy as np
    import pandas as pd

    if cmat is None:
        cmat = _centroid_matrix(cent)
    if cmat is None:
        return (
            emb.select("vec_id", "embedding")
            .withColumn("cid", F.lit(None).cast("long"))
            .where(F.lit(False))
        )
    C, cids, cnorm, dim = cmat

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            embs = pdf["embedding"].to_numpy()
            # null or length-mismatched embeddings: the expression form's
            # zip_with gave them a null cosine against EVERY centroid →
            # sentinel everywhere → smallest cid; keep them out of the
            # matmul and leave their idx at 0 (cids is cid-ascending)
            valid = np.array(
                [e is not None and len(e) == dim for e in embs], dtype=bool
            )
            idx = np.zeros(len(embs), dtype=np.int64)
            if valid.any():
                E = np.vstack(
                    [np.asarray(e, dtype=np.float64) for e in embs[valid]]
                )
                enorm = np.sqrt((E * E).sum(axis=1))
                denom = enorm[:, None] * cnorm[None, :]
                # zero/NaN norm → null cosine in the expression form →
                # -1.5 sentinel: beats nothing real, so the row falls to
                # the first (smallest) cid, as before
                sims = np.full(denom.shape, -1.5)
                np.divide(E @ C.T, denom, out=sims, where=denom > 0)
                sims[~np.isfinite(sims)] = -1.5  # null elements → NaN dot
                idx[valid] = np.argmax(np.round(sims, 6), axis=1)  # 1st = min cid
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "embedding": pdf["embedding"],
                    "cid": cids[idx],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, embedding array<float>, cid long"
    )


def _ivf_search(
    emb: DataFrame, cent: DataFrame, query_vec_id: int, nprobe: int, top_k: int
) -> DataFrame:
    best = _assign_nearest(emb, cent)
    qv = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("probe")
    )
    qcells = (
        cent.crossJoin(F.broadcast(qv))
        .select(
            "cid", F.round(_cosine(F.col("cvec"), F.col("probe")), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), "cid")
        .limit(nprobe)
        .select("cid")
    )
    return (
        best.join(F.broadcast(qcells), "cid")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("probe")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(top_k)
    )


def _kcenter_init(emb: DataFrame, k: int) -> DataFrame:
    """Deterministic farthest-point (greedy k-center) seeding over a
    hash-ordered sample — the k-means++-quality init with no RNG.  One
    Spark pass takes the sample (smallest portable hashes); the greedy
    selection runs driver-side in numpy over that bounded sample, then
    the k seeds broadcast back.  Hash-only seeding can land two seeds in
    one true cluster and strand Lloyd's in a local optimum; spreading
    seeds by cosine distance avoids exactly that."""
    import numpy as np

    h = portable_hash32(F.col("vec_id").cast("string"))
    n_sample = max(64 * k, 256)
    sample = (
        emb.select("vec_id", "embedding", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_sample)
        .toPandas()
    )
    if not len(sample):
        return emb.sparkSession.createDataFrame([], "cid int, cvec array<float>")
    mat = np.array(sample["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    chosen = [0]  # smallest hash
    min_sim = unit @ unit[0]
    min_sim[0] = np.inf  # mask chosen rows: with all-duplicate/colinear
    # samples every remaining min_sim is 1.0 and argmin would re-pick an
    # already-chosen index, silently emitting duplicate centroids
    for _ in range(1, min(k, len(mat))):
        nxt = int(np.argmin(min_sim))  # farthest by cosine; ties → first row
        if min_sim[nxt] == np.inf:  # every sample row already chosen
            break
        chosen.append(nxt)
        min_sim = np.maximum(min_sim, unit @ unit[nxt])
        min_sim[np.asarray(chosen)] = np.inf
    spark = emb.sparkSession
    return spark.createDataFrame(
        [
            (i, [float(x) for x in mat[c].astype(np.float32)])
            for i, c in enumerate(chosen)
        ],
        "cid int, cvec array<float>",
    )


def kmeans_centroids(
    emb: DataFrame, k: int = IVF_CELLS, iters: int = 5, init: str = "kcenter"
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the
    production IVF coarse quantizer (the oracle entry's first-k centroids
    are a determinism device, not a quantizer).

    Deterministic init, two flavors: ``"kcenter"`` (default) spreads
    seeds by farthest-point over a hash-ordered sample
    (:func:`_kcenter_init` — the production-quality choice); ``"hash"``
    takes the k vectors with the smallest portable hash — weaker seeding,
    but exactly expressible in the DuckDB oracle (``ann_ivf_topk_kmeans``
    pins it).  Each iteration is one ZERO-SHUFFLE assignment (a
    numpy-matmul argmax over the closure-shipped centroid matrix —
    :func:`_assign_nearest`) plus one elementwise-mean update via
    ``posexplode → groupBy(cid, pos)`` — n·dim scalar rows through a
    map-side-combined aggregation, the textbook Spark k-means shape.
    Centroids are ``localCheckpoint``-ed per iteration to cut lineage
    growth.  Empty cells simply drop (k shrinks), which IVF tolerates.

    Portability choices shared with the DuckDB twin (``_kmeans_sql``):
    the md5-derived portable hash, 6dp-rounded assignment argmins, and
    float32-cast centroid means — absorbing cross-engine summation-order
    drift below float32 epsilon so the pinned-iteration oracle stays
    hash-identical.

    EAGER: calling this runs Spark jobs immediately (each iteration's
    assignment collects the current centroids driver-side for the matmul
    closure, and ``localCheckpoint`` materializes per iteration) — it is
    a training procedure that RETURNS a small result frame, not a lazy
    plan to compose.  Same for :func:`ann_ivf_topk_kmeans`, which calls
    it."""
    from pyspark.sql import Window

    if init == "kcenter":
        cent = _kcenter_init(emb, k).localCheckpoint()
    else:
        h = portable_hash32(F.col("vec_id").cast("string"))
        # vec_id tie-break: a 32-bit hash collision would otherwise make
        # seed membership/numbering engine-arbitrary vs the DuckDB twin
        seeds = (
            emb.select("vec_id", "embedding", h.alias("h"))
            .orderBy("h", "vec_id")
            .limit(k)
        )
        cent = seeds.select(
            (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).alias("cid"),
            F.col("embedding").alias("cvec"),
        ).localCheckpoint()
    for _ in range(iters):
        best = _assign_nearest(emb, cent)
        cent = (
            best.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select(
                "cid",
                F.transform("s", lambda t: t.m.cast("float")).alias("cvec"),
            )
            .localCheckpoint()
        )
    return cent


def ann_ivf_topk_kmeans(
    emb: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    k_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    top_k: int = TOP_K,
    iters: int = 5,
    init: str = "kcenter",
) -> DataFrame:
    """Production IVF: k-means-trained centroids + the shared search body.

    EAGER (see :func:`kmeans_centroids`): training runs Spark jobs at
    call time; only the returned top-k frame itself is lazy."""
    cent = kmeans_centroids(emb, k_cells, iters, init=init)
    return _ivf_search(emb, cent, query_vec_id, nprobe, top_k)


KMEANS_ORACLE_ITERS = 2  # pinned so the DuckDB twin can unroll the loop


def _kmeans_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as plain CTEs (``cent0`` … ``cent{n}``)
    — the same pinned-iteration determinism trick as ``graph_pagerank``.
    Each iteration: 6dp-rounded argmin assignment, elementwise mean per
    (cid, pos) via lateral unnest+subscripts, mean cast to float32."""
    h = portable_hash32_sql("vec_id::VARCHAR")
    parts = [
        f"""seeds AS (
      SELECT vec_id, embedding, {h} AS h FROM embeddings
      ORDER BY h, vec_id LIMIT {k}
    ),
    cent0 AS (
      SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
             embedding AS cvec
      FROM seeds
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""assign{i} AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              c.cvec::DOUBLE[]), 6) DESC,
                 c.cid) AS rn
        FROM embeddings e, cent{i - 1} c
      ) WHERE rn = 1
    ),
    cent{i} AS (
      SELECT cid, list(m::FLOAT ORDER BY pos) AS cvec FROM (
        SELECT a.cid, u.pos, avg(u.x) AS m
        FROM assign{i} a,
             (SELECT unnest(a.embedding) AS x,
                     generate_subscripts(a.embedding, 1) AS pos) u
        GROUP BY a.cid, u.pos
      ) GROUP BY cid
    )"""
        )
    return ",\n    ".join(parts)


@q(
    "ann_ivf_topk_kmeans",
    f"""
    WITH {_kmeans_sql(IVF_CELLS, KMEANS_ORACLE_ITERS)},
    qv AS (SELECT embedding AS probe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    best AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              c.cvec::DOUBLE[]), 6) DESC,
                 c.cid) AS rn
        FROM embeddings e, cent{KMEANS_ORACLE_ITERS} c
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT c.cid FROM cent{KMEANS_ORACLE_ITERS} c, qv
      ORDER BY round(list_cosine_similarity(c.cvec::DOUBLE[], qv.probe::DOUBLE[]), 6)
               DESC, c.cid
      LIMIT {IVF_NPROBE}
    )
    SELECT b.vec_id,
           round(list_cosine_similarity(b.embedding::DOUBLE[], qv.probe::DOUBLE[]), 6)
             AS cosine
    FROM best b JOIN qcells q ON b.cid = q.cid, qv
    ORDER BY cosine DESC, b.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_ivf_topk_kmeans_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION IVF path as a driver-checked entry: real
    :func:`kmeans_centroids` training (deterministic portable-hash init)
    at the pinned ``KMEANS_ORACLE_ITERS`` iteration count, then the shared
    :func:`_ivf_search` body — hash-matched against a full DuckDB twin
    that unrolls the same Lloyd's iterations."""
    emb = load(spark, sf_dir, "embeddings")
    return ann_ivf_topk_kmeans(emb, iters=KMEANS_ORACLE_ITERS, init="hash")


PAIR_LIMIT = 300  # pairwise over a bounded slice — at scale this runs per LSH bucket
PAIR_THRESHOLD = 0.35


@q(
    "ann_pairwise_label",
    f"""
    SELECT e1.label AS label_a, e2.label AS label_b, count(*) AS n
    FROM embeddings e1 JOIN embeddings e2
      ON e1.vec_id < e2.vec_id
    WHERE e1.vec_id < {PAIR_LIMIT} AND e2.vec_id < {PAIR_LIMIT}
      AND list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[])
          > {PAIR_THRESHOLD}
    GROUP BY e1.label, e2.label
    """,
)
def ann_pairwise_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs aggregated by label pair.  Quadratic
    by nature, so bounded to a slice here; at scale the pair join runs per
    LSH bucket (see ann_lsh_topk), never globally."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < PAIR_LIMIT)
    e1 = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), F.col("label").alias("label_a")
    )
    e2 = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), F.col("label").alias("label_b")
    )
    return (
        e1.join(e2, F.col("id_a") < F.col("id_b"))
        .where(_cosine(F.col("emb_a"), F.col("emb_b")) > PAIR_THRESHOLD)
        .groupBy("label_a", "label_b")
        .agg(F.count("*").alias("n"))
    )


def _assign_nprobe_cells(
    queries: DataFrame, cent: DataFrame, nprobe: int, cmat=None
) -> DataFrame:
    """(query_id, embedding, cid) — each query row exploded to its
    ``nprobe`` nearest centroids, fully MAP-SIDE (same closure-shipped
    centroid matmul as :func:`_assign_nearest`, same 6dp-round +
    smallest-cid tie-break on the per-row cell ORDER).  Query rows with
    no defined cosine against any centroid (zero-norm / malformed
    vectors) still probe the ``nprobe`` smallest cids — the sentinel
    path of the single-query ``_ivf_search``'s null-last ordering."""
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, embedding array<float>, cid long"
    if cmat is None:
        cmat = _centroid_matrix(cent)
    if cmat is None:
        return (
            queries.select(F.col("vec_id").alias("query_id"), "embedding")
            .withColumn("cid", F.lit(None).cast("long"))
            .where(F.lit(False))
        )
    C, cids, cnorm, dim = cmat
    n_take = min(int(nprobe), len(cids))

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            embs = pdf["embedding"].to_numpy()
            valid = np.array(
                [e is not None and len(e) == dim for e in embs], dtype=bool
            )
            sims = np.full((len(embs), len(cids)), -1.5)
            if valid.any():
                E = np.vstack(
                    [np.asarray(e, dtype=np.float64) for e in embs[valid]]
                )
                enorm = np.sqrt((E * E).sum(axis=1))
                denom = enorm[:, None] * cnorm[None, :]
                s = np.full(denom.shape, -1.5)
                np.divide(E @ C.T, denom, out=s, where=denom > 0)
                s[~np.isfinite(s)] = -1.5
                sims[valid] = np.round(s, 6)
            # stable argsort of -sims keeps equal-sim cells cid-ascending
            # (cids is cid-sorted), matching the qcells ORDER BY of the
            # expression form
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_take]
            qid = pdf["vec_id"].to_numpy()
            rep = np.repeat(np.arange(len(embs)), n_take)
            yield pd.DataFrame(
                {
                    "query_id": qid[rep],
                    "embedding": pdf["embedding"].iloc[rep].reset_index(drop=True),
                    "cid": cids[order.ravel()],
                }
            )

    return queries.select("vec_id", "embedding").mapInPandas(
        kernel, schema=out_schema
    )


def ann_knn_join(
    emb: DataFrame,
    queries: DataFrame,
    cent: DataFrame,
    nprobe: int = IVF_NPROBE,
    top_k: int = TOP_K,
    exclude_self: bool = False,
    cell_salt: int = 1,
) -> DataFrame:
    """IVF-pruned k-nearest-neighbor JOIN: for every row of ``queries``
    (``vec_id, embedding``), the ``top_k`` nearest rows of ``emb`` by
    6dp-rounded cosine (ties → smallest corpus vec_id), searching only
    each query's ``nprobe`` nearest cells.  Returns
    ``(query_id, vec_id, cosine)`` — the batch/all-pairs form of
    :func:`_ivf_search`, i.e. kNN-graph construction (semantic-dedup
    graphs, retrieval-eval sweeps, hard-negative mining) instead of one
    probe per Spark job.

    Scale shape (the FAISS-IVF batch search expressed in Spark ops):

    - corpus side: ONE map-side pass assigns each vector to its nearest
      centroid (:func:`_assign_nearest` — closure-shipped centroid
      matmul, no shuffle), then ONE hash exchange on ``cid``;
    - query side: ONE map-side pass explodes each query to its
      ``nprobe`` nearest cells (:func:`_assign_nprobe_cells`), then the
      same ``cid`` exchange — queries·nprobe small rows;
    - ONE cogroup on ``cid``: the kernel scores a whole cell against all
      its probes as a single numpy matmul and emits only each probe's
      per-cell partial top-k (≤ queries·nprobe·top_k rows total — the
      q×cell_size candidate set never materializes as rows);
    - final per-query top-k: a rank window over ``query_id`` on those
      partials (tiny — no full sort of candidates).

    Pairs with no defined cosine (zero-norm vectors, or vectors whose
    length differs from the quantizer's dimension — the centroid table
    defines the embedding space, so "malformed" is pinned to ITS dim,
    never to whatever lengths happen to share a cell) are omitted from
    the candidate set, so they can only be absent from — never wrongly
    inside — a query's top-k.  With
    ``exclude_self`` a corpus row whose ``vec_id`` equals ``query_id``
    is skipped (the self-join/kNN-graph case).  Exactness within the
    probed cells is property-tested against a numpy brute force in
    ``tests/test_similarity.py``.

    ``cell_salt > 1`` splits every cell into that many hash sub-groups:
    the cogroup's parallelism is otherwise capped at the CELL count
    (64 cells can busy at most 64 tasks whatever the cluster size, and a
    hot cell is one straggler task), while salting multiplies the group
    count and duplicates only the tiny probe side (corpus rows are still
    scored exactly once, so the final window merges partials to the
    identical answer — pytest-pinned).  Set it to about
    ``cores / cells`` rounded up, more under cell skew.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    # ONE driver-side centroid collect shared by both assignment kernels
    cmat = _centroid_matrix(cent)
    cent_dim = cmat[3] if cmat is not None else 0
    best = _assign_nearest(emb, cent, cmat=cmat)
    probes = _assign_nprobe_cells(queries, cent, nprobe, cmat=cmat)
    group_keys = ["cid"]
    if cell_salt > 1:
        group_keys = ["cid", "_salt"]
        best = best.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(cell_salt)).cast("int")
        )
        probes = probes.withColumn(
            "_salt", F.explode(F.array([F.lit(s) for s in range(cell_salt)]))
        )
    b_k = int(top_k)
    b_excl = bool(exclude_self)

    def kernel(key, corpus_pdf, probe_pdf):
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if not len(corpus_pdf) or not len(probe_pdf):
            return empty
        # corpus rows sorted by vec_id so a stable sort over -cosine
        # yields the smallest-vec_id tie-break for free
        corpus_pdf = corpus_pdf.sort_values("vec_id").reset_index(drop=True)
        cvecs = corpus_pdf["embedding"].to_numpy()
        # the QUANTIZER's dim defines validity: deriving it from the
        # cell's own rows would let one over-length malformed vector
        # invalidate every well-formed row sharing its cell
        dim = cent_dim
        if dim == 0:
            return empty
        c_valid = np.array(
            [e is not None and len(e) == dim for e in cvecs], dtype=bool
        )
        if not c_valid.any():
            return empty
        E = np.vstack([np.asarray(e, dtype=np.float64) for e in cvecs[c_valid]])
        enorm = np.sqrt((E * E).sum(axis=1))
        e_ids = corpus_pdf["vec_id"].to_numpy(dtype=np.int64)[c_valid]
        qvecs = probe_pdf["embedding"].to_numpy()
        q_ids = probe_pdf["query_id"].to_numpy(dtype=np.int64)
        q_valid = np.array(
            [e is not None and len(e) == dim for e in qvecs], dtype=bool
        )
        if not q_valid.any():
            return empty
        Q = np.vstack([np.asarray(e, dtype=np.float64) for e in qvecs[q_valid]])
        qnorm = np.sqrt((Q * Q).sum(axis=1))
        denom = qnorm[:, None] * enorm[None, :]
        sims = np.full(denom.shape, -np.inf)
        np.divide(Q @ E.T, denom, out=sims, where=denom > 0)
        sims[~np.isfinite(sims)] = -np.inf  # undefined cosine: never a hit
        sims = np.round(sims, 6)
        qid_v = q_ids[q_valid]
        if b_excl:
            sims[qid_v[:, None] == e_ids[None, :]] = -np.inf
        take = min(b_k, sims.shape[1])
        order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        rows_q = np.repeat(qid_v, take)
        rows_v = e_ids[order.ravel()]
        rows_s = np.take_along_axis(sims, order, axis=1).ravel()
        keep = np.isfinite(rows_s)
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "query_id": rows_q[keep],
                "vec_id": rows_v[keep],
                "cosine": rows_s[keep],
            }
        )

    partials = (
        best.select(*group_keys, "vec_id", "embedding")
        .groupBy(*group_keys)
        .cogroup(probes.groupBy(*group_keys))
        .applyInPandas(kernel, schema="query_id long, vec_id long, cosine double")
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    )
    return (
        partials.withColumn("_rk", rank)
        .where(F.col("_rk") <= top_k)
        .select("query_id", "vec_id", "cosine")
    )
