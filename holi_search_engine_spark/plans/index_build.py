"""Distributed inverted-index build (the reference Indexer/Idf pipeline,
re-expressed Spark-first).

Reference semantics: ``jobs/Indexer.java:27-191`` (tokenize → postings →
ntf), ``jobs/Idf.java:22-87`` (df/idf), ``ranker/CrawlProcess.java:19-66``
(title/snippet metadata).  The reference's SPIMI machinery — append-only
segment writes, 8-way external sort, binary merge, same-key collapse
(``kvs/AppendOnly.java:139-155``, ``jobs/Sort.java``) — is exactly what
Spark's sort-based shuffle does natively, so the "merge" here IS the
shuffle; we add what Spark does not give us (SURVEY.md §4): head-term skew
salting for the posting aggregation and per-bucket resumable orchestration.

Scale design (100 TB / 10^12 turns):
- ONE pass over the corpus tokenizes via ``mapInPandas`` (Arrow batches,
  vectorized pandas inside — no per-row Python); the kernel emits each
  doc's ntf/dl inline (a doc never spans a batch), so no downstream stage
  ever joins back to a doc-stats table;
- the (term, doc, tf, ntf, dl) stream is written partitioned by ``bucket =
  pmod(xxhash64(term), B)`` so every downstream job is partition-pruned
  per bucket and the build is resumable at bucket granularity; corpus
  globals (avgdl, doc count) are observed during that write, zero extra
  passes;
- doc_stats / df / idf are pure JVM aggregations over the columnar stream
  (whole-stage codegen, map-side partial agg);
- posting-list aggregation is two-phase with a salt on the doc key:
  ``groupBy(term, salt)`` builds doc-ordered runs, ``groupBy(term)``
  concatenates+re-sorts the ≤S runs — the hot stopword-like terms
  (Zipf head) never funnel their full posting stream through one task's
  sort buffer in phase 1;
- on a cluster every output table is Iceberg partitioned by
  ``bucket(B, term)``; in this sandbox plain parquet ``bucket=K/``
  directories give the same pruning via partition discovery.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import read_table, write_table

DOC_COLS = ["conv_id", "turn_idx"]
DEFAULT_BUCKETS = 8
DEFAULT_SALT = 16


def tokenize_terms(
    df: DataFrame,
    dictionary: frozenset[str],
    doc_cols: list[str] | None = None,
    text_col: str = "text",
    with_stats: bool = False,
    emit_doc_key: bool = False,
) -> DataFrame:
    """Corpus → one row per (doc, term) with tf.

    Vectorized two-pass tokenization (quirks Q6/Q7) runs per Arrow batch in
    ``mapInPandas``; the dictionary is shipped once per executor via a Spark
    broadcast, not per task.  ``with_stats`` adds the per-doc columns
    ``ntf``/``dl``/``fd`` (computed batch-locally — a doc never spans
    batches), which is what lets the build tokenize ONCE and skip any
    doc-stats join downstream.  ``emit_doc_key`` replaces the doc columns
    with the packed 8-byte ``doc_key`` right inside the kernel, so even
    the Python→JVM Arrow transfer never carries the conv_id strings
    (pandas mirror of ``compression.doc_key_expr`` — kept in lockstep).
    """
    doc_cols = doc_cols or DOC_COLS
    if emit_doc_key and doc_cols != ["conv_id", "turn_idx"]:
        raise ValueError(f"emit_doc_key unsupported for doc_cols={doc_cols}")
    spark = df.sparkSession
    bdict = spark.sparkContext.broadcast(dictionary)

    src_schema = dict(zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields]))
    if emit_doc_key:
        doc_schema = "doc_key long"
    else:
        doc_schema = ", ".join(f"{c} {src_schema[c]}" for c in doc_cols)
    out_schema = f"{doc_schema}, term string, tf int"
    if with_stats:
        out_schema += ", ntf double, dl long, fd tinyint"

    def tok(batches):
        import numpy as np

        from ..functions.tokenizer import tokenize_batch
        from .compression import TURN_BITS

        d = bdict.value
        for pdf in batches:
            if len(pdf):
                keys = None
                if emit_doc_key:
                    conv = pdf["conv_id"].str.extract(r"(\d+)", expand=False)
                    ti = pdf["turn_idx"].to_numpy(dtype=np.int64)
                    # defense-in-depth behind build_index's corpus-wide
                    # round-trip gate: raise instead of corrupting keys
                    if (
                        conv.isna().any()
                        or (ti < 0).any()
                        or (ti >= (1 << TURN_BITS)).any()
                    ):
                        raise ValueError(
                            "doc_key packing violated: conv_id must embed "
                            f"digits and 0 <= turn_idx < {1 << TURN_BITS}; "
                            "rebuild with string doc columns"
                        )
                    keys = (conv.astype("int64").to_numpy() << TURN_BITS) | ti
                out = tokenize_batch(
                    pdf, d, doc_cols, text_col, with_stats=with_stats, doc_keys=keys
                )
                out["tf"] = out["tf"].astype("int32")
                yield out

    return df.select(*doc_cols, text_col).mapInPandas(tok, schema=out_schema)


def build_ntf(term_tf: DataFrame, doc_cols: list[str] | None = None) -> DataFrame:
    """Quirk Q1 (``Indexer.java:131-139``): ntf = (Σ tf²)^¼.  Pure JVM
    aggregation with map-side combine."""
    doc_cols = doc_cols or DOC_COLS
    return term_tf.groupBy(*doc_cols).agg(
        # nested sqrt, NOT pow(x, 0.25): Indexer.java:136-139 applies
        # Math.sqrt twice, and the two correctly-rounded functions differ
        # in the last ulp — sqrt∘sqrt is the bit-exact form (the tokenizer
        # kernel's np.sqrt(np.sqrt(...)) matches it; IEEE-754 sqrt is
        # correctly rounded in both numpy and the JVM)
        F.sqrt(F.sqrt(F.sum(F.col("tf").cast("double") * F.col("tf")))).alias("ntf")
    )


def build_wmetric(term_tf: DataFrame, n_docs: int) -> DataFrame:
    """Quirk Q3 (``Idf.java:46``): df = postings_count + 1; idf = ln(N/df).

    N is a parameter (the reference hard-codes 462,821 at ``Idf.java:33``;
    we pass the actual corpus size).

    DELIBERATE 1-ulp divergence: ``Idf.java:47`` calls ``Math.log``, whose
    result is JVM/arch-dependent (HotSpot intrinsic, 1-ulp spec);
    Spark's ``F.log`` is ``StrictMath.log`` (fdlibm) — bit-identical on
    EVERY platform, which is what a reproducible build on a heterogeneous
    multi-executor cluster needs (mixed-arch executors running Math.log
    would make idf partition-dependent).  Measured: they differ on ~3% of
    inputs, always by exactly 1 ulp (``tests/test_java_differential.py::
    test_spark_log_is_strictmath_not_mathlog``).
    """
    return (
        term_tf.groupBy("term")
        .agg((F.count(F.lit(1)) + F.lit(1)).alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
    )


def build_postings(
    term_tf: DataFrame,
    doc_cols: list[str] | None = None,
    salt: int = DEFAULT_SALT,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """term → doc-ordered ``array<struct<doc..., tf>>`` via salted two-phase
    aggregation (SURVEY.md §4 custom work #1).

    Phase 1 groups on ``(term, salt(doc))`` so a Zipf-head term's postings
    are built as ``salt`` doc-ordered runs in parallel; phase 2 concatenates
    the runs and re-sorts (cheap: ≤ ``salt`` pre-sorted arrays per term).

    ``carry_cols`` are term-functional columns (e.g. ``bucket``) passed
    through both groupings without changing cardinality.
    """
    doc_cols = doc_cols or DOC_COLS
    carry = carry_cols or []
    doc_struct = F.struct(*[F.col(c) for c in doc_cols], F.col("tf"))
    salted = term_tf.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in doc_cols]), F.lit(salt))
    )
    phase1 = salted.groupBy("term", *carry, "_salt").agg(
        F.sort_array(F.collect_list(doc_struct)).alias("run")
    )
    phase2 = phase1.groupBy("term", *carry).agg(
        F.array_sort(F.flatten(F.collect_list("run"))).alias("postings")
    )
    return phase2.withColumn("df", F.size("postings"))


def build_doc_meta(
    df: DataFrame, doc_cols: list[str] | None = None, text_col: str = "text"
) -> DataFrame:
    """Title/snippet per ``CrawlProcess.java:49-56`` default path (first 60 /
    300 chars of tag- and punct/control-stripped text).  Spark's
    ``regexp_replace`` uses Java regex, so the patterns are byte-identical
    to the reference's."""
    doc_cols = doc_cols or DOC_COLS
    stripped = F.regexp_replace(
        F.regexp_replace(F.col(text_col), r"\<.*?\>", " "),
        r"[.,:;!?'\"()\-\p{Cntrl}]",
        " ",
    )
    return df.select(
        *doc_cols,
        F.substring(stripped, 1, 60).alias("title"),
        F.substring(stripped, 1, 300).alias("snippet"),
    )


@dataclass
class IndexPaths:
    root: str

    @property
    def term_tf(self) -> str:
        return os.path.join(self.root, "term_tf")

    @property
    def ntf(self) -> str:
        # ntf is a column of doc_stats; parquet column pruning makes a
        # separate copy pointless (readers .select the columns they need)
        return os.path.join(self.root, "doc_stats")

    @property
    def wmetric(self) -> str:
        return os.path.join(self.root, "wmetric")

    @property
    def doc_meta(self) -> str:
        return os.path.join(self.root, "doc_meta")

    @property
    def doc_len(self) -> str:
        return os.path.join(self.root, "doc_stats")

    @property
    def doc_stats(self) -> str:
        return os.path.join(self.root, "doc_stats")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def blocks(self) -> str:
        return os.path.join(self.root, "blocks")

    @property
    def pageranks(self) -> str:
        # optional static-prior artifact (the reference's pageranks table,
        # Ranker.java:112-120); built by plans.pagerank.build_reply_pagerank
        return os.path.join(self.root, "pageranks")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "_manifest")

    @property
    def meta_json(self) -> str:
        return os.path.join(self.root, "_meta.json")


def _manifest_path(paths: IndexPaths, stage: str, bucket: int | None = None) -> str:
    name = f"{stage}.json" if bucket is None else f"{stage}_bucket_{bucket:04d}.json"
    return os.path.join(paths.manifest, name)


def _manifest_done(paths: IndexPaths, stage: str, bucket: int | None = None) -> bool:
    p = _manifest_path(paths, stage, bucket)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("status") == "done"
    except Exception:
        return False


def _manifest_write(paths: IndexPaths, stage: str, record: dict, bucket: int | None = None) -> None:
    os.makedirs(paths.manifest, exist_ok=True)
    p = _manifest_path(paths, stage, bucket)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"status": "done", **record}, f)
    os.replace(tmp, p)  # atomic: a bucket is either fully done or absent


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    dictionary: frozenset[str],
    doc_cols: list[str] | None = None,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    salt: int = DEFAULT_SALT,
    n_for_idf: int | None = None,
    build_blocks: bool = True,
    build_postings_table: bool = True,
    resume: bool = True,
) -> IndexPaths:
    """Full resumable build: stage A (tokenize + stats, one corpus pass),
    stage B (per-term-hash-bucket posting lists).

    Restart skips completed stages/buckets via the ``_manifest`` records
    (precedent: the reference crawler's resume-from-table,
    ``jobs/Crawler.java:28-31``).
    """
    doc_cols = doc_cols or DOC_COLS
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # AQE's stage-coordination loop inserts multi-second idle gaps between
    # the build's (fixed-shape, explicitly-partitioned) jobs — measured ~5s
    # of zero-CPU per write under concurrent job submission.  The build
    # handles skew itself (salted aggregation, streamed block encode), so
    # AQE buys nothing here; restore the caller's setting afterwards.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _build_index_inner(
            spark, transcripts, paths, dictionary, doc_cols, text_col,
            buckets, salt, n_for_idf, build_blocks, build_postings_table,
            resume,
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _build_index_inner(
    spark: SparkSession,
    transcripts: DataFrame,
    paths: IndexPaths,
    dictionary: frozenset[str],
    doc_cols: list[str],
    text_col: str,
    buckets: int,
    salt: int,
    n_for_idf: int | None,
    build_blocks: bool,
    build_postings_table: bool,
    resume: bool,
) -> IndexPaths:
    out_dir = paths.root

    # ---- stage A: tokenize ONCE.  The tokenizer emits the per-doc stats
    # inline (ntf/dl — a doc never spans an Arrow batch), so the single
    # bucket-partitioned term_tf write carries everything downstream:
    # doc_stats and the block index both derive from the columnar parquet
    # (narrow column reads) and the block build needs NO doc-keyed join.
    # Corpus-global avgdl is collected DURING the write via Observation
    # (sum(tf) / exact non-empty-doc count via the fd flag) — zero extra
    # jobs.  doc_meta + the corpus count overlap the write.
    from concurrent.futures import ThreadPoolExecutor

    if not (resume and _manifest_done(paths, "stage_a")):
        from pyspark.sql import Observation

        t0 = time.time()
        sub: dict[str, float] = {}
        # The packed 8-byte doc key is only lossless when every conv_id is
        # exactly 'conv-%08d' of its first digit-run AND every turn_idx
        # fits TURN_BITS — 'a7'/'b7' would collide, a digit-free conv_id
        # would crash the kernel, and turn_idx ≥ 2^TURN_BITS would corrupt
        # keys silently.  Validate the ROUND-TRIP corpus-wide before
        # choosing the key path (one cheap two-column agg, which also
        # yields the corpus count stage A needs anyway); anything
        # non-conforming falls back to string doc columns.
        emit_key = False
        if doc_cols == DOC_COLS:
            from .compression import TURN_BITS

            # try_cast, not cast: under Spark 4's default ANSI mode a
            # digit-less conv_id makes a plain cast of the extracted ""
            # THROW inside this very validation query — the guard must
            # survive exactly the nonconforming input it exists to detect
            # (null round-trip → rt_ok False → string-column fallback)
            rt = F.format_string(
                "conv-%08d",
                F.regexp_extract("conv_id", r"(\d+)", 1).try_cast("long"),
            )
            chk = transcripts.agg(
                F.count(F.lit(1)).alias("n"),
                F.min(F.coalesce(F.col("conv_id") == rt, F.lit(False))).alias("rt_ok"),
                F.min(
                    F.coalesce(
                        (F.col("turn_idx") >= 0)
                        & (F.col("turn_idx") < (1 << TURN_BITS)),
                        F.lit(False),
                    )
                ).alias("turn_ok"),
            ).first()
            n_turns_pre = int(chk["n"])
            emit_key = n_turns_pre == 0 or (bool(chk["rt_ok"]) and bool(chk["turn_ok"]))
        else:
            n_turns_pre = transcripts.count()
        if build_blocks and doc_cols == DOC_COLS and not emit_key and n_turns_pre:
            raise ValueError(
                "block index requires the packed int64 doc key, but this "
                "corpus failed the conv-%08d / turn_idx round-trip check — "
                "packing would silently merge distinct docs. Remap conv_id "
                "to the canonical form, or pass build_blocks=False for the "
                "string-keyed parity artifacts."
            )
        term_raw = tokenize_terms(
            transcripts,
            dictionary,
            doc_cols,
            text_col,
            with_stats=True,
            # hot path carries the packed 8-byte doc key instead of the
            # conv_id string — the widest column of the token stream; on a
            # bandwidth-bound host/cluster this narrows every Arrow
            # transfer, parquet file, and shuffle of ~n_postings rows
            emit_doc_key=emit_key,
        )
        bucketed = term_raw.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
        )
        obs = Observation("corpus_stats")
        observed = bucketed.observe(
            obs,
            F.sum("tf").alias("total_tf"),
            F.sum("fd").alias("n_docs_ne"),
            F.count(F.lit(1)).alias("n_rows"),
        ).drop("fd")

        def big_write() -> None:
            # shuffle-free bucket-partitioned write: each task splits its
            # rows across the ≤`buckets` directories (the downstream
            # posting/block jobs shuffle by term anyway, so pre-clustering
            # by bucket here would pay a full shuffle of the largest
            # intermediate for nothing; bucket dirs exist purely for
            # resume-time partition pruning)
            write_table(observed, paths.term_tf, partition_by=["bucket"])

        def small_jobs() -> None:
            write_table(build_doc_meta(transcripts, doc_cols, text_col), paths.doc_meta)

        # (conv_id, turn_idx) is the primary key: one doc per turn — the
        # validation agg above already counted the corpus
        n_turns = n_turns_pre
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_big = pool.submit(big_write)
            f_small = pool.submit(small_jobs)
            f_small.result()
            f_big.result()
        m = obs.get
        avgdl = float(m["total_tf"] or 0) / max(int(m["n_docs_ne"] or 0), 1)
        if int(m["n_rows"] or 0) == 0:
            # degenerate corpus (zero tokens anywhere): a partitioned write
            # of 0 rows leaves a schema-less directory that every
            # downstream read would choke on — rewrite each artifact as an
            # explicit empty-but-schema-full parquet instead
            from .compression import BLOCK_SCHEMA

            empty_tf = spark.createDataFrame([], observed.schema).coalesce(1)
            write_table(empty_tf, paths.term_tf)
            src_types = dict(
                zip(
                    transcripts.schema.names,
                    [f.dataType.simpleString() for f in transcripts.schema.fields],
                )
            )
            stats_schema = (
                ", ".join(f"{c} {src_types[c]}" for c in doc_cols)
                + ", ntf double, dl long"
            )
            write_table(
                spark.createDataFrame([], schema=stats_schema).coalesce(1),
                paths.doc_stats,
            )
            write_table(
                spark.createDataFrame([], schema=BLOCK_SCHEMA + ", bucket int").coalesce(1),
                paths.blocks,
            )
            write_table(
                spark.createDataFrame(
                    [], schema="term string, df long, idf double"
                ).coalesce(1),
                paths.wmetric,
            )
            n_turns_empty = n_turns
            with open(paths.meta_json, "w") as f:
                json.dump(
                    {
                        "doc_cols": doc_cols,
                        "n_docs": n_turns_empty,
                        "n_for_idf": n_for_idf if n_for_idf is not None else n_turns_empty,
                        "n_turns": n_turns_empty,
                        "buckets": buckets,
                        "avgdl": 0.0,
                        "packed_doc_key": emit_key,
                    },
                    f,
                )
            _manifest_write(paths, "stage_a", {"n_turns": n_turns_empty, "n_docs": n_turns_empty, "wall_sec": time.time() - t0, "turns_per_sec": None, "degenerate": True})
            _manifest_write(paths, "doc_stats", {"degenerate": True})
            _manifest_write(paths, "wmetric", {"degenerate": True})
            for b in range(buckets):
                _manifest_write(paths, "blocks", {"bucket": b, "degenerate": True}, bucket=b)
                _manifest_write(paths, "postings", {"bucket": b, "n_terms": 0, "n_postings": 0, "degenerate": True}, bucket=b)
            write_table(
                spark.createDataFrame(
                    [],
                    schema=(
                        "term string, postings array<struct<"
                        + ", ".join(f"{c}:{src_types[c]}" for c in doc_cols)
                        + ", tf:int>>, df int, bucket int"
                    ),
                ).coalesce(1),
                paths.postings,
            )
            return paths
        sub["term_tf_write_meta"] = time.time() - t0
        n_docs = n_turns
        n_idf = n_for_idf if n_for_idf is not None else n_docs
        wall = time.time() - t0
        with open(paths.meta_json, "w") as f:
            json.dump(
                {
                    "doc_cols": doc_cols,
                    "n_docs": n_docs,
                    "n_for_idf": n_idf,
                    "n_turns": n_turns,
                    "buckets": buckets,
                    "avgdl": float(avgdl),
                    "packed_doc_key": emit_key,
                },
                f,
            )
        _manifest_write(
            paths,
            "stage_a",
            {
                "n_turns": n_turns,
                "n_docs": n_docs,
                "wall_sec": wall,
                "turns_per_sec": n_turns / wall if wall else None,
                "sub_walls": {k: round(v, 2) for k, v in sub.items()},
            },
        )

    # ---- size input splits to the actual parallelism before any term_tf
    # read: the default 128MB packing (+4MB per-file open cost) can
    # collapse a few-hundred-MB bucket-partitioned table into fewer splits
    # than cores — observed: a 330MB term_tf scanned as ~5 splits, starving
    # 8-of-8 (and 27-of-32) cores in the scan stages.  Files on tmpfs /
    # object storage are cheap to open, so split by bytes/(2·cores) and
    # drop the open-cost padding; restored in build_index's finally.
    tf_bytes_total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(paths.term_tf)
        for f in fs
        if f.endswith(".parquet")
    )
    par = max(spark.sparkContext.defaultParallelism, 1)
    split = max(4 << 20, tf_bytes_total // (2 * par))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))

    # ---- doc_stats (the ranker's per-doc ntf/dl lookup), the block
    # index, and wmetric (df/idf, quirk Q3) are independent readers of
    # term_tf — run all three concurrently.
    need_doc_stats = not (resume and _manifest_done(paths, "doc_stats"))
    need_wmetric = not (resume and _manifest_done(paths, "wmetric"))
    blocks_remaining = (
        [b for b in range(buckets) if not (resume and _manifest_done(paths, "blocks", b))]
        if build_blocks
        else []
    )

    def doc_stats_job() -> None:
        from .compression import doc_cols_from_key_exprs

        t = time.time()
        tf_r = read_table(spark, paths.term_tf)
        if "ntf" not in tf_r.columns or "dl" not in tf_r.columns:
            # term_tf written by an older build (before the per-doc stats
            # rode the token stream): recompute the aggregates the old way
            # instead of failing the resume
            key = ["doc_key"] if "doc_key" in tf_r.columns else doc_cols
            stats = tf_r.groupBy(*key).agg(
                # sqrt∘sqrt (bit-exact Indexer.java:136-139), not pow(·,¼)
                F.sqrt(F.sqrt(F.sum(F.col("tf") * F.col("tf")))).alias("ntf"),
                F.sum("tf").cast("long").alias("dl"),
            )
            if key == ["doc_key"]:
                stats = stats.select(
                    *doc_cols_from_key_exprs(doc_cols), "ntf", "dl", "doc_key"
                )
            write_table(stats, paths.doc_stats)
            _manifest_write(
                paths, "doc_stats", {"wall_sec": time.time() - t, "legacy_tf": True}
            )
            return
        if "doc_key" in tf_r.columns:
            # aggregate on the narrow key; reconstruct the user-facing doc
            # columns only on the ~n_docs output rows
            stats = (
                tf_r.select("doc_key", "ntf", "dl")
                .groupBy("doc_key")
                .agg(F.first("ntf").alias("ntf"), F.first("dl").alias("dl"))
                .select(*doc_cols_from_key_exprs(doc_cols), "ntf", "dl", "doc_key")
            )
        else:
            stats = (
                tf_r.select(*doc_cols, "ntf", "dl")
                .groupBy(*doc_cols)
                .agg(F.first("ntf").alias("ntf"), F.first("dl").alias("dl"))
            )
        write_table(stats, paths.doc_stats)
        _manifest_write(paths, "doc_stats", {"wall_sec": time.time() - t})

    def blocks_job() -> None:
        from .compression import build_block_index

        t = time.time()
        build_block_index(
            spark,
            paths,
            bucket=None if len(blocks_remaining) == buckets else blocks_remaining,
            doc_cols=doc_cols,
            buckets=buckets,
        )
        wall = time.time() - t
        # per-bucket lineage metrics off the WRITTEN table (north-rule
        # checkpoint contract: row-count/term-count per partition rides
        # the manifest, so a resume can audit what each bucket holds
        # without recomputing) — one pruned scan of the small block table
        bstats = {
            int(r["bucket"]): r
            for r in read_table(spark, paths.blocks)
            .where(F.col("bucket").isin(list(blocks_remaining)))
            .groupBy("bucket")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum("n").alias("n_postings"),
            )
            .collect()
        }
        for b in blocks_remaining:
            r = bstats.get(b)
            _manifest_write(
                paths,
                "blocks",
                {
                    "bucket": b,
                    "wall_sec": wall / len(blocks_remaining),
                    "n_terms": int(r["n_terms"]) if r else 0,
                    "n_blocks": int(r["n_blocks"]) if r else 0,
                    "n_postings": int(r["n_postings"]) if r else 0,
                },
                bucket=b,
            )

    def wmetric_job() -> None:
        # df per term straight off the term_tf stream (one row per
        # (doc, term) → count = df): a single-column pruned scan with
        # map-side partial aggregation, running concurrently under the
        # blocks encode instead of as a sequential re-read of the written
        # index afterwards.  The quirk-Q3 artifact: df = df_true + 1,
        # idf = ln(N / (df_true + 1)).
        t0 = time.time()
        n_idf = read_meta(paths)["n_for_idf"]
        df_per_term = (
            read_table(spark, paths.term_tf)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df_true"))
        )
        write_table(
            df_per_term.select(
                "term",
                (F.col("df_true") + F.lit(1)).alias("df"),
                # F.log = StrictMath.log: platform-deterministic, <=1 ulp
                # from the reference's Math.log (see build_idf docstring)
                F.log(F.lit(float(n_idf)) / (F.col("df_true") + F.lit(1))).alias("idf"),
            ),
            paths.wmetric,
        )
        _manifest_write(paths, "wmetric", {"wall_sec": time.time() - t0})

    stage2 = (
        ([doc_stats_job] if need_doc_stats else [])
        + ([blocks_job] if blocks_remaining else [])
        + ([wmetric_job] if need_wmetric else [])
    )
    if stage2:
        with ThreadPoolExecutor(max_workers=len(stage2)) as pool:
            for f in [pool.submit(j) for j in stage2]:
                f.result()

    # ---- stage B: posting lists, resumable at bucket granularity.
    # Fresh build → ONE job across all buckets (write partitioned by
    # bucket); partial resume → only the missing buckets, each pruned to
    # its term_tf partition.  Either way the manifest records per-bucket
    # lineage (term/posting counts + wall time).
    # The array-per-term postings table is a reference-parity artifact
    # (the "index" table shape, ``jobs/Indexer.java:142-176``); the
    # production index is the compressed block table, built directly from
    # the sorted term stream — a Zipf-head term's full posting array in one
    # row is exactly the single-task hot spot the block path avoids, so
    # headline builds skip this stage.
    remaining = (
        [b for b in range(buckets) if not (resume and _manifest_done(paths, "postings", b))]
        if build_postings_table
        else []
    )
    if remaining:
        t0 = time.time()
        term_tf_r = read_table(spark, paths.term_tf)
        if len(remaining) < buckets:
            term_tf_r = term_tf_r.where(F.col("bucket").isin(remaining))
        if "doc_key" in term_tf_r.columns:
            # reference-parity postings carry the user-facing doc columns;
            # reconstruct them from the packed key (pure expressions)
            from .compression import doc_cols_from_key_exprs

            term_tf_r = term_tf_r.select(
                *doc_cols_from_key_exprs(doc_cols), "term", "tf", "bucket"
            )
        postings = build_postings(term_tf_r, doc_cols, salt, carry_cols=["bucket"])
        # dynamic overwrite: a partial resume must not wipe completed buckets
        write_table(postings, paths.postings, partition_by=["bucket"], dynamic=True)
        wall = time.time() - t0
        stats = (
            read_table(spark, paths.postings)
            .where(F.col("bucket").isin(remaining))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("df").alias("n_postings"))
            .collect()
        )
        by_bucket = {r["bucket"]: r for r in stats}
        for b in remaining:
            r = by_bucket.get(b)
            _manifest_write(
                paths,
                "postings",
                {
                    "bucket": b,
                    "n_terms": int(r["n_terms"]) if r else 0,
                    "n_postings": int(r["n_postings"]) if r else 0,
                    "wall_sec": wall / len(remaining),
                },
                bucket=b,
            )

    return paths


def read_meta(paths: IndexPaths) -> dict:
    with open(paths.meta_json) as f:
        return json.load(f)


def artifact_nbytes(path: str) -> int:
    """Total on-disk bytes of a (local) parquet artifact directory — the
    cheap input to the engines' preload-vs-pruned-read decision.  Unknown
    (non-local / unreadable) paths return -1; callers treat unknown as
    too big and degrade to pruned per-term reads."""
    total = 0
    try:
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
    except OSError:
        return -1
    return total if total else -1
