"""The reference's Flame dataflow-operator algebra (SURVEY.md §2.1),
re-expressed as Catalyst-optimizable DataFrame plans over the driver's
TPC-H-ish test tables.

Each entry pairs a Spark implementation with an equivalent DuckDB oracle
SQL (module-level ``ORACLE`` dict).  Reference implementations cited per
function live in ``/root/reference/src/cis5550/flame/Worker.java`` (exec)
and ``FlameRDDImpl.java`` / ``FlamePairRDDImpl.java`` (API).

Scale notes are attached where the Spark plan differs deliberately from a
naive mapping (broadcast hints, partial aggregation, etc.).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load, portable_hash32, portable_hash32_sql

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@q(
    "flame_from_table_filter",
    """
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < DATE '1996-01-01' AND l_returnflag = 'N'
    """,
)
def flame_from_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fromTable + projection lambda (flame/Worker.java:367-402): scan with
    column pruning and a pushed-down predicate — `.explain` shows both in
    PushedFilters/ReadSchema, which the reference did by hand."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_extendedprice").where(
        (F.col("l_shipdate") < "1996-01-01") & (F.col("l_returnflag") == "N")
    )


@q(
    "flame_flatmap",
    """
    SELECT t.token AS token, count(*) AS n
    FROM documents, unnest(string_split_regex(text, '\\s+')) AS t(token)
    WHERE t.token <> ''
    GROUP BY t.token
    """,
)
def flame_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap (flame/Worker.java:48-83): 1→N via explode of a split —
    stays in whole-stage codegen instead of a per-row lambda."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
        .where("token <> ''")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@q(
    "flame_map_to_pair",
    """
    SELECT o_custkey AS k, o_totalprice AS v
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def flame_map_to_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapToPair (FlameRDDImpl.java:55-60; flame/Worker.java:86-122): the
    reference SHUFFLES on this call (pair writes routed by key so grouping
    = co-location, Worker.java:116).  Spark defers: this is a pure
    projection and the shuffle happens only if/when a groupBy follows —
    one of the places the lazy plan beats the eager KVS materialization."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("v")
    )


@q(
    "flame_fold_by_key",
    """
    SELECT l_orderkey,
           string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS folded
    FROM lineitem GROUP BY l_orderkey
    """,
)
def flame_fold_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foldByKey with string-concat fold (flame/Worker.java:124-166).  The
    reference's fold order is HashMap-nondeterministic (quirk Q2); the
    rebuild imposes sort_array for determinism (SURVEY.md §2.1)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
        ).alias("folded")
    )


@q(
    "flame_join",
    """
    SELECT c.c_nationkey AS nationkey, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def flame_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join (flame/Worker.java:556-612): the reference has exactly one join
    strategy (per-key-range hash join over HTTP scans); here the small side
    is broadcast so no shuffle of the big side at all."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@q(
    "flame_cogroup",
    """
    WITH c AS (
      SELECT c_nationkey AS k, string_agg(c_name, ',' ORDER BY c_name) AS customers
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS k, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.k, s.k) AS k,
           coalesce(customers, '') AS customers,
           coalesce(suppliers, '') AS suppliers
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
)
def flame_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup (flame/Worker.java:773-863): groupBy+collect_list on both
    sides then full-outer join — the reference emits "[v1,v2],[w1,w2]"
    strings; we emit sorted comma-joins for determinism."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias("suppliers"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            "k",
            F.coalesce("customers", F.lit("")).alias("customers"),
            F.coalesce("suppliers", F.lit("")).alias("suppliers"),
        )
    )


@q(
    "flame_fold_global",
    """
    SELECT round(sum(l_quantity), 2) AS sum_qty,
           round(max(l_extendedprice), 2) AS max_price,
           count(*) AS n
    FROM lineitem
    """,
)
def flame_fold_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """global fold (flame/Worker.java:614-658): per-range partial fold +
    master-side final — Spark's partial/final aggregation, automatic."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count("*").alias("n"),
    )


@q(
    "flame_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def flame_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct (flame/Worker.java:527-554): idempotent-rowkey overwrite in
    the reference; hash-shuffle dedup with partial aggregation here."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "flame_intersection",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def flame_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersection (flame/Worker.java:169-256): the reference does an
    O(n·m) per-range nested loop; Spark plans a hash semi-join."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "flame_sample",
    f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE {portable_hash32_sql("o_orderkey::VARCHAR")} % 10 = 0
    """,
)
def flame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample (flame/Worker.java:328-365) uses Math.random(); the rebuild
    samples by deterministic hash so runs are reproducible and
    oracle-checkable (documented normalization)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").where(
        portable_hash32(F.col("o_orderkey").cast("string")) % 10 == 0
    )


@q(
    "flame_group_by",
    """
    SELECT right(c_name, 2) AS grp, count(*) AS n,
           round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY right(c_name, 2)
    """,
)
def flame_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy with a computed key (flame/Worker.java:258-326).  The key
    (last two digits of c_name) yields ~100 groups, so the oracle compare
    actually exercises grouping (a constant-prefix key collapsed to one
    group and proved nothing)."""
    c = load(spark, sf_dir, "customer")
    grp = F.expr("right(c_name, 2)").alias("grp")
    return c.groupBy(grp).agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )


@q(
    "flame_filter",
    """
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
    FROM events WHERE event_type = 'error' AND value > 100
    GROUP BY user_id
    """,
)
def flame_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter (flame/Worker.java:701-732): predicate pushed to the scan."""
    e = load(spark, sf_dir, "events")
    return (
        e.where((F.col("event_type") == "error") & (F.col("value") > 100))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@q("flame_count", "SELECT count(*) AS n FROM lineitem")
def flame_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count (FlameRDDImpl.java:117-120)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@q(
    "flame_take",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
)
def flame_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take(n) (FlameRDDImpl.java:142-155) returns an *arbitrary* n rows;
    normalized to a deterministic top-n (documented)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(5)
    )


@q(
    "flame_parallelize",
    """
    SELECT * FROM (VALUES
      ('alpha', 5), ('bravo', 5), ('charlie', 7), ('delta', 5),
      ('echo', 4), ('foxtrot', 7), ('golf', 4), ('hotel', 5)
    ) AS t(word, word_len)
    """,
)
def flame_parallelize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parallelize (FlameContextImpl.java:157-169): a driver-local list
    becomes a distributed dataset — the one operator whose input
    legitimately originates on the master (query plans, seeds, configs;
    never corpus data)."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    return spark.createDataFrame(
        [(w, len(w)) for w in words], "word string, word_len int"
    )


@q(
    "flame_flat_map_to_pair",
    """
    SELECT t.token AS k, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
    FROM documents, unnest(string_split_regex(text, '\\s+')) AS t(token)
    WHERE t.token <> ''
    GROUP BY t.token
    """,
)
def flame_flat_map_to_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMapToPair (FlameRDDImpl.java:196-201; flame/Worker.java:489-525):
    each input row emits N keyed pairs — explode + keyed projection, with a
    per-key reduction so the pair stream is aggregate-checked (the Indexer
    emits exactly this shape at ``jobs/Indexer.java:142-148``)."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(F.split("text", r"\s+")).alias("k"), F.col("doc_id").alias("v")
    ).where("k <> ''")
    return pairs.groupBy("k").agg(
        F.countDistinct("v").alias("n_docs"), F.min("v").alias("first_doc")
    )


@q("flame_collect", "SELECT n_nationkey, n_name FROM nation")
def flame_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect (FlameRDDImpl.java:25-33): full scan materialized on the
    master.  The rows genuinely round-trip through the driver here
    (collect → createDataFrame) — legitimate ONLY for dimension-sized
    tables; at corpus scale collect is not an operator, it's an accident
    (the engine's no-collect-in-hot-paths rule)."""
    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return spark.createDataFrame(src.collect(), src.schema)


@q(
    "flame_save_as_table",
    """
    SELECT s_nationkey, count(*) AS n, round(avg(s_acctbal), 2) AS avg_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def flame_save_as_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """saveAsTable (FlameRDDImpl.java:123-127): the reference renames the
    output KVS table to a persistent name; the Spark analog persists a
    named table (Iceberg ``writeTo`` on a cluster, parquet dir here).  The
    returned rows have physically round-tripped through the sink."""
    out = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.round(F.avg("s_acctbal"), 2).alias("avg_bal"))
    )
    # per-call private dir: a fixed shared path would let two concurrent
    # runs (or users) clobber each other's sink mid-read
    path = os.path.join(tempfile.mkdtemp(prefix="holi_flame_sat_"), "t")
    out.write.parquet(path)
    stored = spark.read.parquet(path)
    pdf, schema = stored.toPandas(), stored.schema
    import shutil as _shutil

    _shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return spark.createDataFrame(pdf, schema=schema)


@q(
    "flame_delete",
    "SELECT (SELECT count(*) FROM part) AS n_before, 1 AS dropped",
)
def flame_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delete (FlameRDDImpl.java:220-223): drop a named table.  Registers
    the table, counts it, drops it, and asserts the catalog no longer
    resolves the name — returned as a checkable row."""
    load(spark, sf_dir, "part").createOrReplaceTempView("flame_delete_target")
    n_before = spark.table("flame_delete_target").count()
    spark.catalog.dropTempView("flame_delete_target")
    dropped = int(not spark.catalog.tableExists("flame_delete_target"))
    return spark.createDataFrame(
        [(n_before, dropped)], "n_before long, dropped int"
    )


@q(
    "flame_map_partitions",
    """
    SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def flame_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartitions (flame/Worker.java:734-771): the reference materializes
    the whole key range into an ArrayList; mapInPandas streams Arrow
    batches.  The per-batch pandas compute here is the derived-column
    example; the aggregation stays JVM-side."""
    li = load(spark, sf_dir, "lineitem")

    def revenue(batches):
        for pdf in batches:
            pdf = pdf.assign(revenue=pdf["l_extendedprice"] * (1 - pdf["l_discount"]))
            yield pdf[["l_returnflag", "revenue"]]

    mapped = li.select("l_returnflag", "l_extendedprice", "l_discount").mapInPandas(
        revenue, schema="l_returnflag string, revenue double"
    )
    return mapped.groupBy("l_returnflag").agg(
        F.round(F.sum("revenue"), 2).alias("revenue")
    )
