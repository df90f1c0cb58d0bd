"""The reference's Flame dataflow-operator algebra (SURVEY.md §2.1),
re-expressed as Catalyst-optimizable DataFrame plans over the driver's
TPC-H-ish test tables.

All 21 Flame operators are exercised by FIVE compound registry entries
(the driver's correctness gate verifies the first 50 ``queries()``
entries, so one entry per operator crowded out the higher-risk
operators registered after them — round-2 verdict item #1).  Each
compound entry chains or unions several operators into one
oracle-checked plan; a wrong answer from ANY constituent operator flips
the entry's value hash, so per-operator coverage is preserved:

- ``flame_pipeline_fold``     — fromTable(+proj), filter, mapToPair,
                                foldByKey
- ``flame_pipeline_relational`` — cogroup, join (broadcast), groupBy
                                (computed key)
- ``flame_pipeline_tokens``   — flatMap, flatMapToPair, distinct
- ``flame_actions``           — count, fold (global), take, parallelize,
                                sample, intersection
- ``flame_lifecycle``         — saveAsTable, delete, collect,
                                mapPartitions

Reference implementations cited per operator live in
``/root/reference/src/cis5550/flame/Worker.java`` (exec) and
``FlameRDDImpl.java`` / ``FlamePairRDDImpl.java`` (API).
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


def _sorted_int_concat(col: str):
    """Deterministic fold rendering: ints sorted then comma-joined (the
    reference's fold order is HashMap-nondeterministic, quirk Q2; the
    rebuild imposes sort_array — SURVEY.md §2.1)."""
    return F.concat_ws(
        ",",
        F.transform(F.sort_array(F.collect_list(col)), lambda x: x.cast("string")),
    )


@q(
    "flame_pipeline_fold",
    """
    SELECT l_orderkey AS k,
           string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS folded,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate < DATE '1996-01-01' AND l_returnflag = 'N'
    GROUP BY l_orderkey
    """,
)
def flame_pipeline_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fromTable + projection (flame/Worker.java:367-402) → filter
    (Worker.java:701-732) → mapToPair (FlameRDDImpl.java:55-60;
    Worker.java:86-122) → foldByKey (Worker.java:124-166), chained.

    The scan shows both pushdown and pruning in PushedFilters/ReadSchema
    (the reference did this by hand); mapToPair is a pure projection here
    — the reference SHUFFLES on that call (pair writes routed by key,
    Worker.java:116) while Spark defers the exchange to the foldByKey,
    one of the places the lazy plan beats the eager KVS materialization.
    """
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        li.where((F.col("l_shipdate") < "1996-01-01") & (F.col("l_returnflag") == "N"))
        .select(F.col("l_orderkey").alias("k"), F.col("l_linenumber").alias("v"))
    )
    return pairs.groupBy("k").agg(
        _sorted_int_concat("v").alias("folded"), F.count("*").alias("n")
    )


@q(
    "flame_pipeline_relational",
    """
    WITH c AS (
      SELECT c_nationkey AS k, string_agg(c_name, ',' ORDER BY c_name) AS customers
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS k, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM supplier GROUP BY s_nationkey
    ), cg AS (
      SELECT coalesce(c.k, s.k) AS k,
             coalesce(customers, '') AS customers,
             coalesce(suppliers, '') AS suppliers
      FROM c FULL OUTER JOIN s ON c.k = s.k
    )
    SELECT right(n.n_name, 1) AS grp,
           count(*) AS n_nations,
           sum(length(cg.customers))::BIGINT AS cust_chars,
           sum(length(cg.suppliers))::BIGINT AS supp_chars
    FROM cg JOIN nation n ON cg.k = n.n_nationkey
    GROUP BY right(n.n_name, 1)
    """,
)
def flame_pipeline_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup (flame/Worker.java:773-863) → join (Worker.java:556-612) →
    groupBy with a computed key (Worker.java:258-326), chained.

    The cogroup is groupBy+collect_list per side then a full-outer join
    (the reference emits "[v1,v2],[w1,w2]" strings; sorted comma-joins
    here for determinism).  The join broadcasts the small side — the
    reference has exactly one join strategy (per-key-range hash join over
    HTTP scans).  The computed grouping key (last character of the nation
    name, ~10 groups) yields multiple groups so the oracle compare actually exercises
    grouping."""
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
    cg = c.join(s, "k", "full_outer").select(
        "k",
        F.coalesce("customers", F.lit("")).alias("customers"),
        F.coalesce("suppliers", F.lit("")).alias("suppliers"),
    )
    nation = load(spark, sf_dir, "nation")
    return (
        cg.join(F.broadcast(nation), cg.k == nation.n_nationkey)
        .groupBy(F.expr("right(n_name, 1)").alias("grp"))
        .agg(
            F.count("*").alias("n_nations"),
            F.sum(F.length("customers")).alias("cust_chars"),
            F.sum(F.length("suppliers")).alias("supp_chars"),
        )
    )


@q(
    "flame_pipeline_tokens",
    """
    WITH pairs AS (
      SELECT DISTINCT t.token AS k, doc_id AS v
      FROM documents, unnest(string_split_regex(text, '\\s+')) AS t(token)
      WHERE t.token <> ''
    )
    SELECT k, count(*) AS n_docs, min(v) AS first_doc
    FROM pairs GROUP BY k
    """,
)
def flame_pipeline_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap (flame/Worker.java:48-83) → flatMapToPair
    (FlameRDDImpl.java:196-201; Worker.java:489-525) → distinct
    (Worker.java:527-554), chained.

    1→N fan-out via explode of a split stays in whole-stage codegen
    instead of a per-row lambda; the (token, doc) pair stream is exactly
    the Indexer's emit shape (jobs/Indexer.java:142-148); distinct is
    hash-shuffle dedup with partial aggregation (the reference used
    idempotent-rowkey overwrite)."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(F.split("text", r"\s+")).alias("k"), F.col("doc_id").alias("v")
    ).where("k <> ''")
    return (
        pairs.distinct()
        .groupBy("k")
        .agg(F.count("*").alias("n_docs"), F.min("v").alias("first_doc"))
    )


_ACTIONS_SQL = f"""
    SELECT 'count' AS op, 'lineitem' AS k,
           (SELECT count(*) FROM lineitem) AS n, 0.0 AS x
    UNION ALL
    SELECT 'fold', 'lineitem', count(*),
           round(sum(l_quantity), 2) FROM lineitem
    UNION ALL
    SELECT 'take', o_orderkey::VARCHAR, o_orderkey,
           round(o_totalprice, 2)
    FROM (SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
    UNION ALL
    SELECT 'parallelize', word, word_len, 0.0 FROM (VALUES
      ('alpha', 5), ('bravo', 5), ('charlie', 7), ('delta', 5),
      ('echo', 4), ('foxtrot', 7), ('golf', 4), ('hotel', 5)
    ) AS t(word, word_len)
    UNION ALL
    SELECT 'sample', 'orders', count(*), round(sum(o_totalprice), 2)
    FROM orders WHERE {portable_hash32_sql("o_orderkey::VARCHAR")} % 10 = 0
    UNION ALL
    SELECT 'intersection', k::VARCHAR, k, 0.0 FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    """


@q("flame_actions", _ACTIONS_SQL)
def flame_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count (FlameRDDImpl.java:117-120), global fold
    (flame/Worker.java:614-658), take (FlameRDDImpl.java:142-155),
    parallelize (FlameContextImpl.java:157-169), sample
    (Worker.java:328-365) and intersection (Worker.java:169-256), unioned
    into one tagged (op, k, n, x) frame.

    Documented normalizations vs the reference: take(n) returns an
    *arbitrary* n rows — normalized to a deterministic top-n; sample uses
    Math.random() — sampled by deterministic hash (and aggregated, which
    also exercises the partial/final fold).  The global fold is Spark's
    automatic partial-per-partition + final aggregation — the reference's
    per-range fold + master-side final, for free.  parallelize is the one
    operator whose input legitimately originates on the master (query
    plans, seeds, configs; never corpus data).  intersection plans a hash
    semi-join where the reference did an O(n·m) per-range nested loop."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    schema = "op string, k string, n long, x double"

    count_row = li.agg(
        F.lit("count").alias("op"),
        F.lit("lineitem").alias("k"),
        F.count("*").alias("n"),
        F.lit(0.0).alias("x"),
    )
    fold_row = li.agg(
        F.lit("fold").alias("op"),
        F.lit("lineitem").alias("k"),
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("x"),
    )
    take_rows = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(5)
        .select(
            F.lit("take").alias("op"),
            F.col("o_orderkey").cast("string").alias("k"),
            F.col("o_orderkey").cast("long").alias("n"),
            F.round("o_totalprice", 2).alias("x"),
        )
    )
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    par_rows = spark.createDataFrame(
        [("parallelize", w, len(w), 0.0) for w in words], schema
    )
    sample_row = (
        o.where(portable_hash32(F.col("o_orderkey").cast("string")) % 10 == 0)
        .agg(
            F.lit("sample").alias("op"),
            F.lit("orders").alias("k"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("x"),
        )
    )
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter_rows = c.intersect(s).select(
        F.lit("intersection").alias("op"),
        F.col("k").cast("string").alias("k"),
        F.col("k").cast("long").alias("n"),
        F.lit(0.0).alias("x"),
    )
    return (
        count_row.unionByName(fold_row)
        .unionByName(take_rows)
        .unionByName(par_rows)
        .unionByName(sample_row)
        .unionByName(inter_rows)
    )


_LIFECYCLE_SQL = """
    SELECT 'map_partitions' AS op, l_returnflag AS k, 0::BIGINT AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS x
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'save_as_table', s_nationkey::VARCHAR, count(*),
           round(avg(s_acctbal), 2)
    FROM supplier GROUP BY s_nationkey
    UNION ALL
    SELECT 'collect', n_name, n_nationkey, 0.0 FROM nation
    UNION ALL
    SELECT 'delete', 'part', (SELECT count(*) FROM part), 1.0
    """


@q("flame_lifecycle", _LIFECYCLE_SQL)
def flame_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartitions (flame/Worker.java:734-771), saveAsTable
    (FlameRDDImpl.java:123-127), collect (FlameRDDImpl.java:25-33) and
    delete (FlameRDDImpl.java:220-223), unioned into one tagged frame.

    - mapPartitions: the reference materializes the whole key range into
      an ArrayList; mapInPandas streams Arrow batches (per-batch derived
      column; aggregation stays JVM-side).
    - saveAsTable: the reference renames the output KVS table to a
      persistent name; the Spark analog persists a named table (Iceberg
      ``writeTo`` on a cluster, parquet dir here) — the returned rows have
      physically round-tripped through the sink.  Per-call private dir: a
      fixed shared path would let two concurrent runs clobber each other.
    - collect: rows genuinely round-trip through the driver — legitimate
      ONLY for dimension-sized tables; at corpus scale collect is not an
      operator, it's an accident (the no-collect-in-hot-paths rule).
    - delete: registers a table, counts it, drops it, and asserts the
      catalog no longer resolves the name (returned as a checkable row).
    """
    li = load(spark, sf_dir, "lineitem")

    def revenue(batches):
        for pdf in batches:
            pdf = pdf.assign(revenue=pdf["l_extendedprice"] * (1 - pdf["l_discount"]))
            yield pdf[["l_returnflag", "revenue"]]

    mp_rows = (
        li.select("l_returnflag", "l_extendedprice", "l_discount")
        .mapInPandas(revenue, schema="l_returnflag string, revenue double")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("revenue"), 2).alias("x"))
        .select(
            F.lit("map_partitions").alias("op"),
            F.col("l_returnflag").alias("k"),
            F.lit(0).cast("long").alias("n"),
            "x",
        )
    )

    sat = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"), F.round(F.avg("s_acctbal"), 2).alias("avg_bal"))
    )
    path = os.path.join(tempfile.mkdtemp(prefix="holi_flame_sat_"), "t")
    sat.write.parquet(path)
    stored = spark.read.parquet(path)
    pdf, schema = stored.toPandas(), stored.schema
    import shutil as _shutil

    _shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    sat_rows = spark.createDataFrame(pdf, schema=schema).select(
        F.lit("save_as_table").alias("op"),
        F.col("s_nationkey").cast("string").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("avg_bal").alias("x"),
    )

    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    collect_rows = spark.createDataFrame(src.collect(), src.schema).select(
        F.lit("collect").alias("op"),
        F.col("n_name").alias("k"),
        F.col("n_nationkey").cast("long").alias("n"),
        F.lit(0.0).alias("x"),
    )

    # per-call-unique view name: a fixed shared name would let two
    # concurrent runs in one session race register/count/drop (the same
    # rule as the per-call private sink dir above)
    import uuid

    view = f"flame_delete_target_{uuid.uuid4().hex}"
    load(spark, sf_dir, "part").createOrReplaceTempView(view)
    n_before = spark.table(view).count()
    spark.catalog.dropTempView(view)
    dropped = float(not spark.catalog.tableExists(view))
    delete_row = spark.createDataFrame(
        [("delete", "part", n_before, dropped)], "op string, k string, n long, x double"
    )

    return (
        mp_rows.unionByName(sat_rows).unionByName(collect_rows).unionByName(delete_row)
    )
