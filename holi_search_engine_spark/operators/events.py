"""Event-stream analytics over the ``events`` table: tumbling-window
aggregation and latest-event-per-key — the batch expressions of the
streaming operators in ``streaming/`` (same plan shapes run under
Structured Streaming with a watermark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import load

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


#: The correctness-gate streaming entries seed their own inbox; cap the
#: seeded stream so a state-store-heavy drain can't eat the verification
#: window (round-2 verdict #9).  The oracle twins carry the same cap.
STREAM_USER_CAP = 50

#: State partitions for the gate's streaming drains.  A stateful query
#: pins its partition count from the FIRST checkpoint, and every
#: micro-batch commits one state file per partition — at the gate's tiny
#: corpus 32 partitions is pure commit overhead (the checkpoint dir also
#: sits on the sandbox's slow shared disk unless tmpfs is available).
STREAM_SHUFFLE_PARTITIONS = "8"


#: Minimum free tmpfs bytes before the stream dirs will use it: the gate's
#: seeded parquet + per-batch state-store commits stay well under this, so
#: a host with a small/near-full /dev/shm falls back to the default tmp
#: dir instead of ENOSPCing mid-drain with an opaque write error.
_TMPFS_MIN_FREE = 256 << 20


def _fast_tmpdir(prefix: str) -> str:
    """Temp dir for stream inbox/checkpoint/sink: tmpfs when available
    AND comfortably free (the sandbox's /tmp is a shared virtio disk with
    multi-second sync stalls — BENCH/BASELINE.md; state-store commits
    amplify that)."""
    import os
    import tempfile

    base = None
    if os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= _TMPFS_MIN_FREE:
                base = "/dev/shm"
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix, dir=base)


class _stream_partitions:
    """Temporarily pin spark.sql.shuffle.partitions for a gate drain
    (fresh checkpoint each run, so the pinned count never conflicts)."""

    def __init__(self, spark: SparkSession, n: str = STREAM_SHUFFLE_PARTITIONS):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


@q(
    "events_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form; the streaming form
    adds ``withWatermark`` — see streaming/incremental.py)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))


@q(
    "events_latest_per_user",
    """
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER
            (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user via a ranked window — the dedup-to-latest
    pattern (deterministic tie-break on event_id)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    )


@q(
    "events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             (sum(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum — the
    batch analog of ``session_window`` in Structured Streaming."""
    e = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(order)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(running)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@q(
    "events_stream_sessionize",
    f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < {STREAM_USER_CAP}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sid
      FROM gaps
    ),
    agg AS (
      SELECT user_id, sid, count(*)::BIGINT AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             round(sum(value), 2) AS total_value
      FROM sess GROUP BY user_id, sid
    ),
    last AS (SELECT user_id, max(sid) AS msid FROM agg GROUP BY user_id)
    SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.total_value
    FROM agg a JOIN last l ON a.user_id = l.user_id AND a.sid < l.msid
    """,
)
def events_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL STREAMING operator as a driver-checked entry:
    runs ``streaming.incremental.stream_sessionize``
    (``applyInPandasWithState``, one open session per user as state) over
    the events table as an ``availableNow`` stream and returns the CLOSED
    sessions.  Oracle twin: batch sessionization minus each user's final
    session (which streaming correctly keeps open as state — no later
    event has arrived to close it).  Session boundaries depend only on
    sorted ts values, so equal-timestamp arrival order cannot change the
    result; total_value is rounded to 2dp on both sides.  The seeded
    stream is capped to ``STREAM_USER_CAP`` users and the drain runs at
    ``STREAM_SHUFFLE_PARTITIONS`` state partitions on tmpfs — the gate
    checks operator CORRECTNESS, not drain throughput."""
    import glob
    import os
    import shutil

    from ..streaming.incremental import stream_sessionize

    base = _fast_tmpdir("holi_stream_sess_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    inbox = os.path.join(base, "in")
    # the file stream source requires a DIRECTORY of parquet files; seed
    # it with the capped slice of the events table
    load(spark, sf_dir, "events").where(
        F.col("user_id") < STREAM_USER_CAP
    ).coalesce(1).write.parquet(inbox)
    try:
        with _stream_partitions(spark):
            q_ = stream_sessionize(spark, inbox, out, ckpt, gap_sec=1800)
            done = q_.awaitTermination(600)
        if not done:
            # drain overran the budget: stop before the finally-rmtree
            # deletes the checkpoint under a live query, and fail loudly
            # rather than comparing partial output against the oracle
            q_.stop()
            raise TimeoutError("availableNow drain did not finish in 600s")
        if not glob.glob(os.path.join(out, "*.parquet")):
            return spark.createDataFrame(
                [],
                "user_id long, session_start timestamp, session_end timestamp,"
                " n_events long, total_value double",
            )
        sessions = spark.read.parquet(out).select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
        )
        # materialize before the temp dir is removed
        pdf = sessions.toPandas()
        return spark.createDataFrame(pdf, schema=sessions.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q(
    "events_stream_dedup",
    f"""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events WHERE user_id < {STREAM_USER_CAP}
    """,
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (``dropDuplicatesWithinWatermark``) as a
    driver-checked entry: the events table is re-emitted with every 50th
    event DUPLICATED (same payload, so the input genuinely contains
    re-deliveries — without seeding, the table's unique event_ids would
    make the check vacuous), streamed through the dedup operator under
    ``availableNow``, and the output must equal the original table — the
    oracle is the batch ``distinct()`` twin over the same rows.  Capped
    and partition-pinned like ``events_stream_sessionize``."""
    import os
    import shutil

    from ..streaming.incremental import stream_dedup

    base = _fast_tmpdir("holi_stream_dedup_")
    inbox = os.path.join(base, "in")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    try:
        events = load(spark, sf_dir, "events").where(
            F.col("user_id") < STREAM_USER_CAP
        )
        dupes = events.where(F.col("event_id") % 50 == 0)
        events.unionByName(dupes).coalesce(2).write.parquet(inbox)
        with _stream_partitions(spark):
            q_ = stream_dedup(spark, inbox, out, ckpt)
            done = q_.awaitTermination(600)
        if not done:
            # drain overran the budget: stop before the finally-rmtree
            # deletes the checkpoint under a live query, and fail loudly
            # rather than comparing partial output against the oracle
            q_.stop()
            raise TimeoutError("availableNow drain did not finish in 600s")
        deduped = spark.read.parquet(out).select(
            "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
        )
        pdf = deduped.toPandas()
        return spark.createDataFrame(pdf, schema=deduped.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
