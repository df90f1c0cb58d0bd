"""Transcripts source schema validation."""

import pytest

from holi_search_engine_spark.sources.transcripts import (
    SchemaMismatch,
    validate_schema,
)


def test_valid_schema_passes(xs_df):
    assert validate_schema(xs_df) is xs_df


def test_missing_column_rejected(spark, xs_df):
    with pytest.raises(SchemaMismatch, match="missing column 'text'"):
        validate_schema(xs_df.drop("text"))


def test_wrong_type_rejected(spark, xs_df):
    bad = xs_df.withColumn("text", xs_df["turn_idx"])
    with pytest.raises(SchemaMismatch, match="text must be"):
        validate_schema(bad)


# ---------------------------------------------------------------- catalog

def test_write_read_table_parquet_roundtrip(spark, tmp_path):
    from holi_search_engine_spark.sources import catalog as C

    path = str(tmp_path / "art")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "bucket int, v string")
    assert C.write_table(df, path, partition_by=["bucket"]) == "parquet"
    got = C.read_table(spark, path)
    assert {(r.bucket, r.v) for r in got.collect()} == {(1, "a"), (2, "b")}
    # dynamic overwrite replaces only the partitions present in the df
    one = spark.createDataFrame([(1, "a2")], "bucket int, v string")
    assert C.write_table(one, path, partition_by=["bucket"], dynamic=True) == "parquet"
    got = {(r.bucket, r.v) for r in C.read_table(spark, path).collect()}
    assert got == {(1, "a2"), (2, "b")}


class _RecWriter:
    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", len(cols)))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def append(self):
        self.calls.append(("append",))

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions",))


class _RecDf:
    def __init__(self, table_exists=True):
        from types import SimpleNamespace

        self.calls = []
        self.sparkSession = SimpleNamespace(
            catalog=SimpleNamespace(tableExists=lambda name: table_exists)
        )

    def writeTo(self, name):
        self.calls.append(("writeTo", name))
        return _RecWriter(self.calls)


def test_write_table_iceberg_branch(spark, monkeypatch):
    from holi_search_engine_spark.sources import catalog as C

    monkeypatch.setenv(C.ENV_DB, "lake.search")
    monkeypatch.setattr(C, "iceberg_available", lambda s: True)

    df = _RecDf()
    assert C.write_table(df, "/idx/blocks", partition_by=["bucket"]) == "iceberg"
    assert df.calls == [
        ("writeTo", "lake.search.blocks"),
        ("using", "iceberg"),
        ("partitionedBy", 1),
        ("createOrReplace",),
    ]

    df = _RecDf()
    assert C.write_table(df, "/idx/blocks", dynamic=True) == "iceberg"
    assert df.calls == [("writeTo", "lake.search.blocks"), ("overwritePartitions",)]

    # table absent: dynamic degrades to create-or-replace (first build);
    # an overwritePartitions FAILURE on an existing table must propagate,
    # never silently replace completed buckets
    df = _RecDf(table_exists=False)
    assert C.write_table(df, "/idx/blocks", dynamic=True) == "iceberg"
    assert df.calls == [
        ("writeTo", "lake.search.blocks"),
        ("using", "iceberg"),
        ("createOrReplace",),
    ]

    df = _RecDf()
    assert C.write_table(df, "/idx/t", mode="append") == "iceberg"
    assert df.calls == [("writeTo", "lake.search.t"), ("append",)]


def test_read_table_iceberg_branch(monkeypatch):
    from types import SimpleNamespace

    from holi_search_engine_spark.sources import catalog as C

    monkeypatch.setenv(C.ENV_DB, "lake.search")
    monkeypatch.setattr(C, "iceberg_available", lambda s: True)
    reads = []
    stub = SimpleNamespace(read=SimpleNamespace(table=lambda n: reads.append(n) or "DF"))
    assert C.read_table(stub, "/idx/wmetric") == "DF"
    assert reads == ["lake.search.wmetric"]


def test_ensure_transcripts_table_branches(spark, monkeypatch):
    from types import SimpleNamespace

    from holi_search_engine_spark import session as S
    from holi_search_engine_spark.sources.transcripts import ensure_transcripts_table

    # sandbox: no Iceberg runtime → parquet fallback branch
    assert ensure_transcripts_table(spark) is False

    # capability present → DDL applied once, idempotent form
    monkeypatch.setattr(S, "iceberg_available", lambda s: True)
    ddls = []
    stub = SimpleNamespace(sql=lambda q: ddls.append(q))
    assert ensure_transcripts_table(stub, name="transcripts", catalog="lake") is True
    assert "CREATE TABLE IF NOT EXISTS lake.transcripts" in ddls[0]
    assert "USING iceberg" in ddls[0] and "bucket(64, conv_id)" in ddls[0]
