"""Transcripts source/sink: the engine's primary input table
(``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp`` per BASELINE.json input_hint).

On a cluster these are Iceberg tables (``session.iceberg_available``
gates the catalog path); in this sandbox plain parquet with the same
layout.  Readers validate the schema so a wrong table fails loudly at
plan time, not mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

TRANSCRIPT_FIELDS = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
    ("ts", T.TimestampNTZType()),
]

ICEBERG_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.{name} (
  conv_id string, turn_idx int, role string, text string,
  tool string, ts timestamp)
USING iceberg
PARTITIONED BY (bucket(64, conv_id))
"""


def ensure_transcripts_table(
    spark: SparkSession, name: str = "transcripts", catalog: str = "spark_catalog"
) -> bool:
    """Apply the Iceberg DDL when the runtime is on the classpath; returns
    whether the Iceberg branch was taken (False → parquet-dir layout, the
    sandbox fallback)."""
    from ..session import iceberg_available

    if not iceberg_available(spark):
        return False
    spark.sql(ICEBERG_DDL.format(catalog=catalog, name=name))
    return True


class SchemaMismatch(ValueError):
    pass


def validate_schema(df: DataFrame) -> DataFrame:
    names = {f.name: f.dataType for f in df.schema.fields}
    for col, expected in TRANSCRIPT_FIELDS:
        if col not in names:
            raise SchemaMismatch(f"transcripts table missing column {col!r}")
        got = names[col]
        if col == "ts":
            if not isinstance(got, (T.TimestampType, T.TimestampNTZType)):
                raise SchemaMismatch(f"ts must be a timestamp, got {got}")
        elif col == "turn_idx":
            if not isinstance(got, (T.IntegerType, T.LongType, T.ShortType)):
                raise SchemaMismatch(f"turn_idx must be integral, got {got}")
        elif type(got) is not type(expected):
            raise SchemaMismatch(f"{col} must be {expected}, got {got}")
    return df


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    from .catalog import read_table

    return validate_schema(read_table(spark, path))


def write_transcripts(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partition layout mirrors the Iceberg spec: hashing conv_id spreads
    conversations evenly (turn counts vary per conversation).  Routed
    through the capability-gated catalog — with the Iceberg runtime and
    ``SPARK_GRAFT_ICEBERG_DB`` set this is an ACID table write."""
    from .catalog import write_table

    write_table(validate_schema(df), path, mode=mode)
