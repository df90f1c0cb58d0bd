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
