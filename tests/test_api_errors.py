"""API error paths: unknown tables/formats fail fast with clear errors."""

from __future__ import annotations

import pytest

from celeborn_spark.catalog import load_table
from celeborn_spark.sources.io import read_any, write_any


def test_unknown_table_raises_keyerror(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, sf_dir, "nope")


def test_unknown_write_format_raises(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unsupported format"):
        write_any(df, "/tmp/x", "avroish")


def test_unknown_read_format_raises(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_any(spark, "/tmp/x", "avroish")


def test_missing_path_is_clean_analysis_error(spark, sf_dir):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf9.9", "lineitem").count()
