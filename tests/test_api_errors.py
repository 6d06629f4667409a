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


def test_round2_operator_validation(spark, sf_dir):
    from celeborn_spark.operators import curriculum as C
    from celeborn_spark.operators import dedup as D
    from celeborn_spark.operators import kmeans as K

    df = spark.range(5).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text",
                                   "id AS n_chars", "'en' AS lang")
    with pytest.raises(ValueError, match="n_bins"):
        C.quantile_bins(df, "n_chars", n_bins=0)
    with pytest.raises(ValueError, match="at least one stratum"):
        C.mixture_sample(df, "lang", "doc_id", "n_chars", {}, 0.5)
    with pytest.raises(ValueError, match="budget_frac"):
        C.mixture_sample(df, "lang", "doc_id", "n_chars", {"en": 1.0}, 0.0)
    with pytest.raises(ValueError, match="shares"):
        C.mixture_sample(df, "lang", "doc_id", "n_chars", {"en": -0.1}, 0.5)
    with pytest.raises(ValueError, match="k must"):
        K.lloyd_iterations(df, k=0)
    with pytest.raises(ValueError, match="max_dist"):
        D.edit_distance_pairs(df, "doc_id", "text", max_dist=-1)
    with pytest.raises(ValueError, match="block_chars"):
        D.edit_distance_pairs(df, "doc_id", "text", block_chars=0)
