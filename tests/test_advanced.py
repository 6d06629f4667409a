"""Accuracy bounds for approximate sketches vs their exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        rel_err = abs(approx[k] - n) / max(n, 1)
        assert rel_err < 0.1, f"{k}: approx {approx[k]} vs exact {n}"


def test_percentile_approx_near_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m")).collect()[0].m
    approx = li.agg(F.percentile_approx("l_extendedprice", 0.5).alias("m")).collect()[0].m
    assert abs(approx - exact) / exact < 0.05
