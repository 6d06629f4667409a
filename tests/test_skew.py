"""Skewed-join behavior: a constructed hot key joins correctly, AQE
handles the skew (reference A16 analogue: chunk-range skew split,
CelebornPartitionUtil.java:60-130 + AQE OptimizeSkewedJoin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.operators.skew import salted_join


def _skewed_frames(spark, n_hot=50_000, n_cold=5_000):
    left = (
        spark.range(n_hot + n_cold)
        .withColumn("key", F.when(F.col("id") < n_hot, 1).otherwise(F.col("id")))
        .withColumn("v", F.col("id") % 97)
    )
    right = spark.range(200).select(F.col("id").alias("key"), (F.col("id") * 2).alias("w"))
    return left, right


def test_skewed_join_correct_under_aqe(spark):
    left, right = _skewed_frames(spark)
    joined = left.join(right, "key").groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    rows = {r.key: r.n for r in joined.collect()}
    assert rows[1] == 50_000  # every hot row matched exactly once
    assert all(n == 1 for k, n in rows.items() if k != 1)


def test_salted_join_handles_hot_key(spark):
    left, right = _skewed_frames(spark, n_hot=20_000)
    plain = left.join(right, left.key == right.key).count()
    salted = salted_join(left, right, "key", "key", n_salts=8).count()
    assert plain == salted
