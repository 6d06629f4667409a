"""merge_upsert / SCD2 semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.merge import merge_upsert, scd2_close_and_append


def test_upsert_updates_and_inserts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n0 = c.count()
    updated = c.limit(5).withColumn("c_acctbal", F.lit(0.0))
    new_rows = c.limit(3).withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
    merged = merge_upsert(c, updated.unionByName(new_rows), "c_custkey")
    assert merged.count() == n0 + 3
    zeroed = merged.join(updated.select("c_custkey"), "c_custkey")
    assert all(r.c_acctbal == 0.0 for r in zeroed.collect())


def test_scd2_closes_open_rows(spark):
    schema = "k long, v string, eff string, end string"
    cur = spark.createDataFrame(
        [(1, "a", "2024-01-01", None), (2, "b", "2024-01-01", None)], schema
    )
    chg = spark.createDataFrame([(1, "a2", "2024-06-01", None)], schema)
    out = scd2_close_and_append(cur, chg, "k", "eff", "end")
    rows = {(r.k, r.v): r.end for r in out.collect()}
    assert rows[(1, "a")] == "2024-06-01"   # old version closed
    assert rows[(1, "a2")] is None          # new version open
    assert rows[(2, "b")] is None           # untouched key stays open
