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


def test_lake_format_capability_detection(spark):
    """No lake connector jars ship in this image — the capability check
    must say so (and must not throw); unknown formats are rejected."""
    import pytest

    from celeborn_spark.sources.io import lake_format_available

    for fmt in ("delta", "iceberg", "hudi"):
        assert lake_format_available(spark, fmt) is False
    with pytest.raises(ValueError):
        lake_format_available(spark, "parquet")


def test_merge_into_path_parquet_fallback(spark, tmp_path):
    """Without connector jars merge_into_path takes the relational
    fallback: read target, upsert, atomically overwrite in place."""
    from celeborn_spark.operators.merge import merge_into_path

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, bal double"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (3, "c", 30.0)], "k long, name string, bal double"
    )
    merge_into_path(spark, path, updates, "k")
    rows = {r.k: (r.name, r.bal) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}


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
