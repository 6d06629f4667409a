"""Skyline tests (operators/frontier.skyline_2d): known frontiers,
duplicate-point co-survival, partition-layout invariance, and the
anti-correlated worst case where everything survives.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.operators.frontier import skyline_2d


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["id", "x", "y"]
    )


def test_skyline_known_answer(spark):
    """(1,5) (2,2) (5,1) form the frontier; (3,3) is dominated by (2,2)
    and (6,6) by everything."""
    df = _df(spark, [(1, 5), (2, 2), (5, 1), (3, 3), (6, 6)])
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    assert got == {(1, 5), (2, 2), (5, 1)}


def test_skyline_equal_points_co_survive(spark):
    """Exact duplicates dominate nothing: both copies of (1,1) stay."""
    df = _df(spark, [(1, 1), (1, 1), (2, 2)])
    rows = skyline_2d(df, "x", "y").collect()
    assert sorted((r.x, r.y) for r in rows) == [(1, 1), (1, 1)]


def test_skyline_same_x_strictly_smaller_y_dominates(spark):
    """(2,1) dominates (2,3): equal x, strictly better y."""
    df = _df(spark, [(2, 3), (2, 1), (1, 9)])
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    assert got == {(2, 1), (1, 9)}


def test_skyline_anticorrelated_keeps_all(spark):
    """y = 100 - x: every point is Pareto-optimal (the inherent worst
    case — the skyline IS the data)."""
    df = spark.createDataFrame(
        [(i, i, 100 - i) for i in range(50)], ["id", "x", "y"]
    )
    assert skyline_2d(df, "x", "y").count() == 50


def test_skyline_partition_invariant(spark):
    """The global frontier is identical for 1 and 16 input partitions
    (stage-1 pruning is a superset filter for ANY layout)."""
    pts = [(i % 17, (i * 7) % 23) for i in range(200)]
    df = _df(spark, pts)
    one = {
        (r.x, r.y)
        for r in skyline_2d(df.coalesce(1), "x", "y").collect()
    }
    many = {
        (r.x, r.y)
        for r in skyline_2d(df.repartition(16), "x", "y").collect()
    }
    assert one == many


def test_skyline_keeps_payload_columns(spark):
    df = spark.createDataFrame([(7, "keep", 1, 1)], ["id", "tag", "x", "y"])
    row = skyline_2d(df, "x", "y").collect()[0]
    assert row.id == 7 and row.tag == "keep"
