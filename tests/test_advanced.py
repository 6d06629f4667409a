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


# --- interval merge (operators/resample.merge_intervals) ---


def test_merge_intervals_overlap_and_touch(spark):
    """[1,5],[4,8] overlap; [8,10] touches (start == running max end);
    [20,21] is a separate island."""
    from celeborn_spark.operators.resample import merge_intervals

    rows = [("k", 1, 5), ("k", 4, 8), ("k", 8, 10), ("k", 20, 21)]
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    got = sorted(
        (r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, "key", "s", "e").collect()
    )
    assert got == [(1, 10, 3), (20, 21, 1)]


def test_merge_intervals_contained_interval(spark):
    """An interval fully inside another never opens a new island even
    though its end is smaller than the running max."""
    from celeborn_spark.operators.resample import merge_intervals

    rows = [("k", 1, 100), ("k", 5, 10), ("k", 50, 60)]
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    got = [
        (r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, "key", "s", "e").collect()
    ]
    assert got == [(1, 100, 3)]


def test_merge_intervals_keys_independent(spark):
    from celeborn_spark.operators.resample import merge_intervals

    rows = [("a", 1, 5), ("b", 4, 8)]
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    assert merge_intervals(df, "key", "s", "e").count() == 2


def test_merge_intervals_duplicate_straddling_boundary(spark):
    """Regression for VERDICT r9 item 1 (the supplier-26/1998-06-22
    shape): two IDENTICAL intervals whose start sits exactly one unit
    past the previous island's end. With raw-row windows ordered by the
    non-total key (s, e), an engine may visit the tied twins in
    opposite orders across its two window passes and sum the head=0
    twin into the PREVIOUS island (DuckDB at sf0.1 merged two
    non-touching islands). The deduped form must yield two islands with
    multiplicity-preserving counts — in Spark AND in the oracle SQL."""
    import duckdb

    from celeborn_spark.operators.resample import (
        merge_intervals,
        merge_intervals_oracle_sql,
    )

    rows = [("k", 10, 17), ("k", 14, 21), ("k", 22, 29), ("k", 22, 29)]
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    want = [(10, 21, 2), (22, 29, 2)]
    got = sorted(
        (r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, "key", "s", "e").collect()
    )
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (key VARCHAR, s INTEGER, e INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = merge_intervals_oracle_sql("SELECT key, s, e FROM t", "key")
    oracle = sorted(
        (int(a), int(b), int(n))
        for a, b, n in con.execute(
            f"SELECT island_start, island_end, n_merged FROM ({sql})"
        ).fetchall()
    )
    con.close()
    assert oracle == want
