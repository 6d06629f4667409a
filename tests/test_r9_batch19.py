"""Known-answer tests for the round-9 nineteenth batch: post-hoc
pairwise Welch and empirical-Bayes rate shrinkage
(operators/stats.py). DuckDB parity is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from celeborn_spark.operators.stats import eb_shrunk_rates, pairwise_welch


def test_pairwise_welch_hand_computed(spark):
    # a = {0,2} (mean 1, var 2), b = {10,12} (mean 11, var 2), c = a
    rows = (
        [("a", 0), ("a", 2)] + [("b", 10), ("b", 12)] + [("c", 0), ("c", 2)]
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in pairwise_welch(
            spark.createDataFrame(rows, ["g", "v"]), "g", F.col("v")
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(r["n_pairs"] == 3 for r in out.values())
    # a vs b: t = (1 - 11)/sqrt(1 + 1) = -7.0711; a vs c: t = 0
    ab = out[("a", "b")]
    assert abs(ab["t_stat"] + 10 / math.sqrt(2)) < 1e-4
    assert out[("a", "c")]["t_stat"] == 0.0
    # symmetric pair magnitudes agree
    assert abs(ab["t_stat"]) == abs(out[("b", "c")]["t_stat"])


def test_pairwise_welch_degenerate_null(spark):
    rows = [("a", 5), ("b", 5), ("b", 5)]  # n_a = 1 -> NULL for its pairs
    out = {
        (r["group_a"], r["group_b"]): r
        for r in pairwise_welch(
            spark.createDataFrame(rows, ["g", "v"]), "g", F.col("v")
        ).collect()
    }
    assert out[("a", "b")]["t_stat"] is None


def test_eb_shrinkage_pulls_small_groups_harder(spark):
    # tiny group at rate 1.0, big group at its own rate; global ~ big
    rows = [("tiny", 1)] * 2 + [("big", 1)] * 300 + [("big", 0)] * 700
    out = {
        r["group"]: r
        for r in eb_shrunk_rates(
            spark.createDataFrame(rows, ["g", "y"]), "g", "y", strength=20
        ).collect()
    }
    tiny, big = out["tiny"], out["big"]
    assert tiny["raw_rate"] == 1.0 and abs(big["raw_rate"] - 0.3) < 1e-12
    # tiny moves a lot toward the global (~0.301), big barely moves
    assert abs(tiny["shrunk_rate"] - tiny["raw_rate"]) > 0.5
    assert abs(big["shrunk_rate"] - big["raw_rate"]) < 0.01
    # shrunk rates stay between raw and global
    p0 = 302 / 1002
    for r in (tiny, big):
        lo, hi = sorted((r["raw_rate"], p0))
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12


def test_eb_shrinkage_exact_formula(spark):
    rows = [("g", 1), ("g", 0), ("h", 1), ("h", 1)]
    out = {
        r["group"]: r["shrunk_rate"]
        for r in eb_shrunk_rates(
            spark.createDataFrame(rows, ["g", "y"]), "g", "y", strength=4
        ).collect()
    }
    p0 = 3 / 4
    assert abs(out["g"] - (1 + 4 * p0) / 6) < 1e-12
    assert abs(out["h"] - (2 + 4 * p0) / 6) < 1e-12
