"""Known-answer tests for the round-9 tenth batch: t-closeness,
Cochran-Armitage trend, Theil index (operators/stats.py) and the
Hanley-McNeil AUC CI (operators/evaluation.py). Hand-computed values
on planted inputs; DuckDB parity on the real tables is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from celeborn_spark.operators.evaluation import auc_ci
from celeborn_spark.operators.stats import (
    cochran_armitage,
    t_closeness,
    theil_index,
)


# ---------- t-closeness ----------


def test_t_closeness_identical_distribution_zero(spark):
    # both groups mirror the global 50/50 band mix -> t = 0
    rows = [("g1", 0), ("g1", 1), ("g2", 0), ("g2", 1)]
    out = {
        r["g"]: r["t_close"]
        for r in t_closeness(
            spark.createDataFrame(rows, ["g", "band"]), ["g"], F.col("band")
        ).collect()
    }
    assert out == {"g1": 0.0, "g2": 0.0}


def test_t_closeness_skewed_group_hand_value(spark):
    # global bands {0: 3, 1: 1}; group a = {0,0,0} (skewed), b = {1}
    # m = 2 bands; gap at band 0: |cumA - cumG| = |1 - 0.75| = 0.25
    # t(a) = 0.25 / (2-1) = 0.25; for b: |0 - 0.75| = 0.75
    rows = [("a", 0), ("a", 0), ("a", 0), ("b", 1)]
    out = {
        r["g"]: r
        for r in t_closeness(
            spark.createDataFrame(rows, ["g", "band"]), ["g"], F.col("band")
        ).collect()
    }
    assert abs(out["a"]["t_close"] - 0.25) < 1e-9
    assert abs(out["b"]["t_close"] - 0.75) < 1e-9
    assert out["a"]["n"] == 3 and out["b"]["n"] == 1


def test_t_closeness_single_band_zero(spark):
    rows = [("a", 5), ("b", 5)]
    out = t_closeness(
        spark.createDataFrame(rows, ["g", "band"]), ["g"], F.col("band")
    ).collect()
    assert all(r["t_close"] == 0.0 for r in out)


def test_t_closeness_triad_on_customers(spark, sf_dir):
    # bounded in [0, 1]; most groups should sit well under the global
    # spread (sanity of the audit semantics, not a fixed value)
    from celeborn_spark.queries.stats import q_t_closeness

    rows = q_t_closeness(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["t_close"] <= 1.0


# ---------- Cochran-Armitage ----------


def test_cochran_armitage_perfect_trend(spark):
    # rates 0/…, then all positive at the top score -> strong z > 0
    rows = (
        [(1, 0)] * 10 + [(2, 0)] * 8 + [(2, 1)] * 2 + [(3, 1)] * 10
    )
    out = cochran_armitage(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    assert out["n"] == 30 and out["k_groups"] == 3
    assert out["z"] > 4.0


def test_cochran_armitage_flat_rates_zero(spark):
    # identical rate in every group -> Tn = 0 -> z = 0
    rows = [(s, y) for s in (1, 2, 3) for y in (1, 0, 0, 0)]
    out = cochran_armitage(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    assert out["z"] == 0.0


def test_cochran_armitage_degenerate_null(spark):
    # constant outcome -> NULL; constant score -> NULL
    allpos = [(s, 1) for s in (1, 2, 3)]
    out = cochran_armitage(
        spark.createDataFrame(allpos, ["s", "y"]), "s", "y"
    ).collect()[0]
    assert out["z"] is None
    onescore = [(5, y) for y in (0, 1, 0)]
    out2 = cochran_armitage(
        spark.createDataFrame(onescore, ["s", "y"]), "s", "y"
    ).collect()[0]
    assert out2["z"] is None


def test_cochran_armitage_sign_follows_direction(spark):
    up = [(1, 0)] * 5 + [(2, 1), (2, 0), (2, 0), (2, 0), (2, 0)] + [(3, 1)] * 5
    down = [(3 + 1 - s, y) for s, y in up]  # reverse the scores
    zu = cochran_armitage(
        spark.createDataFrame(up, ["s", "y"]), "s", "y"
    ).collect()[0]["z"]
    zd = cochran_armitage(
        spark.createDataFrame(down, ["s", "y"]), "s", "y"
    ).collect()[0]["z"]
    assert zu > 0 and abs(zu + zd) < 1e-9


# ---------- Theil index ----------


def test_theil_equal_units_zero(spark):
    rows = [("a", 10), ("b", 10), ("c", 10)]
    out = theil_index(
        spark.createDataFrame(rows, ["u", "m"]), "u", "m"
    ).collect()[0]
    assert out["n_units"] == 3 and out["theil"] == 0.0


def test_theil_total_concentration_ln_n(spark):
    # all mass in one of 4 units -> T = ln(4)
    rows = [("a", 100), ("b", 0), ("c", 0), ("d", 0)]
    out = theil_index(
        spark.createDataFrame(rows, ["u", "m"]), "u", "m"
    ).collect()[0]
    assert abs(out["theil"] - round(math.log(4), 6)) < 1e-9


def test_theil_hand_computed(spark):
    # units (1, 3): mu = 2; T = (1/2)[(0.5 ln 0.5) + (1.5 ln 1.5)]
    rows = [("a", 1), ("b", 3)]
    out = theil_index(
        spark.createDataFrame(rows, ["u", "m"]), "u", "m"
    ).collect()[0]
    want = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert abs(out["theil"] - round(want, 6)) < 1e-9


# ---------- AUC CI ----------


def test_auc_ci_brackets_auc_and_clamps(spark):
    rows = [(0.9, 1)] * 5 + [(0.1, 0)] * 5  # perfect separation, A = 1
    out = auc_ci(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y"
    ).collect()[0]
    assert out["auc"] == 1.0
    # A = 1 -> SE = 0 -> degenerate CI [1, 1], upper clamped at 1
    assert out["se"] == 0.0 and out["ci_lo"] == 1.0 and out["ci_hi"] == 1.0


def test_auc_ci_hand_computed(spark):
    # pos scores 3,2; neg 2,1: wins 3>2, 3>1, 2>1 plus the 2-2 tie at
    # half -> U = 3.5, A = 7/8
    rows = [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)]
    out = auc_ci(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y"
    ).collect()[0]
    a = out["auc"]
    assert abs(a - 0.875) < 1e-12
    q1 = a / (2 - a)
    q2 = 2 * a * a / (1 + a)
    se = math.sqrt(
        (a * (1 - a) + (2 - 1) * (q1 - a * a) + (2 - 1) * (q2 - a * a))
        / (2 * 2)
    )
    assert abs(out["se"] - round(se, 6)) < 1e-9
    z = 1.959963984540054
    assert abs(out["ci_lo"] - round(max(0.0, a - z * se), 6)) < 1e-9
    assert abs(out["ci_hi"] - round(min(1.0, a + z * se), 6)) < 1e-9


def test_auc_ci_narrows_with_sample_size(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    full = auc_ci(o, "o_totalprice", "label").collect()[0]
    small = auc_ci(
        o.limit(200), "o_totalprice", "label"
    ).collect()[0]
    assert full["se"] < small["se"]
    assert (full["ci_hi"] - full["ci_lo"]) < (
        small["ci_hi"] - small["ci_lo"]
    )
