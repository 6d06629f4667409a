"""Known-answer tests for the model-evaluation + drift operators
(operators/evaluation.py): ROC AUC, gains/lift, calibration ECE, PSI,
Hellinger, 1D Wasserstein, Pettitt, Hodges-Lehmann. Each pins
hand-computed values on planted inputs; DuckDB parity on the real
tables is pinned separately by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import datetime
import math

from celeborn_spark.operators.evaluation import (
    calibration_bins,
    gains_table,
    hellinger_distance,
    hodges_lehmann_shift,
    pettitt_changepoint,
    psi_drift,
    roc_auc,
    wasserstein_1d,
)


# ---------- ROC AUC ----------


def test_roc_auc_known_value(spark):
    # pos scores [3, 2], neg scores [1, 2]: pairwise wins 3 + tie 0.5
    # -> AUC = 3.5/4 = 0.875 (tie-corrected average ranks)
    rows = [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)]
    df = spark.createDataFrame(rows, ["s", "label"])
    out = roc_auc(df, "s", "label").collect()[0].asDict()
    assert out == {"n_pos": 2, "n_neg": 2, "u_stat": 3.5, "auc": 0.875}


def test_roc_auc_perfect_and_degenerate(spark):
    # perfectly separated -> AUC = 1; all-positive -> auc NULL (guard)
    df = spark.createDataFrame([(5.0, 1), (4.0, 1), (1.0, 0)], ["s", "label"])
    assert roc_auc(df, "s", "label").collect()[0]["auc"] == 1.0
    allpos = spark.createDataFrame([(5.0, 1), (4.0, 1)], ["s", "label"])
    assert roc_auc(allpos, "s", "label").collect()[0]["auc"] is None


# ---------- gains / lift ----------


def test_gains_table_known_values(spark):
    # scores 10..1, positives at 10, 9, 8; 5 buckets of 2
    rows = [(float(s), 1 if s >= 8 else 0) for s in range(10, 0, -1)]
    df = spark.createDataFrame(rows, ["s", "label"])
    out = {
        r["bucket"]: r.asDict()
        for r in gains_table(df, "s", "label", n_buckets=5).collect()
    }
    assert out[1]["n_pos"] == 2 and out[1]["cum_pos"] == 2
    assert out[1]["capture_rate"] == 2 / 3
    assert out[1]["cum_lift"] == (2 * 10) / (2 * 3)
    assert out[2]["cum_pos"] == 3 and out[2]["capture_rate"] == 1.0
    assert out[5]["cum_lift"] == 1.0


def test_gains_tied_block_stays_in_one_bucket(spark):
    # a tied score block straddling a boundary lands wholly in the
    # bucket of its FIRST row (histogram bucketing, not ntile)
    rows = [(5.0, 1), (5.0, 0), (5.0, 0), (1.0, 0)]
    df = spark.createDataFrame(rows, ["s", "label"])
    out = {
        r["bucket"]: r.asDict()
        for r in gains_table(df, "s", "label", n_buckets=2).collect()
    }
    assert out[1]["n_rows"] == 3 and out[2]["n_rows"] == 1


# ---------- calibration / ECE ----------


def test_calibration_exact_integer_ece(spark):
    # D = 1000 cents ($10 scale), 2 bins:
    # bin1 = {(2.0, 0), (3.0, 1)}: acc 0.5, conf 0.25, |D*pos-cents| = 500
    # bin2 = {(7.5, 1), (9.0, 1)}: acc 1.0, conf 0.825, term = 350
    # ECE = 850/4000 = 0.2125
    rows = [(2.0, 0), (3.0, 1), (7.5, 1), (9.0, 1)]
    df = spark.createDataFrame(rows, ["s", "label"])
    out = {
        r["bin"]: r.asDict()
        for r in calibration_bins(df, "s", "label", denom_cents=1000, n_bins=2).collect()
    }
    assert out[1]["acc"] == 0.5 and out[1]["conf"] == 0.25
    assert out[2]["acc"] == 1.0 and out[2]["conf"] == 0.825
    assert out[1]["ece"] == 0.2125 and out[2]["ece"] == 0.2125


# ---------- PSI ----------


def test_psi_known_value(spark):
    # bins [0,5), [5,10]: A = {1, 2} all bin1; B = {1, 6} split.
    # bin1: (1 - 0.5) * ln(2); bin2 skipped (ca = 0) -> bins_used = 1
    rows = [(1.0, 1), (2.0, 1), (1.0, 0), (6.0, 0)]
    df = spark.createDataFrame(rows, ["v", "c"])
    out = psi_drift(df, "v", "c", lo=0.0, hi=10.0, n_bins=2).collect()[0].asDict()
    assert out == {
        "psi": round(0.5 * math.log(2.0), 6),
        "bins_used": 1,
        "n_a": 2,
        "n_b": 2,
    }


def test_psi_identical_cohorts_zero(spark):
    rows = [(v, c) for c in (0, 1) for v in (1.0, 3.0, 7.0)]
    df = spark.createDataFrame(rows, ["v", "c"])
    out = psi_drift(df, "v", "c", lo=0.0, hi=10.0, n_bins=2).collect()[0]
    assert out["psi"] == 0.0 and out["bins_used"] == 2


# ---------- Hellinger / Bhattacharyya ----------


def test_hellinger_known_value(spark):
    # A = {x, x}, B = {x, y}: BC = sqrt(1 * 0.5) = sqrt(0.5)
    rows = [("x", 1), ("x", 1), ("x", 0), ("y", 0)]
    df = spark.createDataFrame(rows, ["cat", "c"])
    out = hellinger_distance(df, "cat", "c").collect()[0].asDict()
    assert out["bc_coef"] == round(math.sqrt(0.5), 6)
    assert out["hellinger"] == round(math.sqrt(1 - math.sqrt(0.5)), 6)
    assert out["bhattacharyya"] == round(0.5 * math.log(2.0), 6)
    assert out["n_a"] == 2 and out["n_b"] == 2


def test_hellinger_identical_distributions(spark):
    rows = [(cat, c) for c in (0, 1) for cat in ("x", "x", "y")]
    df = spark.createDataFrame(rows, ["cat", "c"])
    out = hellinger_distance(df, "cat", "c").collect()[0]
    assert out["bc_coef"] == 1.0 and out["hellinger"] == 0.0


# ---------- 1D Wasserstein ----------


def test_wasserstein_pure_shift(spark):
    # b is a by +1 dollar -> W1 = 1.0 exactly
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0].asDict()
    assert out == {"n_a": 2, "n_b": 2, "w1": 1.0}


def test_wasserstein_identical_is_zero(spark):
    rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.5, 9.9)]
    df = spark.createDataFrame(rows, ["g", "v"])
    assert wasserstein_1d(df, "g", "v", "a", "b").collect()[0]["w1"] == 0.0


# ---------- Pettitt ----------


def test_pettitt_known_changepoint(spark):
    # daily metric [1, 1, 5, 5]: ranks (1.5, 1.5, 3.5, 3.5),
    # U_t = 2*R_t - 5t = (-2, -4, -2); K = 4 at t = 2 (day 2)
    days = [datetime.date(2024, 1, d) for d in (1, 2, 3, 4)]
    rows = list(zip(days, [1, 1, 5, 5]))
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = pettitt_changepoint(df, "day", "cents").collect()[0].asDict()
    assert out["change_day"] == "2024-01-02"
    assert out["k_stat"] == 4.0 and out["n_days"] == 4
    assert out["p_approx"] == round(2 * math.exp(-96 / 80), 6)


def test_pettitt_argmax_ties_to_earliest_day(spark):
    # symmetric series -> |U_t| ties; the earliest attaining day wins
    days = [datetime.date(2024, 1, d) for d in (1, 2, 3, 4)]
    rows = list(zip(days, [1, 5, 1, 5]))
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = pettitt_changepoint(df, "day", "cents").collect()[0]
    assert out["change_day"] == "2024-01-01"


# ---------- Hodges-Lehmann ----------


def test_hodges_lehmann_known_shift(spark):
    # a = {5, 6}, b = {1, 2}: diffs {3:1, 4:2, 5:1}, lower weighted
    # median of W = 4 -> smallest d with 2*cum >= 4 -> 4
    rows = [("a", 5.0), ("a", 6.0), ("b", 1.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = hodges_lehmann_shift(df, "g", "v", "a", "b").collect()[0].asDict()
    assert out == {"n_a": 2, "n_b": 2, "hl_shift": 4}


def test_hodges_lehmann_identical_is_zero(spark):
    rows = [(g, v) for g in ("a", "b") for v in (3.0, 8.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    assert hodges_lehmann_shift(df, "g", "v", "a", "b").collect()[0]["hl_shift"] == 0
