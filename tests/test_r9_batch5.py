"""Known-answer tests for the round-9 fifth batch: CUPED variance
reduction (operators/evaluation.py) and the U-shaped attribution /
session-path / forecast-backtest / Markov-entropy queries
(queries/temporal.py). Hand-computed values on planted inputs; DuckDB
parity on the real tables is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from celeborn_spark.operators.evaluation import cuped_adjustment


# ---------- CUPED ----------


def test_cuped_known_value(spark):
    # (x, y) = (1,2), (2,4), (3,6): y = 2x exactly -> theta = 2, rho2 = 1
    df = spark.createDataFrame([(1, 2), (2, 4), (3, 6)], ["x", "y"])
    out = cuped_adjustment(df, "x", "y").collect()[0].asDict()
    assert out == {"n_units": 3, "theta": 2.0, "rho_sq": 1.0}


def test_cuped_uncorrelated_and_degenerate(spark):
    # symmetric anti-pattern -> cov = 0 -> theta = 0, rho2 = 0
    df = spark.createDataFrame(
        [(1, 1), (1, -1), (-1, 1), (-1, -1)], ["x", "y"]
    )
    out = cuped_adjustment(df, "x", "y").collect()[0]
    assert out["theta"] == 0.0 and out["rho_sq"] == 0.0
    # constant covariate -> var(x) = 0 -> NULL, not a crash
    const = spark.createDataFrame([(5, 1), (5, 2)], ["x", "y"])
    out2 = cuped_adjustment(const, "x", "y").collect()[0]
    assert out2["theta"] is None and out2["rho_sq"] is None


# ---------- U-shaped attribution (registered query on planted frames) ----------


def _ushape_micro(k: int, rn: int) -> int:
    if k == 1:
        return 1_000_000
    if k == 2:
        return 500_000
    mid = 200_000 // (k - 2)
    rem = 200_000 - mid * (k - 2)
    if rn == 1:
        return 400_000 + rem // 2
    if rn == k:
        return 400_000 + rem - rem // 2
    return mid


def test_ushape_policy_conserves_credit():
    # the integer remainder policy sums to exactly 1_000_000 per path
    for k in range(1, 40):
        assert sum(_ushape_micro(k, rn) for rn in range(1, k + 1)) == 1_000_000


def test_ushape_remainder_split():
    # k = 5: mid = floor(200000/3) = 66666, rem = 2 -> first 400001,
    # last 400001, middles 66666 each
    assert _ushape_micro(5, 1) == 400_001
    assert _ushape_micro(5, 5) == 400_001
    assert _ushape_micro(5, 3) == 66_666


def test_attribution_ushaped_on_testdata(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_attribution_ushaped

    rows = q_attribution_ushaped(spark, sf_dir).collect()
    total = sum(r["credit_micro"] for r in rows)
    # conservation: total micros = 1_000_000 * converting users with
    # >= 1 prior touch (recompute the cohort independently)
    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    n_users = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("conv_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == 1_000_000 * n_users


# ---------- session paths ----------


def test_session_paths_on_testdata(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_session_paths
    from celeborn_spark.queries.windows import q_sessionize

    paths = q_session_paths(spark, sf_dir).collect()
    assert 0 < len(paths) <= 15
    ranks = sorted(r["rnk"] for r in paths)
    assert ranks == list(range(1, len(paths) + 1))
    ns = [r["n"] for r in sorted(paths, key=lambda r: r["rnk"])]
    assert ns == sorted(ns, reverse=True)
    # total sessions >= sessions covered by the top paths
    n_sessions = q_sessionize(spark, sf_dir).count()
    assert sum(ns) <= n_sessions


# ---------- forecast backtest ----------


def test_forecast_backtest_scores_tail_days(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_forecast_backtest

    out = q_forecast_backtest(spark, sf_dir).collect()[0]
    # 30-day grid minus the 7-day warmup
    assert out["n_scored"] > 0
    assert out["mape"] >= 0 and out["smape"] >= 0 and out["rmse_cents"] >= 0
    # sMAPE is bounded by 2 by construction
    assert out["smape"] <= 2.0


# ---------- Markov entropy rate ----------


def test_markov_entropy_bounds_and_consistency(spark, sf_dir):
    from celeborn_spark.queries.temporal import (
        q_markov_entropy,
        q_markov_transitions,
    )

    out = q_markov_entropy(spark, sf_dir).collect()[0]
    # 5 event types -> H in [0, ln 5]; perplexity = exp(H)
    assert 0.0 <= out["entropy_rate"] <= math.log(5.0) + 1e-9
    assert abs(out["perplexity"] - math.exp(out["entropy_rate"])) < 1e-4
    # recompute from the transition matrix the registered query emits
    trans = q_markov_transitions(spark, sf_dir).collect()
    grand = sum(r["n"] for r in trans)
    assert out["n_transitions"] == grand
    h = -sum((r["n"] / grand) * math.log(r["prob"]) for r in trans)
    assert abs(out["entropy_rate"] - h) < 1e-5


# ---------- PR curve / AUPRC (sixth batch) ----------


def test_pr_curve_known_values(spark):
    from celeborn_spark.operators.evaluation import pr_curve

    # scores 10..1, positives at 10, 9, 8; 5 buckets of 2:
    # cum_pos = [2,3,3,3,3], cum_rows = [2,4,6,8,10]
    # AUPRC = (2/3)*1.0 + (1/3)*0.75 = 0.916667
    rows = [(float(s), 1 if s >= 8 else 0) for s in range(10, 0, -1)]
    df = spark.createDataFrame(rows, ["s", "label"])
    out = {
        r["bucket"]: r.asDict()
        for r in pr_curve(df, "s", "label", n_buckets=5).collect()
    }
    assert out[1]["precision"] == 1.0 and out[1]["recall"] == 2 / 3
    assert out[2]["precision"] == 0.75 and out[2]["recall"] == 1.0
    assert out[5]["precision"] == 0.3
    assert out[1]["auprc"] == round(2 / 3 + 0.25, 6)


def test_pr_curve_no_positives_is_empty(spark):
    from celeborn_spark.operators.evaluation import pr_curve

    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], ["s", "label"])
    assert pr_curve(df, "s", "label").count() == 0


# ---------- cross-correlation function (sixth batch) ----------


def test_ccf_bounds_and_pair_counts(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_cross_correlation

    rows = {r["lag"]: r.asDict() for r in q_cross_correlation(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(-3, 4))
    n0 = rows[0]["n_days"]
    for lag, r in rows.items():
        # each shift drops |lag| pairs off the grid
        assert r["n_days"] == n0 - abs(lag)
        if r["ccf"] is not None:
            assert -1.0 <= r["ccf"] <= 1.0


# ---------- rich club (sixth batch) ----------


def test_rich_club_self_consistent(spark, sf_dir):
    from celeborn_spark.operators.graph import copurchase_edges
    from celeborn_spark.catalog import load_table
    from celeborn_spark.queries.graph import q_rich_club

    out = q_rich_club(spark, sf_dir).collect()[0].asDict()
    el = copurchase_edges(load_table(spark, sf_dir, "lineitem"), min_qty=45)
    degs = {}
    for r in el.collect():
        degs[r["u"]] = degs.get(r["u"], 0) + 1
        degs[r["v"]] = degs.get(r["v"], 0) + 1
    n = len(degs)
    ordered = sorted(degs.values())
    # lower 75th-percentile rule: smallest deg with 4*cum >= 3*n
    cum = 0
    k_thr = None
    for d in ordered:
        cum += 1
        if 4 * cum >= 3 * n:
            k_thr = d
            break
    rich = {v for v, d in degs.items() if d > k_thr}
    e_rich = sum(1 for r in el.collect() if r["u"] in rich and r["v"] in rich)
    assert out["k_thr"] == k_thr
    assert out["n_rich"] == len(rich)
    assert out["e_rich"] == e_rich
    if len(rich) > 1:
        assert out["phi"] == 2 * e_rich / (len(rich) * (len(rich) - 1))
