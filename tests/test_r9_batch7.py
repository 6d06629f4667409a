"""Known-answer tests for the round-9 seventh batch: log-rank /
Nelson-Aalen / McNemar (operators/stats.py), Brier decomposition /
threshold sweep / UCB1 (operators/evaluation.py), the l-diversity
audit (queries/advanced.py), and RAKE keyword scores
(operators/textops.py). Hand-computed values on planted inputs;
DuckDB parity on the real tables is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from celeborn_spark.operators.evaluation import (
    brier_decomposition,
    threshold_sweep,
    ucb1_scores,
)
from celeborn_spark.operators.stats import (
    log_rank_test,
    mcnemar_test,
    nelson_aalen,
)
from celeborn_spark.operators.textops import rake_word_scores


# ---------- log-rank ----------


def test_log_rank_identical_groups_chi2_zero(spark):
    # identical duration profiles -> O = E -> chi2 = 0
    rows = [(1, t) for t in (1, 2, 3)] + [(2, t) for t in (1, 2, 3)]
    out = log_rank_test(
        spark.createDataFrame(rows, ["g", "t"]), "g", "t", 1, 2
    ).collect()[0]
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["o_a"] == 3 and abs(out["e_a"] - 3.0) < 1e-9
    assert out["chi2"] == 0.0


def test_log_rank_hand_computed(spark):
    # group 1 dies at t=1,1; group 2 at t=2,2.
    # t=1: n1=2,n2=2,d=2 -> e1 = 2*2/4 = 1, v = (2*2/4)*(2/4)*(2/3) = 1/3
    # t=2: n1=0,n2=2,d=2 -> e1 = 0, v = 0 (n1=0 -> d*n1 = 0)
    # O1 = 2, E1 = 1, V = 1/3, chi2 = (2-1)^2/(1/3) = 3
    rows = [(1, 1), (1, 1), (2, 2), (2, 2)]
    out = log_rank_test(
        spark.createDataFrame(rows, ["g", "t"]), "g", "t", 1, 2
    ).collect()[0]
    assert out["o_a"] == 2
    assert abs(out["e_a"] - 1.0) < 1e-9
    assert abs(out["v_stat"] - round(1 / 3, 6)) < 1e-9
    assert abs(out["chi2"] - 3.0) < 1e-6


def test_log_rank_degenerate_single_duration_null(spark):
    # every subject shares ONE duration -> at that t, n = d -> the
    # (n-d)/(n-1) factor zeroes V -> chi2 NULL, no crash
    rows = [(1, 5), (2, 5)]
    out = log_rank_test(
        spark.createDataFrame(rows, ["g", "t"]), "g", "t", 1, 2
    ).collect()[0]
    assert out["v_stat"] == 0.0 and out["chi2"] is None


# ---------- Nelson-Aalen ----------


def test_nelson_aalen_hand_computed(spark):
    # durations 1, 1, 2: t=1 n=3 d=2 -> H = 2/3; t=2 n=1 d=1 -> H = 5/3
    df = spark.createDataFrame([(1,), (1,), (2,)], ["t"])
    rows = {r["t"]: r for r in nelson_aalen(df, "t").collect()}
    assert rows[1]["n_at_risk"] == 3 and rows[1]["d_events"] == 2
    assert abs(rows[1]["cum_hazard"] - round(2 / 3, 6)) < 1e-9
    assert rows[2]["n_at_risk"] == 1 and rows[2]["d_events"] == 1
    assert abs(rows[2]["cum_hazard"] - round(2 / 3 + 1.0, 6)) < 1e-9


def test_nelson_aalen_below_ln_survival(spark, sf_dir):
    # H(t) <= -ln(S(t)) pointwise (x <= -ln(1-x) per increment);
    # equality only as d/n -> 0. Cross-check against km_survival on
    # the same durations.
    from celeborn_spark.operators.stats import km_survival
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    durs = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts")).cast("date"), F.min(F.col("ts")).cast("date")
        ).alias("t")
    )
    na = {r["t"]: r["cum_hazard"] for r in nelson_aalen(durs, "t").collect()}
    km = {r["t"]: r["survival"] for r in km_survival(durs, "t").collect()}
    assert set(na) == set(km)
    for t, h in na.items():
        if km[t] > 0:
            assert h <= -math.log(km[t]) + 1e-9


# ---------- McNemar ----------


def test_mcnemar_hand_computed(spark):
    # b = 3 (1,0), c = 1 (0,1) -> chi2 = (|3-1|-1)^2/4 = 0.25
    rows = [(1, 0)] * 3 + [(0, 1)] + [(1, 1)] * 5
    out = mcnemar_test(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert out["b_disc"] == 3 and out["c_disc"] == 1
    assert abs(out["chi2"] - 0.25) < 1e-12


def test_mcnemar_no_discordant_pairs_null(spark):
    rows = [(1, 1), (0, 0), (1, 1)]
    out = mcnemar_test(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert out["b_disc"] == 0 and out["c_disc"] == 0 and out["chi2"] is None


# ---------- Brier decomposition ----------


def test_brier_decomposition_perfect_scorer(spark):
    # scores 0.05 (label 0) and 0.95 (label 1), 10 bins over [0,1]:
    # bin 1 all-negative conf 0.05, bin 10 all-positive conf 0.95 ->
    # rel = mean((conf-acc)^2 weighted) = 0.05^2 = 0.0025,
    # base = 0.5, res = mean((acc-base)^2) = 0.25, unc = 0.25,
    # brier = 0.0025 - 0.25 + 0.25 = 0.0025
    rows = [(0.05, 0)] * 4 + [(0.95, 1)] * 4
    out = brier_decomposition(
        spark.createDataFrame(rows, ["p", "label"]),
        "p",
        "label",
        denom_cents=100,
        n_bins=10,
    ).collect()[0]
    assert out["n"] == 8
    assert abs(out["rel"] - 0.0025) < 1e-9
    assert abs(out["res"] - 0.25) < 1e-9
    assert abs(out["unc"] - 0.25) < 1e-9
    assert abs(out["brier_binned"] - 0.0025) < 1e-9


def test_brier_identity_holds_on_events(spark, sf_dir):
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    out = brier_decomposition(
        ev, "value", "y", denom_cents=50000, n_bins=10
    ).collect()[0]
    # Murphy identity (on the rounded parts, so 1e-5 slack)
    assert (
        abs(out["brier_binned"] - (out["rel"] - out["res"] + out["unc"]))
        < 1e-5
    )
    assert out["rel"] >= 0 and out["res"] >= 0 and 0 <= out["unc"] <= 0.25


# ---------- threshold sweep ----------


def test_threshold_sweep_counts_conserve(spark):
    rows = [(0.05, 0)] * 3 + [(0.55, 1)] * 2 + [(0.85, 1)] * 1
    out = threshold_sweep(
        spark.createDataFrame(rows, ["p", "label"]),
        "p",
        "label",
        denom_cents=100,
        n_bins=10,
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r["tp"] + r["fn"] == 3  # positives conserve
        assert r["fp"] + r["tn"] == 3  # negatives conserve
    # threshold 1 (s >= 0) predicts everything positive
    r1 = next(r for r in out if r["thr_bin"] == 1)
    assert r1["tp"] == 3 and r1["fp"] == 3 and r1["recall"] == 1.0
    # threshold above every score -> nothing predicted, precision NULL
    r10 = next(r for r in out if r["thr_bin"] == 10)
    assert r10["tp"] == 0 and r10["precision"] is None
    # at 0.5: tp=3, fp=0 -> precision 1, recall 1, f1 1
    r6 = next(r for r in out if r["thr_bin"] == 6)
    assert r6["precision"] == 1.0 and r6["recall"] == 1.0 and r6["f1"] == 1.0


def test_threshold_sweep_monotone_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    rows = sorted(
        threshold_sweep(ev, "value", "y", 50000, 10).collect(),
        key=lambda r: r["thr_bin"],
    )
    recalls = [r["recall"] for r in rows]
    assert all(a >= b - 1e-12 for a, b in zip(recalls, recalls[1:]))
    pps = [r["tp"] + r["fp"] for r in rows]
    assert all(a >= b for a, b in zip(pps, pps[1:]))


# ---------- UCB1 ----------


def test_ucb1_known_values(spark):
    # arm A: 2 pulls mean 1.0 (100 cents of 100); arm B: 8 pulls mean 0
    rows = [("A", 1.0)] * 2 + [("B", 0.0)] * 8
    out = {
        r["arm"]: r
        for r in ucb1_scores(
            spark.createDataFrame(rows, ["arm", "v"]),
            "arm",
            "v",
            reward_max_cents=100,
        ).collect()
    }
    assert out["A"]["n_pulls"] == 2 and out["B"]["n_pulls"] == 8
    assert abs(out["A"]["mean_reward"] - 1.0) < 1e-12
    assert abs(out["B"]["mean_reward"] - 0.0) < 1e-12
    assert abs(
        out["A"]["ucb"] - round(1.0 + math.sqrt(2 * math.log(10) / 2), 6)
    ) < 1e-9
    assert abs(
        out["B"]["ucb"] - round(0.0 + math.sqrt(2 * math.log(10) / 8), 6)
    ) < 1e-9
    # fewer pulls -> bigger bonus
    bonus_a = out["A"]["ucb"] - out["A"]["mean_reward"]
    bonus_b = out["B"]["ucb"] - out["B"]["mean_reward"]
    assert bonus_a > bonus_b


# ---------- l-diversity ----------


def test_l_diversity_flags_homogeneous_groups(spark, sf_dir):
    from celeborn_spark.queries.advanced import q_l_diversity

    rows = q_l_diversity(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert (r["violates_l"] == 1) == (r["distinct_sensitive"] < 3)
        assert 1 <= r["distinct_sensitive"] <= r["group_size"]


# ---------- RAKE ----------


def test_rake_hand_computed(spark):
    # doc: "big join the fast scan" with stopword 'the':
    # phrases: [big, join] (len 2), [fast, scan] (len 2)
    # every word: deg = 2, freq = 1 -> score 2.0
    df = spark.createDataFrame(
        [(1, "big join the fast scan")], ["doc_id", "text"]
    )
    out = {
        r["word"]: r
        for r in rake_word_scores(df, "text", ("a", "the"), k=20).collect()
    }
    assert set(out) == {"big", "join", "fast", "scan"}
    for r in out.values():
        assert r["deg"] == 2 and r["freq"] == 1 and r["score"] == 2.0


def test_rake_degree_rewards_long_phrases(spark):
    # "alpha beta gamma" (one 3-phrase) vs "delta the delta the delta"
    # (three 1-phrases): alpha deg=3 freq=1 score=3; delta deg=3 freq=3
    # score=1 -> long-phrase words outrank repeated singletons
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta the delta the delta")],
        ["doc_id", "text"],
    )
    out = {
        r["word"]: r
        for r in rake_word_scores(df, "text", ("a", "the"), k=20).collect()
    }
    assert out["alpha"]["score"] == 3.0 and out["alpha"]["deg"] == 3
    assert out["delta"]["score"] == 1.0 and out["delta"]["freq"] == 3


def test_rake_stopword_only_doc_yields_nothing(spark):
    df = spark.createDataFrame(
        [(1, "the a the"), (2, "scan the join")], ["doc_id", "text"]
    )
    out = rake_word_scores(df, "text", ("a", "the"), k=20).collect()
    assert {r["word"] for r in out} == {"scan", "join"}
