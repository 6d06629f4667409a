"""Known-answer tests for the round-9 eighth batch: k-truss
(operators/graph.py), Good-Turing / Burrows' Delta
(operators/textops.py), Cohen's kappa / runs test / Brown-Forsythe /
inter-event exponential (operators/stats.py), and MCC
(operators/evaluation.py). Hand-computed values on planted inputs;
DuckDB parity on the real tables is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from celeborn_spark.operators.evaluation import mcc_at_threshold
from celeborn_spark.operators.graph import ktruss
from celeborn_spark.operators.stats import (
    brown_forsythe,
    cohens_kappa,
    interevent_exponential,
    runs_test,
)
from celeborn_spark.operators.textops import burrows_delta, good_turing


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(set(pairs)), ["u", "v"])


# ---------- k-truss ----------


def test_ktruss_keeps_clique_drops_tail(spark):
    # K4 on {1,2,3,4}: every edge sits in 2 triangles -> survives k=4.
    # Pendant edge (4,5): support 0 -> pruned round 1.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = sorted(
        (r["u"], r["v"])
        for r in ktruss(_edges(spark, k4 + [(4, 5)]), k=4, rounds=2).collect()
    )
    assert out == sorted(k4)


def test_ktruss_cascading_prune_needs_round_two(spark):
    # Triangle chain: {1,2,3} + edge (3,4) + triangle {3,4,5} minus
    # (4,5): edges (3,4),(3,5) have support <= 1 each round -> gone;
    # round 2 re-checks the survivors (support recomputed on the
    # shrunken graph).
    es = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5)]
    out = sorted(
        (r["u"], r["v"]) for r in ktruss(_edges(spark, es), k=3, rounds=2).collect()
    )
    assert out == [(1, 2), (1, 3), (2, 3)]


def test_ktruss_k3_equals_triangle_membership(spark):
    # k=3 keeps exactly the edges in >= 1 triangle (after convergence)
    es = [(1, 2), (1, 3), (2, 3), (5, 6)]
    out = sorted(
        (r["u"], r["v"]) for r in ktruss(_edges(spark, es), k=3, rounds=1).collect()
    )
    assert out == [(1, 2), (1, 3), (2, 3)]


# ---------- Good-Turing ----------


def test_good_turing_hand_computed(spark):
    # tokens: a a a b b c -> freqs: a=3, b=2, c=1
    # coc: N_1=1, N_2=1, N_3=1; mass=6
    # r*=r=1: 2*N_2/N_1 = 2; r=2: 3*N_3/N_2 = 3; r=3: no N_4 -> NULL
    df = spark.createDataFrame([(1, "a a a b b c")], ["doc_id", "text"])
    rows = {r["r"]: r for r in good_turing(df, "text").collect()}
    assert rows[1]["n_r"] == 1 and rows[1]["r_star"] == 2.0
    assert rows[2]["n_r"] == 1 and rows[2]["r_star"] == 3.0
    assert rows[3]["r_star"] is None
    for r in rows.values():
        assert abs(r["p_unseen"] - 1 / 6) < 1e-12


def test_good_turing_no_singletons_p0_zero(spark):
    df = spark.createDataFrame([(1, "x x y y")], ["doc_id", "text"])
    rows = good_turing(df, "text").collect()
    assert all(r["p_unseen"] == 0.0 for r in rows)


# ---------- Burrows' Delta ----------


def test_burrows_outlier_source_scores_highest(spark):
    # two conformist sources + one deviant: the deviant's |z| mean wins
    docs = [
        (1, "w w w x", "s1"),
        (2, "w w w x", "s2"),
        (3, "x x x w", "s3"),
    ]
    out = {
        r["source"]: r["delta"]
        for r in burrows_delta(
            spark.createDataFrame(docs, ["doc_id", "text", "source"]),
            "text",
            "source",
            m=2,
        ).collect()
    }
    assert out["s3"] > out["s1"]
    assert abs(out["s1"] - out["s2"]) < 1e-9


def test_burrows_identical_sources_zero_meff(spark):
    # identical relative frequencies everywhere -> sd = 0 for every
    # token -> all tokens drop -> no rows (m_eff would be 0)
    docs = [(1, "p q", "s1"), (2, "p q", "s2")]
    out = burrows_delta(
        spark.createDataFrame(docs, ["doc_id", "text", "source"]),
        "text",
        "source",
        m=2,
    ).collect()
    assert out == []


# ---------- Cohen's kappa ----------


def test_cohens_kappa_known_value(spark):
    # classic 2x2: a=20, b=5, c=10, d=15, N=50
    # po = 35/50; pe = (25*30 + 25*20)/2500 = 0.5
    # kappa = (0.7-0.5)/0.5 = 0.4
    rows = (
        [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    )
    out = cohens_kappa(
        spark.createDataFrame(rows, ["r1", "r2"]), "r1", "r2"
    ).collect()[0]
    assert out["n"] == 50 and out["both_pos"] == 20 and out["both_neg"] == 15
    assert abs(out["kappa"] - 0.4) < 1e-12


def test_cohens_kappa_degenerate_rater_null(spark):
    # BOTH raters constant -> pe = 1 -> denominator 0 -> NULL;
    # one constant rater stays defined (kappa = 0, no agreement
    # beyond chance)
    rows = [(1, 1), (1, 1), (1, 1)]
    out = cohens_kappa(
        spark.createDataFrame(rows, ["r1", "r2"]), "r1", "r2"
    ).collect()[0]
    assert out["kappa"] is None
    one_const = [(1, 1), (0, 1), (1, 1)]
    out2 = cohens_kappa(
        spark.createDataFrame(one_const, ["r1", "r2"]), "r1", "r2"
    ).collect()[0]
    assert out2["kappa"] == 0.0


def test_cohens_kappa_perfect_agreement(spark):
    rows = [(1, 1)] * 3 + [(0, 0)] * 3
    out = cohens_kappa(
        spark.createDataFrame(rows, ["r1", "r2"]), "r1", "r2"
    ).collect()[0]
    assert out["kappa"] == 1.0


# ---------- runs test ----------


def test_runs_test_alternating_sequence(spark):
    import datetime as dt

    # metric alternates around its median -> maximal runs, z > 0
    days = [
        (dt.date(2024, 1, i + 1), 10 if i % 2 == 0 else 20) for i in range(10)
    ]
    out = runs_test(
        spark.createDataFrame(days, ["day", "m"]), "day", "m"
    ).collect()[0]
    # median = 10 (lower) -> equal days excluded -> only the 20s remain
    # as sign=1: n_below = 0 -> z NULL (degenerate guard)
    assert out["n_below"] == 0 and out["z"] is None


def test_runs_test_hand_computed(spark):
    import datetime as dt

    # values 1..6 on consecutive days -> median (lower) = 3, excluded;
    # remaining signs by day: 1,2 -> 0; 4,5,6 -> 1 => R = 2, n1=3, n2=2
    # mu = 2*3*2/5 + 1 = 3.4; sigma = sqrt(12*(12-5)/(25*4)) = sqrt(0.84)
    days = [(dt.date(2024, 1, i), i) for i in range(1, 7)]
    out = runs_test(
        spark.createDataFrame(days, ["day", "m"]), "day", "m"
    ).collect()[0]
    assert out["n_above"] == 3 and out["n_below"] == 2 and out["n_runs"] == 2
    z = (2 - 3.4) / math.sqrt(0.84)
    assert abs(out["z"] - round(z, 6)) < 1e-9


# ---------- Brown-Forsythe ----------


def test_brown_forsythe_equal_spreads_small_f(spark):
    # two groups with identical shapes -> SSB = 0 -> F = 0
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (11, 12, 13)]
    out = brown_forsythe(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert out["k_groups"] == 2 and out["n"] == 6
    assert out["f_stat"] == 0.0


def test_brown_forsythe_unequal_spreads_large_f(spark):
    rows = [("tight", v) for v in (10, 10, 10, 11)] + [
        ("wide", v) for v in (0, 10, 20, 30)
    ]
    out = brown_forsythe(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert out["f_stat"] is not None and out["f_stat"] > 3.0


def test_brown_forsythe_single_group_null(spark):
    rows = [("only", v) for v in (1, 5, 9)]
    out = brown_forsythe(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert out["k_groups"] == 1 and out["f_stat"] is None


# ---------- inter-event exponential ----------


def test_interevent_known_gaps(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # one user, events at +0s, +10s, +30s, +60s -> gaps 10, 20, 30
    rows = [
        (1, i, base + dt.timedelta(seconds=s))
        for i, s in enumerate((0, 10, 30, 60))
    ]
    out = interevent_exponential(
        spark.createDataFrame(rows, ["user_id", "event_id", "ts"]),
        "user_id",
        "ts",
        "event_id",
    ).collect()[0]
    assert out["n_gaps"] == 3
    assert abs(out["mean_gap_s"] - 20.0) < 1e-12
    assert abs(out["lambda_per_s"] - 3 / 60) < 1e-12
    # median (lower) of {10,20,30} = 20 -> median/mean = 1.0
    assert abs(out["median_over_mean"] - 1.0) < 1e-12
    # sd of (10,20,30) = 10 -> cv = 0.5
    assert abs(out["cv"] - 0.5) < 1e-9


def test_interevent_gaps_never_cross_users(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # two users with one event each -> no gaps at all
    rows = [(1, 1, base), (2, 2, base + dt.timedelta(seconds=5))]
    out = interevent_exponential(
        spark.createDataFrame(rows, ["user_id", "event_id", "ts"]),
        "user_id",
        "ts",
        "event_id",
    ).collect()[0]
    assert out["n_gaps"] == 0


# ---------- MCC ----------


def test_mcc_perfect_and_inverted(spark):
    rows = [(0.9, 1)] * 3 + [(0.1, 0)] * 3
    out = mcc_at_threshold(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y", threshold_cents=50
    ).collect()[0]
    assert out["tp"] == 3 and out["tn"] == 3 and out["mcc"] == 1.0
    inv = [(0.9, 0)] * 3 + [(0.1, 1)] * 3
    out2 = mcc_at_threshold(
        spark.createDataFrame(inv, ["p", "y"]), "p", "y", threshold_cents=50
    ).collect()[0]
    assert out2["mcc"] == -1.0


def test_mcc_degenerate_marginal_null(spark):
    rows = [(0.9, 1), (0.8, 1)]  # no negatives -> tn+fp = 0 -> NULL
    out = mcc_at_threshold(
        spark.createDataFrame(rows, ["p", "y"]), "p", "y", threshold_cents=50
    ).collect()[0]
    assert out["mcc"] is None
