"""Known-answer tests for the round-9 twelfth batch: Kruskal-Wallis,
Granger lead-lag (operators/stats.py), and the negative-sampling
table (operators/textops.py). Hand-computed values on planted inputs;
DuckDB parity on the real tables is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from celeborn_spark.operators.stats import granger_leadlag, kruskal_wallis
from celeborn_spark.operators.textops import negative_sampling_table


# ---------- Kruskal-Wallis ----------


def test_kw_identical_groups_zero(spark):
    rows = [(g, v) for g in ("a", "b", "c") for v in (1, 2, 3, 4)]
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert out["k_groups"] == 3 and out["n"] == 12
    assert abs(out["h_stat"]) < 1e-9


def test_kw_hand_computed_no_ties(spark):
    # groups a={1,2}, b={3,4}: ranks a={1,2} sum 3, b={3,4} sum 7
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 0.6*29 - 15 = 2.4; no ties
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert abs(out["h_stat"] - 2.4) < 1e-9


def test_kw_matches_two_group_rank_logic(spark):
    # for k=2 without ties, H = z^2 relation isn't exact under ties,
    # so instead cross-check against a direct python H computation
    import random

    rng = random.Random(7)
    rows = [(rng.choice("ab"), rng.randint(0, 9)) for _ in range(60)]
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    # direct reference
    vals = sorted(v for _, v in rows)
    n = len(vals)
    # average ranks
    from collections import Counter, defaultdict

    cnt = Counter(vals)
    avg_rank = {}
    cum = 0
    for v in sorted(cnt):
        t = cnt[v]
        avg_rank[v] = (2 * cum + t + 1) / 2
        cum += t
    rsum = defaultdict(float)
    nsum = defaultdict(int)
    for g, v in rows:
        rsum[g] += avg_rank[v]
        nsum[g] += 1
    h = 12 / (n * (n + 1)) * sum(
        rsum[g] ** 2 / nsum[g] for g in rsum
    ) - 3 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    h /= 1 - tie / (n**3 - n)
    assert abs(out["h_stat"] - round(h, 6)) < 1e-6


def test_kw_all_tied_null(spark):
    rows = [("a", 5), ("b", 5), ("c", 5)]
    out = kruskal_wallis(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert out["h_stat"] is None


# ---------- Granger lead-lag ----------


def _daily(xy):
    base = dt.date(2024, 1, 1)
    return [
        (base + dt.timedelta(days=i), x, y) for i, (x, y) in enumerate(xy)
    ]


def test_granger_x_leads_y_strongly(spark):
    # y_t = 10*x_{t-1} + tiny alternating noise (an EXACT y = x lag
    # zeroes RSS_f and the guard correctly NULLs the undefined F) ->
    # beta_x ~ 10, near-1 R2, large incremental F
    xs = [5, 9, 2, 8, 1, 7, 3, 10, 4, 6, 11, 0]
    xy = [
        (x, 10 * xs[i - 1] + (i % 2) if i > 0 else 0)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(_daily(xy), ["day", "x", "y"])
    out = granger_leadlag(df, "day", F.col("x"), F.col("y")).collect()[0]
    assert out["n_days"] == 11
    assert abs(out["beta_x"] - 10.0) < 0.2
    assert out["r2_full"] > 0.999
    assert out["granger_f"] > 100


def test_granger_pure_ar_no_x_signal(spark):
    # y follows its own lag exactly; x is constant-noise-free junk ->
    # collinear-with-nothing, beta_x ~ 0, F ~ 0
    ys = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    xy = [(i % 3, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(_daily(xy), ["day", "x", "y"])
    out = granger_leadlag(df, "day", F.col("x"), F.col("y")).collect()[0]
    if out["granger_f"] is not None:
        assert out["r2_full"] - out["r2_restricted"] < 0.02


def test_granger_degenerate_null(spark):
    # constant y -> syy = 0 -> NULL readouts, no crash
    xy = [(i, 7) for i in range(8)]
    df = spark.createDataFrame(_daily(xy), ["day", "x", "y"])
    out = granger_leadlag(df, "day", F.col("x"), F.col("y")).collect()[0]
    assert out["granger_f"] is None and out["beta_x"] is None


# ---------- negative sampling table ----------


def test_negative_sampling_hand_values(spark):
    # counts: a=16, b=1 -> weights 16^0.75 = 8, 1 -> p(a) = 8/9
    df = spark.createDataFrame(
        [(1, " ".join(["a"] * 16 + ["b"]))], ["doc_id", "text"]
    )
    out = {
        r["tok"]: r
        for r in negative_sampling_table(df, "text").collect()
    }
    assert out["a"]["c"] == 16 and abs(out["a"]["weight"] - 8.0) < 1e-9
    assert abs(out["a"]["p_neg"] - 8 / 9) < 1e-9
    assert abs(out["b"]["p_neg"] - 1 / 9) < 1e-9
    # cumulative ranges partition [0, 1]
    his = sorted(r["cum_hi"] for r in out.values())
    assert abs(his[-1] - 1.0) < 1e-12


def test_negative_sampling_flattens_the_distribution(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = negative_sampling_table(d, "text").collect()
    mass = sum(r["c"] for r in rows)
    # p_neg is flatter than the raw unigram: rare tokens gain, the
    # head loses
    for r in rows:
        raw = r["c"] / mass
        if raw > 1.5 / len(rows):
            assert r["p_neg"] < raw + 1e-12
    total = sum(r["p_neg"] for r in rows)
    assert abs(total - 1.0) < 1e-9
