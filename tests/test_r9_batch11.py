"""Known-answer tests for the round-9 eleventh batch: the KS +
Benjamini-Hochberg drift screen (operators/stats.py), the
split-conformal forecast interval, and the day-over-day JS mix-drift
series (operators/evaluation.py). Hand-computed values on planted
inputs; DuckDB parity on the real tables is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from celeborn_spark.operators.evaluation import (
    conformal_interval,
    mix_drift_series,
)
from celeborn_spark.operators.stats import ks_bh_screen


# ---------- KS + BH screen ----------


def test_ks_bh_flags_the_planted_shift(spark):
    # groups a/b/c share one band profile; a SMALL group z sits in its
    # own band -> z's one-vs-rest D = 1 and p is tiny, while z's 6
    # rows barely perturb the rest-side CDF of a/b/c (D ~ 0.05,
    # p ~ 1) -> z is the only BH-significant group
    rows = (
        [("a", v) for v in (1, 2, 3) * 20]
        + [("b", v) for v in (1, 2, 3) * 20]
        + [("c", v) for v in (1, 2, 3) * 20]
        + [("z", 9)] * 6
    )
    out = {
        r["group"]: r
        for r in ks_bh_screen(
            spark.createDataFrame(rows, ["g", "band"]),
            "g",
            F.col("band"),
            q=0.10,
        ).collect()
    }
    assert out["z"]["significant"] == 1
    assert abs(out["z"]["ks_d"] - 1.0) < 1e-12
    assert out["z"]["p_approx"] < 0.001
    for g in ("a", "b", "c"):
        assert out[g]["significant"] == 0
        assert out[g]["p_approx"] > 0.5


def test_ks_bh_no_signal_nothing_significant(spark):
    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3, 4) * 5]
    out = ks_bh_screen(
        spark.createDataFrame(rows, ["g", "band"]), "g", F.col("band")
    ).collect()
    assert all(r["significant"] == 0 for r in out)
    assert all(r["ks_d"] == 0.0 for r in out)
    assert all(r["p_approx"] == 1.0 for r in out)


def test_ks_bh_ranks_are_a_permutation(spark, sf_dir):
    from celeborn_spark.queries.stats import q_ks_bh_screen

    rows = q_ks_bh_screen(spark, sf_dir).collect()
    ranks = sorted(r["bh_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # BH significance is downward-closed in rank order among passers
    sig_ranks = [r["bh_rank"] for r in rows if r["significant"] == 1]
    if sig_ranks:
        assert max(sig_ranks) == len(sig_ranks)


# ---------- conformal interval ----------


def _days(ms):
    base = dt.date(2024, 1, 1)
    return [(base + dt.timedelta(days=i), m) for i, m in enumerate(ms)]


def test_conformal_hand_computed(spark):
    # 16 days: week 2+ scored against 7-day lag. metric = 10*day for
    # days 0-6, then exact repeats +{0..8} noise pattern
    ms = [10, 10, 10, 10, 10, 10, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19]
    # residuals: days 7..15 vs days 0..8 ->
    # |11-10|,|12-10|,...,|17-10|=7, |18-11|=7, |19-12|=7
    df = spark.createDataFrame(_days(ms), ["day", "m"])
    out = conformal_interval(df, "day", "m").collect()[0]
    assert out["n_scored"] == 9
    # k = 10 - floor(10/10) = 9 -> the 9th smallest of
    # (1,2,3,4,5,6,7,7,7) = 7
    assert out["qhat_cents"] == 7
    assert out["target_coverage"] == 0.9
    assert out["empirical_coverage"] == 1.0


def test_conformal_too_few_days_null(spark):
    # 8 days -> 1 residual -> k = ceil(0.9 * 2) = 2 > n -> NULL
    ms = [10, 10, 10, 10, 10, 10, 10, 15]
    out = conformal_interval(
        spark.createDataFrame(_days(ms), ["day", "m"]), "day", "m"
    ).collect()[0]
    assert out["n_scored"] == 1 and out["qhat_cents"] is None


def test_conformal_coverage_guarantee_on_events(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_conformal_interval

    out = q_conformal_interval(spark, sf_dir).collect()[0]
    if out["qhat_cents"] is not None:
        assert out["empirical_coverage"] >= 0.9 - 1e-9


# ---------- mix drift series ----------


def test_mix_drift_identical_days_zero(spark):
    base = dt.date(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=d), c)
        for d in range(3)
        for c in ("x", "x", "y")
    ]
    out = mix_drift_series(
        spark.createDataFrame(rows, ["day", "cat"]), "day", "cat"
    ).collect()
    assert len(out) == 2  # first day has no predecessor
    assert all(r["js_prev"] == 0.0 for r in out)


def test_mix_drift_disjoint_days_ln2(spark):
    # day 1 all 'x', day 2 all 'y' -> JS = ln 2 (maximum)
    base = dt.date(2024, 1, 1)
    rows = [(base, "x")] * 4 + [(base + dt.timedelta(days=1), "y")] * 4
    out = mix_drift_series(
        spark.createDataFrame(rows, ["day", "cat"]), "day", "cat"
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["js_prev"] - round(math.log(2), 6)) < 1e-9
    assert out[0]["n_today"] == 4


def test_mix_drift_bounded_and_gap_days_skipped(spark):
    # calendar gap: day 3 has no day-2 predecessor -> no row for it
    base = dt.date(2024, 1, 1)
    rows = (
        [(base, "x")] * 2
        + [(base + dt.timedelta(days=1), "x"), (base + dt.timedelta(days=1), "y")]
        + [(base + dt.timedelta(days=3), "y")] * 2
    )
    out = {
        r["day"]: r["js_prev"]
        for r in mix_drift_series(
            spark.createDataFrame(rows, ["day", "cat"]), "day", "cat"
        ).collect()
    }
    assert set(out) == {"2024-01-02"}
    assert 0.0 <= out["2024-01-02"] <= round(math.log(2), 6)
