"""Statistics toolkit (operators/stats.py) + CDC apply
(operators/merge.apply_cdc): known-answer kernels and oracle parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from celeborn_spark.operators.merge import apply_cdc
from celeborn_spark.operators.stats import corr_matrix, logreg_fit, welch_t
from tests.oracle import assert_matches_oracle, duck_connection


# --- corr_matrix ---


def test_corr_perfectly_linear(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(10)], ["a", "b", "c"]
    )
    got = {(r.col_x, r.col_y): r.corr for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert got[("a", "b")] == pytest.approx(1.0)
    assert got[("a", "c")] == pytest.approx(-1.0)
    assert got[("b", "c")] == pytest.approx(-1.0)


def test_corr_independent_near_zero(spark):
    # alternating orthogonal pattern: exactly zero sample correlation
    rows = [(1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)]
    df = spark.createDataFrame(rows, ["a", "b"])
    [r] = corr_matrix(df, ["a", "b"]).collect()
    assert r.corr == pytest.approx(0.0)


def test_corr_rejects_single_column(spark):
    df = spark.createDataFrame([(1.0,)], ["a"])
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["a"])


# --- welch_t ---


def test_welch_identical_groups_t_zero(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("base", float(v)) for v in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = welch_t(df, "g", "v", "base").collect()
    assert r.t_stat == pytest.approx(0.0)


def test_welch_shift_sign_and_textbook_value(spark):
    """Equal-variance equal-n case reduces to the classic two-sample t."""
    a = [2.0, 4.0, 6.0, 8.0]
    b = [1.0, 3.0, 5.0, 7.0]
    rows = [("a", v) for v in a] + [("base", v) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = welch_t(df, "g", "v", "base").collect()
    # means 5 vs 4, pooled se = sqrt(20/3/4 * 2); t = 1/se
    se = math.sqrt((20 / 3) / 4 + (20 / 3) / 4)
    assert r.t_stat == pytest.approx(1.0 / se, abs=1e-6)
    assert r.dof == pytest.approx(6.0, abs=1e-6)


# --- logreg_fit ---


def test_logreg_zero_iters_returns_zero_weights(spark):
    df = spark.createDataFrame([(1.0, 0.5, 1.0)], ["bias", "x", "y"])
    got = {r.feature: r.weight for r in
           logreg_fit(df, ["bias", "x"], "y", iters=0).collect()}
    assert got == {"bias": 0.0, "x": 0.0}


def test_logreg_learns_separating_sign(spark):
    """Positive labels sit at x=+1, negatives at x=-1: the x weight
    must move positive and dominate the bias."""
    rows = [(1.0, 1.0, 1.0)] * 20 + [(1.0, -1.0, 0.0)] * 20
    df = spark.createDataFrame(rows, ["bias", "x", "y"])
    got = {r.feature: r.weight for r in
           logreg_fit(df, ["bias", "x"], "y", iters=5).collect()}
    assert got["x"] > 0.3
    assert abs(got["bias"]) < 1e-6  # symmetric classes keep the bias at 0


def test_logreg_loss_decreases(spark):
    """More rounds → lower logistic loss on the training set."""
    rows = [(1.0, 1.0, 1.0)] * 15 + [(1.0, -0.5, 0.0)] * 25
    df = spark.createDataFrame(rows, ["bias", "x", "y"])

    def loss(iters: int) -> float:
        w = {r.feature: r.weight for r in
             logreg_fit(df, ["bias", "x"], "y", iters=iters).collect()}
        z = [(w["bias"] + w["x"] * x, y) for _, x, y in rows]
        return sum(
            -y * math.log(1 / (1 + math.exp(-zz)))
            - (1 - y) * math.log(1 - 1 / (1 + math.exp(-zz)))
            for zz, y in z
        )

    assert loss(4) < loss(1)


def test_logreg_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0, 1.0)], ["x", "y"])
    with pytest.raises(ValueError, match="iters"):
        logreg_fit(df, ["x"], "y", iters=-1)
    with pytest.raises(ValueError, match="feature"):
        logreg_fit(df, [], "y")


# --- apply_cdc ---


def _base(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "val"]
    )


def test_cdc_upsert_delete_insert(spark):
    changes = spark.createDataFrame(
        [
            (1, "U", 1, 11.0),   # update existing
            (2, "D", 1, 0.0),    # delete existing
            (9, "U", 1, 99.0),   # insert new
        ],
        ["k", "op", "seq", "val"],
    )
    got = {r.k: r.val for r in
           apply_cdc(_base(spark), changes, key_col="k", op_col="op",
                     ord_cols=("seq",)).collect()}
    assert got == {1: 11.0, 3: 30.0, 9: 99.0}


def test_cdc_last_writer_wins_with_tiebreak(spark):
    changes = spark.createDataFrame(
        [(1, "U", 1, 100.0), (1, "U", 2, 200.0), (1, "D", 3, 0.0),
         (2, "D", 1, 0.0), (2, "U", 2, 222.0)],
        ["k", "op", "seq", "val"],
    )
    got = {r.k: r.val for r in
           apply_cdc(_base(spark), changes, key_col="k", op_col="op",
                     ord_cols=("seq",)).collect()}
    assert 1 not in got          # final op is a delete
    assert got[2] == 222.0       # delete then re-insert survives
    assert got[3] == 30.0


def test_cdc_null_upsert_does_not_resurrect_base(spark):
    changes = spark.createDataFrame(
        [(1, "U", 1, None)], "k long, op string, seq long, val double"
    )
    [r] = [x for x in apply_cdc(_base(spark), changes, key_col="k",
                                op_col="op", ord_cols=("seq",)).collect()
           if x.k == 1]
    assert r.val is None


def test_cdc_rejects_base_missing_payload(spark):
    base = spark.createDataFrame([(1,)], ["k"])
    changes = spark.createDataFrame([(1, "U", 1, 5.0)], ["k", "op", "seq", "val"])
    with pytest.raises(ValueError, match="base lacks"):
        apply_cdc(base, changes, key_col="k", op_col="op", ord_cols=("seq",))


# --- oracle parity of the registered queries ---


@pytest.mark.parametrize(
    "name",
    ["q_correlation_matrix", "q_ab_test_welch", "q_logreg_quality", "q_cdc_apply"],
)
def test_stats_queries_vs_oracle(spark, sf_dir, name):
    from celeborn_spark import registry

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir), con, registry.oracles()[name], name
    )


# --- data-quality gate (operators/quality.py) ---


def test_expectations_counts_planted_violations(spark):
    from celeborn_spark.operators.quality import check_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "id long, v double"
    )
    got = {r.rule: (r.n_violations, r["pass"]) for r in check_expectations(
        df, [("v_positive", "v > 0"), ("id_known", "id BETWEEN 1 AND 4")]
    ).collect()}
    # NULL predicate counts as a violation (unevaluable != pass)
    assert got["v_positive"] == (2, False)
    assert got["id_known"] == (0, True)


def test_expectations_rejects_empty_rules(spark):
    from celeborn_spark.operators.quality import check_expectations

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="at least one rule"):
        check_expectations(df, [])


def test_referential_violations_planted(spark):
    from celeborn_spark.operators.quality import referential_violations

    fact = spark.createDataFrame([(1,), (2,), (9,)], ["k"])
    dim = spark.createDataFrame([(1,), (2,)], ["dk"])
    got = [r.k for r in referential_violations(fact, "k", dim, "dk").collect()]
    assert got == [9]


def test_mad_robust_to_corrupt_batch(spark):
    """A mean/stddev gate dragged by a corrupt batch misses it; the
    MAD gate flags exactly the planted outliers."""
    from celeborn_spark.operators.quality import mad_outliers

    clean = [("g", float(v)) for v in range(100)]
    corrupt = [("g", 1e6), ("g", 2e6), ("g", -1e6)]
    df = spark.createDataFrame(clean + corrupt, ["grp", "v"])
    [r] = mad_outliers(df, "grp", "v", k=6.0).collect()
    assert r.n == 103 and r.n_outliers == 3
    assert r.median == pytest.approx(50.0, abs=1.0)


# --- CUSUM change-point (operators/stats.cusum_changepoint) ---


def test_cusum_locates_planted_level_shift(spark):
    """20 points at 10.0 then 20 at 30.0: |cusum| peaks exactly at the
    last pre-shift point (key 19)."""
    from celeborn_spark.operators.stats import cusum_changepoint

    rows = [("u", i, 10.0 if i < 20 else 30.0) for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    out = cusum_changepoint(df, "g", ("k",), "v").collect()[0]
    assert out.cp_key == 19
    assert out.n_points == 40
    # deviation magnitude: at t=19, sum of 20 * (n*x - S) with
    # n=40, x=1000c, S=40*2000c avg -> 20*(40*1000-80000) = -800000
    assert out.max_dev == 800000


def test_cusum_flat_series_zero_deviation(spark):
    """A constant series never deviates: max_dev == 0, change point is
    the first key (all ties, earliest wins)."""
    from celeborn_spark.operators.stats import cusum_changepoint

    df = spark.createDataFrame(
        [("u", i, 5.0) for i in range(10)], ["g", "k", "v"]
    )
    out = cusum_changepoint(df, "g", ("k",), "v").collect()[0]
    assert out.max_dev == 0 and out.cp_key == 0


def test_cusum_groups_independent(spark):
    """A shifted group and a flat group report independently."""
    from celeborn_spark.operators.stats import cusum_changepoint

    rows = [("a", i, 1.0 if i < 5 else 9.0) for i in range(10)]
    rows += [("b", i, 4.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    got = {r.g: r for r in cusum_changepoint(df, "g", ("k",), "v").collect()}
    assert got["a"].max_dev > 0 and got["a"].cp_key == 4
    assert got["b"].max_dev == 0


# --- key-skew profile (operators/stats.key_skew_profile) ---


def test_key_skew_uniform_gini_zero(spark):
    """Every key exactly once: Gini == 0, top_share == 1/n."""
    from celeborn_spark.operators.stats import key_skew_profile

    df = spark.range(100).select(F.col("id").alias("k"))
    out = key_skew_profile(df, "k").collect()[0]
    assert out.gini == 0.0
    assert out.n_keys == 100 and out.total_rows == 100
    assert abs(out.top_share - 0.01) < 1e-12


def test_key_skew_hot_key_raises_gini(spark):
    """One key owning 90% of rows: Gini near (n-1)/n * 0.9-ish, far
    from zero, and top_share reports the hot fraction."""
    from celeborn_spark.operators.stats import key_skew_profile

    rows = [(0,)] * 900 + [(i,) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_profile(df, "k").collect()[0]
    assert out.max_count == 900
    assert abs(out.top_share - 0.9) < 1e-12
    assert out.gini > 0.8


def test_key_skew_matches_direct_rank_formula(spark):
    """Histogram block sums equal the direct sorted-rank Gini on a
    small mixed distribution (computed in Python)."""
    from celeborn_spark.operators.stats import key_skew_profile

    counts = [1, 1, 2, 3, 3, 3, 8, 20]
    rows = [(ki, ) for ki, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_profile(df, "k").collect()[0]
    sc = sorted(counts)
    n, tot = len(sc), sum(sc)
    rs = sum((i + 1) * c for i, c in enumerate(sc))
    expect = (2 * rs - (n + 1) * tot) / (n * tot)
    assert abs(out.gini - expect) < 1e-12


# --- grouped OLS trend (operators/stats.grouped_ols_trend) ---


def test_ols_exact_slope_on_planted_line(spark):
    """y = 2.5 cents/day * x + const: slope recovered exactly (all
    sums integer, one division)."""
    from celeborn_spark.operators.stats import grouped_ols_trend

    rows = [("s", f"1970-01-{d:02d}", (250 * d + 1000) / 100.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, ["g", "day", "v"]).select(
        "g", F.col("day").cast("timestamp").alias("day"), "v"
    )
    out = grouped_ols_trend(df, "g", "day", "v").collect()[0]
    assert out.slope_cents_per_day == 250.0
    assert out.slope_num == out.slope_den * 250


def test_ols_flat_series_zero_slope(spark):
    from celeborn_spark.operators.stats import grouped_ols_trend

    rows = [("s", f"1970-02-{d:02d}", 7.0) for d in range(1, 8)]
    df = spark.createDataFrame(rows, ["g", "day", "v"]).select(
        "g", F.col("day").cast("timestamp").alias("day"), "v"
    )
    out = grouped_ols_trend(df, "g", "day", "v").collect()[0]
    assert out.slope_num == 0 and out.slope_cents_per_day == 0.0


def test_ols_drops_degenerate_groups(spark):
    """Groups below min_n or with a single distinct day (zero
    x-variance) are absent."""
    from celeborn_spark.operators.stats import grouped_ols_trend

    rows = [("small", "1970-01-01", 1.0), ("small", "1970-01-02", 2.0)]
    rows += [("const_x", "1970-01-05", float(v)) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, ["g", "day", "v"]).select(
        "g", F.col("day").cast("timestamp").alias("day"), "v"
    )
    assert grouped_ols_trend(df, "g", "day", "v", min_n=3).count() == 0


# --- Benford audit (operators/stats.benford_audit) ---


def test_benford_digits_and_shares(spark):
    from celeborn_spark.operators.stats import benford_audit

    rows = [(1.23,), (1.99,), (2.50,), (0.9,)]  # cents: 123,199,250,90
    df = spark.createDataFrame(rows, ["v"])
    got = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert got[1].n == 2 and got[2].n == 1 and got[9].n == 1
    assert abs(got[1].observed - 0.5) < 1e-12
    assert abs(got[1].expected - 0.30103) < 1e-6


def test_benford_ignores_nonpositive(spark):
    from celeborn_spark.operators.stats import benford_audit

    df = spark.createDataFrame([(0.0,), (-5.0,), (3.0,)], ["v"])
    got = benford_audit(df, "v").collect()
    assert len(got) == 1 and got[0].digit == 3 and got[0].observed == 1.0


# --- lag-1 autocorrelation (operators/stats.lag1_autocorr) ---


def test_acf_alternating_series_negative(spark):
    """A perfectly alternating series (+a, -a, ...) has acf1 near -1."""
    from celeborn_spark.operators.stats import lag1_autocorr

    rows = [("u", i, 10.0 if i % 2 == 0 else -10.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    out = lag1_autocorr(df, "g", ("k",), "v").collect()[0]
    assert out.acf1 < -0.9


def test_acf_trending_series_positive(spark):
    """A monotone ramp is strongly positively autocorrelated."""
    from celeborn_spark.operators.stats import lag1_autocorr

    rows = [("u", i, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    out = lag1_autocorr(df, "g", ("k",), "v").collect()[0]
    assert out.acf1 > 0.8


def test_acf_constant_series_dropped(spark):
    """Zero variance: the group has no defined ACF and is absent."""
    from celeborn_spark.operators.stats import lag1_autocorr

    df = spark.createDataFrame([("u", i, 5.0) for i in range(10)], ["g", "k", "v"])
    assert lag1_autocorr(df, "g", ("k",), "v").count() == 0
