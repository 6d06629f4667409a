"""Property-based differentials for the model-evaluation + drift
operators (operators/evaluation.py) vs pure-Python brute-force
references (the repo's hypothesis pattern, tests/test_property_r9.py):
ROC AUC vs an O(n^2) pairwise win count and monotone invariance,
1D Wasserstein vs an explicit CDF-walk integral, Hodges-Lehmann vs
the literal median-of-pairwise-differences, Pettitt vs the textbook
sign double-sum, PSI/Hellinger cohort-swap symmetry, gains-table
conservation laws.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators.evaluation import (
    gains_table,
    hellinger_distance,
    hodges_lehmann_shift,
    pettitt_changepoint,
    psi_drift,
    roc_auc,
    wasserstein_1d,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

scored_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=2,
    max_size=25,
)

two_sample = st.tuples(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=15),
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=15),
)


def _auc_brute(rows):
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


@given(rows=scored_rows)
@settings(**_SETTINGS)
def test_auc_matches_pairwise_brute_force(spark, rows):
    df = spark.createDataFrame(
        [(float(s), l) for s, l in rows], ["s", "label"]
    )
    out = roc_auc(df, "s", "label").collect()[0]
    expect = _auc_brute(rows)
    if expect is None:
        assert out["auc"] is None
    else:
        assert abs(out["auc"] - expect) < 1e-12


@given(rows=scored_rows)
@settings(**_SETTINGS)
def test_auc_monotone_transform_invariant(spark, rows):
    # AUC depends only on the score ORDER: s -> 3s + 1 preserves it
    df1 = spark.createDataFrame([(float(s), l) for s, l in rows], ["s", "label"])
    df2 = spark.createDataFrame(
        [(3.0 * s + 1.0, l) for s, l in rows], ["s", "label"]
    )
    a1 = roc_auc(df1, "s", "label").collect()[0]["auc"]
    a2 = roc_auc(df2, "s", "label").collect()[0]["auc"]
    assert a1 == a2


def _w1_brute(xs, ys):
    # integral over the merged grid of |CDF_a - CDF_b| dv
    grid = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    total = 0.0
    for v, nxt in zip(grid, grid[1:]):
        fa = sum(1 for x in xs if x <= v) / na
        fb = sum(1 for y in ys if y <= v) / nb
        total += abs(fa - fb) * (nxt - v)
    return total


@given(samples=two_sample)
@settings(**_SETTINGS)
def test_wasserstein_matches_cdf_walk(spark, samples):
    xs, ys = samples
    rows = [("a", float(x)) for x in xs] + [("b", float(y)) for y in ys]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert abs(out["w1"] - _w1_brute(xs, ys)) < 1e-9


@given(samples=two_sample)
@settings(**_SETTINGS)
def test_hodges_lehmann_matches_brute_median(spark, samples):
    xs, ys = samples
    rows = [("a", float(x)) for x in xs] + [("b", float(y)) for y in ys]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = hodges_lehmann_shift(df, "g", "v", "a", "b").collect()[0]
    diffs = sorted(x - y for x in xs for y in ys)
    # lower weighted median: smallest d with 2*cum >= W
    w = len(diffs)
    assert out["hl_shift"] == diffs[math.ceil(w / 2) - 1]


series_strategy = st.lists(
    st.integers(min_value=0, max_value=9), min_size=3, max_size=20
)


@given(series=series_strategy)
@settings(**_SETTINGS)
def test_pettitt_matches_sign_double_sum(spark, series):
    import datetime

    n = len(series)
    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(n)]
    df = spark.createDataFrame(list(zip(days, series)), ["day", "cents"])
    out = pettitt_changepoint(df, "day", "cents").collect()[0]
    # textbook U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)
    u = [
        sum(
            (1 if series[i] > series[j] else -1 if series[i] < series[j] else 0)
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        for t in range(n - 1)
    ]
    k = max(abs(x) for x in u)
    first = min(t for t in range(n - 1) if abs(u[t]) == k)
    assert out["k_stat"] == float(k)
    assert out["change_day"] == str(days[first])


@given(samples=two_sample)
@settings(**_SETTINGS)
def test_psi_cohort_swap_symmetric(spark, samples):
    xs, ys = samples
    rows = [(float(x), 1) for x in xs] + [(float(y), 0) for y in ys]
    df = spark.createDataFrame(rows, ["v", "c"])
    flipped = spark.createDataFrame(
        [(v, 1 - c) for v, c in rows], ["v", "c"]
    )
    a = psi_drift(df, "v", "c", lo=0.0, hi=10.0, n_bins=5).collect()[0]
    b = psi_drift(flipped, "v", "c", lo=0.0, hi=10.0, n_bins=5).collect()[0]
    # (p-q)ln(p/q) is invariant under p<->q
    assert a["psi"] == b["psi"] and a["bins_used"] == b["bins_used"]


@given(samples=two_sample)
@settings(**_SETTINGS)
def test_hellinger_swap_symmetric_and_bounded(spark, samples):
    xs, ys = samples
    rows = [(str(x % 4), 1) for x in xs] + [(str(y % 4), 0) for y in ys]
    df = spark.createDataFrame(rows, ["cat", "c"])
    flipped = spark.createDataFrame([(v, 1 - c) for v, c in rows], ["cat", "c"])
    a = hellinger_distance(df, "cat", "c").collect()[0]
    b = hellinger_distance(flipped, "cat", "c").collect()[0]
    assert a["hellinger"] == b["hellinger"]
    assert 0.0 <= a["hellinger"] <= 1.0
    assert 0.0 <= a["bc_coef"] <= 1.0 + 1e-9


@given(rows=scored_rows)
@settings(**_SETTINGS)
def test_gains_conservation_laws(spark, rows):
    df = spark.createDataFrame([(float(s), l) for s, l in rows], ["s", "label"])
    out = sorted(
        (r.asDict() for r in gains_table(df, "s", "label", n_buckets=4).collect()),
        key=lambda r: r["bucket"],
    )
    tot_rows = sum(r["n_rows"] for r in out)
    tot_pos = sum(r["n_pos"] for r in out)
    assert tot_rows == len(rows)
    assert tot_pos == sum(l for _, l in rows)
    assert out[-1]["cum_rows"] == tot_rows and out[-1]["cum_pos"] == tot_pos
    if tot_pos > 0:
        assert out[-1]["capture_rate"] == 1.0
        rates = [r["capture_rate"] for r in out]
        assert rates == sorted(rates)  # capture is monotone


# duplicate-heavy score lists: small value domain forces tied blocks,
# the adversarial input for prefix-sum machinery
dup_scores = st.lists(
    st.integers(min_value=-3, max_value=3), min_size=1, max_size=40
)


@given(xs=dup_scores, descending=st.booleans())
@settings(**_SETTINGS)
def test_bounded_cum_before_equals_single_window(spark, xs, descending):
    """_bounded_cum_before (the two-stage bucket-offset prefix sum that
    replaced the ROC family's unpartitioned histogram window, VERDICT
    r9 item 4) must return EXACTLY the single-window values on any
    histogram — including all-equal scores (span 0 -> one bucket) and
    heavy tie blocks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from celeborn_spark.operators.evaluation import _bounded_cum_before

    hist = (
        spark.createDataFrame([(float(x),) for x in xs], ["v"])
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    got = {
        r["v"]: r["cum_before"]
        for r in _bounded_cum_before(
            hist, F.col("cnt"), descending=descending, n_buckets=4
        ).collect()
    }
    order = F.col("v").desc() if descending else F.col("v").asc()
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["v"]: r["ref"]
        for r in hist.withColumn(
            "ref", F.coalesce(F.sum("cnt").over(w), F.lit(0))
        ).collect()
    }
    assert got == want
