"""Property-based differentials for the round-9 statistics operators
vs pure-Python references (the repo's hypothesis pattern, see
tests/test_property_r7.py): Spearman vs a rank-then-Pearson reference
with bounds and monotone-invariance, Kendall vs an O(n^2) pair loop,
KS vs an explicit CDF walk, ANOVA/G-test non-negativity.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators.stats import (
    anova_oneway,
    g_test,
    kendall_tau_b,
    ks_two_sample,
    spearman_rho_int,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=3,
    max_size=30,
)


def _avg_ranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        r = (i + 1 + j) / 2  # average of ranks i+1..j
        for k in range(i, j):
            ranks[order[k]] = r
        i = j
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (n * sxy - sx * sy) / den if den else None


@given(pairs_strategy)
@settings(**_SETTINGS)
def test_spearman_matches_rank_pearson_reference(spark, pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if len(set(xs)) < 2 or len(set(ys)) < 2:
        return  # degenerate: zero variance, rho undefined
    df = spark.createDataFrame([("g", x, y) for x, y in pts], ["g", "x", "y"])
    out = spearman_rho_int(df, "g", "x", "y").collect()[0]
    want = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    assert abs(out.rho - want) < 1e-9
    assert -1.0 - 1e-12 <= out.rho <= 1.0 + 1e-12


@given(pairs_strategy)
@settings(**_SETTINGS)
def test_kendall_matches_pair_loop_reference(spark, pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if len(set(xs)) < 2 or len(set(ys)) < 2:
        return
    df = spark.createDataFrame(pts, ["x", "y"])
    out = kendall_tau_b(df, "x", "y").collect()[0]
    n = len(pts)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xs[i] - xs[j]
            dy = ys[i] - ys[j]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    assert out.concordant == conc and out.discordant == disc
    n0 = n * (n - 1) // 2
    tx = {}
    ty = {}
    for x in xs:
        tx[x] = tx.get(x, 0) + 1
    for y in ys:
        ty[y] = ty.get(y, 0) + 1
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    want = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(out.tau_b - want) < 1e-12


@given(pairs_strategy)
@settings(**_SETTINGS)
def test_ks_matches_cdf_walk_reference(spark, pts):
    # reuse the pair values as two samples: xs under 'a', ys under 'b'
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    vals = sorted(set(xs) | set(ys))
    best = 0
    for v in vals:
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        best = max(best, abs(ca * len(ys) - cb * len(xs)))
    assert out.ks_num == best
    assert 0.0 <= out.ks_d <= 1.0


@given(pairs_strategy)
@settings(**_SETTINGS)
def test_anova_f_nonnegative_and_gtest_nonnegative(spark, pts):
    rows = [("a", float(p[0])) for p in pts] + [("b", float(p[1])) for p in pts]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = anova_oneway(df, "g", "v").collect()[0]
    # SSW can be 0 (all values equal within groups) -> F inf/NaN; skip those
    if out.f_stat is not None and not math.isnan(out.f_stat):
        assert out.f_stat >= 0.0
    cat = [("r%d" % (p[0] % 3), "c%d" % (p[1] % 2)) for p in pts]
    g = g_test(spark.createDataFrame(cat, ["r", "c"]), "r", "c").collect()[0]
    # G is >= 0 up to the 6dp round of a sum of +/- terms
    assert g.g_stat >= -1e-6
