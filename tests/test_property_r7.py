"""Property-based differentials for the round-7 geometric/graph
operators vs pure-Python references (the repo's hypothesis pattern,
see tests/test_property_packing.py): skyline vs brute-force dominance,
interval merge vs a sweep reference, bounded Bellman-Ford vs an
explicit relaxation loop.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=25,
)


@given(points_strategy)
@settings(**_SETTINGS)
def test_skyline_matches_bruteforce_dominance(spark, pts):
    from celeborn_spark.operators.frontier import skyline_2d

    def dominated(p, universe):
        return any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in universe
        )

    expect = sorted(p for p in pts if not dominated(p, pts))
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["id", "x", "y"]
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == expect


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=10),
    ),
    min_size=1,
    max_size=15,
)


@given(intervals_strategy)
@settings(**_SETTINGS)
def test_interval_merge_matches_sweep_reference(spark, raw):
    from celeborn_spark.operators.resample import merge_intervals

    iv = sorted((s, s + w) for s, w in raw)
    islands, cur = [], None
    for s, e in iv:
        if cur is None or s > cur[1]:
            if cur:
                islands.append(tuple(cur))
            cur = [s, e, 1]
        else:
            cur[1] = max(cur[1], e)
            cur[2] += 1
    islands.append(tuple(cur))
    expect = sorted((a, b, n) for a, b, n, in islands)

    df = spark.createDataFrame(
        [("k", s, e) for s, e in iv], ["key", "s", "e"]
    )
    got = sorted(
        (r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, "key", "s", "e").collect()
    )
    assert got == expect


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=20,
)


@given(edges_strategy, st.integers(min_value=0, max_value=3))
@settings(**_SETTINGS)
def test_shortest_paths_matches_python_bellman_ford(spark, edges, rounds):
    from celeborn_spark.operators.graph import shortest_paths

    seeds = {0}
    dist = {0: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist:
                cand = dist[s] + w
                if d not in nxt or cand < nxt[d]:
                    nxt[d] = cand
        dist = nxt
    expect = sorted(dist.items())

    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = sorted(
        (r.node, r.dist)
        for r in shortest_paths(e, sdf, rounds=rounds).collect()
    )
    assert got == expect


series_strategy = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=30
)


@given(series_strategy)
@settings(**_SETTINGS)
def test_cusum_matches_python_reference(spark, vals):
    from celeborn_spark.operators.stats import cusum_changepoint

    cents = [v * 100 for v in vals]
    n, s = len(cents), sum(cents)
    run, best, best_k = 0, -1, None
    for k, x in enumerate(cents):
        run += n * x - s
        if abs(run) > best or (abs(run) == best and False):
            best, best_k = abs(run), k
    df = spark.createDataFrame(
        [("g", i, v * 1.0) for i, v in enumerate(vals)], ["g", "k", "v"]
    )
    out = cusum_changepoint(df, "g", ("k",), "v").collect()[0]
    assert out.max_dev == best
    assert out.cp_key == best_k
    assert out.n_points == n


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # day offset
            st.integers(min_value=-99, max_value=99),  # value units
        ),
        min_size=3,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_grouped_ols_matches_python_reference(spark, pts):
    from celeborn_spark.operators.stats import grouped_ols_trend

    xs = [d for d, _ in pts]
    ys = [v * 100 for _, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    df = spark.createDataFrame(
        [
            ("g", f"1970-01-{d + 1:02d}", v / 100.0)
            for (d, _), v in zip(pts, ys)
        ],
        ["g", "day", "v"],
    ).select("g", st_col_ts("day"), "v")
    out = grouped_ols_trend(df, "g", "day", "v").collect()
    if den == 0:
        assert out == []
    else:
        r = out[0]
        assert r.slope_num == n * sxy - sx * sy
        assert r.slope_den == den


def st_col_ts(c):
    from pyspark.sql import functions as F

    return F.col(c).cast("timestamp").alias(c)
