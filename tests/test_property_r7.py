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
