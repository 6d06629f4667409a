"""Property-based differential test: asof_join vs pandas merge_asof on
randomized event times."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators.asof import asof_join

times = st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=12)


@given(left_ts=times, right_ts=times)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, left_ts, right_ts):
    right_ts = sorted(set(right_ts))  # unique per (key, ts), as documented
    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(left_ts)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in right_ts], "k long, ts long, payload long"
    )
    got = {
        r.lid: r.payload
        for r in asof_join(left, right, ["k"], "ts", ["payload"]).collect()
    }
    lpdf = pd.DataFrame({"ts": left_ts, "lid": range(len(left_ts))}).sort_values(
        "ts", kind="mergesort"
    )
    want_df = pd.merge_asof(
        lpdf,
        pd.DataFrame({"ts": right_ts, "payload": [t * 10 for t in right_ts]}),
        on="ts",
        direction="backward",
    )
    want = {int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()}
    assert got == want


@given(left_ts=times, right_ts=times)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_forward_matches_pandas_merge_asof(spark, left_ts, right_ts):
    right_ts = sorted(set(right_ts))
    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(left_ts)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in right_ts], "k long, ts long, payload long"
    )
    got = {
        r.lid: r.payload
        for r in asof_join(
            left, right, ["k"], "ts", ["payload"], direction="forward"
        ).collect()
    }
    lpdf = pd.DataFrame({"ts": left_ts, "lid": range(len(left_ts))}).sort_values(
        "ts", kind="mergesort"
    )
    want_df = pd.merge_asof(
        lpdf,
        pd.DataFrame({"ts": right_ts, "payload": [t * 10 for t in right_ts]}),
        on="ts",
        direction="forward",
    )
    want = {int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()}
    assert got == want


# --- point-in-time join (operators/asof.point_in_time_join) ---


def test_pit_join_picks_version_in_effect(spark):
    """Versions [10, 20) = 'v1', [20, None) = 'v2': facts at ts 5, 10,
    15, 20, 99 get NULL, v1, v1, v2, v2."""
    from celeborn_spark.operators.asof import point_in_time_join
    from pyspark.sql import functions as F

    versions = spark.createDataFrame(
        [("k", 10, 20, "v1"), ("k", 20, None, "v2")],
        ["key", "valid_from", "valid_to", "attr"],
    )
    facts = spark.createDataFrame(
        [("k", t) for t in (5, 10, 15, 20, 99)], ["key", "ts"]
    )
    out = point_in_time_join(
        facts, versions, ["key"], "ts", "valid_from", "valid_to", ["attr"]
    )
    got = {r.ts: r.attr for r in out.collect()}
    assert got == {5: None, 10: "v1", 15: "v1", 20: "v2", 99: "v2"}


def test_pit_join_gap_yields_null_not_stale(spark):
    """A GAPPED history ([0,10) then [50,None)): a fact at ts 30 falls
    in the gap and must get NULL — plain backward as-of would wrongly
    attach the stale [0,10) version."""
    from celeborn_spark.operators.asof import point_in_time_join

    versions = spark.createDataFrame(
        [("k", 0, 10, "old"), ("k", 50, None, "new")],
        ["key", "valid_from", "valid_to", "attr"],
    )
    facts = spark.createDataFrame([("k", 30)], ["key", "ts"])
    out = point_in_time_join(
        facts, versions, ["key"], "ts", "valid_from", "valid_to", ["attr"]
    ).collect()
    assert out[0].attr is None


def test_pit_join_keys_isolated(spark):
    """Versions never leak across keys."""
    from celeborn_spark.operators.asof import point_in_time_join

    versions = spark.createDataFrame(
        [("a", 0, None, "va"), ("b", 0, None, "vb")],
        "key string, valid_from long, valid_to long, attr string",
    )
    facts = spark.createDataFrame([("a", 5), ("b", 5)], ["key", "ts"])
    got = {
        r.key: r.attr
        for r in point_in_time_join(
            facts, versions, ["key"], "ts", "valid_from", "valid_to", ["attr"]
        ).collect()
    }
    assert got == {"a": "va", "b": "vb"}
