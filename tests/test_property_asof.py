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
