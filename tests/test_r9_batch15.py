"""Known-answer tests for the round-9 fifteenth batch: the per-feature
stump screen and time-decayed item popularity
(queries/analytics.py compositions). DuckDB parity is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math


def test_feature_screen_one_row_per_feature(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_feature_screen

    rows = q_feature_screen(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {"hour", "dow", "value_band"}
    for r in rows:
        n = r["tp"] + r["fp"] + r["fn"] + r["tn"]
        assert n > 0 and 0.0 <= r["accuracy"] <= 1.0
        assert r["split_score"] >= 0
    # every stump sees the SAME population
    ns = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
    assert len(ns) == 1


def test_decayed_popularity_fresh_beats_stale(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_decayed_popularity

    rows = q_decayed_popularity(spark, sf_dir).collect()
    assert len(rows) == 20
    # score is bounded by raw count (decay <= 1) and positive
    for r in rows:
        assert 0 < r["decayed_score"] <= r["n_events"] + 1e-9
    # ranked descending with item tiebreak
    scores = [(r["decayed_score"], r["item"]) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_decayed_popularity_decay_law(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # item 1: 10 events 20 days ago; item 2: 5 events today ->
    # decayed(1) = 10*e^-2 ~ 1.35 < decayed(2) = 5
    rows = [
        (1, base, '{"k": 1}', "view", 1.0)
        for _ in range(10)
    ] + [
        (2, base + dt.timedelta(days=20), '{"k": 2}', "view", 1.0)
        for _ in range(5)
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "props", "event_type", "value"]
    )
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    cells = (
        df.select(
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .groupBy("item", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mx = cells.agg(F.max("day").alias("d_max"))
    out = {
        r["item"]: r["s"]
        for r in cells.crossJoin(F.broadcast(mx))
        .select(
            "item",
            F.expr("c * exp(-0.1 * datediff(d_max, day))").alias("s"),
        )
        .collect()
    }
    assert abs(out[1] - 10 * math.exp(-2.0)) < 1e-9
    assert abs(out[2] - 5.0) < 1e-12
    assert out[2] > out[1]
