"""Known-answer tests for q_daily_percentile_ladder — the exact
per-day order-statistic SLO series. DuckDB parity is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations


def test_ladder_is_monotone_and_exact_rank(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_daily_percentile_ladder

    rows = q_daily_percentile_ladder(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["p50_cents"] <= r["p95_cents"] <= r["p99_cents"]
        assert r["n"] > 0


def test_ladder_hand_computed(spark):
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    # one day, values 1..100 cents -> p50 = ceil(0.5*100) = 50th
    # smallest = 0.50; p95 = 0.95; p99 = 0.99 (lower rule, exact)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, "view", (i + 1) / 100.0, "{}", 1)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value", "props", "user_id"]
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from celeborn_spark.queries.temporal import (
            q_daily_percentile_ladder,
        )

        out = q_daily_percentile_ladder(spark, d).collect()[0]
    assert out["n"] == 100
    assert out["p50_cents"] == 50
    assert out["p95_cents"] == 95
    assert out["p99_cents"] == 99
