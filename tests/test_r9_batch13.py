"""Known-answer tests for the round-9 thirteenth batch: rolling WAU
and monthly stickiness (queries/analytics.py compositions). DuckDB
parity on the real tables is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_rolling_wau_window_semantics(spark, sf_dir):
    from celeborn_spark.queries.analytics import (
        q_rolling_wau,
        q_user_growth,
    )

    wau = {r["day"]: r["wau"] for r in q_rolling_wau(spark, sf_dir).collect()}
    growth = {
        str(r["day"]): r for r in q_user_growth(spark, sf_dir).collect()
    }
    assert len(wau) > 0
    for day, w in wau.items():
        if day in growth:
            # WAU >= that day's DAU, and never exceeds total users
            assert w >= growth[day]["active_users"]
    # WAU is monotone-ish vs DAU but bounded by the 7-day union
    days = sorted(wau)
    assert all(wau[d] >= 1 for d in days)


def test_stickiness_bounds_and_identity(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_stickiness

    rows = q_stickiness(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        # avg DAU <= MAU -> stickiness in (0, 1]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["sum_dau"] <= r["days_active"] * r["mau"]
        assert r["mau"] >= 1 and r["days_active"] >= 1


def test_stickiness_everyone_every_day_is_one(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (u, base + dt.timedelta(days=d))
        for u in (1, 2, 3)
        for d in range(5)
    ]
    from celeborn_spark.queries import analytics as A
    from celeborn_spark.catalog import load_table  # noqa: F401
    import celeborn_spark.operators  # noqa: F401
    from pyspark.sql import functions as F

    ev = _ev(spark, rows)
    du = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    dau = du.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    m = dau.groupBy("month").agg(
        F.count(F.lit(1)).alias("days_active"),
        F.sum("dau").alias("sum_dau"),
    )
    mau = du.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    out = m.join(mau, "month").select(
        (F.col("sum_dau") / (F.col("days_active") * F.col("mau"))).alias(
            "s"
        )
    ).collect()[0]
    assert abs(out["s"] - 1.0) < 1e-12
