"""Known-answer tests for time-decay attribution
(queries/temporal.py). DuckDB parity is pinned by
tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations


def test_timedecay_conserves_micro_per_user(spark, sf_dir):
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table
    from celeborn_spark.queries.temporal import q_attribution_timedecay

    out = q_attribution_timedecay(spark, sf_dir).collect()
    total_micro = sum(r["credit_micro"] for r in out)
    # total credit = 1e6 per converting user WITH at least one
    # pre-conversion touch
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    n_users = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("conv_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert total_micro == 1_000_000 * n_users


def test_timedecay_recent_touch_gets_more(spark):
    import datetime as dt

    from pyspark.sql import functions as F
    from celeborn_spark.queries import temporal as T  # noqa: F401

    # one user: an old view (8 days before), a fresh click (1 hour
    # before), then a purchase -> the click must out-earn the view
    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, 1, base - dt.timedelta(days=8), "view", 1.0, "{}"),
        (1, 2, base - dt.timedelta(hours=1), "click", 1.0, "{}"),
        (1, 3, base, "purchase", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type", "value", "props"]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            # only events is read by this query; write a placeholder
            pass
        from celeborn_spark.queries.temporal import q_attribution_timedecay

        out = {
            r["touch_type"]: r["credit_micro"]
            for r in q_attribution_timedecay(spark, d).collect()
        }
    assert out["click"] + out["view"] == 1_000_000
    assert out["click"] > 0.7 * 1_000_000 > out["view"]
