"""Grouped z-score surface.

The REGISTERED operator is the pure-JVM window form — (x - avg) /
stddev_samp over a per-user window needs no Python in the hot path, so
it stays inside whole-stage codegen (51x faster than the Arrow
grouped-map form at sf0.1). The applyInPandas variant
(operators/pandas_ops.grouped_zscore) remains the differential test of
the Arrow grouped-map path in tests/test_pandas_path.py — a test
artifact, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.registry import query


@query(
    "q_grouped_zscore",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, value,
               count(*)            OVER w AS n,
               avg(value)          OVER w AS mu,
               stddev_samp(value)  OVER w AS sd
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id, round((value - mu) / sd, 6) AS zscore
    FROM g WHERE n >= 2 AND sd > 0
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score as one unordered window: count/avg/stddev over
    PARTITION BY user_id, then the scalar expression — a single hash
    exchange, zero Python."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    stats = e.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    return (
        stats.filter((F.col("n") >= 2) & (F.col("sd") > 0))
        .select(
            "user_id",
            "event_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6).alias("zscore"),
        )
    )
