"""Pandas-UDF surface: the Arrow grouped-map path differentially
tested against plain SQL window semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.pandas_ops import grouped_zscore
from celeborn_spark.registry import query


@query(
    "q_grouped_zscore_pandas",
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
def q_grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas z-score per user vs the SQL window oracle — the
    numbers must agree, proving the Arrow batch path end to end."""
    e = load_table(spark, sf_dir, "events")
    counted = e.withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("user_id"))
    )
    eligible = counted.filter(F.col("n") >= 2).drop("n")
    z = grouped_zscore(eligible, "user_id", "value", "event_id")
    return z.filter(F.col("zscore").isNotNull()).select(
        "user_id", "event_id", F.round("zscore", 6).alias("zscore")
    )
