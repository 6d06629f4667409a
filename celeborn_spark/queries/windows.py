"""Window functions: rank/row_number/lag/lead, frames, ntile,
sessionization.

Absent from the reference by design (pure data plane — SURVEY.md §2B
last row); declared here from Spark built-ins. A window = one hash
exchange on the partition keys + per-partition sort, exactly the
exchange contract Celeborn serves (docs/developers/overview.md:19-52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.registry import query


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the scalable idiom (one exchange, no self-join)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_window_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC) AS drnk
    FROM customer
    """,
)
def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.round(F.col("c_acctbal"), 2).desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           round(value, 4)                                        AS value,
           round(lag(value)  OVER w, 4)                           AS prev_value,
           round(lead(value) OVER w, 4)                           AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
    -- l_quantity joins the ORDER BY: (orderkey, linenumber) is NOT
    -- unique in the synthetic data, and a tied ordering makes frame
    -- contents engine-dependent; ties including the averaged value are
    -- interchangeable for the result
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(avg(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS qty_ma4
    FROM lineitem
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-3, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 4).alias("qty_ma4"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY round(c_acctbal, 2) DESC, c_custkey)               AS quartile,
           round(percent_rank() OVER (ORDER BY round(c_acctbal, 2) DESC, c_custkey), 6) AS pct_rank
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-partitioned window: single-partition sort. Fine for a 150k-row
    dim; at 100 TB you'd partition or pre-aggregate first — kept here as
    the operator exists in the surface."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.round(F.col("c_acctbal"), 2).desc(), "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, event_id,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag(ts) gap > 30 min starts a new session,
    running sum assigns ids (pyspark_guide 'Sessionization' idiom; the
    streaming twin is F.session_window in queries/streaming.py)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: cast('long') floor-truncates to whole
    # seconds while the oracle compares at micros — a gap in
    # (1800s, 1801s) would then classify differently across engines
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "q_window_range_frame",
    # count and cents-sum are exact integers, so the frame aggregate
    # can't drift with accumulation order (a RANGE frame's segment-tree
    # vs running-sum evaluation differs between engines on doubles)
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_5min,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS sum_cents_5min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: per-user trailing-5-minute
    event count and value sum, ordered by event time. Unlike a ROWS
    frame the bound is a time distance — the time-series sliding
    aggregate in its batch form (streaming form: q_stream_sliding_counts)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_5min"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).over(w).alias("sum_cents_5min"),
    )
