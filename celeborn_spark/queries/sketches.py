"""Mergeable-sketch queries: KMV distinct counts and theta-style
overlap estimation (operators/sketch.py) — cardinality analytics whose
cross-engine check is EXACT because the sketch itself is deterministic
md5 arithmetic, unlike engine-private HLL (q_sketch_accuracy can only
bound).

Reference analogue: compact per-partition summaries merged at read
time (the partition-split/commit manifest discipline of the reference
worker) — here the summary is a cardinality sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.sketch import (
    kmv_distinct,
    kmv_distinct_oracle_sql,
    kmv_overlap,
    kmv_overlap_oracle_sql,
)
from celeborn_spark.registry import query

_K = 64


@query(
    "q_kmv_distinct",
    oracle=kmv_distinct_oracle_sql(
        "lineitem", "l_partkey", "l_returnflag", "l_returnflag", k=_K
    ),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts shipped per return flag, estimated by a k=64 KMV
    sketch next to the exact count. At 100 TB the sketch path shuffles
    k rows per group instead of every distinct key; the exact column
    exists for the driver's hash comparison (and would be dropped in
    production). Estimate arithmetic is bit-identical cross-engine —
    identical md5 minima, one division (operators/sketch.kmv_distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_partkey", "l_returnflag", k=_K)


@query(
    "q_kmv_overlap",
    oracle=kmv_overlap_oracle_sql(
        "lineitem",
        "l_partkey",
        "l_returnflag = 'A'",
        "l_returnflag = 'R'",
        k=_K,
    ),
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-set overlap between returned (A) and refused (R) lines via the theta
    rule: theta = min of the two kth-minimum hashes, estimate = common
    samples below theta / theta. The contamination-audit shape — at
    100 TB two 64-row sketches broadcast-join instead of the raw key
    sets meeting; the exact-overlap column is the honesty check
    (operators/sketch.kmv_overlap)."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_overlap(
        li.filter(F.col("l_returnflag") == "A"),
        li.filter(F.col("l_returnflag") == "R"),
        "l_partkey",
        k=_K,
    )


@query(
    "q_hll_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS merge_within_2pct,
           TRUE AS hll_within_5pct
    FROM lineitem GROUP BY 1
    """,
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native HLL sketch ALGEBRA, driver-verified: per return
    flag, four partition-slice sketches (hll_sketch_agg) merged with
    hll_union_agg estimate within 2% of one direct whole-group sketch
    — this is why the sketch is the 100 TB distinct-count path
    (partial sketches combine map-side like any partial agg; only
    fixed-size register sets shuffle). NOT asserted bit-equal: the
    Datasketches impl promotes sparse->dense representations on union,
    so merged and direct estimates legitimately differ within rsd
    (measured <=0.7% at sf0.01; lgConfigK=14 rsd ~0.8%, bound 2.5x).
    The oracle pins exact counts plus both self-check booleans; the
    direct estimate also sits within 5% of exact (>6 sigma)."""
    li = load_table(spark, sf_dir, "lineitem")
    sliced = li.groupBy(
        "l_returnflag", F.pmod("l_orderkey", F.lit(4)).alias("_slice")
    ).agg(F.hll_sketch_agg("l_orderkey", 14).alias("sk"))
    merged = sliced.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", False)).alias("est_m")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", 14)).alias("est_d"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    return direct.join(merged, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("est_m") - F.col("est_d")) / F.col("est_d") <= 0.02
        ).alias("merge_within_2pct"),
        (
            F.abs(F.col("est_d") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        ).alias("hll_within_5pct"),
    )
