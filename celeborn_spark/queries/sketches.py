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
