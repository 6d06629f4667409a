"""Known-answer tests for q_gini_coefficient — exact tie-aware Gini.
DuckDB parity is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations


def _gini_via_query_machinery(spark, balances):
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    df = spark.createDataFrame([(b,) for b in balances], ["c_acctbal"])
    hist = df.groupBy(
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wp = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    wall = W.partitionBy()
    cum = hist.select(
        "v", "c",
        F.coalesce(F.sum("c").over(wp), F.lit(0)).alias("p"),
        F.sum("c").over(wall).alias("n"),
        F.sum(F.col("v") * F.col("c")).over(wall).alias("s"),
    )
    return cum.agg(
        (
            F.sum(
                F.col("v") * F.col("c")
                * (2 * F.col("p") + F.col("c") - F.col("n"))
            ).cast("double")
            / (F.max("n") * F.max("s"))
        ).alias("g")
    ).collect()[0]["g"]


def test_gini_poles(spark):
    # perfect equality -> 0
    assert abs(_gini_via_query_machinery(spark, [5.0] * 10)) < 1e-12
    # extreme concentration -> (n-1)/n
    g = _gini_via_query_machinery(spark, [0.0] * 9 + [100.0])
    assert abs(g - 0.9) < 1e-12


def test_gini_hand_computed_with_ties(spark):
    # values 1,1,2 (cents 100,100,200): sorted ranks -> exact Gini
    # G = sum((2i-n-1)x_i)/(n*S) = ((2-4)*100 + (4-4)*100 + (6-4)*200)
    #     / (3*400) = 200/1200
    g = _gini_via_query_machinery(spark, [1.0, 1.0, 2.0])
    assert abs(g - 200 / 1200) < 1e-12


def test_gini_bounded_on_customers(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_gini_coefficient

    out = q_gini_coefficient(spark, sf_dir).collect()[0]
    assert 0.0 <= out["gini"] < 1.0
    assert out["gini_num"] >= 0 and out["n"] > 0
