"""Known-answer test for q_powerlaw_alpha — the MLE degree exponent.
DuckDB parity is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math


def test_powerlaw_alpha_hand_computed(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    # planted degree histogram: degrees 2,2,4,8 (d_min = 2)
    # lnsum = 0 + 0 + ln2 + ln4; n = 4 -> alpha = 1 + 4/(3 ln 2)
    hist = spark.createDataFrame([(2, 2), (4, 1), (8, 1)], ["d", "c"])
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    out = (
        hist.withColumn(
            "lnsum", F.sum(F.expr("c * ln(CAST(d AS DOUBLE) / 2)")).over(w)
        )
        .withColumn("n", F.sum("c").over(w))
        .withColumn("rn", F.count(F.lit(1)).over(w))
        .withColumn("cells", F.count(F.lit(1)).over(W.partitionBy()))
        .filter(F.col("rn") == F.col("cells"))
        .select(F.expr("1.0 + n / lnsum").alias("a"))
        .collect()[0]
    )
    want = 1 + 4 / (3 * math.log(2))
    assert abs(out["a"] - want) < 1e-9


def test_powerlaw_alpha_on_copurchase_graph(spark, sf_dir):
    from celeborn_spark.queries.graph import q_powerlaw_alpha

    out = q_powerlaw_alpha(spark, sf_dir).collect()[0]
    assert out["d_min"] == 2 and out["n_nodes"] > 0
    # a connected co-purchase graph with degree spread -> alpha > 1
    if out["alpha_hat"] is not None:
        assert out["alpha_hat"] > 1.0
