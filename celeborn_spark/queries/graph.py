"""Graph analytics queries: PageRank over the order bipartite graph
(SURVEY.md §2C iterative-algorithm surface, next to k-means).

Reference analogue: Celeborn has no graph operators, but iterative
exchange workloads are exactly what its data plane exists to serve
(tests/spark-it/.../SparkTestBase.scala:122-135 repartition+reduce
loops); here the per-iteration exchange is the rank relation only —
the edge relation is partitioned once and reused (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.graph import (
    bipartite_order_edges,
    pagerank,
    pagerank_oracle_sql,
)
from celeborn_spark.registry import query

_ITERS = 3


@query("q_pagerank", oracle=pagerank_oracle_sql(iters=_ITERS))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled PageRank (3 rounds, damping 0.85) over the undirected
    customer<->supplier order graph. Edge relation hash-partitioned by
    src once and persisted; each round exchanges only the node-sized
    rank relation, localCheckpointed to cut lineage."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return pagerank(bipartite_order_edges(orders, lineitem), iters=_ITERS)
