"""PageRank: determinism, rank-mass conservation, convergence shape,
and oracle parity of the registered query (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.graph import (
    bipartite_order_edges,
    pagerank,
    pagerank_oracle_sql,
)
from tests.oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    return bipartite_order_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()


def test_pagerank_deterministic(spark, edges):
    a = {r.node: r.pr for r in pagerank(edges, iters=2).collect()}
    b = {r.node: r.pr for r in pagerank(edges, iters=2).collect()}
    assert a == b
    assert len(a) > 0


def test_pagerank_mass_conserved(spark, edges):
    """Scaled form: sum of pr stays ~= node count every round (no
    dangling nodes by construction of the undirected edge list)."""
    n = edges.select("src").distinct().count()
    for iters in (1, 3):
        total = pagerank(edges, iters=iters).agg(F.sum("pr")).collect()[0][0]
        assert total == pytest.approx(n, rel=1e-4), (iters, total, n)


def test_pagerank_converges(spark, edges):
    """Successive iterations move less: L1 delta between rounds 2->3
    is below the delta between rounds 0->1 (damping contracts)."""
    r = {i: {x.node: x.pr for x in pagerank(edges, iters=i).collect()} for i in (0, 1, 2, 3)}
    d01 = sum(abs(r[1][n] - r[0][n]) for n in r[0])
    d23 = sum(abs(r[3][n] - r[2][n]) for n in r[2])
    assert d23 < d01


def test_pagerank_hub_ranks_higher(spark):
    """A node every other node points at must outrank the spokes."""
    star = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(star, ["src", "dst"])
    ranks = {r.node: r.pr for r in pagerank(edges, iters=5).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6))


def test_pagerank_vs_oracle(spark, sf_dir):
    from celeborn_spark.queries.graph import q_pagerank

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        q_pagerank(spark, sf_dir), con, pagerank_oracle_sql(iters=3), "q_pagerank"
    )


def test_pagerank_rejects_negative_iters(spark, edges):
    with pytest.raises(ValueError):
        pagerank(edges, iters=-1)
