"""PageRank: determinism, rank-mass conservation, convergence shape,
and oracle parity of the registered query (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.graph import (
    bipartite_order_edges,
    directed_order_edges,
    pagerank,
    pagerank_dangling_oracle_sql,
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


# --- dangling-node handling (handle_dangling=True) ---


def test_dangling_mass_conserved(spark):
    """Directed chain with a sink: 0->1->2 (node 2 dangles). With
    redistribution, total rank mass stays at N=3 every round; the
    default path leaks the dangler's mass instead."""
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    for iters in (1, 3, 5):
        total = (
            pagerank(edges, iters=iters, handle_dangling=True)
            .agg(F.sum("pr"))
            .collect()[0][0]
        )
        assert total == pytest.approx(3.0, rel=1e-4), (iters, total)
    leaked = pagerank(edges, iters=3).agg(F.sum("pr")).collect()[0][0] or 0.0
    assert leaked < 2.5  # documents the leak the flag exists to fix


def test_dangling_sink_outranks_spoke(spark):
    """Star with all edges INTO a sink hub: the hub (a dangler) must
    accumulate the most rank, and its mass must flow back out to the
    spokes via redistribution rather than vanish."""
    edges = spark.createDataFrame([(i, 0) for i in range(1, 6)], ["src", "dst"])
    ranks = {r.node: r.pr for r in pagerank(edges, iters=5, handle_dangling=True).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6))
    assert min(ranks.values()) > 0
    assert sum(ranks.values()) == pytest.approx(6.0, rel=1e-4)


def test_dangling_deterministic(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 0)], ["src", "dst"]
    )
    a = {r.node: r.pr for r in pagerank(edges, iters=3, handle_dangling=True).collect()}
    b = {r.node: r.pr for r in pagerank(edges, iters=3, handle_dangling=True).collect()}
    assert a == b and len(a) == 4


def test_no_danglers_matches_default_path(spark, edges):
    """On a graph with no danglers the correction is a no-op: both
    paths produce identical 6-dp ranks."""
    base = {r.node: r.pr for r in pagerank(edges, iters=2).collect()}
    cor = {r.node: r.pr for r in pagerank(edges, iters=2, handle_dangling=True).collect()}
    assert base == cor


def test_pagerank_dangling_vs_oracle(spark, sf_dir):
    from celeborn_spark.queries.graph import q_pagerank_dangling

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        q_pagerank_dangling(spark, sf_dir),
        con,
        pagerank_dangling_oracle_sql(iters=3),
        "q_pagerank_dangling",
    )


def test_weighted_pagerank_follows_strong_edges(spark):
    """Two spokes pointing at two hubs with 9:1 weights — the heavy hub
    must outrank the light one; uniform weights must reproduce the
    unweighted ranks bit-for-bit."""
    e = spark.createDataFrame(
        [(1, 10, 9.0), (1, 11, 1.0), (2, 10, 9.0), (2, 11, 1.0),
         (10, 1, 1.0), (11, 2, 1.0)],
        ["src", "dst", "w"],
    )
    ranks = {r.node: r.pr for r in pagerank(e, iters=4, weight_col="w").collect()}
    assert ranks[10] > ranks[11]
    uni = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)], ["src", "dst", "w"]
    )
    a = {r.node: r.pr for r in pagerank(uni, iters=3, weight_col="w").collect()}
    b = {r.node: r.pr for r in pagerank(uni.drop("w"), iters=3).collect()}
    assert a == b


def test_weighted_pagerank_vs_oracle(spark, sf_dir):
    from celeborn_spark.operators.graph import WEIGHTED_EDGES_ORACLE
    from celeborn_spark.queries.graph import q_pagerank_weighted

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        q_pagerank_weighted(spark, sf_dir),
        con,
        pagerank_oracle_sql(WEIGHTED_EDGES_ORACLE, iters=3, weighted=True),
        "q_pagerank_weighted",
    )


def test_directed_edges_have_danglers(spark, sf_dir):
    """The planted-dangler graph is honest: suppliers never appear as
    src, so every supplier node dangles."""
    e = directed_order_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    supplier_srcs = e.where(F.col("src") % 2 == 1).count()
    assert supplier_srcs == 0
    assert e.count() > 0


# --- BFS hop distance (operators/graph.bfs_hops) ---


def test_bfs_path_graph_hops(spark):
    """Directed path 0->1->2->3->4, seed {0}: hop == node index,
    bounded at max_hops."""
    from celeborn_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(i, i + 1) for i in range(4)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 beyond the bound


def test_bfs_min_hop_wins_on_diamond(spark):
    """Diamond 0->1->3, 0->2, 2->3 plus a long detour 1->4->3 variant:
    node 3 settles at hop 2 (shortest), never the longer path."""
    from celeborn_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 4), (4, 3), (2, 3)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=4).collect()}
    assert got[3] == 2 and got[4] == 2


def test_bfs_multi_source_takes_nearest_seed(spark):
    from celeborn_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (10, 3)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (10,)], ["node"])
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got[3] == 1  # via seed 10, not hop-3 via seed 0


def test_bfs_zero_hops_returns_seeds_only(spark):
    from celeborn_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(0, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    assert [(r.node, r.hop) for r in bfs_hops(e, seeds, max_hops=0).collect()] == [
        (0, 0)
    ]


def test_bfs_vs_oracle(spark, sf_dir):
    from celeborn_spark.queries.graph import q_bfs_reachability
    from celeborn_spark.operators.graph import bfs_oracle_sql

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        q_bfs_reachability(spark, sf_dir),
        con,
        bfs_oracle_sql(seed_pred="src % 194 = 0", max_hops=3),
        "q_bfs_reachability",
    )


# --- k-core peeling (operators/graph.kcore) ---


def test_kcore_strips_tail_keeps_clique(spark):
    """K4 clique with a pendant path hanging off: 2-core = the K4
    (every clique node has core degree 3 once the tail peels)."""
    from celeborn_spark.operators.graph import kcore

    k4 = [(u, v) for u in range(4) for v in range(4) if u < v]
    tail = [(3, 4), (4, 5)]
    e = spark.createDataFrame(k4 + tail, ["u", "v"])
    got = {r.node: r.core_deg for r in kcore(e, k=2, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_cascading_peel_needs_rounds(spark):
    """A path peels one layer per round from each end — with too few
    rounds the middle survives, with enough it empties (no 2-core)."""
    from celeborn_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(path, ["u", "v"])
    assert kcore(e, k=2, rounds=1).count() > 0
    assert kcore(e, k=2, rounds=4).count() == 0


def test_kcore_rejects_bad_k(spark):
    from celeborn_spark.operators.graph import kcore

    e = spark.createDataFrame([(0, 1)], ["u", "v"])
    with pytest.raises(ValueError, match="k must be"):
        kcore(e, k=0)


def test_kcore_vs_oracle(spark, sf_dir):
    from celeborn_spark.queries.graph import q_kcore
    from celeborn_spark.operators.graph import kcore_oracle_sql

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        q_kcore(spark, sf_dir),
        con,
        kcore_oracle_sql(k=8, rounds=4, min_qty=45),
        "q_kcore",
    )


# --- HITS hubs/authorities (operators/graph.hits) ---


def test_hits_star_hub_dominates(spark):
    """Star 0->{1,2,3}: node 0 is the only hub (hub=1 after L1 norm),
    the three leaves split authority equally."""
    from celeborn_spark.operators.graph import hits

    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    got = {r.node: (r.hub, r.auth) for r in hits(e, iters=2).collect()}
    assert got[0] == (1.0, 0.0)
    for leaf in (1, 2, 3):
        assert got[leaf][0] == 0.0
        assert abs(got[leaf][1] - 1 / 3) < 1e-5


def test_hits_authority_follows_indegree(spark):
    """Two hubs point at node 3, one at node 4: auth(3) > auth(4), and
    the hub pointing at BOTH popular targets out-scores the single-target
    hub after mutual reinforcement."""
    from celeborn_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(0, 3), (0, 4), (1, 3), (2, 4)], ["src", "dst"]
    )
    got = {r.node: (r.hub, r.auth) for r in hits(e, iters=3).collect()}
    assert got[3][1] > got[4][1] - 1e-9  # indegree 2 vs 2 (0,1 vs 0,2) equalish
    assert got[0][0] > got[1][0]  # two-target hub beats one-target hub


def test_hits_values_normalized(spark):
    """Hub and auth vectors each sum to ~1 (L1) every run."""
    from celeborn_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    rows = hits(e, iters=3).collect()
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.auth for r in rows) - 1.0) < 1e-4


def test_hits_rejects_zero_iters(spark):
    import pytest as _pytest

    from celeborn_spark.operators.graph import hits

    e = spark.createDataFrame([(0, 1)], ["src", "dst"])
    with _pytest.raises(ValueError):
        hits(e, iters=0)


# --- bounded Bellman-Ford (operators/graph.shortest_paths) ---


def test_shortest_path_prefers_cheap_detour(spark):
    """0->2 direct costs 10; 0->1->2 costs 2+3=5: the 2-hop detour wins
    once rounds >= 2, while a 1-round bound must take the direct edge."""
    from celeborn_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(
        [(0, 2, 10), (0, 1, 2), (1, 2, 3)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    one = {r.node: r.dist for r in shortest_paths(e, seeds, rounds=1).collect()}
    two = {r.node: r.dist for r in shortest_paths(e, seeds, rounds=2).collect()}
    assert one[2] == 10 and two[2] == 5


def test_shortest_path_multi_seed_min(spark):
    from celeborn_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(
        [(0, 1, 7), (9, 1, 2)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(0,), (9,)], ["node"])
    got = {r.node: r.dist for r in shortest_paths(e, seeds, rounds=2).collect()}
    assert got[1] == 2 and got[0] == 0 and got[9] == 0


def test_shortest_path_unreached_absent(spark):
    from celeborn_spark.operators.graph import shortest_paths

    e = spark.createDataFrame([(0, 1, 1), (5, 6, 1)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.dist for r in shortest_paths(e, seeds, rounds=3).collect()}
    assert 5 not in got and 6 not in got and got == {0: 0, 1: 1}


def test_shortest_path_zero_rounds_seeds_only(spark):
    from celeborn_spark.operators.graph import shortest_paths

    e = spark.createDataFrame([(0, 1, 1)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    assert [
        (r.node, r.dist) for r in shortest_paths(e, seeds, rounds=0).collect()
    ] == [(0, 0)]


# --- label propagation communities (operators/graph.label_propagation) ---


def _undirected(spark, pairs):
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, ["src", "dst"])
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_lpa_disjoint_cliques_get_distinct_labels(spark):
    """Two disjoint triangles each converge to their own min node id."""
    from celeborn_spark.operators.graph import label_propagation

    e = _undirected(
        spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    )
    got = {r.node: r.label for r in label_propagation(e, rounds=3).collect()}
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}


def test_lpa_majority_beats_min_label(spark):
    """Node 9 sits between a K4 community (stable label 4 from round 2)
    and the smaller-id pair {0,1}: the MAJORITY label 4 wins over the
    smaller label — the rule that separates LPA from
    connected-components min-propagation (which would give 0)."""
    from celeborn_spark.operators.graph import label_propagation

    k4 = [(4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)]
    e = _undirected(spark, k4 + [(9, 5), (9, 6), (9, 7), (9, 0), (0, 1)])
    got = {r.node: r.label for r in label_propagation(e, rounds=3).collect()}
    assert got[9] == 4


def test_lpa_deterministic(spark, sf_dir):
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.graph import (
        bipartite_order_edges,
        label_propagation,
    )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = bipartite_order_edges(o, li)
    a = sorted((r.node, r.label) for r in label_propagation(e, 2).collect())
    b = sorted((r.node, r.label) for r in label_propagation(e, 2).collect())
    assert a == b


def test_lpa_rejects_zero_rounds(spark):
    import pytest as _pytest

    from celeborn_spark.operators.graph import label_propagation

    e = _undirected(spark, [(0, 1)])
    with _pytest.raises(ValueError):
        label_propagation(e, rounds=0)
