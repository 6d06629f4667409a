"""Graph analytics queries: PageRank over the order bipartite graph
(SURVEY.md §2C iterative-algorithm surface, next to k-means).

Reference analogue: Celeborn has no graph operators, but iterative
exchange workloads are exactly what its data plane exists to serve
(tests/spark-it/.../SparkTestBase.scala:122-135 repartition+reduce
loops); here each round costs one exchange — the node-sized rank/deg
relations are AQE-broadcast by default, and `partition_edges=True`
opts into a partitioned-once edge layout for beyond-broadcast graphs
(operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import graph as graph_ops
from celeborn_spark.operators.graph import (
    adamic_adar_oracle_sql,
    bfs_oracle_sql,
    kcore_oracle_sql,
    WEIGHTED_EDGES_ORACLE,
    bipartite_order_edges,
    directed_order_edges,
    pagerank,
    pagerank_dangling_oracle_sql,
    pagerank_oracle_sql,
    triangle_oracle_sql,
    weighted_order_edges,
)
from celeborn_spark.registry import query

_ITERS = 3


@query("q_pagerank", oracle=pagerank_oracle_sql(iters=_ITERS))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled PageRank (3 rounds, damping 0.85) over the undirected
    customer<->supplier order graph. Default AQE-broadcast path: the
    rank/deg relations are node-sized, so each round costs exactly one
    exchange (the groupBy(dst) contribution combine); pass
    partition_edges=True in `pagerank` for beyond-broadcast graphs.
    The edge join+distinct is materialized once (bipartite_order_edges
    localCheckpoints it) and the bounded rounds chain lazily."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return pagerank(bipartite_order_edges(orders, lineitem), iters=_ITERS)


@query(
    "q_pagerank_weighted",
    oracle=pagerank_oracle_sql(WEIGHTED_EDGES_ORACLE, iters=_ITERS, weighted=True),
)
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank: edges carry order-line multiplicity, so the
    random surfer follows strong customer<->supplier relationships
    proportionally (contribution = pr * w / sum_w(src)). Same
    one-exchange-per-round plan as the unweighted form — the weight is
    one extra double riding the existing edge relation."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return pagerank(
        weighted_order_edges(orders, lineitem), iters=_ITERS, weight_col="ew"
    )


@query("q_pagerank_dangling", oracle=pagerank_dangling_oracle_sql(iters=_ITERS))
def q_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dangling-aware PageRank over the DIRECTED customer->supplier
    graph: every supplier is a planted dangler (no out-edges), so each
    round redistributes their summed rank uniformly (teleport-sum
    correction) — total mass stays at N instead of leaking. Scalars
    (dangling mass, N) are broadcast 1-row relations; no per-round
    driver action."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return pagerank(
        directed_order_edges(orders, lineitem), iters=_ITERS, handle_dangling=True
    )


@query("q_triangle_count", oracle=triangle_oracle_sql(min_qty=45))
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts over the co-purchase graph (two
    suppliers connected when both ship large lines in one order) —
    the community-density / clustering-coefficient primitive. Degree-
    ordered orientation keeps the wedge join O(m^1.5) instead of
    quadratic-on-hubs (operators/graph.triangle_counts)."""
    from celeborn_spark.operators.graph import copurchase_edges, triangle_counts

    lineitem = load_table(spark, sf_dir, "lineitem")
    # copurchase_edges is an exchange-bearing self-join + distinct; the
    # consumers below reference it several times in one lazy plan, so
    # materialize once (the r7 pagerank-pair-build regime, not q_hits')
    edges = copurchase_edges(lineitem, min_qty=45).localCheckpoint(eager=False)
    return triangle_counts(edges)


@query(
    "q_bfs_reachability",
    oracle=bfs_oracle_sql(seed_pred="src % 194 = 0", max_hops=3),
)
def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the undirected customer<->
    supplier order graph, seeds = customers with custkey % 97 == 0
    (node id custkey*2, so node % 194 == 0). The blast-radius /
    contamination-spread primitive: one frontier-join exchange per hop,
    frontier bounded by reachable nodes, edges never mutated."""
    from celeborn_spark.operators.graph import bfs_hops

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = bipartite_order_edges(orders, lineitem)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % 194 == 0)
        .distinct()
    )
    return bfs_hops(edges, seeds, max_hops=3)


@query(
    "q_kcore",
    oracle=kcore_oracle_sql(k=8, rounds=4, min_qty=45),
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=8, 4 bounded rounds) over the supplier
    co-purchase graph — the graph density filter that strips leaves and
    spam-farm tendrils, keeping the mutually-well-connected core. Each
    round: one degree aggregation + two shrinking semi-joins."""
    from celeborn_spark.operators.graph import copurchase_edges, kcore

    lineitem = load_table(spark, sf_dir, "lineitem")
    return kcore(copurchase_edges(lineitem, min_qty=45), k=8, rounds=4)


@query(
    "q_adamic_adar",
    oracle=adamic_adar_oracle_sql(k=30, min_qty=45),
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 Adamic–Adar link predictions over the supplier
    co-purchase graph: non-adjacent supplier pairs ranked by
    sum(1/ln(deg)) over common neighbors — the related-entity /
    recommend-a-link primitive. Wedge join keyed on the common
    neighbor, anti-join vs existing edges, one pair-keyed aggregate;
    cut ranks on the 6 dp-rounded score with the pair as tiebreaker
    (operators/graph.adamic_adar)."""
    from celeborn_spark.operators.graph import adamic_adar, copurchase_edges

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(lineitem, min_qty=45).localCheckpoint(eager=False)
    return adamic_adar(edges, k=30)


@query("q_hits", oracle=graph_ops.hits_oracle_sql(iters=_ITERS))
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (3 rounds) over the DIRECTED customer->
    supplier order graph: customers are pure hubs, suppliers pure
    authorities — the link-analysis dual of q_pagerank_dangling on the
    same edge relation. Two node-keyed exchanges + two broadcast scalar
    normalizers per round (operators/graph.hits)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # partition_edges stays False here: at bench scale the node-sized
    # hub/auth side broadcasts, so the edge mass never shuffles at all
    # (byte-measured in tests/test_metrics.py) — pre-partitioning would
    # ADD two edge shuffles. Set True only when the node set outgrows
    # broadcast and the per-round joins degrade to shuffle joins.
    # materialize="persist": HITS' half-round checkpoints already bound
    # the plan, so the cached edge build beats the checkpointed one
    # (no blocking toRdd planning pass; see directed_order_edges).
    return graph_ops.hits(
        directed_order_edges(orders, lineitem, materialize="persist"),
        iters=_ITERS,
    )


@query(
    "q_shortest_path",
    oracle=graph_ops.shortest_paths_oracle_sql(
        graph_ops.COST_EDGES_ORACLE,
        "SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = 0",
        rounds=3,
    ),
)
def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford (3 relaxation rounds) from every nation-0
    customer over the undirected min-quantity-weighted order graph —
    exact integer min/plus arithmetic end to end, so the unrolled-CTE
    oracle matches bit-for-bit (operators/graph.shortest_paths). The
    weighted generalization of q_bfs_reachability."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    seeds = customer.filter(F.col("c_nationkey") == 0).select(
        (F.col("c_custkey") * 2).alias("node")
    )
    return graph_ops.shortest_paths(
        graph_ops.cost_order_edges(orders, lineitem), seeds, rounds=3
    )


@query(
    "q_label_propagation",
    oracle=graph_ops.label_propagation_oracle_sql(rounds=_ITERS),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label propagation (3 synchronous rounds, all-integer
    min-label tiebreak) over the undirected customer<->supplier order
    graph — community detection beside q_dedup_groups' connected
    components. One join + one partial-combined count exchange per
    round, argmax via struct max, zero windows
    (operators/graph.label_propagation)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return graph_ops.label_propagation(
        bipartite_order_edges(orders, lineitem), rounds=_ITERS
    )


@query(
    "q_clustering_coefficient",
    oracle="""
    WITH el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM el UNION ALL SELECT v FROM el)
        GROUP BY node
    ),
    o AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND el.u < el.v)
                    THEN el.u ELSE el.v END AS s,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND el.u < el.v)
                    THEN el.v ELSE el.u END AS t
        FROM el JOIN deg du ON el.u = du.node JOIN deg dv ON el.v = dv.node
    ),
    w AS (
        SELECT o1.s AS a, o1.t AS x, o2.t AS y
        FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
    ),
    tri AS (SELECT a, x, y FROM w JOIN el ON el.u = w.x AND el.v = w.y),
    ntri AS (
        SELECT node, count(*) AS n_tri
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT x FROM tri
              UNION ALL SELECT y FROM tri)
        GROUP BY node
    )
    SELECT deg.node, CAST(coalesce(ntri.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(2 * coalesce(ntri.n_tri, 0) AS DOUBLE)
               / (deg.d * (deg.d - 1)) AS clustering
    FROM deg LEFT JOIN ntri ON deg.node = ntri.node
    WHERE deg.d >= 2
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the supplier co-purchase
    graph: 2*triangles / (d*(d-1)) per node with degree >= 2 — the
    how-clique-like-is-my-neighborhood signal (community density,
    link-spam detection) composed from `triangle_counts` and the
    degree aggregate; ONE exact-integer division, no rounding. Nodes
    with no triangles report 0 (left join), keeping the denominator
    honest."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_ops.copurchase_edges(li, min_qty=45).localCheckpoint(eager=False)
    tri = graph_ops.triangle_counts(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.col("degree").cast("long").alias("degree"),
            (
                (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("clustering"),
        )
    )


@query(
    "q_degree_assortativity",
    oracle="""
    WITH el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM el UNION ALL SELECT v FROM el)
        GROUP BY node
    ),
    pairs AS (
        SELECT du.d AS x, dv.d AS y FROM el
        JOIN deg du ON el.u = du.node JOIN deg dv ON el.v = dv.node
        UNION ALL
        SELECT dv.d AS x, du.d AS y FROM el
        JOIN deg du ON el.u = du.node JOIN deg dv ON el.v = dv.node
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs
    )
    SELECT n AS n_edge_ends,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                            * (n * syy - sy * sy)) END AS assortativity
    FROM s
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier co-purchase graph: Pearson
    correlation of endpoint degrees over both edge directions — do
    hubs attach to hubs (positive, social-style) or to leaves
    (negative, hub-and-spoke)? All correlation sums are exact BIGINTs
    (degrees are integers); one sqrt + one division, bit-identical.
    The structural prior behind skew decisions: disassortative graphs
    concentrate shuffle load on hub keys."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_ops.copurchase_edges(li, min_qty=45).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)  # joined twice per direction
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ends = edges.join(du, "u").join(dv, "v")
    pairs = ends.select(F.col("du").alias("x"), F.col("dv").alias("y")).unionAll(
        ends.select(F.col("dv").alias("x"), F.col("du").alias("y"))
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").alias("n_edge_ends"),
        # a regular graph (zero degree variance) has no defined
        # assortativity: NULL on both engines, never a /0
        F.when(
            (varx == 0) | (vary == 0), F.lit(None).cast("double")
        ).otherwise(num.cast("double") / den).alias("assortativity"),
    )


@query(
    "q_neighbor_jaccard",
    oracle=graph_ops.neighbor_jaccard_oracle_sql(
        """el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    )""",
        k=25,
    ),
)
def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 supplier pairs by neighbor-set Jaccard over the
    co-purchase graph — the degree-normalized link predictor next to
    q_adamic_adar (same wedge/anti-join machinery; Jaccard asks what
    FRACTION of the combined neighborhoods is shared). The ranking key
    is one division of exact integers — bit-identical cross-engine —
    with the pair as tiebreak (operators/graph.neighbor_jaccard)."""
    from celeborn_spark.operators.graph import copurchase_edges, neighbor_jaccard

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(lineitem, min_qty=45).localCheckpoint(eager=False)
    return neighbor_jaccard(edges, k=25)


@query(
    "q_harmonic_centrality",
    oracle=graph_ops.harmonic_oracle_sql(
        """el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    )"""
    ),
)
def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated (2-hop) harmonic centrality over the supplier
    co-purchase graph: H2 = |N1| + |N2|/2 — the influence-reach
    ranking next to q_triangle_count (density) and q_neighbor_jaccard
    (pairwise overlap), without all-pairs BFS. Two wedge equi-joins
    keyed on the middle node; harmonic = (2*n1+n2)/2.0 is one exact
    halving, emitted raw (operators/graph.harmonic_centrality_2hop)."""
    from celeborn_spark.operators.graph import (
        copurchase_edges,
        harmonic_centrality_2hop,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(lineitem, min_qty=45).localCheckpoint(eager=False)
    return harmonic_centrality_2hop(edges)


@query(
    "q_personalized_pagerank",
    oracle=graph_ops.personalized_pagerank_oracle_sql(
        """el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    ),
    e AS (SELECT u AS src, v AS dst FROM el
          UNION ALL SELECT v AS src, u AS dst FROM el)""",
        seed_mod=50,
        iters=3,
    ),
)
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the supplier co-purchase graph,
    restarting to the seed set (suppkey % 50 == 0) — relevance TO
    THESE suppliers, where global q_pagerank ranks importance to the
    whole graph (the related-item / local-influence primitive). Same
    one-exchange-per-round plan as pagerank plus a node-sized restart
    join; 6dp per round (operators/graph.personalized_pagerank)."""
    from celeborn_spark.operators.graph import (
        copurchase_edges,
        personalized_pagerank,
    )

    el = copurchase_edges(load_table(spark, sf_dir, "lineitem"), min_qty=45)
    edges = el.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        el.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    return personalized_pagerank(edges, seed_mod=50, iters=3)


def _lp_label_ctes(rounds: int = 3) -> str:
    """Unrolled label-propagation CTE chain over `el(u, v)` ending in
    `lfinal(node, label)` — the same per-round arithmetic as
    operators/graph.label_propagation_oracle_sql, packaged as a CTE
    fragment so downstream oracles (modularity) can consume the
    partition."""
    parts = [
        "e AS (SELECT u AS src, v AS dst FROM el UNION ALL SELECT v, u FROM el)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e)",
    ]
    prev = "l0"
    for i in range(rounds):
        parts.append(
            f"""c{i} AS (
        SELECT e.dst, {prev}.label, count(*) AS cnt
        FROM {prev} JOIN e ON {prev}.node = e.src
        GROUP BY 1, 2
    )"""
        )
        parts.append(
            f"""l{i + 1} AS (
        SELECT dst AS node, label FROM (
            SELECT dst, label,
                   row_number() OVER (
                       PARTITION BY dst ORDER BY cnt DESC, label ASC
                   ) AS rn
            FROM c{i}
        ) WHERE rn = 1
    )"""
        )
        prev = f"l{i + 1}"
    parts.append(f"lfinal AS (SELECT node, label FROM {prev})")
    return ",\n    ".join(parts)


@query(
    "q_graph_modularity",
    oracle=graph_ops.modularity_oracle_sql(
        """el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    )""",
        _lp_label_ctes(rounds=3),
    ),
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition over the
    supplier co-purchase graph — the did-the-communities-beat-random
    quality score closing the community-detection loop
    (q_label_propagation finds the partition; this grades it). Exact
    integer e_c/d_c/m; per-community terms identical IEEE, 6dp sum
    (operators/graph.modularity). The LPA labels are checkpointed once
    and consumed by the three label joins."""
    from celeborn_spark.operators.graph import (
        copurchase_edges,
        label_propagation,
        modularity,
    )

    el = copurchase_edges(
        load_table(spark, sf_dir, "lineitem"), min_qty=45
    ).localCheckpoint(eager=False)
    e_sym = el.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        el.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels = label_propagation(e_sym, rounds=3).localCheckpoint(eager=False)
    return modularity(el, labels)


_RICH_EL_SQL = """
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
"""


@query(
    "q_rich_club",
    oracle=f"""
    WITH el AS ({_RICH_EL_SQL}),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM el UNION ALL SELECT v AS node FROM el)
        GROUP BY node
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
    hist AS (SELECT deg, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY deg),
    thr AS (
        SELECT min(deg) AS k_thr FROM (
            SELECT deg, sum(c) OVER (ORDER BY deg) AS cum, n_nodes
            FROM hist CROSS JOIN tot
        ) WHERE 4 * cum >= 3 * n_nodes
    ),
    rich AS (SELECT node FROM deg CROSS JOIN thr WHERE deg > k_thr),
    nk AS (SELECT CAST(count(*) AS BIGINT) AS n_rich FROM rich),
    ek AS (
        SELECT CAST(count(*) AS BIGINT) AS e_rich
        FROM el
        WHERE u IN (SELECT node FROM rich) AND v IN (SELECT node FROM rich)
    )
    SELECT k_thr, n_rich, e_rich,
           CASE WHEN n_rich > 1 THEN
               CAST(2 * e_rich AS DOUBLE) / (n_rich * (n_rich - 1))
           END AS phi
    FROM thr CROSS JOIN nk CROSS JOIN ek
    """,
)
def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the supplier co-purchase graph: the
    edge density among nodes whose degree exceeds the 75th-percentile
    degree — "do the hubs preferentially trade with each other"
    (assortativity's set-level sibling: that one is a correlation,
    this is the density of the hub subgraph). The threshold comes
    from the DEGREE HISTOGRAM with the lower-quantile rule (smallest
    deg with 4*cum >= 3*n); counts are exact BIGINTs and phi =
    2*e_rich/(n_rich*(n_rich-1)) is ONE division — bit-identical.

    Scale shape: the edge list is built and checkpointed once; degrees
    are one exchange; the hub set is node-sized and broadcast into two
    semi-joins — edge mass is scanned, never paired."""
    from celeborn_spark.operators.graph import copurchase_edges
    from pyspark.sql import Window as W

    el = copurchase_edges(
        load_table(spark, sf_dir, "lineitem"), min_qty=45
    ).localCheckpoint(eager=False)
    deg = (
        el.select(F.col("u").alias("node"))
        .unionAll(el.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )
    tot = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = W.orderBy("deg").rowsBetween(W.unboundedPreceding, 0)
    thr = (
        hist.withColumn("cum", F.sum("c").over(wc))
        .crossJoin(F.broadcast(tot))
        .filter(4 * F.col("cum") >= 3 * F.col("n_nodes"))
        .agg(F.min("deg").alias("k_thr"))
    )
    rich = (
        deg.crossJoin(F.broadcast(thr))
        .filter(F.col("deg") > F.col("k_thr"))
        .select("node")
    )
    nk = rich.agg(F.count(F.lit(1)).cast("long").alias("n_rich"))
    ek = (
        el.join(
            F.broadcast(rich.select(F.col("node").alias("u"))), "u", "semi"
        )
        .join(F.broadcast(rich.select(F.col("node").alias("v"))), "v", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("e_rich"))
    )
    return (
        thr.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(ek))
        .select(
            "k_thr",
            "n_rich",
            "e_rich",
            F.when(
                F.col("n_rich") > 1,
                (2 * F.col("e_rich")).cast("double")
                / (F.col("n_rich") * (F.col("n_rich") - 1)),
            ).alias("phi"),
        )
    )


@query("q_ktruss", oracle=graph_ops.ktruss_oracle_sql(k=4, rounds=2, min_qty=45))
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the supplier co-purchase graph (edges surviving 2
    rounds of support-< 2 pruning): the edge-level cohesion filter one
    notch stricter than q_kcore — an edge survives only inside >= 2
    triangles of the CURRENT subgraph, so hub-and-spoke noise peels
    away. Per round: degree-ordered triangle enumeration (the
    q_triangle_count plan, hub-safe) + one support aggregate + a
    semi-join prune; edge/triangle relations localCheckpoint at their
    multi-reference points (operators/graph.ktruss)."""
    from celeborn_spark.operators.graph import copurchase_edges, ktruss

    lineitem = load_table(spark, sf_dir, "lineitem")
    return ktruss(copurchase_edges(lineitem, min_qty=45), k=4, rounds=2)


@query("q_homophily", oracle=graph_ops.homophily_oracle_sql(min_qty=45))
def q_homophily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation homophily of the supplier co-purchase graph: Newman's
    discrete attribute assortativity — do same-nation suppliers co-sell
    beyond what nation sizes force? The categorical sibling of
    q_degree_assortativity. Integer-cleared single-division form over
    directed stub counts (operators/graph.attribute_assortativity)."""
    from celeborn_spark.operators.graph import (
        attribute_assortativity,
        copurchase_edges,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node"),
        F.col("s_nationkey").cast("long").alias("attr"),
    )
    return attribute_assortativity(
        copurchase_edges(lineitem, min_qty=45), sup
    )


@query(
    "q_powerlaw_alpha",
    # continuous-approximation MLE alpha = 1 + n / sum(ln(d / d_min))
    # over degrees >= d_min = 2 (ln terms from the DEGREE HISTOGRAM,
    # accumulated over the ordered degree window; one final division,
    # 6dp). Degenerate guard: all observed degrees equal d_min makes
    # the ln-sum 0 -> NULL.
    oracle="""
    WITH el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM el UNION ALL SELECT v FROM el
        ) GROUP BY node
    ),
    hist AS (
        SELECT d, CAST(count(*) AS BIGINT) AS c
        FROM deg WHERE d >= 2 GROUP BY d
    ),
    walked AS (
        SELECT sum(c * ln(CAST(d AS DOUBLE) / 2)) OVER w AS lnsum,
               sum(c) OVER w AS n,
               count(*) OVER w AS rn,
               count(*) OVER () AS cells
        FROM hist
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_nodes,
           CAST(2 AS BIGINT) AS d_min,
           CASE WHEN lnsum > 0
                THEN round(1.0 + n / lnsum, 6) END AS alpha_hat
    FROM walked WHERE rn = cells
    """,
)
def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law degree exponent of the supplier co-purchase graph:
    the continuous-approximation MLE alpha = 1 + n/sum(ln(d/d_min))
    over nodes with degree >= d_min=2 — the is-this-scale-free
    readout behind every hub-aware plan choice in the graph family
    (alpha ~ 2-3 means hubs dominate; the degree-ordered triangle
    plans exist precisely for that regime). ln terms come from the
    DEGREE HISTOGRAM accumulated over the ordered degree window;
    one final division, 6dp. NULL when every degree equals d_min."""
    from pyspark.sql import Window as W

    from celeborn_spark.operators.graph import copurchase_edges

    edges = copurchase_edges(
        load_table(spark, sf_dir, "lineitem"), min_qty=45
    ).localCheckpoint(eager=False)  # referenced by both degree union lanes
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    hist = (
        deg.filter(F.col("d") >= 2)
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    walked = (
        hist.withColumn(
            "lnsum",
            F.sum(F.expr("c * ln(CAST(d AS DOUBLE) / 2)")).over(w),
        )
        .withColumn("n", F.sum("c").over(w))
        .withColumn("rn", F.count(F.lit(1)).over(w))
        .withColumn("cells", F.count(F.lit(1)).over(W.partitionBy()))
    )
    return walked.filter(F.col("rn") == F.col("cells")).select(
        F.col("n").cast("long").alias("n_nodes"),
        F.lit(2).cast("long").alias("d_min"),
        F.when(
            F.col("lnsum") > 0,
            F.round(F.expr("1.0 + n / lnsum"), 6),
        ).alias("alpha_hat"),
    )


@query(
    "q_eigenvector_centrality",
    oracle=graph_ops.eigenvector_oracle_sql(min_qty=45, iters=3),
)
def q_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality (3 L1-normalized power-iteration rounds,
    6dp per-round re-sync) over the supplier co-purchase graph — a
    node matters when its NEIGHBORS matter: the influence ranking that
    separates well-connected cores from leaf-heavy hubs degree alone
    over-counts. Undirected companion of q_pagerank / q_hits on the
    same graph family; one node-keyed exchange per round
    (operators/graph.eigenvector_centrality)."""
    li = load_table(spark, sf_dir, "lineitem")
    from celeborn_spark.operators.graph import copurchase_edges

    return graph_ops.eigenvector_centrality(
        copurchase_edges(li, min_qty=45), iters=3
    )


@query(
    "q_katz_centrality",
    oracle=graph_ops.katz_oracle_sql(min_qty=45, alpha=0.1, iters=3),
)
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (3 rounds of x' = 0.1*Ax + 1, 6dp per-round
    re-sync) over the supplier co-purchase graph — influence with a
    baseline: every node keeps its +1 floor and walk volume damps by
    alpha per hop, the ranking of choice for sparse graphs with many
    near-isolated nodes where eigenvector centrality zeroes out
    everything off the core. One node-keyed exchange per round
    (operators/graph.katz_centrality)."""
    li = load_table(spark, sf_dir, "lineitem")
    from celeborn_spark.operators.graph import copurchase_edges

    return graph_ops.katz_centrality(
        copurchase_edges(li, min_qty=45), alpha=0.1, iters=3
    )


@query(
    "q_edge_embeddedness",
    oracle=graph_ops.edge_embeddedness_oracle_sql(
        """el AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
        WHERE a.l_quantity >= 45 AND b.l_quantity >= 45
    )""",
        k=25,
    ),
)
def q_edge_embeddedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 supplier co-purchase edges by embeddedness (shared
    neighbors over union neighborhood): which existing ties are
    deeply embedded vs local bridges — the tie-strength complement
    of q_neighbor_jaccard's non-edge link prediction, same wedge
    machinery with an inner (semi) join against the edge list
    (operators/graph.edge_embeddedness)."""
    from celeborn_spark.operators.graph import copurchase_edges, edge_embeddedness

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(lineitem, min_qty=45).localCheckpoint(eager=False)
    return edge_embeddedness(edges, k=25)


@query(
    "q_degree_centralization",
    oracle=graph_ops.degree_centralization_oracle_sql(
        """SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           FROM lineitem a
           JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                          AND a.l_suppkey < b.l_suppkey
           WHERE a.l_quantity >= 45 AND b.l_quantity >= 45"""
    ),
)
def q_degree_centralization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeman degree centralization of the supplier co-purchase
    graph: one number for how hub-dominated the topology is — the
    scalar summary over the same degree relation q_powerlaw_alpha
    fits and q_degree_assortativity correlates, and the structural
    shuffle-skew prior (centralized graph = hub keys = salt/AQE
    territory). Exact integer degree sums, one division
    (operators/graph.degree_centralization)."""
    li = load_table(spark, sf_dir, "lineitem")
    # both degree union lanes reference the self-join build — once
    edges = graph_ops.copurchase_edges(li, min_qty=45).localCheckpoint(eager=False)
    return graph_ops.degree_centralization(edges)
