"""Bounded-iteration connected components (hash-min label propagation)
— turns near-dup PAIRS into dedup GROUPS (SURVEY.md §7 "what's hard"
#2: iterative, bound iterations, checkpoint between, no collect).

Each iteration: every vertex takes the min label among itself and its
neighbors — one join + one groupBy (two exchanges) per round; labels
converge in O(diameter) rounds, and near-dup graphs are unions of
small cliques, so a handful of rounds suffices. localCheckpoint()
truncates lineage each round (the driver-side plan would otherwise grow
exponentially); convergence is detected with a count of changed labels
(one scalar action per round, never a data collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_propagation_round(
    edges: DataFrame, labels: DataFrame, broadcast_labels: bool = False
) -> DataFrame:
    """One hash-min propagation round (the loop body, exposed so skew
    tests can pin its physical plan): each vertex takes the min label
    among itself and its neighbors. The edges.dst join key is power-law
    on real near-dup graphs (a giant component's hub vertex) — the
    groupBy(src) partial-agg absorbs hot keys map-side and AQE's skew
    split handles the join (tests/test_skew_stress.py).

    ``broadcast_labels`` hints the vertex-sized labels/neighbor-min
    relations broadcast (they derive from checkpointed RDDs with
    unknown stats, so the static planner otherwise sort-merges and
    re-exchanges the EDGE mass every round — the r13 iterative-graph
    fix). Default False: the direct-call skew tests pin the
    shuffle-join shape, and `connected_components` opts in."""
    lb = F.broadcast(labels) if broadcast_labels else labels
    neighbor_min = (
        edges.join(lb, edges.dst == lb.vertex)
        .groupBy("src")
        .agg(F.min("label").alias("nbr_label"))
    )
    if broadcast_labels:
        neighbor_min = F.broadcast(neighbor_min)
    return (
        labels.join(neighbor_min, labels.vertex == neighbor_min.src, "left")
        .select(
            "vertex",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
            (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                "_changed"
            ),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    broadcast_labels: bool = True,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in `pairs`;
    component = min vertex id in its connected component.

    The label relation is vertex-sized — near-dup vertices are the
    docs that appear in a pair, far fewer than the corpus — and
    broadcasts into each round's edge join by default; pass
    ``broadcast_labels=False`` when the vertex set outgrows broadcast
    (the shuffle join + AQE skew split regime the tests pin)."""
    # Materialize the edge list once: it is re-joined every round, and
    # without a checkpoint each iteration would re-run the (possibly
    # expensive — LSH!) pair-producing pipeline from scratch.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        new_labels = _label_propagation_round(
            edges, labels, broadcast_labels
        ).localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("vertex", F.col("label").alias("component"))


def dedup_groups(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup groups: component id + member count per group
    (keep-one-per-group = filter vertex == component downstream)."""
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    # component-sized aggregate of a checkpointed RDD (unknown stats) —
    # hint it broadcast instead of sort-merging the vertex relation
    return cc.join(F.broadcast(sizes), "component").select(
        "vertex", "component", "group_size"
    )
