"""Planted-skew stress tests for the three bucketed/iterative paths
whose shuffle keys are power-law in the wild (VERDICT r4 item 2):

- LSH band-bucket join: a hot band (30% of docs identical) — AQE's
  skew split must fire on the band join (SortMergeJoin(skew=true) /
  AQEShuffleRead skewed), the built-in analogue of the reference's
  chunk-range skew split (CelebornPartitionUtil.java:60-130,
  SkewJoinSuite.scala:50-120).
- Components label propagation: a giant star component — same skew
  split on the edges.dst join.
- PageRank contribs: a hub dst holding 30% of edges — the mitigation
  for AGGREGATION skew is map-side partial combine (AQE splits only
  joins), so the plan pin is partial-then-final HashAggregate around
  the exchange, plus exact correctness of the hub's combined rank.

AQE decides from shuffle partition BYTES, so the thresholds are
lowered to test scale (the production confs keep the same ratios);
broadcast is disabled because at 100 TB neither join side fits — the
skew machinery, not broadcast, is what's under test. The salted_join
fallback for beyond-AQE skew keeps its own tests in test_skew.py.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from celeborn_spark.operators.components import (
    _label_propagation_round,
    connected_components,
)
from celeborn_spark.operators.dedup import minhash_lsh_candidates
from celeborn_spark.operators.graph import _pagerank_round, pagerank

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # thresholds sized for the tuned session's zstd shuffle compression
    # (a hot partition of thousands of near-identical rows compresses
    # to a few KB); the production ratios are the defaults, only the
    # absolute bytes shrink to test scale
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1024",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    """Execute THIS Dataset (AQE finalizes per-execution) and return
    the final adaptive plan string."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "plan did not finalize"
    return plan


def _assert_skew_split_fired(plan: str):
    assert "skew=true" in plan or "AQEShuffleRead skewed" in plan, (
        "AQE skew split did not fire:\n" + plan[:3000]
    )


def test_lsh_band_join_skew_split(spark):
    """30% of docs share one text -> one hot band bucket per band; the
    band-bucket self-join must take the AQE skew split, and the
    candidate set must still contain every hot-cluster pair."""
    # single-band config so the hot bucket dominates the exchange in
    # BYTES as well as rows (identical band_key strings zstd-compress
    # to almost nothing, so with 8 bands the hot partitions stayed
    # byte-comparable to the cold median and AQE rightly didn't split)
    n_docs, n_hot = 2200, 1200
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot, F.lit("the same hot duplicated document text body")
        )
        .otherwise(F.concat(F.lit("unique cold text "), F.col("id"),
                            F.lit(" tail "), F.col("id") * 7))
        .alias("text"),
    )
    with _skew_confs(spark):
        cand = minhash_lsh_candidates(docs, "doc_id", "text", n=3,
                                      num_hashes=8, bands=1)
        plan = _final_plan(cand)
        _assert_skew_split_fired(plan)
        pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    # identical docs agree on every band: all hot pairs must be present
    assert len(pairs) >= n_hot * (n_hot - 1) // 2
    assert (0, 1) in pairs and (0, n_hot - 1) in pairs
    # cold docs must not blow up the candidate set (buckets stay sparse)
    assert len(pairs) < n_hot * (n_hot - 1) // 2 + n_docs


def test_components_label_propagation_skew_split(spark):
    """Giant star component: vertex 0 neighbors 30% of all vertices, so
    the edges.dst join key is hot. One real propagation round must take
    the skew split; the full operator must still converge to min-label
    components."""
    n, spokes = 100_000, 30_000
    star = spark.range(1, spokes + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    chains = spark.range(spokes + 1, n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).where(F.col("id_b") % 50 != 0)  # break into many small chains
    pairs = star.unionByName(chains)
    edges = (
        pairs.select("id_a", "id_b")
        .unionByName(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("vertex")).distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint()
    )
    with _skew_confs(spark):
        one_round = _label_propagation_round(edges, labels)
        plan = _final_plan(one_round)
        _assert_skew_split_fired(plan)
        cc = connected_components(pairs)
        star_labels = {
            r.component
            for r in cc.where(F.col("vertex") <= spokes).collect()
        }
    assert star_labels == {0}  # the giant component converged to min id


def test_pagerank_hub_agg_skew_partial_combine(spark):
    """Hub node receives 30% of all edges. Aggregation skew isn't
    AQE-splittable — the mitigation is map-side partial combine: the
    plan must show partial-then-final HashAggregate around the
    exchange, and the hub's combined rank must be exact."""
    n_edges, n_hub = 30_000, 9_000
    edges = spark.range(n_edges).select(
        (F.col("id") % 6000 + 1).alias("src"),
        F.when(F.col("id") < n_hub, F.lit(0)).otherwise(F.col("id") % 500 + 1)
        .cast("long")
        .alias("dst"),
    ).localCheckpoint()
    edges = edges.withColumn("ew", F.lit(1.0))
    deg = edges.groupBy("src").agg(F.sum("ew").alias("outdeg"))
    e = edges.join(deg, "src")
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    with _skew_confs(spark):
        nxt = _pagerank_round(ranks, e, damping=0.85)
        plan = _final_plan(nxt)
    # partial (map-side) then final aggregate around the dst exchange
    assert plan.count("HashAggregate") >= 2, plan[:3000]
    assert "partial_sum" in plan or "partial" in plan.lower(), plan[:3000]
    hub = {r.node: r.pr for r in nxt.collect()}[0]
    # exact expectation: every edge src has pr=1.0, so hub rank =
    # 0.15 + 0.85 * sum(1/outdeg over its in-edges)
    import math

    outdeg = {r.src: r.outdeg for r in deg.collect()}
    in_edges = [r.src for r in edges.where(F.col("dst") == 0).collect()]
    want = round(0.15 + 0.85 * math.fsum(1.0 / outdeg[s] for s in in_edges), 6)
    assert hub == pytest.approx(want, abs=2e-6)
