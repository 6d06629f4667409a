"""k-means Lloyd iterations: convergence (SSE non-increasing per
round), total assignment, determinism, and the broadcast-centroid plan
shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import kmeans as K


def _sse(assignment) -> float:
    return assignment.agg(F.sum(F.col("dist") * F.col("dist"))).collect()[0][0]


def test_lloyd_sse_non_increasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    sses = [_sse(K.lloyd_iterations(emb, k=4, iters=i)) for i in range(3)]
    for a, b in zip(sses, sses[1:]):
        # 6dp rounding of centroids/distances can wiggle the last digit
        assert b <= a * 1.0001, f"SSE increased across a Lloyd round: {sses}"
    assert sses[-1] < sses[0], f"two rounds never improved SSE: {sses}"


def test_every_vector_assigned_once(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.lloyd_iterations(emb, k=4, iters=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    clusters = {r.cluster for r in out.select("cluster").distinct().collect()}
    seeds = {r.vec_id for r in emb.orderBy("vec_id").limit(4).collect()}
    assert clusters <= seeds, f"cluster ids {clusters} not from seed ids {seeds}"
    assert len(clusters) >= 2, "k-means collapsed to a single cluster"


def test_deterministic_across_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, K.lloyd_iterations(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, K.lloyd_iterations(emb, k=4, iters=2).collect()))
    assert a == b


def test_assign_broadcasts_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cluster"),
        F.col("embedding").cast("array<double>").alias("c"),
    )
    plan = K.assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, "centroid join must not shuffle the vectors"


def test_iteration_reuses_vector_partitioning(spark, sf_dir):
    """After the one-time id-partitioning, an iteration's assign window
    and update join must NOT re-exchange the vector relation — the only
    per-iteration exchange is the (cluster, pos) mean aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = K.prepared_vectors(emb)
    cents = v.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("c")
    ).localCheckpoint()
    assignment = K.assign_clusters(v, cents)
    updated = K.update_centroids(v, assignment)
    plan = updated._jdf.queryExecution().executedPlan().toString()
    # the cached plan's one-time REPARTITION_BY_NUM fill shows up inside
    # the InMemoryRelation display; what must NOT exist is a runtime
    # ENSURE_REQUIREMENTS re-exchange of the vectors by id
    import re

    runtime_vec_exchanges = re.findall(
        r"Exchange hashpartitioning\(vec_id[^\n]*ENSURE_REQUIREMENTS", plan
    )
    assert not runtime_vec_exchanges, plan[:2500]
    v.unpersist()
