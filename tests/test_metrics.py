"""Shuffle-volume assertions via the status-store metrics helper —
the engine-side analogue of the reference's worker push/fetch byte
counters (WorkerSource.scala). Plan-shape tests say WHERE the exchange
is; these say HOW MUCH crosses it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from celeborn_spark.catalog import load_table
from celeborn_spark.plans.metrics import measure_action
from celeborn_spark.plans import physical_plan


def test_broadcast_join_moves_fewer_bytes_than_shuffle_join(spark, sf_dir):
    """A26 broadcast record: broadcasting the dim must eliminate the
    fact-side shuffle — measured in bytes, not just plan shape."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    bcast = measure_action(li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey))
    shuf = measure_action(
        li.hint("merge").join(s.hint("merge"), li.l_suppkey == s.s_suppkey)
    )
    assert shuf.n_rows == bcast.n_rows
    # sort-merge shuffles the whole fact side; broadcast only the final
    # count aggregation's single-row partials
    assert bcast.shuffle_write_bytes < shuf.shuffle_write_bytes / 10, (bcast, shuf)


def test_map_side_combine_shrinks_exchange(spark, sf_dir):
    """A3 map-side combine: partial aggregation means the exchange
    carries per-group partials, far less than the raw fact rows a
    combine-less exchange (repartition) moves."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")

    def noop_write(df):
        # count() lets Catalyst drop every column through a bare
        # repartition; the noop sink materializes full rows
        df.write.format("noop").mode("overwrite").save()
        return -1

    agg = measure_action(li.groupBy("l_returnflag").agg(F.sum("l_quantity")))
    raw = measure_action(li.repartition(8, "l_returnflag"), action=noop_write)
    assert agg.shuffle_write_bytes < raw.shuffle_write_bytes / 10, (agg, raw)


def test_persist_tiers_serve_rereads(spark, sf_dir):
    """A19-adjacent tiered storage: MEMORY_AND_DISK persist makes the
    second action read from the in-memory relation (InMemoryTableScan
    in the plan), the engine-side analogue of the reference's
    memory->disk tier promotion."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cached = li.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cached.count()  # materialize
        again = cached.groupBy().sum("l_quantity")
        assert "InMemoryTableScan" in physical_plan(again)
        assert again.collect()[0][0] is not None
    finally:
        cached.unpersist()


def test_hits_partition_edges_cuts_edge_shuffle(spark, tmp_path):
    """HITS at iters=3 joins the edge relation six times (two
    directions x three rounds). While the node-sized hub/auth side
    broadcasts, the edge mass never shuffles and partition_edges would
    only ADD two repartition shuffles — q_hits therefore keeps it off.
    The option exists for the regime where the node set OUTGROWS
    broadcast (per-round joins degrade to shuffle joins): modeled here
    by disabling broadcast, where partition_edges=True shuffles the
    edge mass once per join direction instead of once per round per
    direction — byte-measured like A26/A3 above, results identical."""
    from celeborn_spark.operators.graph import hits

    n_nodes, n_edges = 400, 60_000
    base = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 7919 + 13) % n_nodes).alias("dst"),
    )
    edges_dir = str(tmp_path / "hits_edges_metrics")
    base.write.mode("overwrite").parquet(edges_dir)
    edges = spark.read.parquet(edges_dir)

    def run(partition):
        # broadcast_state=False models the node set OUTGROWING
        # broadcast (r13: the default path now HINTS the node-sized
        # state broadcast, which would override the disabled threshold
        # below and defeat the regime this test byte-measures)
        return measure_action(
            edges,
            action=lambda _: hits(
                edges, iters=3, partition_edges=partition,
                broadcast_state=False,
            ).count(),
        )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plain, part = run(False), run(True)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    assert part.shuffle_write_bytes < plain.shuffle_write_bytes, (part, plain)

    a = {r.node: (r.hub, r.auth) for r in hits(edges, iters=3).collect()}
    b = {
        r.node: (r.hub, r.auth)
        for r in hits(edges, iters=3, partition_edges=True).collect()
    }
    assert a == b
