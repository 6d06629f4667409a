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
