"""Streaming behaviors beyond the oracle-checked queries: custom
stateful operator, foreachBatch exactly-once sink, micro-batch flow
control (maxFilesPerTrigger)."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.streaming.events import read_events_stream
from celeborn_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_match_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    out = running_user_totals(ev)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # update mode: take the LAST emitted row per user (final state)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.table("stateful_user_totals").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_foreach_batch_sink_sees_all_rows(spark, sf_dir):
    """foreachBatch = exactly-once sink contract: batch ids are stable
    and each input row lands in exactly one batch."""
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    seen: dict[int, int] = {}

    def sink(batch_df, batch_id: int):
        seen[batch_id] = batch_df.count()

    q = ev.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(seen.values()) == total
    assert all(n >= 0 for n in seen.values())
