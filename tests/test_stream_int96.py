"""Regression: read_events_stream over a Spark-written INT96 events
directory (the legacy writer default — any pre-Spark-4 pipeline's
layout). pyarrow surfaces INT96 as timestamp[ns], so a unit-only footer
probe misclassifies it as TIMESTAMP(NANOS), pins LongType, and the
stream dies on PARQUET_COLUMN_DATA_TYPE_MISMATCH (found by the r10
batch-21 scale probe on replicated events)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.streaming.events import read_events_stream


def test_stream_reads_int96_events_directory(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events.parquet")
    # Restore whatever the suite had, not a hardcoded default — a
    # hardcoded restore would leak config into the shared session if
    # the suite ever pins a different value.
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        load_table(spark, sf_dir, "events").limit(200).write.mode(
            "overwrite"
        ).parquet(out)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    import pyarrow.parquet as pq
    import glob

    part = sorted(glob.glob(out + "/*.parquet"))[0]
    assert pq.ParquetFile(part).schema.column(1).physical_type == "INT96"

    stream = read_events_stream(spark, str(tmp_path)).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("int96_events")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_type"]: r["n"]
            for r in spark.sql("SELECT * FROM int96_events").collect()
        }
    finally:
        q.stop()
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and sum(got.values()) == 200
    shutil.rmtree(out, ignore_errors=True)
