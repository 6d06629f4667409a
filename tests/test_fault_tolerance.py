"""Fault-injection tests: task retry and stream restart semantics.

The reference dedicates whole suites to failure-path correctness
(tests/spark-it/.../CelebornFetchFailureSuite.scala,
CelebornStageRerunSuite.scala, RetryReviveTest.scala) — its data plane
must return the SAME answer when pushes fail and stages re-run. The
survey adjudicates revive/stage-rerun (A18/A29) to Spark built-ins;
these tests EXERCISE that adjudication at engine level instead of
assuming it: a Python kernel that dies on its first attempt must not
change any result (task retry is exactly-once at the result layer),
and a restarted stream must resume from its checkpoint without
reprocessing committed batches (A30's graceful-restart analogue, at
the sink).

A 100 TB run WILL see task retries; an operator whose kernel has
side effects or whose output depends on the attempt would silently
corrupt results. The repo-wide rule these tests pin: every
mapInPandas/applyInPandas kernel must be a pure function of its input
batches.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table

# Local mode is fail-fast by default (task maxFailures=1), so the
# retry test runs in its own subprocess on master local[4, 2] — the
# local-mode syntax that allows one retry per task, the closest
# engine-level analogue to a stage re-run after a fetch failure.
_RETRY_SCRIPT = textwrap.dedent(
    """
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4, 2]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("fault_injection")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(4, "k")

    def kernel(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 1 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        for b in batches:
            yield pd.DataFrame(
                {
                    "k": b["k"],
                    "v": b["id"] * 2,
                    "attempt": ctx.attemptNumber(),
                }
            )

    out = df.mapInPandas(kernel, "k long, v long, attempt int")
    agg = {
        r.k: r.s
        for r in out.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    want = {
        r.k: r.s
        for r in df.select("k", (F.col("id") * 2).alias("v"))
        .groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert agg == want, f"retry changed results: {agg} != {want}"
    # prove the failure actually fired and the rows came from attempt 1
    attempts = {
        (r.pid, r.a)
        for r in out.withColumn(
            "pid", F.spark_partition_id()
        ).select("pid", F.col("attempt").alias("a")).distinct().collect()
    }
    assert any(a >= 1 for _, a in attempts), f"no retry observed: {attempts}"
    n = out.count()
    assert n == 10_000, f"row count under retry: {n}"
    print("RETRY_OK")
    spark.stop()
    """
)


def test_task_retry_is_exactly_once_for_pandas_kernels():
    """A mapInPandas kernel that throws on its first attempt for one
    partition (attempt-id-keyed injection) must yield byte-identical
    aggregates and row counts after Spark's task retry — the engine
    face of the reference's stage-rerun suites."""
    proc = subprocess.run(
        [sys.executable, "-c", _RETRY_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout, (proc.stdout, proc.stderr[-2000:])


def test_stream_restart_resumes_from_checkpoint_exactly_once(
    spark, sf_dir, tmp_path
):
    """Kill-and-restart a file-source stream against the SAME
    checkpoint: batches committed before the stop must not be
    reprocessed, files arriving after the restart must be picked up,
    and the restarted sink must equal the batch aggregate exactly
    (A30 graceful-restart at the sink layer — the reference's
    worker-shuffledb recovery re-expressed as checkpointed progress)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    first = e.filter(F.pmod("event_id", F.lit(2)) == 0)
    second = e.filter(F.pmod("event_id", F.lit(2)) == 1)
    first.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # drain the first half, commit progress, stop
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from the same checkpoint

    got = spark.read.parquet(sink)
    # exactly-once: no event replayed across the restart...
    assert got.count() == got.select("event_id").distinct().count()
    # ...and nothing lost: totals equal the batch recompute
    g = got.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    w = e.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    assert g.n == w.n and abs(g.s - w.s) < 1e-6, (g, w)


_ARROW_RETRY_SCRIPT = textwrap.dedent(
    """
    import pyarrow as pa
    from pyspark import TaskContext
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4, 2]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("fault_injection_arrow")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(4, "k")

    def kernel(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 2 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        for b in batches:
            ks = b.column("k")
            ids = b.column("id")
            import pyarrow.compute as pc
            yield pa.RecordBatch.from_arrays(
                [ks, pc.multiply(ids, pa.scalar(3, type=pa.int64()))],
                names=["k", "v"],
            )

    out = df.mapInArrow(kernel, "k long, v long")
    agg = {
        r.k: r.s
        for r in out.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    want = {
        r.k: r.s
        for r in df.select("k", (F.col("id") * 3).alias("v"))
        .groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert agg == want, f"arrow retry changed results: {agg} != {want}"
    print("ARROW_RETRY_OK")
    spark.stop()
    """
)


def test_task_retry_is_exactly_once_for_arrow_kernels():
    """The mapInArrow tier (the RecordBatch-native path added with the
    L2-norm kernel) under the same attempt-keyed failure injection:
    a first-attempt crash on one partition must leave every aggregate
    identical — RecordBatch kernels must be pure functions of their
    input batches exactly like the pandas tiers."""
    proc = subprocess.run(
        [sys.executable, "-c", _ARROW_RETRY_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ARROW_RETRY_OK" in proc.stdout, (
        proc.stdout,
        proc.stderr[-2000:],
    )
