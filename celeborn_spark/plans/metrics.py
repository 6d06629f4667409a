"""Execution metrics: shuffle volume and spill accounting for a
DataFrame action.

Reference mapping (SURVEY.md §2A): the reference exports worker-side
push/fetch byte counters and per-partition file sizes through its
metrics system (worker/.../WorkerSource.scala; master quota accounting
in QuotaManager.scala). Engine-side, the same observability comes from
Spark's StatusTracker stage metrics — shuffle read/write bytes and
memory/disk spill per executed stage — captured here around a single
action so tests (and capacity planning) can assert on data-plane
volume, not just wall-clock.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ActionMetrics:
    """Totals across all stages executed by one action."""

    shuffle_read_bytes: int
    shuffle_write_bytes: int
    memory_spill_bytes: int
    disk_spill_bytes: int
    n_stages: int
    n_rows: int


def measure_action(df: DataFrame | None, action=None) -> ActionMetrics:
    """Run an action (default `df.count()`) and return the shuffle and
    spill byte totals its stages produced. Pass a custom `action`
    (e.g. a noop-sink write) when the default count would let Catalyst
    elide the very columns you mean to measure. `df` may be None when
    `action` builds its own DataFrame — the right form for iterative
    operators whose eager localCheckpoint stages run at BUILD time and
    must land inside the metric window.

    Implementation: diff the set of completed stage infos in the Spark
    status store before/after the action (the PySpark-visible face of
    the task-metrics system). Driver-side and test-oriented — the
    action itself is fully distributed.
    """
    if df is None and action is None:
        raise ValueError("measure_action needs a DataFrame or an action")
    if df is not None:
        sc = df.sparkSession.sparkContext
    else:
        from pyspark.sql import SparkSession

        sc = SparkSession.getActiveSession().sparkContext
    # Stage info via the JVM status store: AppStatusStore.stageList(
    #   statuses: JList, details: Boolean, withSummaries: Boolean,
    #   unsortedQuantiles: Array[Double], taskStatus: JList)
    jstore = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway

    def _list_stages():
        empty = jvm.java.util.ArrayList()
        no_q = gw.new_array(jvm.double, 0)
        return _scala_seq(jstore.stageList(empty, False, False, no_q, empty))

    before = {s.stageId() for s in _list_stages()}
    n_rows = action(df) if action is not None else df.count()
    n_rows = n_rows if isinstance(n_rows, int) else -1
    after = [s for s in _list_stages() if s.stageId() not in before]

    read = sum(s.shuffleReadBytes() for s in after)
    write = sum(s.shuffleWriteBytes() for s in after)
    mem_spill = sum(s.memoryBytesSpilled() for s in after)
    disk_spill = sum(s.diskBytesSpilled() for s in after)
    return ActionMetrics(
        shuffle_read_bytes=read,
        shuffle_write_bytes=write,
        memory_spill_bytes=mem_spill,
        disk_spill_bytes=disk_spill,
        n_stages=len(after),
        n_rows=n_rows,
    )


def _scala_seq(seq):
    """Iterate a Scala Seq returned over py4j."""
    out = []
    it = seq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out
