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
    ui = sc.uiWebUrl
    if ui:
        # REST status API: ONE http call returns every retained stage
        # with its byte counters — no per-stage py4j wrappers. The
        # py4j scan below creates ~2 objects per retained stage per
        # call; across a 72-query bench their deferred finalizers
        # arrive as synchronous gateway storms that degrade LATE
        # queries (a 2 s query read 7-8 s by position ~70). Benchmark
        # sessions should enable the UI to get this path.
        import json as _json
        from urllib.request import urlopen

        base = f"{ui}/api/v1/applications/{sc.applicationId}/stages"

        def _rest_stages(status: str | None):
            # timeout: a wedged UI endpoint must fail the metrics read,
            # not hang the bench (r12 ADVICE item 3).
            q = f"?status={status}" if status else ""
            with urlopen(base + q, timeout=30) as resp:
                return _json.load(resp)

        # `before` snapshots ALL statuses (r12 ADVICE item 3): a stage
        # from a prior query still marked active/pending here — the
        # AppStatusListener completes stages asynchronously — would be
        # absent from a complete-only `before` set and its bytes would
        # be attributed to the measured action. The `after` read keeps
        # status=complete so only finished counters are summed.
        before = {s["stageId"] for s in _rest_stages(None)}
        n_rows = action(df) if action is not None else df.count()
        n_rows = n_rows if isinstance(n_rows, int) else -1
        after = [s for s in _rest_stages("complete") if s["stageId"] not in before]
        return ActionMetrics(
            shuffle_read_bytes=sum(s["shuffleReadBytes"] for s in after),
            shuffle_write_bytes=sum(s["shuffleWriteBytes"] for s in after),
            memory_spill_bytes=sum(s["memoryBytesSpilled"] for s in after),
            disk_spill_bytes=sum(s["diskBytesSpilled"] for s in after),
            n_stages=len(after),
            n_rows=n_rows,
        )

    jstore = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway

    def _scan_stages(new_since=None):
        """One pass over the retained stage list, extracting primitives
        and DETACHING every py4j wrapper immediately. The lazy
        alternative (keep the JavaObject list, let Python GC clean up)
        leaked ~2k wrappers per call; over a 72-query metrics bench the
        deferred detach commands arrived as multi-second synchronous
        socket storms whenever Python GC fired, inflating whichever
        query happened to be running (observed: a 2 s query timed at
        19.6 s). Eager detach keeps the gateway object table flat."""
        empty = jvm.java.util.ArrayList()
        no_q = gw.new_array(jvm.double, 0)
        seq = jstore.stageList(empty, False, False, no_q, empty)
        ids = set()
        rows = []
        it = seq.iterator()
        while it.hasNext():
            s = it.next()
            sid = s.stageId()
            ids.add(sid)
            if new_since is not None and sid not in new_since:
                rows.append(
                    (
                        s.shuffleReadBytes(),
                        s.shuffleWriteBytes(),
                        s.memoryBytesSpilled(),
                        s.diskBytesSpilled(),
                    )
                )
            gw.detach(s)
        gw.detach(seq)
        gw.detach(it)
        return ids, rows

    before, _ = _scan_stages()
    n_rows = action(df) if action is not None else df.count()
    n_rows = n_rows if isinstance(n_rows, int) else -1
    _, after = _scan_stages(new_since=before)

    return ActionMetrics(
        shuffle_read_bytes=sum(r[0] for r in after),
        shuffle_write_bytes=sum(r[1] for r in after),
        memory_spill_bytes=sum(r[2] for r in after),
        disk_spill_bytes=sum(r[3] for r in after),
        n_stages=len(after),
        n_rows=n_rows,
    )
