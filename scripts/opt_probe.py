#!/usr/bin/env python3
"""Optimization-round workhorse (r13): measure, snapshot plans, and
exactness-check individual queries without paying a full bench run.

Usage:
  python scripts/opt_probe.py time q_itemsets3 q_hits ...   # best-of-2 count() + noop timing
  python scripts/opt_probe.py plan q_itemsets3 [suffix]     # write plans/r13/<q>_<suffix>.txt
  python scripts/opt_probe.py oracle q_itemsets3 [sf_dir]   # cell-exact vs DuckDB (validate_window core)

Session matches bench.py exactly (tuned factory, shuffle_partitions=8)
so timings are comparable to the committed BENCH lines. Never run while
another Spark JVM is alive (CLAUDE.md contention rule) — the probe
prints the load/jvm sentinel first and refuses on a hot host unless
SPARK_GRAFT_PROBE_FORCE=1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def _sentinel() -> None:
    load1 = os.getloadavg()[0]
    jvms = 0
    for pid in os.listdir("/proc"):
        if pid.isdigit():
            try:
                with open(f"/proc/{pid}/comm") as fh:
                    if fh.read().strip() == "java":
                        jvms += 1
            except OSError:
                pass
    print(f"sentinel: load1={load1:.2f} jvms={jvms}", file=sys.stderr)
    if (load1 > 1.5 or jvms > 0) and not os.environ.get("SPARK_GRAFT_PROBE_FORCE"):
        print("host is hot; refusing to measure (set SPARK_GRAFT_PROBE_FORCE=1)", file=sys.stderr)
        sys.exit(2)


def _spark():
    from celeborn_spark.session import get_spark

    # mirror bench.py's fixed pre-touched heap so probe timings stay
    # comparable to committed BENCH lines (see bench.py for rationale)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    return get_spark(
        app_name="opt_probe",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )


def cmd_time(names: list[str]) -> None:
    _sentinel()
    from celeborn_spark import registry

    spark = _spark()
    qs = registry.queries()
    # warm like bench.py does (incl. the python-worker pool pre-warm)
    qs["q1_pricing_summary"](spark, SF_DIR).count()
    par = spark.sparkContext.defaultParallelism
    (
        spark.range(0, par, 1, par)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for name in names:
        best_c = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best_c = dt if best_c is None else min(best_c, dt)
        best_n = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best_n = dt if best_n is None else min(best_n, dt)
        print(f"{name}: count={best_c:.2f}s noop={best_n:.2f}s")
    spark.stop()


def cmd_plan(name: str, suffix: str = "before") -> None:
    from celeborn_spark import registry

    spark = _spark()
    qs = registry.queries()
    df = qs[name](spark, SF_DIR)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    os.makedirs(PLANS_DIR, exist_ok=True)
    path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    n_ex = plan.count("Exchange")
    n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow")
    print(f"{path}: {len(plan)} chars, Exchange x{n_ex}, python-nodes x{n_py}")
    spark.stop()


def cmd_oracle(name: str, sf_dir: str) -> None:
    # Delegate to the established cell-exact harness (driver-faithful:
    # vanilla local[4] session + exact equality, NaN==NaN).
    import subprocess

    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "validate_window.py"), sf_dir, name]
    )
    sys.exit(rc)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "before")
    elif cmd == "oracle":
        cmd_oracle(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01")
    else:
        raise SystemExit(f"unknown command {cmd!r}")
