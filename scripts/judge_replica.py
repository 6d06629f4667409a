#!/usr/bin/env python3
"""Replicate the judge's bench-vs-baseline measurement locally:
DuckDB best-of-2 wall-clock for every registered oracle SQL at sf0.1,
paired with the Spark timings from a bench.py JSON line, and the
aggregate ratio the verdict grades (paired Spark total / DuckDB total).

Usage: python scripts/judge_replica.py [/tmp/bench_now.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from celeborn_spark import registry
from tests.oracle import duck_connection


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark_times: dict[str, float] = {}
    if bench_path:
        with open(bench_path) as f:
            spark_times = json.load(f)["queries"]

    con = duck_connection(sf_dir)
    duck: dict[str, float] = {}
    for name, sql in registry.oracles().items():
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            duck[name] = best
        except Exception as exc:
            print(f"duckdb FAILED {name}: {exc}", file=sys.stderr)

    paired = sorted(
        ((n, spark_times[n], duck[n]) for n in duck if spark_times.get(n, -1) >= 0),
        key=lambda t: t[1] - t[2],
        reverse=True,
    )
    s_tot = sum(s for _, s, _ in paired)
    d_tot = sum(d for _, _, d in paired)
    print(f"{'query':36s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for n, s, d in paired:
        print(f"{n:36s} {s:8.3f} {d:8.3f} {s / max(d, 1e-9):7.1f}")
    print(f"\npaired n={len(paired)}  spark={s_tot:.2f}s  duck={d_tot:.2f}s  "
          f"ratio={s_tot / max(d_tot, 1e-9):.2f}x")
    unpaired_duck = {n: round(d, 3) for n, d in duck.items() if n not in spark_times}
    if unpaired_duck:
        print("oracles with no spark timing:", unpaired_duck)


if __name__ == "__main__":
    main()
