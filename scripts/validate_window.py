#!/usr/bin/env python3
"""Driver-window pre-validation: iterate CORRECTNESS_WINDOW under a
VANILLA local[4] session (the driver does not use our tuned factory)
and compare each query cell-by-cell EXACTLY (NaN == NaN) against its
DuckDB oracle — the pytest harness (tests/oracle.py) tolerates 1e-9
relative drift, but the driver VALUE-HASHES, so only exact equality
predicts a green CORRECTNESS row (.claude/skills/verify/SKILL.md).

Usage: python scripts/validate_window.py [sf_dir] [name_filter|--all]
Defaults to /root/testdata/sf0.01 (driver scale). --all checks EVERY
oracle-backed registered query (the r11 pre-drain exactness sweep),
not just the window. Exit code = number of failed queries.
"""

from __future__ import annotations

import math
import sys

import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from celeborn_spark import registry
from tests.oracle import duck_connection, _canon


def exact_equal(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if list(got.columns) != list(want.columns):
        return f"columns spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return f"rows spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                if a_nan != b_nan or float(a) != float(b):
                    return f"col {c!r} row {i}: spark={a!r} oracle={b!r}"
        else:
            eq = (g == w) | (g.isna() & w.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                return f"col {c!r} row {i}: spark={g[i]!r} oracle={w[i]!r}"
    return None


# Queries whose sf0.1 result is too large to toPandas on the sweep's
# 1 GB vanilla driver (q_resample_gapfill: 12.58M gap-filled rows —
# VERDICT r11 item 5). These compare via _distributed_exact_equal
# instead: DuckDB streams its result to parquet (constant memory),
# Spark exceptAll's the two sides in BOTH directions — null-safe,
# bit-exact on the 6dp-rounded doubles, and never materializes the
# result on the driver. Strictly stronger than the driver's value
# hash, with bounded memory at any scale.
BIG_RESULT_QUERIES = {"q_resample_gapfill"}


def _distributed_exact_equal(spark, sdf, con, sql: str) -> str | None:
    """Exact multiset compare of a Spark result vs a DuckDB oracle
    without collecting either side to the driver."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    ocols = sorted(d[0] for d in con.execute(f"SELECT * FROM ({sql}) t LIMIT 0").description)
    if ocols != cols:
        return f"columns spark={cols} oracle={ocols}"
    col_list = ", ".join(f'"{c}"' for c in cols)
    with tempfile.TemporaryDirectory() as td:
        opath = os.path.join(td, "oracle.parquet")
        spath = os.path.join(td, "spark_result")
        con.execute(
            f"COPY (SELECT {col_list} FROM ({sql}) t) TO '{opath}' (FORMAT PARQUET)"
        )
        # Materialize the Spark side to parquet before comparing: it
        # runs the query plan exactly once, and — the hard-won part —
        # keeps the query's own operators (window sorts etc.) in a
        # separate JOB from exceptAll's hash aggregate. Pipelining
        # them in one stage OOM'd the 1 GB vanilla driver at sf0.1
        # (UNABLE_TO_ACQUIRE_MEMORY) even though each runs fine alone.
        sdf.select(cols).write.mode("overwrite").parquet(spath)
        s2 = spark.read.parquet(spath).select(cols)
        odf = spark.read.parquet(opath).select(
            [F.col(c).cast(s2.schema[c].dataType).alias(c) for c in cols]
        )
        n_s, n_o = s2.count(), odf.count()
        if n_s != n_o:
            return f"rows spark={n_s} oracle={n_o}"
        d = s2.exceptAll(odf).count()
        if d:
            return f"{d} spark rows not in oracle"
        d = odf.exceptAll(s2).count()
        if d:
            return f"{d} oracle rows not in spark"
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = registry.queries(), registry.oracles()
    con = duck_connection(sf_dir)

    # --all and explicit name filters search the FULL registry (the
    # point of a filter is usually a query not yet in the window);
    # only the bare invocation restricts to CORRECTNESS_WINDOW.
    names = (
        list(registry.CORRECTNESS_WINDOW)
        if name_filter == ""
        else list(qs)
    )
    failed = []
    for name in names:
        if name_filter not in ("", "--all") and name_filter not in name:
            continue
        if name not in oracles:
            print(f"{name:36s} SKIP (rows-only)")
            continue
        try:
            if name in BIG_RESULT_QUERIES:
                err = _distributed_exact_equal(
                    spark, qs[name](spark, sf_dir), con, oracles[name]
                )
                nrows = "distributed"
            else:
                got = _canon(qs[name](spark, sf_dir).toPandas())
                want = _canon(con.execute(oracles[name]).fetchdf())
                err = exact_equal(got, want)
                nrows = f"{len(got)} rows"
        except Exception as exc:  # noqa: BLE001 — report and continue
            err = f"EXCEPTION {exc}"
        if err:
            failed.append(name)
            print(f"{name:36s} FAIL  {err}")
        else:
            print(f"{name:36s} exact-OK ({nrows})")
    print(f"\n{len(failed)} failed of window at {sf_dir}")
    # Exit codes truncate modulo 256 — 256 failures must not read as
    # success to the caller (possible under --all over 350+ queries).
    sys.exit(min(len(failed), 255))


if __name__ == "__main__":
    main()
