"""DuckDB oracle harness — mirrors the driver's compare: column-sorted,
order-insensitive, value-level. Differential testing against a golden
engine is the reference's own strategy (SparkTestBase.scala:111-150).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from celeborn_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # Spark-written table (directory of part files), e.g. the
            # materialized .sf1 rung — DuckDB needs the part glob.
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        g_f, w_f = pd.api.types.is_float_dtype(g), pd.api.types.is_float_dtype(w)
        g_i, w_i = pd.api.types.is_integer_dtype(g), pd.api.types.is_integer_dtype(w)
        # int-on-one-side / float-on-the-other means the ENGINES returned
        # different type classes (e.g. DuckDB HUGEINT sum -> float64 vs
        # Spark bigint) — a driver value-hash hazard even when values
        # numerically agree. Nullable ints legitimately arrive as float64
        # on BOTH sides, so only flag asymmetric classes.
        assert not (g_i and w_f) and not (g_f and w_i), (
            f"{name}: column {c!r} type-class mismatch: spark={g.dtype} oracle={w.dtype}"
        )
        if g_f or w_f:
            ga = pd.to_numeric(g, errors="coerce")
            wa = pd.to_numeric(w, errors="coerce")
            both_nan = ga.isna() & wa.isna()
            close = pd.Series(
                [
                    bn or (not (pd.isna(a) or pd.isna(b)) and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-8))
                    for a, b, bn in zip(ga, wa, both_nan)
                ]
            )
            assert close.all(), (
                f"{name}: column {c!r} differs; first diffs:\n"
                f"{pd.DataFrame({'spark': ga[~close], 'oracle': wa[~close]}).head(10)}"
            )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"{name}: column {c!r} differs; first diffs:\n"
                f"{pd.DataFrame({'spark': g[~eq], 'oracle': w[~eq]}).head(10)}"
            )
