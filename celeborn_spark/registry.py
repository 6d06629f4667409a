"""Query registry: the oracle-checked operator surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
(name, spark_fn, oracle_sql) triple via the @query decorator. The
driver contract (__spark_entry__.py) and the test harness both read
this single source of truth. The pattern mirrors the reference's
differential-test design (tests/spark-it/.../SparkTestBase.scala:111-150
runs each workload with and without Celeborn and compares result maps);
here the "golden engine" is DuckDB over the same parquet files.

Rules enforced by convention:
- every computed column is aliased identically in Spark and SQL
  (the driver sorts columns by name before value-hashing);
- double aggregates are rounded (2-6 dp) on BOTH sides so accumulation
  order can't flip the hash;
- timestamps are cast to strings/dates on both sides (Spark is
  session-TZ, DuckDB is naive — pinned UTC makes string forms equal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle (non-SQL-expressible ops: streaming state,
    LSH with engine-specific hashes) get the driver's rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: modules register their queries on import.
    from celeborn_spark.queries import (  # noqa: F401
        relational,
        joins,
        windows,
        scalar,
        dataplane,
        dedup,
        text,
        similarity,
        multimodal,
        streaming,
        temporal,
        advanced,
        pandas_surface,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
