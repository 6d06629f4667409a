"""Catalog: the driver-generated TPC-H-ish parquet tables (TESTDATA.md).

Scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and partition pruning for free — the engine
analogue of the reference's reader stack (WorkerPartitionReader /
LocalPartitionReader / DfsPartitionReader,
worker/.../FetchHandler.scala:111) collapsed into one declarative scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Oracle parity must hold under ANY caller-provided session (the
    # driver does not use our tuned factory): timestamps render in the
    # session TZ, DuckDB's are naive — pin UTC at runtime.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
        # Set the legacy conf here (runtime-settable SQL conf) so this
        # works under ANY caller-provided session, read nanos as long,
        # and truncate to micros — the same truncation DuckDB applies,
        # so oracles agree.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
