"""Batch MERGE / upsert (CDC & SCD patterns).

When a lake format's transactional MERGE INTO is available (Delta/
Iceberg jars on the classpath — sources/io.lake_format_available
detects at runtime), merge_into_path routes through it; otherwise the
engine composes the same semantics relationally: updates win over
target rows on the key (anti-join removes shadowed targets, union
appends the updates). One shuffle on the key; at scale both sides are
bucketed by the key so the anti-join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPSERT: rows of `updates` replace same-key rows of `target`;
    unmatched update rows are inserted. Schemas must match."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def merge_into_path(
    spark, target_path: str, updates: DataFrame, key: str, fmt: str = "delta"
) -> None:
    """MERGE of `updates` into the table stored at `target_path`.

    Capability-dispatched sink: with the `fmt` connector on the
    classpath this is a real transactional MERGE INTO (concurrent-safe,
    no full rewrite); without it, the parquet fallback reads the target,
    applies the relational upsert, and atomically replaces via
    overwrite — same final state, weaker isolation (documented)."""
    from celeborn_spark.sources.io import lake_format_available

    if lake_format_available(spark, fmt):  # pragma: no cover - jars absent here
        updates.createOrReplaceTempView("_merge_updates")
        cols = ", ".join(f"{c} = s.{c}" for c in updates.columns if c != key)
        spark.sql(
            f"MERGE INTO {fmt}.`{target_path}` t USING _merge_updates s "
            f"ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET {cols} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        return
    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key)
    # parquet has no transactional replace: stage the merge, then
    # overwrite (localCheckpoint materializes before the target dir is
    # truncated — overwriting one's own input is otherwise a read-write
    # race on the same files)
    merged.localCheckpoint().write.mode("overwrite").parquet(target_path)


def scd2_close_and_append(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str,
    end_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the open row for each
    changed key (set end = change's effective time) and append the new
    version with an open end. `current` rows are open (end is null)."""
    from pyspark.sql import functions as F

    chg = changes.select(
        F.col(key).alias("_k"), F.col(effective_col).alias("_eff")
    )
    closed = (
        current.join(chg, current[key] == F.col("_k"), "left")
        .withColumn(
            end_col,
            F.when(F.col("_k").isNotNull(), F.col("_eff")).otherwise(F.col(end_col)),
        )
        .drop("_k", "_eff")
    )
    opened = changes.withColumn(end_col, F.lit(None).cast(dict(current.dtypes)[end_col]))
    return closed.unionByName(opened)
