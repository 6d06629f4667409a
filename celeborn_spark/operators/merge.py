"""Batch MERGE / upsert emulation (CDC & SCD patterns).

Without a lake format's transactional MERGE INTO (Delta/Iceberg jars
absent — sources/io.py stubs them), the engine composes the same
semantics relationally: updates win over target rows on the key
(anti-join removes shadowed targets, union appends the updates). One
shuffle on the key; at scale both sides are bucketed by the key so the
anti-join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPSERT: rows of `updates` replace same-key rows of `target`;
    unmatched update rows are inserted. Schemas must match."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


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
