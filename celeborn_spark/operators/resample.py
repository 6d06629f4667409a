"""Time-series resample + gap-fill (hypertable-rollup-style operator).

Buckets an event stream into fixed-width windows per key, materializes
the FULL bucket grid between each key's first and last event (sequence
+ explode — no driver-side loop), and forward-fills empty buckets from
the most recent non-empty one.

Scale shape: one exchange to aggregate (key, bucket), one narrow
per-key window for the fill. The grid explode is bounded by
span/width per key, generated executor-side. Buckets are epoch-second
longs, not timestamps: integer bucket arithmetic is exact and
engine-portable (timestamp rendering is where oracle parity goes to
die — see CLAUDE.md events.parquet rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_sec: int,
) -> DataFrame:
    """(key, bucket, bucket_avg, filled): avg(value) per key per
    `width_sec` bucket over each key's [min, max] event span;
    `bucket_avg` is NULL for gap buckets, `filled` carries the last
    non-empty bucket's average forward (never backward — the first
    bucket of a key is always non-empty by construction)."""
    us = width_sec * 1_000_000
    b = df.select(
        F.col(key_col),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(us)).cast("long").alias("bucket"),
        F.col(value_col).alias("_v"),
    )
    agg = b.groupBy(key_col, "bucket").agg(F.round(F.avg("_v"), 6).alias("bucket_avg"))
    grid = (
        b.groupBy(key_col)
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(key_col, F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    j = grid.join(agg, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        key_col,
        "bucket",
        "bucket_avg",
        F.last("bucket_avg", ignorenulls=True).over(w).alias("filled"),
    )
