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


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching [start, end] intervals per key —
    the gaps-and-islands operator (merging validity windows, speech/
    scene segments, maintenance windows; the interval dual of
    sessionization's gap splitting). Intervals touch when
    next.start <= running_max(end); each island starts where that
    fails. Output: (key, island_start, island_end, n_merged).

    Determinism contract (VERDICT r9 item 1): the island windows order
    by (start, end), which is NOT a total order over raw rows when the
    same interval occurs twice — two engines (or two passes of the same
    engine) may then visit the tied twins in opposite orders, and a
    running sum of heads computed in a separate pass can land a twin in
    the PREVIOUS island (observed: DuckDB merged two non-touching
    islands at sf0.1). Fix: pre-aggregate duplicates into a
    multiplicity count — after GROUP BY (key, start, end) the rows are
    unique on the ORDER BY key within each partition, so (start, end)
    IS a total order and every pass in every engine sorts identically.
    n_merged sums the multiplicities, preserving the original row
    count per island.

    Plan: one map-side-combinable pre-aggregation exchange on
    (key, start, end) — at 100 TB it moves DISTINCT intervals only —
    then one key-partitioned window pass over the deduped rows (running
    max of end marks island heads; island ids are a running sum of
    heads); the per-island aggregate reuses the window partitioning.
    All comparisons on the raw (integer/timestamp) bounds — no
    arithmetic, engine-exact."""
    from pyspark.sql import Window as W

    g = df.groupBy(key_col, start_col, end_col).agg(
        F.count(F.lit(1)).alias("_mult")
    )
    w = W.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(F.col(end_col)).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    d = g.withColumn(
        "_head",
        F.when(
            prev_max.isNull() | (F.col(start_col) > prev_max), 1
        ).otherwise(0),
    )
    d = d.withColumn(
        "_island",
        F.sum("_head").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return d.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.sum("_mult").cast("long").alias("n_merged"),
    ).drop("_island")


def merge_intervals_oracle_sql(
    intervals_sql: str, key_col: str, bounds_cast: str | None = None
) -> str:
    """DuckDB mirror of `merge_intervals` over ``intervals_sql`` (a
    relation with (key, s, e) columns): identical dedupe-then-prefix-max
    island construction. The mi_iv GROUP BY makes (s, e) unique within
    each key — a TOTAL order — so the two window passes (mi_d heads,
    mi_g running island ids) sort identically no matter how the engine
    orders tied rows internally (VERDICT r9 item 1: the pre-fix form
    was flaky on duplicate intervals). ``bounds_cast`` (e.g. ``"DATE"``)
    casts the output island bounds so the oracle's types match a Spark
    side that casts its own output — a first-class parameter instead of
    post-hoc string surgery on this SQL (ADVICE r7: a silent no-op
    .replace() would break type matching undiagnosably if this text
    drifted). CTE names carry the mi_ prefix (CLAUDE.md: bare names
    collide when oracle fragments are chained)."""
    s_out = f"CAST(min(s) AS {bounds_cast})" if bounds_cast else "min(s)"
    e_out = f"CAST(max(e) AS {bounds_cast})" if bounds_cast else "max(e)"
    return f"""
    WITH mi_src AS ({intervals_sql}),
    mi_iv AS (
        SELECT {key_col}, s, e, count(*) AS mult
        FROM mi_src GROUP BY {key_col}, s, e
    ),
    mi_d AS (
        SELECT {key_col}, s, e, mult,
               CASE WHEN max(e) OVER (
                        PARTITION BY {key_col} ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR s > max(e) OVER (
                        PARTITION BY {key_col} ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS head
        FROM mi_iv
    ),
    mi_g AS (
        SELECT {key_col}, s, e, mult,
               sum(head) OVER (
                   PARTITION BY {key_col} ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM mi_d
    )
    SELECT {key_col}, {s_out} AS island_start, {e_out} AS island_end,
           CAST(sum(mult) AS BIGINT) AS n_merged
    FROM mi_g GROUP BY {key_col}, island
    """
