"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB shape this module exists for: a corpus-wide per-key summary
(counts, sums, extremes) must stay current as daily deltas arrive, and
rescanning the full corpus per refresh is the thing that does NOT scale.
Every statistic kept here is a *mergeable state*: state(base ∪ delta)
== merge(state(base), state(delta)) holds EXACTLY, because sums are
integer cents (BIGINT addition is associative — no floating-point
accumulation-order drift) and count/min/max are trivially mergeable.
A refresh therefore touches only the delta partition plus the
key-sized state table: one aggregate over the delta + one key-keyed
full-outer merge join (bucket both by the key at scale and the merge
is co-located, shuffle-free).

Reference analogue: Celeborn's partition commit/merge path combines
per-map partial outputs into one final partition without revisiting
upstream data (worker storage PartitionDataWriter merge-on-commit);
here the same partial-combine algebra is lifted to table state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_cents", "min_cents", "max_cents")


def agg_state(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Reduce a relation to its mergeable per-key aggregate state:
    (n_rows, sum_cents, min_cents, max_cents) over floor(value*100).
    Integer cents make the state exact and associative; one partial→
    final hash aggregate (map-side combine shrinks the exchange to
    key-cardinality)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    return df.groupBy(F.col(key)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents).cast("long").alias("sum_cents"),
        F.min(cents).cast("long").alias("min_cents"),
        F.max(cents).cast("long").alias("max_cents"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Combine two aggregate states (full-outer on the key; keys present
    on one side pass through). The only data that moves is the two
    key-sized state relations — never the underlying rows."""
    an = a.select(
        F.col(key),
        *[F.col(c).alias(f"_a_{c}") for c in STATE_COLS],
    )
    bn = b.select(
        F.col(key),
        *[F.col(c).alias(f"_b_{c}") for c in STATE_COLS],
    )
    j = an.join(bn, key, "full_outer")

    def add(c: str) -> F.Column:
        return (
            F.coalesce(F.col(f"_a_{c}"), F.lit(0))
            + F.coalesce(F.col(f"_b_{c}"), F.lit(0))
        ).cast("long")

    return j.select(
        F.col(key),
        add("n_rows").alias("n_rows"),
        add("sum_cents").alias("sum_cents"),
        F.least(
            F.coalesce(F.col("_a_min_cents"), F.col("_b_min_cents")),
            F.coalesce(F.col("_b_min_cents"), F.col("_a_min_cents")),
        )
        .cast("long")
        .alias("min_cents"),
        F.greatest(
            F.coalesce(F.col("_a_max_cents"), F.col("_b_max_cents")),
            F.coalesce(F.col("_b_max_cents"), F.col("_a_max_cents")),
        )
        .cast("long")
        .alias("max_cents"),
    )


def finalize_agg(state: DataFrame, key: str) -> DataFrame:
    """Derive the user-facing summary from a state relation. The mean
    divides two exact integers — identical IEEE division in every
    engine — and is rounded 6 dp only to survive the driver's textual
    hash of doubles."""
    return state.select(
        F.col(key),
        "n_rows",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.round(F.col("sum_cents") / F.col("n_rows") / 100.0, 6).alias("avg_value"),
    )


def incremental_agg_oracle_sql(
    table: str, key: str, value_col: str
) -> str:
    """DuckDB mirror: the FULL recompute. The Spark side builds the
    answer as merge(state(base), state(delta)) over a partition split of
    the same table, so oracle equality IS the merge-correctness proof —
    any non-associative statistic would diverge here."""
    return f"""
    SELECT {key},
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(min(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           round(CAST(sum(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT)
                 / count(*) / 100.0, 6) AS avg_value
    FROM {table}
    GROUP BY {key}
    """
