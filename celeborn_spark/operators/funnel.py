"""Funnel analysis: ordered event-sequence conversion over an event
stream — the product-analytics operator family (view -> click ->
purchase) on top of the events table.

Semantics: step k converts for a user when an event of step k's type
occurs STRICTLY AFTER the user's step-(k-1) conversion time; each
step's conversion time is the EARLIEST such event. This is the
standard "first touch" funnel; reordering-resistant (a purchase before
the first view does not count).

Spark-first plan: one filtered min-aggregate per step, chained by an
equi-join on the user key. Every join is keyed on user_id, so at 100 TB
all steps co-partition after the first exchange (AQE reuses the
exchange); no windows over the raw event stream, no per-user state in
Python. Timestamps compare as unix micros — the engine-exact form for
the nanos-truncated events table (same discipline as
queries/temporal.py sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_sec: int | None = None,
) -> DataFrame:
    """Per-step funnel conversion: (step, ord, n_users,
    avg_step_delay_sec) for each step in order. `avg_step_delay_sec`
    is the mean seconds between converting the previous step and this
    one (NULL for the first step). With `window_sec`, a step only
    converts if it happens within that many seconds of the previous
    step's conversion (the time-bound funnel of product analytics);
    unbounded otherwise."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    t = F.unix_micros(F.col(ts_col))
    base = events.select(F.col(user_col).alias("u"), F.col(type_col).alias("et"), t.alias("t"))

    out_rows: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        e = base.filter(F.col("et") == step)
        if prev is None:
            cur = e.groupBy("u").agg(F.min("t").alias("t"))
            delay = F.lit(None).cast("double")
        else:
            after_prev = F.col("t") > F.col("t_prev")
            if window_sec is not None:
                after_prev = after_prev & (
                    F.col("t") <= F.col("t_prev") + window_sec * 1_000_000
                )
            cur = (
                e.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .filter(after_prev)
                .groupBy("u")
                # t_prev is constant per user; min() just carries it
                .agg(F.min("t").alias("t"), F.min("t_prev").alias("t_prev"))
            )
            delay = F.round(F.avg((F.col("t") - F.col("t_prev")) / 1e6), 2)
        out_rows.append(
            cur.agg(
                F.lit(step).alias("step"),
                F.lit(i + 1).alias("ord"),
                F.count(F.lit(1)).alias("n_users"),
                delay.alias("avg_step_delay_sec"),
            )
        )
        prev = cur

    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionByName(r)
    return result


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (the cohort), counted once per subsequent week they appear in.
    Returns (cohort_week, week_offset, n_active_users).

    Two keyed aggregations (first-week per user, then distinct
    user-week activity) and one broadcast-size rollup — the activity
    relation shrinks to |users| x |weeks| before the final count, so
    the raw event volume only streams once. Weeks are Monday-truncated
    in both engines; offsets are exact multiples of 7 days."""
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = events.groupBy(user_col).agg(F.min(wk).alias("cohort_week"))
    active = events.select(F.col(user_col), wk.alias("act_week")).distinct()
    return (
        active.join(first, user_col)
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition counts (the Markov-chain edge
    list of user behavior): lag over a TOTAL per-user ordering
    (timestamp micros, event id tie-break — ties are real in synthetic
    and production streams), then one (prev, next) count aggregation.
    The window partitions by user, so state never crosses users and
    the exchange is user-keyed."""
    t = F.unix_micros(F.col(ts_col))
    w = W.partitionBy(user_col).orderBy(t, F.col(id_col))
    seq = events.select(
        F.col(user_col),
        F.col(type_col).alias("next_type"),
        F.lag(type_col).over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
