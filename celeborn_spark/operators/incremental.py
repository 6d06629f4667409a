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
    """Derive the user-facing summary from a state relation. The mean is
    emitted as ALL-INTEGER half-up micro-units (1e-6 of the value unit):
    avg_micro = (sum_cents * 20000 + n_rows) DIV (2 * n_rows). A 6dp
    `round()` of the exact rational sum_cents/n/100 is the tie-prone
    class — it can land exactly on a half-way point (l_partkey=148 at
    sf0.01: 214062551/32/100 = 66894.5471875 exactly; Spark's BigDecimal
    HALF_UP and DuckDB's double rounding then disagree in the last
    digit, the repo's one driver correctness failure, VERDICT r7). The
    integer DIV form computes the identical BIGINT in every engine.
    (Contract: sum_cents >= 0 — Spark's `div` truncates toward zero
    while DuckDB's `//` floors; they agree only for non-negative
    numerators, true for the price/amount columns this serves.)"""
    avg_micro = F.expr(
        "(sum_cents * 20000L + n_rows) div (2L * n_rows)"
    ).cast("long")
    return state.select(
        F.col(key),
        "n_rows",
        "sum_cents",
        "min_cents",
        "max_cents",
        avg_micro.alias("avg_micro"),
    )


def incremental_agg_oracle_sql(
    table: str, key: str, value_col: str
) -> str:
    """DuckDB mirror: the FULL recompute. The Spark side builds the
    answer as merge(state(base), state(delta)) over a partition split of
    the same table, so oracle equality IS the merge-correctness proof —
    any non-associative statistic would diverge here."""
    return f"""
    WITH st AS (
        SELECT {key},
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               CAST(min(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS min_cents,
               CAST(max(CAST(floor({value_col} * 100) AS BIGINT)) AS BIGINT) AS max_cents
        FROM {table}
        GROUP BY {key}
    )
    SELECT {key}, n_rows, sum_cents, min_cents, max_cents,
           CAST((sum_cents * 20000 + n_rows) // (2 * n_rows) AS BIGINT) AS avg_micro
    FROM st
    """


def quantile_state(
    df: DataFrame,
    key: str,
    value_col: str,
    lo_cents: int,
    width_cents: int,
    n_bins: int,
) -> DataFrame:
    """Mergeable per-key quantile state: fixed-grid histogram counts
    over integer cents. (key, bin, n) with bin = (c - c mod w)/w clamped
    to [0, n_bins) — the subtract-mod form makes the floor-division an
    EXACT-multiple IEEE division, identical in every engine (a bare
    float divide could round across a bin boundary). Counts are
    integers, so states merge by addition — the quantile analogue of
    agg_state, and the reason percentile refresh at 100 TB touches only
    the delta."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    c = F.greatest(cents - F.lit(lo_cents), F.lit(0))
    bin_ = F.least(
        ((c - (c % F.lit(width_cents))) / F.lit(width_cents)).cast("long"),
        F.lit(n_bins - 1),
    )
    return df.groupBy(F.col(key), bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def merge_quantile_states(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Add two histogram states: union + one (key, bin)-keyed sum."""
    return (
        a.unionByName(b)
        .groupBy(key, "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def quantile_state_sides(
    df: DataFrame,
    key: str,
    value_col: str,
    side_col,
    lo_cents: int,
    width_cents: int,
    n_bins: int,
) -> DataFrame:
    """Per-(key, side) mergeable quantile states in ONE scan: the same
    fixed-grid histogram as `quantile_state`, with ``side_col`` (e.g. a
    base-vs-delta flag) as an extra group key — the stacked form of two
    separate state builds, without scanning the table twice. Merge by
    summing out the side (`merge_quantile_state_sides`)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    c = F.greatest(cents - F.lit(lo_cents), F.lit(0))
    bin_ = F.least(
        ((c - (c % F.lit(width_cents))) / F.lit(width_cents)).cast("long"),
        F.lit(n_bins - 1),
    )
    return df.groupBy(F.col(key), bin_.alias("bin"), side_col.alias("_side")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def merge_quantile_state_sides(sides: DataFrame, key: str) -> DataFrame:
    """Add the stacked per-side histogram states: one (key, bin)-keyed
    sum over the side axis — identical integers to unioning separate
    states, since every input row lands in exactly one side."""
    return sides.groupBy(key, "bin").agg(F.sum("n").cast("long").alias("n"))


def quantile_from_state(
    state: DataFrame,
    key: str,
    q_num: int,
    q_den: int,
    lo_cents: int,
    width_cents: int,
    out_col: str,
) -> DataFrame:
    """Per-key quantile estimate from a histogram state: the LOWER EDGE
    of the first bin whose cumulative count reaches rank
    ceil(q * n_rows) — a deterministic integer rule (rank via the
    subtract-mod exact ceil-division; no interpolation, so engines
    cannot disagree). The cumulative window is bounded by n_bins per
    key, never row-sized."""
    from pyspark.sql import Window as W

    totals = state.groupBy(key).agg(F.sum("n").cast("long").alias("n_rows"))
    t = F.col("n_rows") * F.lit(q_num) + F.lit(q_den - 1)
    rank = ((t - (t % F.lit(q_den))) / F.lit(q_den)).cast("long")
    cum = F.sum("n").over(
        W.partitionBy(key).orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    )
    hit = (
        state.select(key, "bin", F.col("n"), cum.alias("cum"))
        .join(totals.select(key, "n_rows", rank.alias("_rank")), key)
        .filter(F.col("cum") >= F.col("_rank"))
        .groupBy(key, "n_rows")
        .agg(F.min("bin").alias("_bin"))
    )
    return hit.select(
        F.col(key),
        F.col("n_rows"),
        ((F.lit(lo_cents) + F.col("_bin") * F.lit(width_cents)) / 100.0).alias(out_col),
    )


def quantiles_from_state(
    state: DataFrame,
    key: str,
    quantiles: list[tuple[str, int, int]],
    lo_cents: int,
    width_cents: int,
) -> DataFrame:
    """ALL requested per-key quantiles from a histogram state in ONE
    bounded window pass — the multi-quantile form of
    `quantile_from_state`, with the per-key total folded in-row as a
    key-partitioned window BIGINT sum (bounded by n_bins per key)
    instead of a totals aggregate + join per quantile, and the hit bins
    folded into one aggregate instead of one filtered aggregate + final
    join per quantile. Same integer rank rule, same min-bin hit, same
    lower-edge expression — identical values, 2 joins + 1 aggregate +
    1 eager-checkpoint consumer fewer per extra quantile."""
    from pyspark.sql import Window as W

    wk = W.partitionBy(key)
    cum = F.sum("n").over(
        wk.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    )
    rows = state.select(
        key,
        "bin",
        cum.alias("cum"),
        F.sum("n").over(wk).cast("long").alias("n_rows"),
    )
    hits = []
    for out_col, q_num, q_den in quantiles:
        t = F.col("n_rows") * F.lit(q_num) + F.lit(q_den - 1)
        rank = ((t - (t % F.lit(q_den))) / F.lit(q_den)).cast("long")
        hits.append(
            F.min(F.when(F.col("cum") >= rank, F.col("bin"))).alias(
                f"_bin_{out_col}"
            )
        )
    g = rows.groupBy(key, "n_rows").agg(*hits)
    return g.select(
        F.col(key),
        F.col("n_rows"),
        *[
            (
                (F.lit(lo_cents) + F.col(f"_bin_{out_col}") * F.lit(width_cents))
                / 100.0
            ).alias(out_col)
            for out_col, _, _ in quantiles
        ],
    )


def incremental_quantile_oracle_sql(
    table: str,
    key: str,
    value_col: str,
    lo_cents: int,
    width_cents: int,
    n_bins: int,
    quantiles: list[tuple[str, int, int]],
) -> str:
    """DuckDB mirror: FULL-table recompute of the identical histogram
    rule for each (out_col, q_num, q_den) — equality with Spark's
    merged-state build proves histogram mergeability."""
    qcols = []
    for out_col, q_num, q_den in quantiles:
        qcols.append(
            f"(({lo_cents} + min(CASE WHEN cum >= "
            f"((n_rows * {q_num} + {q_den - 1}) - ((n_rows * {q_num} + {q_den - 1}) % {q_den})) / {q_den}"
            f" THEN bin END) * {width_cents}) / 100.0) AS {out_col}"
        )
    sel = ", ".join(qcols)
    return f"""
    WITH cents AS (
        SELECT {key} AS k,
               greatest(CAST(floor({value_col} * 100) AS BIGINT) - {lo_cents}, 0) AS c
        FROM {table}
    ),
    hist AS (
        SELECT k, least(CAST((c - (c % {width_cents})) / {width_cents} AS BIGINT),
                        {n_bins - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM cents GROUP BY 1, 2
    ),
    cums AS (
        SELECT k, bin, n,
               sum(n) OVER (PARTITION BY k ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(n) OVER (PARTITION BY k) AS n_rows
        FROM hist
    )
    SELECT k AS {key}, CAST(any_value(n_rows) AS BIGINT) AS n_rows, {sel}
    FROM cums
    GROUP BY k
    """


def delta_join(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    key: str,
) -> DataFrame:
    """The DELTA of an inner equi-join under insertions to both sides:
    d(A join B) = dA join B_old  union all  A_old join dB
                  union all  dA join dB
    — the other half of incremental view maintenance next to
    `merge_agg_states` (aggregates). At 100 TB the nightly refresh of
    a joined view touches ONLY the delta partitions and their matching
    keys, never a full re-join: the three delta terms are each keyed
    joins whose small side is the delta (broadcast when it fits).

    Returns the join DELTA; union it with the previous materialized
    join result to refresh. Exact by the distributivity of inner join
    over union — pinned against a full recompute by the oracle of
    q_incremental_join_merge."""
    return (
        delta_a.join(base_b, key)
        .unionByName(base_a.join(delta_b, key))
        .unionByName(delta_a.join(delta_b, key))
    )
