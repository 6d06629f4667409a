"""Data-quality gate: declarative expectation checking and robust
outlier detection (MAD).

The validation layer every ingestion pipeline runs before data is
allowed downstream (Great-Expectations/Deequ shape, re-expressed as
single-pass aggregates). Reference analogue: Celeborn's end-to-end
integrity checking (A21 — CRC per partition accumulated at push and
validated at read, `ShuffleClientImpl.java:1823-1830`): declare the
invariant, measure violations cheaply, fail loudly.

Scale shapes:
- `check_expectations`: ALL row-level rules are counted in ONE full
  scan (each rule is a codegen'd conditional sum — map-side partials,
  one 1-row exchange); referential rules add one anti-join each on
  the foreign key (broadcast when the dimension side is small).
- `mad_outliers`: two group-keyed aggregates (median, then median of
  absolute deviations) + a broadcast join back — the robust
  mean/stddev replacement that one corrupt batch cannot drag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """(rule, n_violations, pass) — evaluate named row-level SQL
    predicate rules in ONE scan. Each rule is (name, predicate_sql)
    where the predicate states what a GOOD row satisfies; violations
    are rows where the predicate is false or NULL (an unevaluable
    expectation is a violation, not a pass)."""
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    aggs = [
        F.sum(
            F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
        ).cast("long").alias(name)
        for name, pred in rules
    ]
    counts = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).alias("n_violations"),
            )
            for name, _ in rules
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("p"))
        .select(
            "p.rule",
            "p.n_violations",
            (F.col("p.n_violations") == 0).alias("pass"),
        )
    )


def referential_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Rows of ``fact`` whose key has no match in ``dim`` — the
    referential-integrity complement to row-level expectations. One
    anti-join on the key (broadcast when dim is dimension-sized)."""
    return fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_anti",
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 6.0,
) -> DataFrame:
    """(group, n, n_outliers, median, mad) — robust per-group outlier
    counts: a row is an outlier when |x - median| > k * MAD (median
    absolute deviation). Unlike mean/stddev gates, one corrupt batch
    cannot drag the threshold toward itself — the robust data-quality
    screen for metric columns. Exact medians (percentile 0.5, IEEE
    interpolation identical in both engines); both percentiles ride
    GROUP-PARTITIONED window aggregates over one row-mass pass (same
    per-group value multiset as the old agg + broadcast-join-back
    chain, so the same IEEE results — and the lazy chain re-scanned
    the table once per derived stage: 4 scans, now 1). The per-group
    window buffer costs what the holistic percentile aggregate already
    buffered per group."""
    from pyspark.sql import Window as W

    w = W.partitionBy("grp")
    flagged = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("x"))
        .withColumn("median", F.percentile(F.col("x"), F.lit(0.5)).over(w))
        .withColumn("absdev", F.abs(F.col("x") - F.col("median")))
        .withColumn("mad", F.percentile(F.col("absdev"), F.lit(0.5)).over(w))
    )
    return (
        flagged.groupBy("grp", "median", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("x") - F.col("median")) > F.lit(k) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .select(
            "grp",
            "n",
            "n_outliers",
            F.round("median", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
        )
    )
