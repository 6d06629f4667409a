"""Model-evaluation + drift queries (operators/evaluation.py): ROC
AUC, gains/lift, calibration, PSI, Hellinger, Wasserstein, Pettitt,
Hodges-Lehmann.

These grade the engine's own in-engine scorers (logreg quality
classifier, popularity recommender) and watch the corpus under them —
the offline-eval half of a training-data pipeline. Reference analogue:
Celeborn proves its data plane by differential comparison of the same
workload's result maps (tests/spark-it/.../SparkTestBase.scala:111-150);
every query here carries the DuckDB mirror of the same formula text.

All plans are one map-combined histogram/category aggregate plus a
histogram-sized window — row mass shuffles at most once, totals ride
1-row broadcasts, and the only pairwise op (Hodges-Lehmann) convolves
bounded value-space histograms, never row pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import evaluation as E
from celeborn_spark.operators.evaluation import (
    rbo_overlap,
    rbo_oracle_sql,
    anderson_darling,
    anderson_darling_oracle_sql,
    kuiper_test,
    kuiper_oracle_sql,
    cramer_von_mises,
    cvm_oracle_sql,
    isotonic_calibration,
    isotonic_oracle_sql,
    auc_ci,
    auc_ci_oracle_sql,
    hosmer_lemeshow,
    hosmer_lemeshow_oracle_sql,
    conformal_interval,
    conformal_oracle_sql,
    mix_drift_oracle_sql,
    mix_drift_series,
    brier_decomposition,
    brier_oracle_sql,
    calibration_bins,
    calibration_oracle_sql,
    cuped_adjustment,
    cuped_oracle_sql,
    gains_oracle_sql,
    gains_table,
    hellinger_distance,
    hellinger_oracle_sql,
    hodges_lehmann_oracle_sql,
    hodges_lehmann_shift,
    mcc_at_threshold,
    mcc_oracle_sql,
    pettitt_changepoint,
    pettitt_oracle_sql,
    pr_curve,
    pr_curve_oracle_sql,
    psi_drift,
    psi_oracle_sql,
    roc_auc,
    roc_auc_oracle_sql,
    threshold_sweep,
    threshold_sweep_oracle_sql,
    ucb1_oracle_sql,
    ucb1_scores,
    wasserstein_1d,
    wasserstein_oracle_sql,
)
from celeborn_spark.registry import query

# Binary label for the ranking-eval family: does order value predict
# urgency? (A deterministic stand-in for "does the quality score
# predict the human label" — same shapes, same parity rules.)
_URGENT = "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"


@query(
    "q_roc_auc",
    oracle=roc_auc_oracle_sql("orders", "o_totalprice", _URGENT),
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected ROC AUC of order value ranking the is-urgent
    label — the threshold-free scorer grade. Histogram average ranks,
    exact U, one final division (operators/evaluation.roc_auc)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    return roc_auc(orders, "o_totalprice", "label")


@query(
    "q_gains_lift",
    oracle=gains_oracle_sql("orders", "o_totalprice", _URGENT, n_buckets=10),
)
def q_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains/lift deciles of order value vs the is-urgent
    label — "the top decile captures X% of urgent orders". Histogram
    bucketing (no ntile row-order dependence), exact-integer
    cumulative ratios (operators/evaluation.gains_table)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    return gains_table(orders, "o_totalprice", "label", n_buckets=10)


@query(
    "q_pr_curve",
    oracle=pr_curve_oracle_sql("orders", "o_totalprice", _URGENT, n_buckets=10),
)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve + step AUPRC of order value vs the
    is-urgent label on the gains-table decile grid — the rare-positive
    complement of q_roc_auc (operators/evaluation.pr_curve). Exact
    integer cumulative counts; the <= 10-term area sum rounds 6 dp."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    return pr_curve(orders, "o_totalprice", "label", n_buckets=10)


@query(
    "q_calibration_bins",
    oracle=calibration_oracle_sql(
        "events",
        "value",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END",
        denom_cents=50000,
        n_bins=10,
    ),
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of value/500 as a pseudo-probability of
    is-purchase, plus the exact-integer expected calibration error
    (|D*pos - cents| BIGINT numerators, ONE division) —
    operators/evaluation.calibration_bins."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    return calibration_bins(
        events, "value", "label", denom_cents=50000, n_bins=10
    )


@query(
    "q_psi_drift",
    oracle=psi_oracle_sql(
        "(SELECT * FROM events WHERE event_type IN ('purchase', 'view'))",
        "value",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END",
        lo=0.0,
        hi=500.0,
        n_bins=10,
    ),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between purchase and view value
    distributions over 10 fixed-width bins — the model-monitoring
    drift score (operators/evaluation.psi_drift). Fixed bins keep
    the cut deterministic; the ln-term sum rounds 6 dp."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("cohort"),
        )
    )
    return psi_drift(events, "value", "cohort", lo=0.0, hi=500.0, n_bins=10)


@query(
    "q_hellinger_langmix",
    oracle=hellinger_oracle_sql(
        "documents",
        "lang",
        "CASE WHEN length(source) = 4 THEN 1 ELSE 0 END",
    ),
)
def q_hellinger_langmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger/Bhattacharyya distance between the language mixes of
    the src0-9 and src10-19 source cohorts — the bounded [0,1]
    corpus-mix drift gauge that stays finite on missing categories
    (operators/evaluation.hellinger_distance)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.when(F.length("source") == 4, 1).otherwise(0).alias("cohort"),
    )
    return hellinger_distance(docs, "lang", "cohort")


@query(
    "q_wasserstein_drift",
    oracle=wasserstein_oracle_sql(
        "events", "event_type", "value", "'click'", "'view'"
    ),
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1D Wasserstein-1 distance between click and view value
    distributions — the magnitude-aware drift metric (KS sees the
    largest CDF gap; W1 integrates all of it). All-BIGINT area
    numerator on the cents histogram, ONE division
    (operators/evaluation.wasserstein_1d)."""
    return wasserstein_1d(
        load_table(spark, sf_dir, "events"), "event_type", "value", "click", "view"
    )


@query(
    "q_pettitt_changepoint",
    oracle=pettitt_oracle_sql(
        """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS m
        FROM events WHERE event_type = 'purchase' GROUP BY 1
        """
    ),
)
def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point over daily purchase revenue — the
    rank-based single-change detector next to CUSUM (which needs a
    baseline). Ranks from the metric histogram, exact U_t walk,
    earliest-day argmax tiebreak
    (operators/evaluation.pettitt_changepoint)."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return pettitt_changepoint(events, "day", "cents")


@query(
    "q_cuped",
    oracle=cuped_oracle_sql(
        """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' AND day(ts) <= 15
                        THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                        THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id
        """
    ),
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduction readout: per-user pre-period view
    spend (days 1-15) as the covariate x, post-period purchase spend
    as the metric y; theta and the removed variance fraction rho²
    from one BIGINT power-sum aggregate
    (operators/evaluation.cuped_adjustment). The experiment-precision
    companion to q_ab_test_welch/q_sprt_ab."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("event_type") == "view") & (F.dayofmonth("ts") <= 15),
                cents,
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") > 15),
                cents,
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("y"),
    )
    return cuped_adjustment(per_user, "x", "y")


@query(
    "q_hodges_lehmann",
    oracle=hodges_lehmann_oracle_sql(
        "events", "event_type", "value", "'purchase'", "'click'"
    ),
)
def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift (median of all pairwise differences)
    between purchase and click values — the robust effect-size
    companion to Mann-Whitney. The pair space is a dollar-grain
    histogram convolution (range² grid cells, independent of row
    count), median by cumulative BIGINT weights
    (operators/evaluation.hodges_lehmann_shift)."""
    return hodges_lehmann_shift(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "value",
        "purchase",
        "click",
    )


_IS_PURCHASE = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"


@query(
    "q_brier_decomposition",
    oracle=brier_oracle_sql(
        "events", "value", _IS_PURCHASE, denom_cents=50000, n_bins=10
    ),
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the binned Brier score of value/500 as
    a pseudo-probability of is-purchase: reliability (fixable by
    recalibration) vs resolution (real discrimination) vs base-rate
    uncertainty — the diagnosis BEHIND q_calibration_bins' ECE.
    Exact-integer per-bin numerators, ordered-bin-window accumulation
    (operators/evaluation.brier_decomposition)."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    return brier_decomposition(
        events, "value", "label", denom_cents=50000, n_bins=10
    )


@query(
    "q_threshold_sweep",
    oracle=threshold_sweep_oracle_sql(
        "events", "value", _IS_PURCHASE, denom_cents=50000, n_bins=10
    ),
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix sweep: precision/recall/F1 of "value >= t
    predicts purchase" at each of 10 threshold operating points — the
    deployment-cutoff picker between the threshold-free grades
    (q_roc_auc, q_pr_curve). All counts are exact-BIGINT suffix sums
    of the score histogram; the metrics are single divisions, raw
    (operators/evaluation.threshold_sweep)."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    return threshold_sweep(
        events, "value", "label", denom_cents=50000, n_bins=10
    )


@query(
    "q_ucb1_bandit",
    oracle=ucb1_oracle_sql(
        "events", "event_type", "value", reward_max_cents=50000
    ),
)
def q_ucb1_bandit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit scores per event-type arm from logged value
    rewards (normalized to [0,1] by the 500 value cap): which variant
    does an explore/exploit policy pull next? The bandit-side readout
    of the experiment family (welch/CUPED fixed-horizon, SPRT
    sequential). One map-combined aggregate; the mean is a single
    exact division, the sqrt(2 ln N / n) bonus rounds 6dp
    (operators/evaluation.ucb1_scores)."""
    events = load_table(spark, sf_dir, "events")
    return ucb1_scores(
        events, "event_type", "value", reward_max_cents=50000
    )


@query(
    "q_mcc",
    oracle=mcc_oracle_sql(
        "events", "value", _IS_PURCHASE, threshold_cents=25000
    ),
)
def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of "value >= 250 predicts purchase" — the
    imbalance-honest single-number confusion grade next to
    q_threshold_sweep's per-threshold table. Exact-BIGINT counts, the
    split-sqrt denominator keeps every product under 2^63, raw
    (operators/evaluation.mcc_at_threshold)."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    return mcc_at_threshold(
        events, "value", "label", threshold_cents=25000
    )


@query(
    "q_auc_ci",
    oracle=auc_ci_oracle_sql("orders", "o_totalprice", _URGENT),
)
def q_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC with Hanley-McNeil standard error and 95% CI — the
    uncertainty companion to q_roc_auc's point estimate (is 0.71
    really better than 0.68 on this sample?). Same histogram-rank
    machinery; identical-text SE/CI chain with repr'd z, clamped to
    [0,1], 6dp (operators/evaluation.auc_ci)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("label"),
    )
    return auc_ci(orders, "o_totalprice", "label")


@query(
    "q_conformal_interval",
    oracle=conformal_oracle_sql(
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS m
           FROM events WHERE event_type = 'purchase' GROUP BY 1"""
    ),
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval for the seasonal-naive revenue
    forecaster: qhat = the ceil(0.9(n+1))-th smallest |residual|, so
    forecast ± qhat covers a fresh day with >= 90% probability under
    exchangeability — distribution-free uncertainty on top of
    q_forecast_backtest's point scores. Exact-integer rank off the
    residual histogram, rational alpha, single-division coverage
    (operators/evaluation.conformal_interval)."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return conformal_interval(events, "day", "cents")


@query(
    "q_mix_drift_series",
    oracle=mix_drift_oracle_sql(
        "events", "CAST(date_trunc('day', ts) AS DATE)", "event_type"
    ),
)
def q_mix_drift_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day Jensen-Shannon drift of the event-type mix — the
    drift TIME SERIES that surfaces WHEN the mix broke (q_js_divergence
    compares two fixed cohorts). Adjacent-day category grids with
    coalesce-0 sides, exact count-ratio terms, per-day ordered walks,
    6dp (operators/evaluation.mix_drift_series)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.col("event_type"),
    )
    return mix_drift_series(ev, "day", "event_type")


@query(
    "q_hosmer_lemeshow",
    oracle=hosmer_lemeshow_oracle_sql(
        "(SELECT value,"
        "        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        "            AS is_purchase FROM events)",
        "value",
        "is_purchase",
        denom_cents=50000,
        n_bins=10,
    ),
)
def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit of the value/500
    pseudo-probability against is-purchase, on q_calibration_bins'
    exact fixed-width bins — the significance-flavored calibration
    companion to ECE (how big is the miscalibration relative to
    chance?). All-BIGINT term cores, one bounded-bin total
    (operators/evaluation.hosmer_lemeshow)."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
    )
    return hosmer_lemeshow(
        events, "value", "label", denom_cents=50000, n_bins=10
    )


@query(
    "q_isotonic_calibration",
    oracle=isotonic_oracle_sql(
        "events",
        "value",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END",
        denom_cents=50000,
        n_buckets=32,
    ),
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) recalibration of value/500 as a probability of
    is-purchase over 32 score buckets — the monotone map that REPAIRS
    what q_calibration_bins diagnoses. Fit by the exact minimax
    characterization on bucket prefix sums (O(B^3) on 32 rows, never
    row pairs); every rate is one IEEE division of exact BIGINTs,
    emitted raw (operators/evaluation.isotonic_calibration)."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    return isotonic_calibration(
        events, "value", "label", denom_cents=50000, n_buckets=32
    )


@query(
    "q_kuiper_test",
    oracle=kuiper_oracle_sql(
        "events",
        "event_type",
        "CAST(floor(value * 100) AS BIGINT)",
        "'purchase'",
        "'view'",
    ),
)
def q_kuiper_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper two-sample statistic V = D+ + D- between purchase and
    view value distributions — the rotation-invariant sibling of
    q_ks_test: it adds the largest CDF gap in EACH direction, so
    two-sided shifts that cancel in KS still register. Fully exact:
    integer scaled gaps, integer extremes, single divisions
    (operators/evaluation.kuiper_test)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    return kuiper_test(events, "event_type", "cents", "purchase", "view")


@query(
    "q_cramer_von_mises",
    oracle=cvm_oracle_sql(
        "lineitem", "l_returnflag", "l_quantity", "'R'", "'A'"
    ),
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample statistic between returned and
    accepted lineitem quantity distributions — grades the WHOLE CDF
    gap curve where KS/Kuiper grade the worst point (broad mild
    drift beats one spike). Exact integer scaled gaps; per-value
    terms nano-quantized so the cross-value sum is exact BIGINT
    (operators/evaluation.cramer_von_mises)."""
    li = load_table(spark, sf_dir, "lineitem")
    return cramer_von_mises(li, "l_returnflag", "l_quantity", "R", "A")


@query(
    "q_anderson_darling",
    oracle=anderson_darling_oracle_sql(
        "events",
        "event_type",
        "CAST(floor(value * 100) AS BIGINT)",
        "'purchase'",
        "'view'",
    ),
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling two-sample statistic between purchase and
    view value distributions — the TAIL-sensitive member of the EDF
    family (q_ks_test worst point, q_kuiper_test both directions,
    q_cramer_von_mises whole curve, AD up-weights the tails where
    risk lives). Exact integer gaps and pooled weights; per-value
    terms micro-quantized to an exact BIGINT sum
    (operators/evaluation.anderson_darling)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    return anderson_darling(events, "event_type", "cents", "purchase", "view")


_RBO_LIST_A_SQL = """
    SELECT key, rank FROM (
        SELECT l_partkey AS key,
               row_number() OVER (ORDER BY cents DESC, l_partkey) AS rank
        FROM (SELECT l_partkey,
                     CAST(sum(floor(l_extendedprice * 100)) AS BIGINT)
                         AS cents
              FROM lineitem GROUP BY 1)
    ) WHERE rank <= 20"""

_RBO_LIST_B_SQL = """
    SELECT key, rank FROM (
        SELECT l_partkey AS key,
               row_number() OVER (ORDER BY qty DESC, l_partkey) AS rank
        FROM (SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qty
              FROM lineitem GROUP BY 1)
    ) WHERE rank <= 20"""


@query(
    "q_rbo_overlap",
    oracle=rbo_oracle_sql(_RBO_LIST_A_SQL, _RBO_LIST_B_SQL, k=20, p=0.9),
)
def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between the revenue-top-20 and
    quantity-top-20 part rankings — do the two rankers agree where it
    matters (the top), the list-vs-list agreement grade NDCG-style
    gold-label metrics can't give. Both lists heap-select
    (TakeOrderedAndProject) on exact integers with partkey
    tiebreaks; depth weights are Python-built literals shared by
    both engines (operators/evaluation.rbo_overlap)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")

    def top20(agg_col, alias):
        per = li.groupBy("l_partkey").agg(agg_col.alias(alias))
        cut = per.orderBy(F.col(alias).desc(), "l_partkey").limit(20)
        # rank over the post-limit 20-row relation (bounded)
        wr = W.orderBy(F.col(alias).desc(), "l_partkey")
        return cut.select(
            F.col("l_partkey").alias("key"),
            F.row_number().over(wr).alias("rank"),
        )

    a = top20(
        F.sum(F.floor(F.col("l_extendedprice") * 100)).cast("long"), "cents"
    )
    b = top20(F.sum(F.col("l_quantity")).cast("long"), "qty")
    return rbo_overlap(a, b, k=20, p=0.9)


def _part_topk_lists(spark: SparkSession, sf_dir: str, k: int):
    """Two part rankings to depth k: by revenue cents vs by total
    quantity, both heap-selected on exact integers with partkey
    tiebreaks (the q_rbo_overlap construction, deeper cut)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")

    def topk(agg_col, alias):
        per = li.groupBy("l_partkey").agg(agg_col.alias(alias))
        cut = per.orderBy(F.col(alias).desc(), "l_partkey").limit(k)
        # rank over the post-limit k-row relation (bounded)
        wr = W.orderBy(F.col(alias).desc(), "l_partkey")
        return cut.select(
            F.col("l_partkey").alias("key"),
            F.row_number().over(wr).alias("rank"),
        )

    rev = topk(
        F.sum(F.floor(F.col("l_extendedprice") * 100)).cast("long"), "rev"
    )
    qty = topk(F.sum(F.col("l_quantity").cast("long")).cast("long"), "qv")
    return rev, qty


_TKO_LIST_A = """SELECT l_partkey AS key,
       row_number() OVER (ORDER BY rev DESC, l_partkey) AS rank
FROM (SELECT l_partkey,
             CAST(sum(floor(l_extendedprice * 100)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1)
ORDER BY rev DESC, l_partkey LIMIT 100"""

_TKO_LIST_B = """SELECT l_partkey AS key,
       row_number() OVER (ORDER BY qv DESC, l_partkey) AS rank
FROM (SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qv
      FROM lineitem GROUP BY 1)
ORDER BY qv DESC, l_partkey LIMIT 100"""


@query(
    "q_topk_overlap",
    oracle=E.topk_overlap_oracle_sql(_TKO_LIST_A, _TKO_LIST_B),
)
def q_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap@k curve (k = 10/25/50/100) between the revenue-top
    and quantity-top part rankings: at which depth do the two
    rankers stop agreeing — the unweighted decay profile beside
    q_rbo_overlap's single geometric grade
    (operators/evaluation.topk_overlap_curve)."""
    rev, qty = _part_topk_lists(spark, sf_dir, 100)
    return E.topk_overlap_curve(rev, qty)


@query(
    "q_spearman_footrule",
    oracle=E.footrule_oracle_sql(
        """SELECT r1.nat AS key, r1.r AS r1, r2.r AS r2
           FROM (SELECT c_nationkey AS nat,
                        row_number() OVER (ORDER BY rev DESC, c_nationkey)
                            AS r
                 FROM (SELECT c.c_nationkey,
                              CAST(sum(floor(o.o_totalprice * 100)) AS BIGINT)
                                  AS rev
                       FROM customer c JOIN orders o
                         ON o.o_custkey = c.c_custkey
                       GROUP BY 1)) r1
           JOIN (SELECT c_nationkey AS nat,
                        row_number() OVER (ORDER BY nc DESC, c_nationkey)
                            AS r
                 FROM (SELECT c_nationkey,
                              CAST(count(*) AS BIGINT) AS nc
                       FROM customer GROUP BY 1)) r2
             ON r2.nat = r1.nat"""
    ),
)
def q_spearman_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman footrule between two complete nation rankings —
    by order revenue vs by customer count: total rank displacement,
    the L1 companion of q_spearman's L2 correlation. Ranks over the
    25-nation grain (bounded window) with nationkey tiebreaks
    (operators/evaluation.spearman_footrule)."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nat"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("rev"))
        # rank over the 25-nation grain (bounded window input)
        .select(
            "nat",
            F.row_number()
            .over(W.orderBy(F.col("rev").desc(), "nat"))
            .cast("long")
            .alias("r1"),
        )
    )
    cnt = (
        c.groupBy(F.col("c_nationkey").alias("nat"))
        .agg(F.count(F.lit(1)).cast("long").alias("nc"))
        # rank over the 25-nation grain (bounded window input)
        .select(
            "nat",
            F.row_number()
            .over(W.orderBy(F.col("nc").desc(), "nat"))
            .cast("long")
            .alias("r2"),
        )
    )
    return E.spearman_footrule(
        rev.join(cnt, "nat").select(F.col("nat").alias("key"), "r1", "r2")
    )
