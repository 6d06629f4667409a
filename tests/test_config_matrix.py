"""Config-matrix differential tests — the reference's pattern of
looping one workload through config combinations and asserting
identical results (SkewJoinSuite.scala:50-54 loops CompressionCodec x
skew x integrityChecks). Here: AQE off, forced sort-merge join, tiny
shuffle partitioning — physical strategy must never change results.
Also: the salted join equals the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.skew import salted_join
from celeborn_spark.queries.relational import q1_pricing_summary
from celeborn_spark.queries.joins import q_join_inner
from celeborn_spark.queries.dedup import q_dedup_jaccard_pairs
from celeborn_spark.queries.similarity import q_cosine_topk

CONF_VARIANTS = [
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},  # force shuffle joins
    {"spark.sql.shuffle.partitions": "7"},
]


def _rows(df):
    # repr gives a None-safe total order (this testdata has duplicate
    # (l_orderkey, l_linenumber) pairs, so ties can reach a nullable
    # column where None < str raises); any consistent order works for
    # the multiset-equality assertion.
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("conf", CONF_VARIANTS, ids=[str(c) for c in CONF_VARIANTS])
@pytest.mark.parametrize(
    "qfn", [q1_pricing_summary, q_join_inner, q_dedup_jaccard_pairs, q_cosine_topk]
)
def test_results_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# --- r5 operator surface under the widened matrix (VERDICT r5 item 5):
# AQE on/off, shuffle partitions {1, 32}, forced shuffle joins. The
# physical strategy (adaptive re-plan, exchange width, join strategy)
# must never change results — the reference's matrix pattern
# (SkewJoinSuite.scala:50-54 loops CompressionCodec x skew x checks).
# The shuffle WIRE codec (spark.io.compression.codec) is a core conf
# frozen at JVM start — not settable per-test in one session; codec
# variation is covered at the storage layer instead
# (test_sources.py::test_parquet_codecs round-trips every codec).
R5_CONF_VARIANTS = [
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "1"},
    {"spark.sql.shuffle.partitions": "32"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},  # force shuffle joins
]


def _r5_ops():
    from celeborn_spark.queries.dataplane import q_snapshot_diff, q_zorder_layout
    from celeborn_spark.queries.dedup import q_dedup_incremental_lsh
    from celeborn_spark.queries.graph import q_pagerank_dangling, q_pagerank_weighted
    from celeborn_spark.queries.sampling import q_epoch_shuffle
    from celeborn_spark.queries.streaming import q_stream_stream_left_join

    return [
        q_zorder_layout,
        q_dedup_incremental_lsh,
        q_pagerank_dangling,
        q_pagerank_weighted,
        q_epoch_shuffle,
        q_snapshot_diff,
        q_stream_stream_left_join,
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r5_ops(), ids=lambda f: f.__name__)
def test_r5_operators_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(lineitem, orders, "l_orderkey", "o_orderkey", n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert _rows(plain) == _rows(salted)


# --- r6 operator surface under the same matrix: iterative graph ops
# (BFS frontier, k-core peeling), the cell-keyed kNN join, winnowing's
# window frames, BPE's per-round argmax broadcast, and CDC's
# last-writer window — all must be invariant to adaptive re-plan,
# exchange width and join strategy.
def _r6_ops():
    from celeborn_spark.queries.dedup import q_winnow_fingerprints
    from celeborn_spark.queries.graph import q_bfs_reachability, q_kcore
    from celeborn_spark.queries.similarity import q_knn_join
    from celeborn_spark.queries.stats import q_cdc_apply, q_logreg_quality
    from celeborn_spark.queries.text import q_bpe_train

    return [
        q_bfs_reachability,
        q_kcore,
        q_knn_join,
        q_winnow_fingerprints,
        q_bpe_train,
        q_cdc_apply,
        q_logreg_quality,
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r6_ops(), ids=lambda f: f.__name__)
def test_r6_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# --- late-r6 analytics surface under the same matrix: the merge
# algebra's full-outer join, the basket self-join + top-k cut, window
# frames (anomaly/EWMA), the postings-join argmax, wedge/anti joins,
# and the fused-rank cut — all invariant to physical strategy. The
# bit-exactness claims (EWMA, RRF, lift) get their strongest test
# here: a 1-partition plan and a 32-partition plan must produce the
# SAME raw doubles.
def _r6_late_ops():
    from celeborn_spark.queries.analytics import (
        q_cooccurrence_lift,
        q_ewma_trend,
        q_incremental_agg_merge,
        q_naive_bayes_lang,
        q_rolling_anomaly,
        q_rrf_fusion,
    )
    from celeborn_spark.queries.graph import q_adamic_adar

    return [
        q_incremental_agg_merge,
        q_cooccurrence_lift,
        q_rolling_anomaly,
        q_ewma_trend,
        q_naive_bayes_lang,
        q_adamic_adar,
        q_rrf_fusion,
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r6_late_ops(), ids=lambda f: f.__name__)
def test_r6_late_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# --- r7 operator surface under the same matrix: HITS' broadcast
# scalar normalizers, Bellman-Ford's full-outer merge, the two-stage
# KMV top-k, the skyline's hash pruning groups, LPA's struct-max
# argmax, MMR's greedy rounds, the PIT join's union+window — all must
# be invariant to adaptive re-plan, exchange width and join strategy.
def _r7_ops():
    from celeborn_spark.queries.advanced import q_pareto_frontier
    from celeborn_spark.queries.analytics import q_item_neighbors
    from celeborn_spark.queries.graph import (
        q_hits,
        q_label_propagation,
        q_shortest_path,
    )
    from celeborn_spark.queries.similarity import q_mmr_select
    from celeborn_spark.queries.sketches import q_kmv_distinct
    from celeborn_spark.queries.temporal import q_point_in_time_join

    from celeborn_spark.queries.sampling import q_dense_ids
    from celeborn_spark.queries.temporal import q_temporal_cooccurrence

    return [
        q_hits,
        q_shortest_path,
        q_label_propagation,
        q_kmv_distinct,
        q_pareto_frontier,
        q_item_neighbors,
        q_mmr_select,
        q_point_in_time_join,
        q_dense_ids,  # two-stage offset+rank must not depend on layout
        q_temporal_cooccurrence,  # bucketed rewrite under join-strategy flips
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r7_ops(), ids=lambda f: f.__name__)
def test_r7_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r8_ops():
    from celeborn_spark.queries.curriculum import q_coverage_select, q_rfm_segments
    from celeborn_spark.queries.graph import q_neighbor_jaccard
    from celeborn_spark.queries.stats import (
        q_chi_square,
        q_mann_whitney,
        q_quantile_transform,
        q_survival_curve,
    )
    from celeborn_spark.queries.temporal import q_ohlc_hourly, q_seq_pattern_topk
    from celeborn_spark.queries.text import q_kl_divergence, q_textrank_keywords

    return [
        q_kl_divergence,       # vocab-grid crossJoin under strategy flips
        q_chi_square,          # broadcast marginals forced to shuffle
        q_mann_whitney,        # histogram window at 1 vs 32 partitions
        q_survival_curve,      # prefix products over distinct durations
        q_quantile_transform,  # broadcast bin join-back forced to shuffle
        q_rfm_segments,        # three quantile_bins passes over layouts
        q_neighbor_jaccard,    # wedge self-join + anti-join re-planned
        q_coverage_select,     # 5 greedy rounds re-planned per round
        q_textrank_keywords,   # pagerank on string nodes under AQE off
        q_seq_pattern_topk,    # user-keyed leads at 1 partition
        q_ohlc_hourly,         # min_by/max_by partial-merge associativity
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r8_ops(), ids=lambda f: f.__name__)
def test_r8_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r9_ops():
    from celeborn_spark.queries.graph import (
        q_harmonic_centrality,
        q_personalized_pagerank,
    )
    from celeborn_spark.queries.similarity import q_cluster_medoid
    from celeborn_spark.queries.stats import (
        q_anova,
        q_fano_burstiness,
        q_kendall_tau,
        q_ks_test,
        q_spearman,
    )
    from celeborn_spark.queries.temporal import (
        q_retention_matrix,
        q_time_to_convert,
    )

    return [
        q_anova,                  # scalar moment assembly over layouts
        q_ks_test,                # CDF window at 1 vs 32 partitions
        q_spearman,               # two rank windows + joint-cell joins
        q_kendall_tau,            # cell self-join forced to shuffle
        q_fano_burstiness,        # hour-grid aggregate re-planned
        q_retention_matrix,       # cohort join + broadcast sizes flipped
        q_time_to_convert,        # min-aggregates + user join at 1 part
        q_harmonic_centrality,    # wedge joins + anti-join re-planned
        q_personalized_pagerank,  # per-round restart joins under AQE off
        q_cluster_medoid,         # md5-capped pair join under strategy flips
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r9_ops(), ids=lambda f: f.__name__)
def test_r9_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# --- the evaluation/drift + behavioral batches under the same matrix:
# histogram windows at 1 vs 32 partitions, the HL convolution join and
# rich-club semi-joins forced to shuffle, attribution's window pair
# and session path assembly under AQE off — invariant results.


def _r9_eval_ops():
    from celeborn_spark.queries.evaluation import (
        q_cuped,
        q_gains_lift,
        q_hodges_lehmann,
        q_roc_auc,
    )
    from celeborn_spark.queries.graph import q_rich_club
    from celeborn_spark.queries.temporal import (
        q_attribution_ushaped,
        q_cross_correlation,
        q_session_paths,
    )

    return [
        q_roc_auc,               # score-histogram rank window over layouts
        q_gains_lift,            # decile bucketing + cumulative windows
        q_hodges_lehmann,        # histogram convolution join forced to shuffle
        q_cuped,                 # per-user reduce + scalar power sums
        q_rich_club,             # hub semi-joins under strategy flips
        q_attribution_ushaped,   # window pair at 1 vs 32 partitions
        q_session_paths,         # struct-sort path assembly under AQE off
        q_cross_correlation,     # 7 lag branches over the checkpointed grid
    ]


@pytest.mark.parametrize("conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS])
@pytest.mark.parametrize("qfn", _r9_eval_ops(), ids=lambda f: f.__name__)
def test_r9_eval_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _batch78_ops():
    from celeborn_spark.queries.evaluation import q_threshold_sweep
    from celeborn_spark.queries.graph import q_ktruss
    from celeborn_spark.queries.stats import q_brown_forsythe, q_log_rank
    from celeborn_spark.queries.text import q_burrows_delta, q_rake_keywords

    return [
        q_log_rank,        # ordered duration walk under partition flips
        q_brown_forsythe,  # histogram medians + ordered group walk
        q_threshold_sweep, # suffix sums over the threshold grid
        q_ktruss,          # triangle joins under forced shuffle strategy
        q_burrows_delta,   # grid windows at 1 vs 32 partitions
        q_rake_keywords,   # phrase-id prefix windows + global rank
    ]


@pytest.mark.parametrize(
    "conf", CONF_VARIANTS, ids=[str(c) for c in CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _batch78_ops(), ids=lambda f: f.__name__)
def test_batch78_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    """Batch-7/8 operators under AQE-off / no-broadcast / 7-partition
    confs: physical strategy must never change results (the
    SkewJoinSuite loop pattern)."""
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11_ops():
    """The bucket-offset prefix-sum machinery (rebuilt r10: ROC family
    + SPRT) and the experiment desk under engine-config flips — the
    two-stage form's bucket boundaries and offsets must be invariant
    to partition count, AQE re-planning, and join strategy (VERDICT
    r10 item 8: config-matrix breadth is where engine-config bugs
    would hide at cluster scale)."""
    from celeborn_spark.queries.evaluation import (
        q_auc_ci,
        q_calibration_bins,
        q_pr_curve,
    )
    from celeborn_spark.queries.stats import (
        q_did_estimator,
        q_eb_shrinkage,
        q_granger_leadlag,
        q_ks_bh_screen,
        q_sprt_ab,
    )

    return [
        q_sprt_ab,           # time-bucketed exact-integer prefix walk
        q_auc_ci,            # bucket-offset rank machinery + CI formula
        q_pr_curve,          # cumulative TP/FP over the score histogram
        q_calibration_bins,  # fixed-width probability bins + exact ECE
        q_did_estimator,     # 2x2 group means under strategy flips
        q_ks_bh_screen,      # per-facet KS + BH rank walk
        q_granger_leadlag,   # lagged daily-grid joins under AQE off
        q_eb_shrinkage,      # method-of-moments prior + per-key posterior
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11_ops(), ids=lambda f: f.__name__)
def test_r11_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11b_ops():
    """The r11 operator batch under engine-config flips: the Shapley
    bitmask joins and interval-join day buckets under forced-shuffle /
    AQE-off / 1-vs-32 partitions, the lcm-integer rank eval, the
    dual-histogram effect size, the log-factorial Fisher grid, and
    the split-half centroid drift."""
    from celeborn_spark.queries.analytics import q_rank_eval
    from celeborn_spark.queries.similarity import q_embedding_drift
    from celeborn_spark.queries.stats import (
        q_cliffs_delta,
        q_fisher_exact,
        q_gumbel_maxima,
    )
    from celeborn_spark.queries.temporal import (
        q_interval_join,
        q_shapley_attribution,
    )

    return [
        q_shapley_attribution,
        q_interval_join,
        q_rank_eval,
        q_cliffs_delta,
        q_fisher_exact,
        q_embedding_drift,
        q_gumbel_maxima,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11b_ops(), ids=lambda f: f.__name__)
def test_r11b_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11c_ops():
    """The Spark-4-frontend + preference/eval batch under engine-config
    flips: the recursive-CTE level joins, the pipe-lowered aggregate,
    the MM-iterated Bradley-Terry pair joins, the broadcast ROUGE
    reference joins, and the single-aggregate 2x2 / Bartlett stats."""
    from celeborn_spark.queries.sql_features import (
        q_listagg,
        q_recursive_cte,
        q_sql_pipe,
        q_sql_udf,
    )
    from celeborn_spark.queries.stats import (
        q_bartlett_test,
        q_bradley_terry,
        q_odds_ratio,
    )
    from celeborn_spark.queries.text import q_rouge_overlap

    return [
        q_recursive_cte,
        q_listagg,
        q_sql_pipe,
        q_sql_udf,
        q_bradley_terry,
        q_rouge_overlap,
        q_odds_ratio,
        q_bartlett_test,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11c_ops(), ids=lambda f: f.__name__)
def test_r11c_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11d_ops():
    """Part-7 batch under engine-config flips: the shared clipped-count
    BLEU core, the all-integer Friedman ranks, the calendar-bounded
    Ljung-Box lags, and the power-iteration eigenvector rounds."""
    from celeborn_spark.queries.graph import q_eigenvector_centrality
    from celeborn_spark.queries.stats import q_friedman_test, q_ljung_box
    from celeborn_spark.queries.text import q_bleu_corpus

    return [
        q_bleu_corpus,
        q_friedman_test,
        q_ljung_box,
        q_eigenvector_centrality,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11d_ops(), ids=lambda f: f.__name__)
def test_r11d_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11e_ops():
    """Part-8 batch under engine-config flips: stratified MH cells,
    the TOST two-sided Welch machinery, the 0-filled NB moments, and
    the integer-cents Page-Hinkley prefix chain."""
    from celeborn_spark.queries.stats import (
        q_mantel_haenszel,
        q_negbin_fit,
        q_page_hinkley,
        q_tost_equivalence,
    )

    return [
        q_mantel_haenszel,
        q_tost_equivalence,
        q_negbin_fit,
        q_page_hinkley,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11e_ops(), ids=lambda f: f.__name__)
def test_r11e_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11f_ops():
    """Part-9 batch under engine-config flips: the bounded-catalog DB
    pairwise joins, the 200-replicate md5 fan-out, the exact-bin HL
    terms, and the broadcast whitening basis."""
    from celeborn_spark.queries.evaluation import q_hosmer_lemeshow
    from celeborn_spark.queries.similarity import (
        q_davies_bouldin,
        q_embedding_whiten,
    )
    from celeborn_spark.queries.stats import q_permutation_test

    return [
        q_davies_bouldin,
        q_permutation_test,
        q_hosmer_lemeshow,
        q_embedding_whiten,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11f_ops(), ids=lambda f: f.__name__)
def test_r11f_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11g_ops():
    """Part-10 batch under engine-config flips: the kxk confusion
    report joins and the all-integer Gopher predicate battery."""
    from celeborn_spark.queries.analytics import q_classifier_report
    from celeborn_spark.queries.text import q_gopher_rules

    return [q_classifier_report, q_gopher_rules]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11g_ops(), ids=lambda f: f.__name__)
def test_r11g_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11h_ops():
    """Part-11 batch under engine-config flips: the EM rounds'
    broadcast-param crossJoins and weighted-moment aggregates."""
    from celeborn_spark.queries.stats import q_mixture_em

    return [q_mixture_em]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11h_ops(), ids=lambda f: f.__name__)
def test_r11h_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11i_ops():
    """Part-12 batch under engine-config flips: the Chapman flag
    aggregate, the parts-keyed price-index join, and the DP
    exponential-mechanism grid."""
    from celeborn_spark.queries.advanced import q_dp_quantile
    from celeborn_spark.queries.stats import (
        q_capture_recapture,
        q_price_index,
    )

    return [q_capture_recapture, q_price_index, q_dp_quantile]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11i_ops(), ids=lambda f: f.__name__)
def test_r11i_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11j_ops():
    """Part-13 batch under engine-config flips: the PAVA bucket
    minimax, the literal-trig DFT join, the calendar-filled moment
    expansion, and the KM-area walk."""
    from celeborn_spark.queries.evaluation import q_isotonic_calibration
    from celeborn_spark.queries.stats import (
        q_durbin_watson,
        q_periodogram,
        q_rmst,
    )

    return [q_isotonic_calibration, q_periodogram, q_durbin_watson, q_rmst]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11j_ops(), ids=lambda f: f.__name__)
def test_r11j_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11k_ops():
    """Part-14 batch under engine-config flips: the histogram-grain
    geometric mean, the item-moment aggregate, the in-row vote flags,
    and the 2-segment moment pivot."""
    from celeborn_spark.queries.stats import (
        q_atkinson_index,
        q_chow_test,
        q_cronbach_alpha,
        q_fleiss_kappa,
    )

    return [q_atkinson_index, q_cronbach_alpha, q_fleiss_kappa, q_chow_test]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11k_ops(), ids=lambda f: f.__name__)
def test_r11k_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11l_ops():
    """Part-15 batch under engine-config flips: the histogram median
    + quantized term sum, the exact extreme deviations, the md5
    size-banded sample, and the calendar lag moments."""
    from celeborn_spark.queries.stats import (
        q_grubbs_test,
        q_horvitz_thompson,
        q_mood_median,
        q_pacf,
    )

    return [q_mood_median, q_grubbs_test, q_horvitz_thompson, q_pacf]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11l_ops(), ids=lambda f: f.__name__)
def test_r11l_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11m_ops():
    """Part-16 batch under engine-config flips: the integer CDF
    extremes, the nano-quantized gap mass, the Katz rounds, and the
    stratum-term sum."""
    from celeborn_spark.queries.evaluation import (
        q_cramer_von_mises,
        q_kuiper_test,
    )
    from celeborn_spark.queries.graph import q_katz_centrality
    from celeborn_spark.queries.stats import q_stratified_att

    return [q_kuiper_test, q_cramer_von_mises, q_katz_centrality, q_stratified_att]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11m_ops(), ids=lambda f: f.__name__)
def test_r11m_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11n_ops():
    """Part-17 batch under engine-config flips: the tail-weighted gap
    mass, the arcsine transforms, the MA/DOW decomposition, and the
    correlation closed form."""
    from celeborn_spark.queries.evaluation import q_anderson_darling
    from celeborn_spark.queries.stats import (
        q_cohens_h,
        q_seasonal_decompose,
        q_vif,
    )

    return [q_anderson_darling, q_cohens_h, q_seasonal_decompose, q_vif]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11n_ops(), ids=lambda f: f.__name__)
def test_r11n_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11o_ops():
    """Part-18 batch under engine-config flips: the day-pair sign
    join, the count comparison, the exact diversity divisions, and
    the collapsed quadratic kappa."""
    from celeborn_spark.queries.stats import (
        q_diversity_profile,
        q_mann_kendall,
        q_poisson_2rate,
        q_weighted_kappa,
    )

    return [q_mann_kendall, q_poisson_2rate, q_diversity_profile, q_weighted_kappa]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11o_ops(), ids=lambda f: f.__name__)
def test_r11o_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11p_ops():
    """Part-19 batch under engine-config flips: the bucket-offset ABC
    cut, the leverage heap-select, the brand-mean regression, and the
    gap-histogram percentiles."""
    from celeborn_spark.queries.stats import (
        q_abc_analysis,
        q_cooks_distance,
        q_order_gaps,
        q_price_elasticity,
    )

    return [q_abc_analysis, q_cooks_distance, q_price_elasticity, q_order_gaps]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11p_ops(), ids=lambda f: f.__name__)
def test_r11p_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11q_ops():
    """Part-20 batch under engine-config flips: the micro-rank
    Spearman moments, the closed 2x2 inverse, the quantized expected
    mass, and the per-group correlation chains."""
    from celeborn_spark.queries.stats import (
        q_fisher_z_corr,
        q_indirect_standardization,
        q_kendall_w,
        q_stuart_maxwell,
    )

    return [
        q_kendall_w,
        q_stuart_maxwell,
        q_indirect_standardization,
        q_fisher_z_corr,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11q_ops(), ids=lambda f: f.__name__)
def test_r11q_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11r_ops():
    """Part-21 batch under engine-config flips: the Arrow aHash
    kernel, the band-bucket Hamming join, the lag-difference
    moments, and the weighted list overlap."""
    from celeborn_spark.queries.evaluation import q_rbo_overlap
    from celeborn_spark.queries.multimodal import (
        q_ahash_near_dup,
        q_multimodal_ahash,
    )
    from celeborn_spark.queries.stats import q_variance_ratio

    return [q_multimodal_ahash, q_ahash_near_dup, q_variance_ratio, q_rbo_overlap]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11r_ops(), ids=lambda f: f.__name__)
def test_r11r_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11s_ops():
    """Part-22 batch under engine-config flips: the block R/S walks,
    the logit fit, the lag/lead growth decomposition, and the
    one-pass slice counts."""
    from celeborn_spark.queries.stats import (
        q_growth_accounting,
        q_hurst_rs,
        q_logistic_growth,
    )
    from celeborn_spark.queries.text import q_heaps_law

    return [q_hurst_rs, q_logistic_growth, q_growth_accounting, q_heaps_law]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11s_ops(), ids=lambda f: f.__name__)
def test_r11s_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11t_ops():
    """Part-23 batch under engine-config flips: the ordered-pair U
    grid, pooled-rank pairs, the moment closed form, and the bucketed
    quantile fences."""
    from celeborn_spark.queries.stats import (
        q_dunn_test,
        q_iqr_outliers,
        q_jonckheere,
        q_partial_correlation,
    )

    return [q_jonckheere, q_dunn_test, q_partial_correlation, q_iqr_outliers]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11t_ops(), ids=lambda f: f.__name__)
def test_r11t_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11u_ops():
    """Part-24 batch under engine-config flips: the min_by/max_by
    pair builder, the bucket-offset signed ranks, and the exact
    uniformity identities."""
    from celeborn_spark.queries.stats import (
        q_hash_uniformity,
        q_paired_t,
        q_sign_test,
        q_wilcoxon,
    )

    return [q_paired_t, q_sign_test, q_wilcoxon, q_hash_uniformity]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11u_ops(), ids=lambda f: f.__name__)
def test_r11u_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11v_ops():
    """Part-25 batch under engine-config flips: the literal expected
    table, the exact uniform identity, the bucketed threshold read,
    and the fixed heatmap grid."""
    from celeborn_spark.queries.stats import (
        q_activity_heatmap,
        q_benford_second,
        q_price_endings,
        q_top_share,
    )

    return [q_benford_second, q_price_endings, q_top_share, q_activity_heatmap]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11v_ops(), ids=lambda f: f.__name__)
def test_r11v_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11w_ops():
    """Part-26 batch under engine-config flips: the WoE binning, the
    conditional-moment decomposition, and the minute-grain gap
    histogram."""
    from celeborn_spark.queries.stats import (
        q_oaxaca,
        q_user_mtbf,
        q_woe_iv,
    )

    return [q_woe_iv, q_oaxaca, q_user_mtbf]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11w_ops(), ids=lambda f: f.__name__)
def test_r11w_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r11x_ops():
    """Part-27 batch under engine-config flips: the quantized
    biweight rounds, the XmR limits, and the residual grid."""
    from celeborn_spark.queries.stats import (
        q_chi_residuals,
        q_control_chart,
        q_tukey_biweight,
    )

    return [q_tukey_biweight, q_control_chart, q_chi_residuals]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r11x_ops(), ids=lambda f: f.__name__)
def test_r11x_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _r12a_ops():
    """Matrix stragglers (VERDICT r11 item 4): the r11 operators that
    had no config-matrix row anywhere — the Gopher-style readability
    score, the DP count release (deterministic md5 noise), the Hill
    tail estimator's order-statistic cut, the within-subject Cochran
    Q grid, the Beta-posterior closed form, the 3-itemset lattice
    join, the Weiszfeld iteration, the VARIANT path extraction, the
    collation-aware grouping, the UDTF lateral fan-out, and the
    rows-only zlib ratio profile (invariance applies regardless of
    oracle-ability)."""
    from celeborn_spark.queries.advanced import q_dp_counts
    from celeborn_spark.queries.analytics import q_itemsets3
    from celeborn_spark.queries.pandas_surface import q_udtf_tokens
    from celeborn_spark.queries.scalar import q_collation_group, q_variant_json
    from celeborn_spark.queries.similarity import q_geometric_median
    from celeborn_spark.queries.stats import q_bayes_ab, q_cochran_q
    from celeborn_spark.queries.text import (
        q_compression_quality,
        q_hill_tail,
        q_readability,
    )

    return [
        q_readability,
        q_dp_counts,
        q_hill_tail,
        q_cochran_q,
        q_bayes_ab,
        q_itemsets3,
        q_geometric_median,
        q_variant_json,
        q_collation_group,
        q_udtf_tokens,
        q_compression_quality,
    ]


@pytest.mark.parametrize(
    "conf", R5_CONF_VARIANTS, ids=[str(c) for c in R5_CONF_VARIANTS]
)
@pytest.mark.parametrize("qfn", _r12a_ops(), ids=lambda f: f.__name__)
def test_r12a_ops_invariant_under_conf(spark, sf_dir, conf, qfn):
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
