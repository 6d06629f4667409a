#!/usr/bin/env python3
"""8x/32x scale probe for the round-8/round-9 operator batch
(VERDICT r8 item 6): RFM segmentation, Mann-Whitney U, grouped
quantile transform, Kaplan-Meier survival, greedy max-coverage,
plus the r9-wired heavies (2-hop harmonic centrality, Theil-Sen,
cluster medoid). The r6/r8 probes each caught a real planner issue;
this one covers the operators added since.

Method: unlike scale_probe32 (which replicates DataFrames in memory),
this probe MATERIALIZES replicated parquet dirs shaped like sf dirs
and calls the REGISTERED query functions on them — probing the exact
end-to-end plan the driver runs. Replicas are disjoint (shifted
integer keys; per-replica token remap for text), so group/graph
structure scales without cross-replica mass:

- orders:    o_custkey shifts -> RFM's customer groups scale; the
             quintile histograms stay distinct-value bounded.
- lineitem:  l_orderkey/l_suppkey/l_partkey shift; l_returnflag /
             l_quantity UNCHANGED -> Mann-Whitney and the quantile
             transform keep a FIXED 50-value histogram while row mass
             grows 32x (the claim under test: rank stats are
             histogram-bounded, never row-sorted).
- events:    user_id/event_id shift; ts unchanged -> KM durations and
             Theil-Sen daily x-values stay calendar-bounded.
- documents: doc_id shifts + per-replica token prefix -> coverage
             select's shingle space grows with the corpus.
- embeddings: vec_id and label shift -> cluster_medoid's label count
             grows linearly, cap^2 per label fixed.

Exponents are log4(t32/t8): ~0 flat, ~1 linear, ~2 quadratic.

Last run (idle host, local[32], SPARK_GRAFT_DRIVER_MEM=48g, round 9,
second run covering BOTH r9 batches; min of 2 reps; exponents
log4(t32/t8)):

    q_rfm_segments          1x  1.19  8x  1.11  32x  1.24   exp 0.08
    q_mann_whitney          1x  0.27  8x  0.31  32x  0.30   exp -0.02
    q_quantile_transform    1x  0.44  8x  0.71  32x  1.81   exp 0.67
    q_survival_curve        1x  0.28  8x  0.37  32x  0.51   exp 0.23
    q_theil_sen             1x  0.34  8x  0.38  32x  0.55   exp 0.28
    q_coverage_select       1x  2.86  8x  7.31  32x 16.80   exp 0.60
    q_harmonic_centrality   1x  2.16  8x  0.90  32x  2.42   exp 0.71
    q_cluster_medoid        1x  0.53  8x  0.45  32x  0.56   exp 0.15
    q_spearman              1x  0.61  8x  0.67  32x  0.89   exp 0.20
    q_kendall_tau           1x  0.49  8x  0.48  32x  0.74   exp 0.31
    q_personalized_pagerank 1x  0.75  8x  1.11  32x  2.32   exp 0.53
    q_markov_transitions    1x  0.45  8x  0.60  32x  0.97   exp 0.35
    q_ndcg_eval             1x  0.61  8x  0.80  32x  1.24   exp 0.32
    q_retention_matrix      1x  0.51  8x  0.50  32x  0.87   exp 0.40

(An earlier same-session run measured the first batch alone with the
same conclusions; sub-second rows carry ±0.2 s JVM noise — the
q_theil_sen/q_harmonic 1x-vs-8x wobbles are that noise, and the
8x->32x exponent is the signal.)

Batch-4 run (same conditions; the late-r9 third batch + the
model-evaluation/drift family; replicas keep VALUE columns unchanged,
so histogram-bounded statistics should stay ~flat):

    q_roc_auc               1x  0.32  8x  0.26  32x  0.29   exp 0.08
    q_gains_lift            1x  0.80  8x  0.69  32x  1.01   exp 0.27
    q_did_estimator         1x  0.26  8x  0.27  32x  0.29   exp 0.06
    q_calibration_bins      1x  0.25  8x  0.27  32x  0.31   exp 0.09
    q_psi_drift             1x  0.28  8x  0.32  32x  0.31   exp -0.02
    q_wasserstein_drift     1x  0.32  8x  0.36  32x  0.58   exp 0.34
    q_pettitt_changepoint   1x  0.67  8x  0.66  32x  0.72   exp 0.07
    q_hodges_lehmann        1x  0.59  8x  0.59  32x  0.93   exp 0.32
    q_bootstrap_ci          1x  2.22  8x  6.70  32x 25.18   exp 0.95
    q_sprt_ab               1x  0.30  8x  0.29  32x  0.32   exp 0.06
    q_trimmed_mean          1x  0.35  8x  0.31  32x  0.36   exp 0.12
    q_weighted_median       1x  0.24  8x  0.27  32x  0.36   exp 0.19
    q_graph_modularity      1x  1.82  8x  3.29  32x  6.78   exp 0.52
    q_hellinger_langmix     1x  0.23  8x  0.24  32x  0.33   exp 0.24
    q_char_entropy          1x  0.59  8x  1.71  32x  3.11   exp 0.43
    q_arrow_norms           1x  0.33  8x  1.54  32x  2.31   exp 0.29

The claim held: the rank/bin/cents-grid family (AUC, gains, DiD,
calibration, PSI, Pettitt, SPRT, trimmed mean, weighted median,
Hellinger) is ~FLAT at 32x row mass because every one of them reduces
to a fixed value-space structure before any window runs. The ~linear
rows are the ones that must touch every row's payload (bootstrap's
200-weight map at exp 0.95 — the per-row work IS the algorithm;
char entropy's per-doc char histograms; modularity's edge build) —
none super-linear, no silent caps.

Batch-5/6 run (same conditions; experiment-analytics + behavioral +
ranking/time-series/graph closers):

    q_cuped                 1x  0.36  8x  0.33  32x  0.32   exp -0.02
    q_attribution_ushaped   1x  0.60  8x  0.56  32x  0.73   exp 0.19
    q_session_paths         1x  0.94  8x  0.94  32x  1.93   exp 0.52
    q_forecast_backtest     1x  0.36  8x  0.37  32x  0.49   exp 0.20
    q_markov_entropy        1x  0.70  8x  1.16  32x  1.03   exp -0.08
    q_cross_correlation     1x  0.97  8x  1.03  32x  1.08   exp 0.04
    q_pr_curve              1x  1.55  8x  1.64  32x  2.11   exp 0.18
    q_rich_club             1x  0.87  8x  1.40  32x  2.67   exp 0.47

Shifted user/custkey replicas multiply the unit population while
per-unit path length stays fixed: the user-keyed window family
(attribution, session paths) grows with row mass but stays well
sublinear under local[32]; the day-grid and score-histogram family
(CUPED, CCF, forecast, PR curve) is ~flat; rich-club's edge build is
linear in disjoint replicas. No super-linear case.

Interpretation: every probed operator is sublinear in time at 32x
(local[32] absorbs part of the work growth below full saturation;
rank stats ride fixed 50-value histograms, hence the ~flat
mann_whitney/rfm/spearman/kendall rows — row mass grows 32x while the
cell grid does not). No inversion candidates here: none of these
operators choose between strategies at runtime; the bounded
structures the docstrings claim (value histograms, calendar grids,
capped pairwise blocks, per-label caps, node-sized PPR rounds) hold —
no super-linear case, no silent caps.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from celeborn_spark import registry
from celeborn_spark.catalog import load_table
from celeborn_spark.operators.textops import tokens
from celeborn_spark.session import get_spark

SCALES = (1, 8, 32)
SF = "/root/testdata/sf0.1"
TMP = "/root/repo/.probe_tmp"

# (query, tables it reads, per-table integer shifts, text-remap tables)
CASES = [
    ("q_rfm_segments", ["orders"]),
    ("q_mann_whitney", ["lineitem"]),
    ("q_quantile_transform", ["lineitem"]),
    ("q_survival_curve", ["events"]),
    ("q_theil_sen", ["events"]),
    ("q_coverage_select", ["documents"]),
    ("q_harmonic_centrality", ["lineitem"]),
    ("q_cluster_medoid", ["embeddings"]),
    # second r9 batch: rank correlations over FIXED value histograms
    # (row mass grows, 50x11 cell grid does not), PPR over disjoint
    # supplier graphs, behavioral dynamics over shifted users
    ("q_spearman", ["lineitem"]),
    ("q_kendall_tau", ["lineitem"]),
    ("q_personalized_pagerank", ["lineitem"]),
    ("q_markov_transitions", ["events"]),
    ("q_ndcg_eval", ["events"]),
    ("q_retention_matrix", ["events"]),
]

# Batch 4 (run with --batch4): the late-r9 third batch + the
# model-evaluation/drift family. The replication design keeps every
# VALUE column unchanged, so the batch's central claim is directly
# testable: histogram-bounded statistics (AUC/gains ranks, PSI /
# calibration bins, W1/HL cents grids, Pettitt's 30-day calendar)
# should stay ~FLAT while row mass grows 32x; per-doc text work
# (char entropy) and the co-purchase graph (modularity) grow
# linearly and should stay ~exp 1 or below.
CASES_BATCH4 = [
    ("q_roc_auc", ["orders"]),
    ("q_gains_lift", ["orders"]),
    ("q_did_estimator", ["orders"]),
    ("q_calibration_bins", ["events"]),
    ("q_psi_drift", ["events"]),
    ("q_wasserstein_drift", ["events"]),
    ("q_pettitt_changepoint", ["events"]),
    ("q_hodges_lehmann", ["events"]),
    ("q_bootstrap_ci", ["events"]),
    ("q_sprt_ab", ["events"]),
    ("q_trimmed_mean", ["lineitem"]),
    ("q_weighted_median", ["lineitem"]),
    ("q_graph_modularity", ["lineitem"]),
    ("q_hellinger_langmix", ["documents"]),
    ("q_char_entropy", ["documents"]),
    ("q_arrow_norms", ["embeddings"]),
]

# Batch 5/6 (run with --batch5): experiment-analytics + behavioral +
# the ranking/time-series/graph closers. Shifted user_id/custkey
# means user paths, attribution cohorts, and CUPED units multiply
# while per-user path length stays fixed (window work ~linear);
# the day grid, score histograms, and lag branches stay fixed
# (~flat); the rich-club edge list grows linearly in disjoint
# replicas (hub set per replica unchanged).
CASES_BATCH5 = [
    ("q_cuped", ["events"]),
    ("q_attribution_ushaped", ["events"]),
    ("q_session_paths", ["events"]),
    ("q_forecast_backtest", ["events"]),
    ("q_markov_entropy", ["events"]),
    ("q_cross_correlation", ["events"]),
    ("q_pr_curve", ["orders"]),
    ("q_rich_club", ["lineitem"]),
]

# Batch 7/8 (run with --batch7): the survival/eval/agreement/keyword
# closers. Shifted user_id means the log-rank/Nelson-Aalen duration
# histograms stay calendar-bounded while subjects multiply (~flat
# windows over distinct durations); the Brier/threshold/MCC/UCB1
# score histograms are fixed-bin (~flat); RAKE/Good-Turing/Burrows
# token scans are ~linear in the remapped token mass (vocabulary
# grows with the r{i}_ prefix remap, keeping per-replica phrase
# structure intact); k-truss edges grow linearly in disjoint
# replicas (per-replica triangle structure unchanged); the
# inter-event lag is one user-keyed window pass (~linear).
# Batch-7/8 run (same conditions; idle host, min of 2 reps):
#   q_log_rank            1x 0.68  8x 0.69  32x  0.67  exp -0.02
#   q_nelson_aalen        1x 0.43  8x 0.37  32x  0.60  exp  0.35
#   q_mcnemar             1x 0.30  8x 0.30  32x  0.32  exp  0.04
#   q_brier_decomposition 1x 0.50  8x 0.51  32x  0.61  exp  0.14
#   q_threshold_sweep     1x 0.64  8x 0.50  32x  0.55  exp  0.06
#   q_ucb1_bandit         1x 0.43  8x 0.38  32x  0.42  exp  0.06
#   q_rake_keywords       1x 1.05  8x 4.83  32x 10.11  exp  0.53
#   q_good_turing         1x 3.61  8x 3.20  32x  4.73  exp  0.28
#   q_burrows_delta       1x 5.60  8x 5.50  32x  6.58  exp  0.13
#   q_ktruss              1x 7.79  8x 7.29  32x 16.19  exp  0.58
#   q_cohens_kappa        1x 1.77  8x 1.71  32x  1.69  exp -0.01
#   q_runs_test           1x 2.23  8x 2.73  32x  3.26  exp  0.13
#   q_brown_forsythe      1x 1.99  8x 2.71  32x  3.49  exp  0.18
#   q_interevent_expon.   1x 3.05  8x 3.31  32x  2.70  exp -0.15
#   q_mcc                 1x 0.72  8x 0.79  32x  1.00  exp  0.17
# All sublinear: the duration/score/arm histograms are ~flat; the
# token/edge scans (~linear row mass) stay under exp 0.6 because
# per-replica phrase/triangle structure is constant and the fixed
# session floor amortizes.
CASES_BATCH7 = [
    ("q_log_rank", ["events"]),
    ("q_nelson_aalen", ["events"]),
    ("q_mcnemar", ["events"]),
    ("q_brier_decomposition", ["events"]),
    ("q_threshold_sweep", ["events"]),
    ("q_ucb1_bandit", ["events"]),
    ("q_rake_keywords", ["documents"]),
    ("q_good_turing", ["documents"]),
    ("q_burrows_delta", ["documents"]),
    ("q_ktruss", ["lineitem"]),
    ("q_cohens_kappa", ["orders"]),
    ("q_runs_test", ["events"]),
    ("q_brown_forsythe", ["lineitem"]),
    ("q_interevent_exponential", ["events"]),
    ("q_mcc", ["events"]),
]

# Batch 9 (run with --batch9): planner/graph/seasonality/entropy
# closers. Group counts, DOW grids, and power-plan moments are ~flat;
# homophily/bigram-entropy edge/cell scans are ~linear with
# per-replica structure constant; the component histogram inherits
# the jaccard-pair + label-propagation pipeline (probed r7) over the
# remapped token space.
# Batch-9 run (same conditions; supplier added to SHIFTS after the
# first attempt crashed on the missing replica table):
#   q_mixture_plan           1x 1.12  8x 0.86  32x  0.89  exp 0.03
#   q_homophily              1x 1.20  8x 1.46  32x  3.38  exp 0.60
#   q_seasonal_strength      1x 0.64  8x 0.72  32x  0.77  exp 0.04
#   q_ab_power_plan          1x 0.27  8x 0.28  32x  0.32  exp 0.09
#   q_bigram_entropy         1x 1.04  8x 1.26  32x  2.42  exp 0.47
#   q_component_size_hist.   1x 4.93  8x 8.97  32x 31.05  exp 0.90
# component_size_histogram is ~linear by design: it inherits the
# jaccard-pair + label-propagation pipeline (probed r7) and the
# remapped token space keeps cross-replica shingles disjoint, so the
# pair space grows linearly with replicas, never quadratically.
CASES_BATCH9 = [
    ("q_mixture_plan", ["documents"]),
    ("q_homophily", ["lineitem", "supplier"]),
    ("q_seasonal_strength", ["events"]),
    ("q_ab_power_plan", ["events"]),
    ("q_bigram_entropy", ["documents"]),
    ("q_component_size_histogram", ["documents"]),
]

# Batch 10 (run with --batch10): privacy/trend/inequality/uncertainty
# closers — all value-space-histogram shapes (quasi x band grids,
# decile counts, day grids, score histograms), expected ~flat.
# Batch-10 run (same conditions): t_closeness exp 0.12,
# cochran_armitage 0.10, theil_index 0.15, auc_ci 0.04 — all ~flat
# (quasi/band grids, decile counts, day grids, score histograms).
CASES_BATCH10 = [
    ("q_t_closeness", ["customer"]),
    ("q_cochran_armitage", ["events"]),
    ("q_theil_index", ["events"]),
    ("q_auc_ci", ["orders"]),
]

# Batches 11-13 (run with --batch11): screen/uncertainty/drift-series,
# rank/causality/sampler, and engagement closers — histogram/day-grid
# shapes expected ~flat; the WAU band join and negative-sampling/
# kruskal scans ~linear.
# Batch-11/12/13 run (same conditions): ks_bh_screen exp 0.19,
# conformal 0.00, mix_drift 0.25, kruskal 0.17, granger 0.09,
# negative_sampling 0.32, rolling_wau 0.59, stickiness 0.31 — all
# sublinear; the WAU band join is the expected linear-bounded
# shape (7x day-user grid per replica).
CASES_BATCH11 = [
    ("q_ks_bh_screen", ["customer"]),
    ("q_conformal_interval", ["events"]),
    ("q_mix_drift_series", ["events"]),
    ("q_kruskal_wallis", ["lineitem"]),
    ("q_granger_leadlag", ["events"]),
    ("q_negative_sampling", ["documents"]),
    ("q_rolling_wau", ["events"]),
    ("q_stickiness", ["events"]),
]

# Batches 14-15 (run with --batch14): corpus-signal/ANN-QA/screen/
# freshness closers — token scans ~linear, stump and item-day grids
# ~flat, the recall QA is corpus x 5 queries (~linear).
# Batch-14/15 run (same conditions): token_burstiness exp 0.11,
# quantized_recall 0.18, feature_screen 0.39, decayed_popularity
# 0.22 — all sublinear (token/event scans linear-bounded with flat
# grids after the first aggregate).
CASES_BATCH14 = [
    ("q_token_burstiness", ["documents"]),
    ("q_quantized_recall", ["embeddings"]),
    ("q_feature_screen", ["events"]),
    ("q_decayed_popularity", ["events"]),
]

# Batches 16-17 (run with --batch16): nested-type + multimodal-audio
# closers — map build and frame kernel both ~linear in payload mass.
# Batch-16/17 run (same conditions): map_funcs exp 0.44,
# multimodal_energy 0.77 — both the expected ~linear payload scans
# (the energy kernel is per-byte Python-side work through Arrow,
# linear by construction; _spread keeps it off a single split).
CASES_BATCH16 = [
    ("q_map_funcs", ["documents"]),
    ("q_multimodal_energy", ["documents"]),
]

# Batches 18-19 (run with --batch18): streaming leaderboard +
# post-hoc/shrinkage — the stream replays the replicated files
# (~linear in file mass); the stats pair/cohort grids are ~flat.
# Batch-18/19 run (same conditions; the FIRST attempt crashed —
# read_events_stream's schema probe opened events.parquet as a single
# file while the replicas are part-file DIRECTORIES; the loader now
# footer-probes the first part, which is also the real-world layout):
# stream_topk exp 0.00-0.13, posthoc_pairwise -0.06..0.00,
# eb_shrinkage 0.31-0.40, attribution_timedecay 0.23-0.25,
# daily_percentile_ladder 0.16 (across three runs as late cases were
# added) — all flat/sublinear.
CASES_BATCH18 = [
    ("q_stream_topk_items", ["events"]),
    ("q_posthoc_pairwise", ["lineitem"]),
    ("q_eb_shrinkage", ["orders"]),
    ("q_attribution_timedecay", ["events"]),
    ("q_daily_percentile_ladder", ["events"]),
]

# Batch 20 (run with --batch20, round 10): re-probe of the two r9
# perf findings AFTER their fixes, under the adversarial replica
# design the r9 probes lacked:
# - the ROC-AUC family (roc_auc/gains/pr_curve/auc_ci) moved from an
#   unpartitioned histogram window to the two-stage bucket-offset
#   prefix sum (_bounded_cum_before). The r9 batch-4 probe kept VALUE
#   columns unchanged, so the score histogram stayed sf0.1-sized and
#   the single-partition window looked flat (exp 0.08) — invisible.
#   Batch 20 SHIFTS o_totalprice per replica (VALUE_SHIFTS below), so
#   |distinct scores| grows with row mass exactly like a real corpus.
# - q_embedding_near_dup's recall guard moved from a fixed-RATE
#   (vec_id % 29 -> O(N^2/29)) to a fixed-SIZE sample (64 smallest
#   md5(vec_id) -> O(64N)); guard cost should now be ~linear and the
#   broadcast side constant.
# Batch-20 run (idle host, local[32], SPARK_GRAFT_DRIVER_MEM=48g,
# round 10; min of 2 reps; exponents log4(t32/t8)):
#   q_roc_auc            1x 1.12  8x 1.16  32x  1.68  exp 0.27
#   q_gains_lift         1x 1.42  8x 1.31  32x  2.23  exp 0.39
#   q_pr_curve           1x 1.29  8x 1.38  32x  2.42  exp 0.41
#   q_auc_ci             1x 0.78  8x 0.85  32x  1.27  exp 0.29
#   q_embedding_near_dup 1x 3.03  8x 4.68  32x 12.85  exp 0.73
# The ROC family stays sublinear WITH the score histogram growing 32x
# alongside row mass (4.8M distinct scores at 32x) — the regime where
# the r9 single-partition window form would have serialized the whole
# histogram onto one task. near_dup's exp 0.73 is the production
# bucket self-join growing with the corpus; the rebuilt guard itself
# is O(64N) with a constant 64-row broadcast side (previously the
# fixed-rate sample made the whole query quadratic-by-construction).
# Same-session follow-up: q_sprt_ab after its own bucket-offset
# rewrite (the walk's prefix counts were the same unbounded class —
# one row per USER through one unpartitioned window):
#   q_sprt_ab            1x 1.24  8x 1.24  32x  1.71  exp 0.23
CASES_BATCH20 = [
    ("q_roc_auc", ["orders"]),
    ("q_gains_lift", ["orders"]),
    ("q_pr_curve", ["orders"]),
    ("q_auc_ci", ["orders"]),
    ("q_embedding_near_dup", ["embeddings"]),
]

# Batch 21 (run with --batch21, round 10): the 13 r10-window queries
# no prior batch ever probed — the two r10 reps (interval merge after
# the dedupe-before-window rebuild; the session-window oracle fix) and
# the mechanically-simple scalar shapes. Expected: interval merge
# ~linear (the dedupe exchange moves distinct intervals), the stream
# replay ~linear in file mass, everything else histogram/manifest
# ~flat. q_dataset_manifest reads EVERY catalog table (the CLAUDE.md
# probe rule: replicate every table a query loads — region/nation/part
# shifts added below for it).
# Batch-21 run (same conditions; the FIRST attempt crashed on the
# footer probe misreading Spark-written INT96 replicas as
# TIMESTAMP(NANOS) — fixed in streaming/events.py with an INT96
# physical-type test + regression test, a real-world-layout bug the
# probe bought us):
#   q_interval_merge      1x 1.65  8x 2.10  32x  5.00  exp  0.63
#   q_stream_session_win. 1x 1.21  8x 3.17  32x 19.13  exp  1.30*
#   q_cohens_d            1x 0.34  8x 0.40  32x  0.38  exp -0.03
#   q_g_test              1x 0.63  8x 0.63  32x  1.50  exp  0.62
#   q_l_diversity         1x 0.51  8x 0.48  32x  1.02  exp  0.54
#   q_powerlaw_alpha      1x 3.85  8x 5.92  32x  2.68  exp -0.57
#   q_dataset_manifest    1x 0.96  8x 0.95  32x  1.30  exp  0.22
#   q_arg_minmax          1x 0.46  8x 0.70  32x  0.93  exp  0.20
#   q_bitwise_agg         1x 0.65  8x 0.81  32x  1.23  exp  0.31
#   q_uniform_sample      1x 1.19  8x 1.08  32x  0.24  exp -1.09
#   q_dense_ids           1x 4.10  8x 1.85  32x  3.53  exp  0.47
#   q_mode_per_group      1x 0.31  8x 0.45  32x  0.92  exp  0.51
#   q_text_fingerprint    1x 0.15  8x 0.19  32x  0.17  exp -0.09
# (*) the session-window exp is a HARNESS artifact, verified by a
# same-session re-measure sweep: the 32x cold run pays JVM/codegen
# (min-of-2 still caught it); warm runs at 32x are 8.9-13.2 s across
# state_partitions 4/16/32 (vs 3.17 s at 8x -> exp ~0.88, i.e. linear
# in the 3.05M-session OUTPUT that complete-mode collects into the
# driver memory sink each batch). The operator itself is Spark's
# session_window state merge; a production deployment writes
# update-mode to a real sink and sizes state partitions to volume
# (run_stream_to_table docstring). The interval-merge 0.63 is the
# dedupe exchange moving distinct intervals — linear-bounded as
# designed; the negative exponents are AQE/noise on sub-second rows.
CASES_BATCH21 = [
    ("q_interval_merge", ["lineitem"]),
    ("q_stream_session_window", ["events"]),
    ("q_cohens_d", ["lineitem"]),
    ("q_g_test", ["documents"]),
    ("q_l_diversity", ["customer"]),
    ("q_powerlaw_alpha", ["lineitem"]),
    ("q_dataset_manifest", ["region", "nation", "supplier", "customer",
                            "part", "orders", "lineitem", "events",
                            "documents", "embeddings"]),
    ("q_arg_minmax", ["customer"]),
    ("q_bitwise_agg", ["events"]),
    ("q_uniform_sample", ["events"]),
    ("q_dense_ids", ["lineitem"]),
    ("q_mode_per_group", ["events"]),
    ("q_text_fingerprint", ["documents"]),
]

SHIFTS = {
    "region": {"r_regionkey": 1_000},
    "nation": {"n_nationkey": 1_000, "n_regionkey": 1_000},
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 1_000_000_000,
        "l_suppkey": 10_000_000,
        "l_partkey": 10_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000, "label": 1_000},
}
TEXT_REMAP = {"documents"}

# Applied ONLY under --batch20 (SHIFT_VALUES): grows |distinct scores|
# with row mass. Other batches keep value columns unchanged — their
# recorded flat-histogram claims depend on it.
VALUE_SHIFTS = {"orders": {"o_totalprice": 1_000_000.0}}
SHIFT_VALUES = False


def replicate(spark, table: str, k: int, out_dir: str) -> None:
    df = load_table(spark, SF, table)
    shifts = dict(SHIFTS[table])
    if SHIFT_VALUES:
        shifts.update(VALUE_SHIFTS.get(table, {}))
    parts = []
    for i in range(k):
        cols = []
        for c, dt in df.dtypes:
            if c in shifts:
                cols.append((F.col(c) + F.lit(i * shifts[c])).cast(dt).alias(c))
            elif table in TEXT_REMAP and c == "text":
                cols.append(
                    F.array_join(
                        F.transform(
                            tokens(F.col(c)),
                            lambda x, i=i: F.concat(F.lit(f"r{i}_"), x),
                        ),
                        " ",
                    ).alias(c)
                )
            else:
                cols.append(F.col(c))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def timeit(label: str, fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:36s} {best:8.2f} s", flush=True)
    return best


def main() -> None:
    global SHIFT_VALUES
    if "--batch20" in sys.argv:
        SHIFT_VALUES = True
    cases = (
        CASES_BATCH21
        if "--batch21" in sys.argv
        else CASES_BATCH20
        if "--batch20" in sys.argv
        else CASES_BATCH18
        if "--batch18" in sys.argv
        else CASES_BATCH16
        if "--batch16" in sys.argv
        else CASES_BATCH14
        if "--batch14" in sys.argv
        else CASES_BATCH11
        if "--batch11" in sys.argv
        else CASES_BATCH10
        if "--batch10" in sys.argv
        else CASES_BATCH9
        if "--batch9" in sys.argv
        else CASES_BATCH7
        if "--batch7" in sys.argv
        else CASES_BATCH5
        if "--batch5" in sys.argv
        else CASES_BATCH4
        if "--batch4" in sys.argv
        else CASES
    )
    spark = get_spark(app_name="scale_probe_r9")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    needed = sorted({t for _, ts in cases for t in ts})
    dirs = {1: SF}
    for k in SCALES:
        if k == 1:
            continue
        kdir = f"{TMP}/x{k}"
        dirs[k] = kdir
        for t in needed:
            replicate(spark, t, k, kdir)
        print(f"materialized {k}x replicas for {needed}", flush=True)

    results: dict[str, dict[int, float]] = {}
    for name, _tables in cases:
        for k in SCALES:
            results.setdefault(name, {})[k] = timeit(
                f"{name} {k}x",
                lambda name=name, k=k: qs[name](spark, dirs[k]).count(),
            )

    print("\n--- growth exponents (8x -> 32x, log base 4) ---")
    for name, ts in results.items():
        print(
            f"{name:36s} 1x {ts[1]:6.2f}  8x {ts[8]:6.2f}  "
            f"32x {ts[32]:6.2f}   exp "
            f"{math.log(ts[32] / ts[8]) / math.log(4):.2f}"
        )

    shutil.rmtree(TMP, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
