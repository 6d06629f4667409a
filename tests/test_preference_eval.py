"""Value invariants for the preference/eval batch (Bradley-Terry,
ROUGE, odds ratio, Bartlett) — the oracle harness proves cross-engine
equality; these pin the MATH (things a wrong-but-consistent
implementation would violate).
"""

from __future__ import annotations

import math

from celeborn_spark.queries.stats import (
    q_bartlett_test,
    q_bradley_terry,
    q_odds_ratio,
)
from celeborn_spark.queries.text import q_rouge_overlap


def test_bradley_terry_invariants(spark, sf_dir):
    rows = q_bradley_terry(spark, sf_dir).collect()
    # teams = distinct suppkey % 16 values — 16 once suppliers >= 16
    # (sf0.001 ships only 10 suppliers)
    assert 2 <= len(rows) <= 16
    # normalized to mean 1 (up to the 6dp per-round rounding)
    assert abs(sum(r.strength for r in rows) / len(rows) - 1.0) < 1e-4
    assert all(r.strength >= 0 for r in rows)
    # strengths must track wins directionally: the max-wins team is
    # stronger than the min-wins team (matches are near-balanced by
    # construction, so win counts dominate)
    by_wins = sorted(rows, key=lambda r: (r.wins, r.team))
    assert by_wins[-1].strength > by_wins[0].strength
    # every team's matches = sum of its pair matches; symmetric totals
    assert sum(r.wins for r in rows) * 2 == sum(r.matches for r in rows)


def test_rouge_bounds_and_self_exclusion(spark, sf_dir):
    rows = q_rouge_overlap(spark, sf_dir).collect()
    assert rows, "candidates exist at every sf"
    for r in rows:
        for v in (r.r1_p, r.r1_r, r.r1_f, r.r2_f):
            assert 0.0 <= v <= 1.0 + 1e-12, r
        # F1 is between min and max of P and R (harmonic-mean bound)
        if r.r1_f > 0:
            assert min(r.r1_p, r.r1_r) - 1e-12 <= r.r1_f <= max(
                r.r1_p, r.r1_r
            ) + 1e-12
    # the per-lang reference doc must not score itself
    from celeborn_spark.catalog import load_table
    from pyspark.sql import functions as F

    refs = {
        r.ref_id
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.min("doc_id").alias("ref_id"))
        .collect()
    }
    assert refs.isdisjoint({r.doc_id for r in rows})


def test_odds_ratio_consistency(spark, sf_dir):
    row = q_odds_ratio(spark, sf_dir).collect()[0]
    # OR recomputes from the emitted cells exactly
    assert row.odds_ratio == (row.a * row.d) / (row.b * row.c)
    # CI brackets the point estimate; ln_or consistent with OR
    assert row.lo_ln < row.ln_or < row.hi_ln
    assert abs(row.ln_or - math.log(row.odds_ratio)) < 1e-6


def test_bartlett_nonnegative_and_dof(spark, sf_dir):
    row = q_bartlett_test(spark, sf_dir).collect()[0]
    assert row.k == 5  # mktsegment catalog
    assert row.dof == row.k - 1
    assert row.bartlett_t is not None and row.bartlett_t >= 0


def test_bleu_bounds_and_brevity(spark, sf_dir):
    from celeborn_spark.queries.text import q_bleu_corpus

    rows = q_bleu_corpus(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.bp <= 1.0 + 1e-12
        assert 0.0 <= r.bleu2 <= 1.0 + 1e-12
        # brevity penalty caps BLEU: bleu2 <= bp (precisions <= 1)
        assert r.bleu2 <= r.bp + 1e-9


def test_friedman_ranks_consistency(spark, sf_dir):
    from celeborn_spark.queries.stats import q_friedman_test

    row = q_friedman_test(spark, sf_dir).collect()[0]
    assert row.k == 5  # event_type catalog
    assert row.friedman_chi2 >= 0
    # tie correction only inflates the statistic
    assert row.chi2_tie_corrected >= row.friedman_chi2 - 1e-9


def test_ljung_box_monotone_cumulative(spark, sf_dir):
    from celeborn_spark.queries.stats import q_ljung_box

    rows = sorted(q_ljung_box(spark, sf_dir).collect(), key=lambda r: r.lag)
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1.0 - 1e-9 <= r.rho <= 1.0 + 1e-9
    # Q is a cumulative sum of non-negative terms
    qs = [r.q_lb for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))


def test_eigenvector_centrality_invariants(spark, sf_dir):
    from celeborn_spark.queries.graph import q_eigenvector_centrality

    rows = q_eigenvector_centrality(spark, sf_dir).collect()
    assert rows
    assert all(r.score >= 0 for r in rows)
    # L1-normalized: scores sum to 1 (up to 6dp rounding per node)
    assert abs(sum(r.score for r in rows) - 1.0) < 5e-6 * len(rows)


def test_mantel_haenszel_pools_strata(spark, sf_dir):
    from celeborn_spark.queries.stats import (
        q_mantel_haenszel,
        q_odds_ratio,
    )

    mh = q_mantel_haenszel(spark, sf_dir).collect()[0]
    crude = q_odds_ratio(spark, sf_dir).collect()[0]
    assert mh.k_strata == 5
    # or_crude must reproduce q_odds_ratio's pooled-cell OR
    assert abs(mh.or_crude - round(crude.odds_ratio, 6)) < 1e-9
    assert mh.or_mh is not None and mh.or_mh > 0


def test_tost_direction(spark, sf_dir):
    from celeborn_spark.queries.stats import q_tost_equivalence

    row = q_tost_equivalence(spark, sf_dir).collect()[0]
    assert row.margin > 0
    assert row.t_lo > row.t_hi  # +margin shifts the numerator up
    assert row.equivalent in (True, False)


def test_negbin_moments(spark, sf_dir):
    from celeborn_spark.queries.stats import q_negbin_fit

    rows = q_negbin_fit(spark, sf_dir).collect()
    assert len(rows) == 5  # event_type catalog
    for r in rows:
        assert r.mean_count > 0 and r.var_count >= 0
        assert r.overdispersed == (r.var_count > r.mean_count)
        if r.overdispersed:
            # MoM identities: r > 0 and 0 < p <= 1
            assert r.nb_r > 0 and 0 < r.nb_p <= 1


def test_page_hinkley_nonnegative_and_resets(spark, sf_dir):
    from celeborn_spark.queries.stats import q_page_hinkley

    rows = q_page_hinkley(spark, sf_dir).collect()
    assert rows
    # PH_t = m_t - running_min(m_t) >= 0 always, and = 0 at new minima
    assert all(r.ph_cents >= 0 for r in rows)
    assert any(r.ph_cents == 0 for r in rows)


def test_davies_bouldin_positive_and_bounded_labels(spark, sf_dir):
    from celeborn_spark.queries.similarity import q_davies_bouldin

    rows = q_davies_bouldin(spark, sf_dir).collect()
    assert 2 <= len(rows) <= 16
    for r in rows:
        assert r.scatter >= 0 and r.db_component > 0


def test_permutation_test_p_value_range(spark, sf_dir):
    from celeborn_spark.queries.stats import q_permutation_test

    row = q_permutation_test(spark, sf_dir).collect()[0]
    assert row.n_replicates == 200
    assert 0 < row.p_value <= 1.0
    assert row.p_value == (1 + row.n_extreme) / (1 + row.n_replicates)


def test_hosmer_lemeshow_totals(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_hosmer_lemeshow

    rows = q_hosmer_lemeshow(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    chi2 = {r.hl_chi2 for r in rows}
    assert len(chi2) == 1  # repeated total
    assert chi2.pop() >= 0


def test_embedding_whiten_unit_variance(spark, sf_dir):
    from celeborn_spark.queries.similarity import q_embedding_whiten

    rows = q_embedding_whiten(spark, sf_dir).collect()
    n = len(rows)
    assert n > 1
    for col in ("w1", "w2"):
        vals = [getattr(r, col) for r in rows]
        m = sum(vals) / n
        var = sum((v - m) ** 2 for v in vals) / (n - 1)
        # whitened axes have mean ~0, variance ~1
        assert abs(m) < 1e-6
        assert abs(var - 1.0) < 1e-6


def test_classifier_report_consistency(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_classifier_report

    rows = q_classifier_report(spark, sf_dir).collect()
    assert 2 <= len(rows) <= 5
    total = sum(r.support for r in rows)
    assert total > 0
    for r in rows:
        for v in (r.precision, r.recall, r.f1):
            if v is not None:
                assert 0.0 <= v <= 1.0 + 1e-12
    accs = {r.accuracy for r in rows}
    assert len(accs) == 1 and 0 <= accs.pop() <= 1


def test_gopher_rules_conjunction(spark, sf_dir):
    from celeborn_spark.queries.text import q_gopher_rules

    rows = q_gopher_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pass_all == (
            r.r_len and r.r_wordlen and r.r_digit and r.r_rep and r.r_stop
        )
    # the battery must actually discriminate on this corpus
    verdicts = {r.pass_all for r in rows}
    assert verdicts == {True, False} or len(rows) < 10


def test_mixture_em_component_order_and_weights(spark, sf_dir):
    from celeborn_spark.queries.stats import q_mixture_em

    row = q_mixture_em(spark, sf_dir).collect()[0]
    assert 0 < row.w1 < 1
    assert row.s1_cents > 0 and row.s2_cents > 0
    # init places mu1 below mu2 (mean -/+ sd); EM preserves the order
    # on a unimodal-ish distribution
    assert row.mu1_cents < row.mu2_cents
    assert row.n > 0


def test_capture_recapture_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_capture_recapture

    row = q_capture_recapture(spark, sf_dir).collect()[0]
    assert row.m <= min(row.n1, row.n2)
    # the estimate can never be below the union lower bound
    assert row.n_hat >= max(row.n1, row.n2) - 1e-9
    assert row.ci_lo <= row.n_hat <= row.ci_hi


def test_price_index_fisher_between(spark, sf_dir):
    from celeborn_spark.queries.stats import q_price_index

    row = q_price_index(spark, sf_dir).collect()[0]
    assert row.base_year < row.curr_year
    assert row.n_parts > 0
    lo, hi = sorted((row.laspeyres, row.paasche))
    # Fisher is the geometric mean of the two
    assert lo - 1e-6 <= row.fisher <= hi + 1e-6


def test_dp_quantile_in_range(spark, sf_dir):
    from celeborn_spark.queries.advanced import q_dp_quantile
    from celeborn_spark.catalog import load_table
    from pyspark.sql import functions as F

    row = q_dp_quantile(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.floor(F.col("value") * 100)).alias("lo"),
        F.max(F.floor(F.col("value") * 100)).alias("hi"),
    ).collect()[0]
    assert b.lo <= row.dp_median_cents <= b.hi
    assert 0 <= row.bucket <= 255
    # deterministic release: same query, same answer
    again = q_dp_quantile(spark, sf_dir).collect()[0]
    assert again.dp_median_cents == row.dp_median_cents


# --- r11 batch 13: isotonic / periodogram / Durbin-Watson / RMST ---


def test_isotonic_monotone_and_mean_preserving(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_isotonic_calibration

    rows = sorted(
        q_isotonic_calibration(spark, sf_dir).collect(), key=lambda r: r.bin
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-12
    for r in rows:
        assert 0.0 <= r.iso_rate <= 1.0
        assert abs(r.raw_rate - r.n_pos / r.n) < 1e-12
    # PAVA preserves the weighted mean: sum n*iso == sum pos
    fit_mass = sum(r.n * r.iso_rate for r in rows)
    pos_mass = sum(r.n_pos for r in rows)
    assert abs(fit_mass - pos_mass) < 1e-6 * max(1, pos_mass)


def test_periodogram_grid_and_nonnegative(spark, sf_dir):
    from celeborn_spark.queries.stats import q_periodogram

    rows = q_periodogram(spark, sf_dir).collect()
    assert sorted(r.p for r in rows) == list(range(2, 15))
    n_days = {r.n_days for r in rows}
    assert len(n_days) == 1 and n_days.pop() > 0
    for r in rows:
        assert r.amp >= 0.0


def test_durbin_watson_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_durbin_watson

    row = q_durbin_watson(spark, sf_dir).collect()[0]
    assert row.n_days > 0
    assert 0.0 <= row.dw <= 4.0
    assert abs(row.rho - round(1 - row.dw / 2, 6)) < 1e-9


def test_rmst_within_curve_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_rmst, q_survival_curve

    row = q_rmst(spark, sf_dir).collect()[0]
    assert 0.0 <= row.rmst_days <= row.tau_days
    km = sorted(
        q_survival_curve(spark, sf_dir).collect(), key=lambda r: r.t
    )
    assert row.n_steps == len(km)
    assert row.tau_days == km[-1].t
    # recompute the step-curve area at full precision
    area = km[0].t * 1.0
    for a, b in zip(km, km[1:]):
        area += a.survival * (b.t - a.t)
    assert abs(area - row.rmst_days) < 1e-5


# --- r11 batch 14: Atkinson / Cronbach / Fleiss / Chow ---


def test_atkinson_in_unit_interval(spark, sf_dir):
    from celeborn_spark.queries.stats import q_atkinson_index

    row = q_atkinson_index(spark, sf_dir).collect()[0]
    assert row.n_units > 0
    assert 0.0 <= row.atkinson < 1.0
    assert row.mean_cents > 0


def test_cronbach_alpha_bounds_and_subjects(spark, sf_dir):
    from celeborn_spark.queries.stats import q_cronbach_alpha
    from celeborn_spark.catalog import load_table

    row = q_cronbach_alpha(spark, sf_dir).collect()[0]
    assert row.k_items == 3
    assert row.alpha <= 1.0
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert row.n_subjects == n_cust


def test_fleiss_kappa_agreeing_raters(spark, sf_dir):
    from celeborn_spark.queries.stats import q_fleiss_kappa

    row = q_fleiss_kappa(spark, sf_dir).collect()[0]
    assert row.n_raters == 3 and row.k_categories == 3
    assert 0.0 <= row.p_bar <= 1.0
    assert 0.0 < row.p_e < 1.0
    assert -1.0 <= row.kappa <= 1.0
    # the three size heuristics genuinely correlate on TPC-H orders
    assert row.kappa > 0.0


def test_chow_split_never_fits_worse(spark, sf_dir):
    from celeborn_spark.queries.stats import q_chow_test

    row = q_chow_test(spark, sf_dir).collect()[0]
    assert row.n_days > 4
    assert 0 < row.break_t
    # split regression can only reduce SSE (F >= 0 up to rounding)
    assert row.sse_split <= row.sse_pooled + 1e-6
    assert row.f_stat >= -1e-6


# --- r11 batch 15: Mood / Grubbs / Horvitz-Thompson / PACF ---


def test_mood_median_counts_and_dof(spark, sf_dir):
    from celeborn_spark.queries.stats import q_mood_median

    row = q_mood_median(spark, sf_dir).collect()[0]
    assert row.k_groups == 3 and row.dof == 2
    assert 0 < row.a_total < row.n
    assert row.chi2 >= 0.0
    assert 1 <= row.med <= 50


def test_grubbs_outlier_is_an_extreme(spark, sf_dir):
    from celeborn_spark.queries.stats import q_grubbs_test
    from celeborn_spark.catalog import load_table
    from pyspark.sql import functions as F

    row = q_grubbs_test(spark, sf_dir).collect()[0]
    assert row.g_stat > 0
    b = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.min(F.floor("o_totalprice")).alias("lo"),
            F.max(F.floor("o_totalprice")).alias("hi"),
        )
        .collect()[0]
    )
    assert row.outlier_units in (b.lo, b.hi)


def test_horvitz_thompson_near_truth(spark, sf_dir):
    from celeborn_spark.queries.stats import q_horvitz_thompson

    row = q_horvitz_thompson(spark, sf_dir).collect()[0]
    assert 0 < row.n_sample < row.n_pop
    # the design is unbiased; on 15k+ orders the realized estimate
    # should land well within 20% of truth
    assert 0.8 < row.ht_ratio < 1.2
    # deterministic sampling: same query, same answer
    again = q_horvitz_thompson(spark, sf_dir).collect()[0]
    assert again.ht_cents == row.ht_cents


def test_pacf_lag1_identity_and_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_pacf

    row = q_pacf(spark, sf_dir).collect()[0]
    assert row.n_days > 10
    assert row.pacf1 == row.r1
    for v in (row.r1, row.r2, row.r3, row.pacf2, row.pacf3):
        assert -1.0 <= v <= 1.0


# --- r11 batch 16: Kuiper / CvM / Katz / stratified ATT ---


def test_kuiper_dominates_ks_components(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_kuiper_test

    row = q_kuiper_test(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0.0 <= row.d_plus <= 1.0 and 0.0 <= row.d_minus <= 1.0
    assert abs(row.v_stat - (row.d_plus + row.d_minus)) < 1e-12
    # V >= the one-sided max, i.e. >= the KS statistic
    assert row.v_stat >= max(row.d_plus, row.d_minus)


def test_cvm_nonnegative_and_bounded(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_cramer_von_mises

    row = q_cramer_von_mises(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert row.t_stat >= 0.0
    # T is at most N*M/(N+M) (gap <= 1 at every observation)
    assert row.t_stat <= row.n_a * row.n_b / (row.n_a + row.n_b) + 1e-9


def test_katz_floor_and_ordering(spark, sf_dir):
    from celeborn_spark.queries.graph import q_katz_centrality

    rows = q_katz_centrality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every node keeps the +1 baseline
        assert r.score >= 1.0
    # somebody has neighbors: at least one score above the floor
    assert max(r.score for r in rows) > 1.0


def test_stratified_att_mass_and_strata(spark, sf_dir):
    from celeborn_spark.queries.stats import q_stratified_att
    from celeborn_spark.catalog import load_table

    row = q_stratified_att(spark, sf_dir).collect()[0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert row.n_treated + row.n_control == n_cust
    assert 1 <= row.n_strata <= 25
    # adjusted and naive estimates live on the same cents scale
    assert abs(row.att_cents) < 1e10
    assert abs(row.naive_diff_cents) < 1e10


# --- r11 batch 17: Anderson-Darling / Cohen's h / seasonal / VIF ---


def test_anderson_darling_nonnegative(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_anderson_darling

    row = q_anderson_darling(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert row.a2_stat >= 0.0


def test_cohens_h_is_phi_difference(spark, sf_dir):
    from celeborn_spark.queries.stats import q_cohens_h

    row = q_cohens_h(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.pos_a <= row.n_a and 0 <= row.pos_b <= row.n_b
    import math

    assert abs(row.h - (row.phi_a - row.phi_b)) < 1e-12
    assert abs(row.h) <= math.pi


def test_seasonal_decompose_profile_sums_small(spark, sf_dir):
    from celeborn_spark.queries.stats import q_seasonal_decompose

    rows = q_seasonal_decompose(spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == list(range(1, 8))
    # an additive seasonal profile is mean-free up to edge effects
    mass = sum(r.n_days * r.seasonal for r in rows)
    total = sum(r.n_days for r in rows)
    assert abs(mass / total) < 1.0


def test_vif_at_least_one(spark, sf_dir):
    from celeborn_spark.queries.stats import q_vif

    row = q_vif(spark, sf_dir).collect()[0]
    for v in (row.vif1, row.vif2, row.vif3):
        assert v >= 1.0 - 1e-9
    for r in (row.r12, row.r13, row.r23):
        assert -1.0 <= r <= 1.0
    # count and spend genuinely correlate on TPC-H customers
    assert row.r12 > 0.3


# --- r11 batch 18: Mann-Kendall / Poisson 2-rate / diversity / wkappa ---


def test_mann_kendall_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_mann_kendall

    row = q_mann_kendall(spark, sf_dir).collect()[0]
    n = row.n_days
    assert abs(row.s_stat) <= n * (n - 1) // 2
    assert row.var_s > 0
    # tie correction can only SHRINK the no-tie variance
    assert row.var_s <= n * (n - 1) * (2 * n + 5) / 18


def test_poisson_2rate_ci_brackets_ratio(spark, sf_dir):
    from celeborn_spark.queries.stats import q_poisson_2rate

    row = q_poisson_2rate(spark, sf_dir).collect()[0]
    assert row.c1 > 0 and row.c2 > 0
    assert row.rr_lo <= row.rate_ratio <= row.rr_hi
    assert abs(row.rate_ratio - row.c1 / row.c2) < 1e-12


def test_diversity_indices_consistent(spark, sf_dir):
    from celeborn_spark.queries.stats import q_diversity_profile

    rows = q_diversity_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.richness <= 5  # five market segments
        assert 0.0 <= r.simpson <= 1.0
        # Berger-Parker dominance is at least 1/richness
        assert r.berger_parker >= 1.0 / r.richness - 1e-12
        # exact lower bound: the dominant class alone contributes
        # nmax(nmax-1)/(n(n-1)) to the two-draw match probability
        nmax = round(r.berger_parker * r.n)
        assert r.simpson >= nmax * (nmax - 1) / (r.n * (r.n - 1)) - 1e-12


def test_weighted_kappa_vs_chance(spark, sf_dir):
    from celeborn_spark.queries.stats import q_weighted_kappa

    row = q_weighted_kappa(spark, sf_dir).collect()[0]
    assert row.n > 0 and row.d_exp_num > 0
    assert -1.0 <= row.kappa_w <= 1.0
    # price and quantity bands are weakly related; at sf0.001 the
    # 150-order sample can dip just below chance — bound the noise
    assert row.kappa_w > -0.3


# --- r11 batch 19: ABC / Cook's D / elasticity / order gaps ---


def test_abc_classes_partition_revenue(spark, sf_dir):
    from celeborn_spark.queries.stats import q_abc_analysis

    rows = {r.abc_class: r for r in q_abc_analysis(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    shares = sum(r.revenue_share for r in rows.values())
    assert abs(shares - 1.0) < 1e-9
    # A-class items are fewer but carry more revenue per item
    if "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a.cents / a.n_items > c.cents / c.n_items


def test_cooks_top5_sorted_nonnegative(spark, sf_dir):
    from celeborn_spark.queries.stats import q_cooks_distance

    rows = q_cooks_distance(spark, sf_dir).collect()
    assert len(rows) == 5
    ds = [r.d_stat for r in rows]
    assert ds == sorted(ds, reverse=True)
    assert all(d >= 0.0 for d in ds)


def test_price_elasticity_shape(spark, sf_dir):
    from celeborn_spark.queries.stats import q_price_elasticity

    row = q_price_elasticity(spark, sf_dir).collect()[0]
    assert row.n_groups >= 2
    assert row.mean_ln_price > 0
    assert abs(row.elasticity) < 100


def test_order_gaps_percentile_order(spark, sf_dir):
    from celeborn_spark.queries.stats import q_order_gaps

    row = q_order_gaps(spark, sf_dir).collect()[0]
    assert row.n_gaps > 0
    assert 0 <= row.p50_days <= row.p90_days
    assert 0 < row.mean_days


# --- r11 batch 20: Kendall W / Stuart-Maxwell / SMR / Fisher z ---


def test_kendall_w_from_pairwise_rhos(spark, sf_dir):
    from celeborn_spark.queries.stats import q_kendall_w

    row = q_kendall_w(spark, sf_dir).collect()[0]
    for r in (row.rho01, row.rho02, row.rho12):
        assert -1.0 <= r <= 1.0
    assert 0.0 <= row.w <= 1.0 + 1e-9
    expect = round((2 * (row.rho01 + row.rho02 + row.rho12) / 3 + 1) / 3, 6)
    assert abs(row.w - expect) < 1e-9


def test_stuart_maxwell_margins(spark, sf_dir):
    from celeborn_spark.queries.stats import q_stuart_maxwell

    row = q_stuart_maxwell(spark, sf_dir).collect()[0]
    assert row.dof == 2
    assert row.chi2 >= 0.0
    assert abs(row.d0) <= row.n and abs(row.d1) <= row.n


def test_smr_mass_balance(spark, sf_dir):
    from celeborn_spark.queries.stats import q_indirect_standardization

    rows = q_indirect_standardization(spark, sf_dir).collect()
    assert rows
    # indirect standardization preserves total mass: sum expected ==
    # sum observed (up to micro quantization)
    obs = sum(r.observed for r in rows)
    exp = sum(r.expected for r in rows)
    assert abs(obs - exp) < 0.01 * obs
    for r in rows:
        assert r.smr > 0


def test_fisher_z_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_fisher_z_corr

    row = q_fisher_z_corr(spark, sf_dir).collect()[0]
    assert row.n_a > 3 and row.n_b > 3
    assert -1.0 < row.r_a < 1.0 and -1.0 < row.r_b < 1.0
    # two ~independent-year samples of the same pair: z is a finite,
    # modest standardized gap (this synthetic price is independent of
    # quantity, so r itself sits near 0 — the TEST is about r_a vs r_b)
    assert abs(row.z) < 50


# --- r11 batch 21: aHash / Hamming LSH / variance ratio / RBO ---


def test_ahash_halves_in_32_bits(spark, sf_dir):
    from celeborn_spark.queries.multimodal import q_multimodal_ahash

    rows = q_multimodal_ahash(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hash_hi < 2**32 and 0 <= r.hash_lo < 2**32
        assert r.n_bytes >= 64


def test_ahash_near_dup_pairs_sound(spark, sf_dir):
    from celeborn_spark.queries.multimodal import (
        q_ahash_near_dup,
        q_multimodal_ahash,
    )

    pairs = q_ahash_near_dup(spark, sf_dir).collect()
    hashes = {
        r.doc_id: (r.hash_hi, r.hash_lo)
        for r in q_multimodal_ahash(spark, sf_dir).collect()
    }
    for pr in pairs:
        assert pr.rep_a < pr.rep_b
        assert pr.n_a >= 1 and pr.n_b >= 1
        hi_a, lo_a = hashes[pr.rep_a]
        hi_b, lo_b = hashes[pr.rep_b]
        ham = bin((hi_a ^ hi_b)).count("1") + bin((lo_a ^ lo_b)).count("1")
        # distinct signatures: hamming is 1..6 by construction
        assert ham == pr.hamming and 1 <= pr.hamming <= 6
    # the corpus contains planted near-duplicates: pairs must exist
    assert pairs


def test_variance_ratio_grid(spark, sf_dir):
    from celeborn_spark.queries.stats import q_variance_ratio

    rows = {r.k: r for r in q_variance_ratio(spark, sf_dir).collect()}
    assert set(rows) == {2, 5, 10}
    for k, r in rows.items():
        assert r.vr > 0
        assert r.n_diffs > 0
        # longer differencing has fewer observations
    assert rows[10].n_diffs < rows[2].n_diffs


def test_rbo_bounds(spark, sf_dir):
    from celeborn_spark.queries.evaluation import q_rbo_overlap

    row = q_rbo_overlap(spark, sf_dir).collect()[0]
    assert row.k == 20
    assert 0 <= row.n_common <= 20
    # RBO@k lower bound lives in [0, 1)
    assert 0.0 <= row.rbo < 1.0


# --- r11 batch 22: Hurst / logistic growth / growth accounting / Heaps ---


def test_hurst_in_unit_interval(spark, sf_dir):
    from celeborn_spark.queries.stats import q_hurst_rs

    row = q_hurst_rs(spark, sf_dir).collect()[0]
    assert row.n_days > 0
    # sf0.001's sparse calendar can leave < 2 sizes with full blocks,
    # in which case the fit is declared NULL rather than 0/0
    if row.hurst is not None:
        assert 0.0 < row.hurst < 1.2


def test_logistic_growth_cap_and_rate(spark, sf_dir):
    from celeborn_spark.queries.stats import q_logistic_growth
    from celeborn_spark.catalog import load_table

    row = q_logistic_growth(spark, sf_dir).collect()[0]
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert row.m_cap >= n_cust
    # adoption accumulates: the fitted rate must be positive
    assert row.r_rate > 0


def test_growth_accounting_identity(spark, sf_dir):
    from celeborn_spark.queries.stats import q_growth_accounting
    from celeborn_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        q_growth_accounting(spark, sf_dir).collect(), key=lambda r: r.month_idx
    )
    assert rows
    # actives(m) = new + retained + resurrected; actives(m) =
    # actives(m-1) + new(m) + resurrected(m) - churned(m)
    prev_active = None
    for r in rows:
        active = r.new_units + r.retained + r.resurrected
        if prev_active is not None:
            assert active == prev_active + r.new_units + r.resurrected - r.churned
        prev_active = active
    total_new = sum(r.new_units for r in rows)
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total_new == n_cust


def test_heaps_beta_in_range(spark, sf_dir):
    from celeborn_spark.queries.text import q_heaps_law

    row = q_heaps_law(spark, sf_dir).collect()[0]
    assert row.n_slices_used == 8
    # this synthetic corpus has a ~31-type vocabulary, so V saturates
    # in slice 1 and beta legitimately sits at 0 — assert the range
    assert 0.0 <= row.beta <= 1.0


# --- r11 batch 23: Jonckheere / Dunn / partial corr / IQR fences ---


def test_jonckheere_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_jonckheere

    row = q_jonckheere(spark, sf_dir).collect()[0]
    assert row.n > 0
    # J2 lies in [0, 2 * sum_{i<j} n_i n_j] = [0, n^2 - sum n_i^2]
    assert 0 <= row.j2_stat
    assert row.e2_mean > 0
    # under no ordered effect z is modest; bound the statistic
    assert abs(row.z) < 100


def test_dunn_pairs_shape(spark, sf_dir):
    from celeborn_spark.queries.stats import q_dunn_test

    rows = q_dunn_test(spark, sf_dir).collect()
    assert len(rows) == 3  # C(3,2) return-flag pairs
    for r in rows:
        assert r.g_a < r.g_b
        assert r.n_a > 0 and r.n_b > 0


def test_partial_corr_bounds(spark, sf_dir):
    from celeborn_spark.queries.stats import q_partial_correlation

    row = q_partial_correlation(spark, sf_dir).collect()[0]
    for v in (row.r01_g2, row.r02_g1, row.r12_g0):
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_iqr_fences_contain_bulk(spark, sf_dir):
    from celeborn_spark.queries.stats import q_iqr_outliers

    row = q_iqr_outliers(spark, sf_dir).collect()[0]
    assert row.q1_units <= row.q3_units
    # Tukey fences flag at most a modest share of any distribution
    assert row.n_low + row.n_high < 0.25 * row.n


# --- r11 batch 24: paired desk / hash uniformity ---


def test_paired_desk_consistency(spark, sf_dir):
    from celeborn_spark.queries.stats import (
        q_paired_t,
        q_sign_test,
        q_wilcoxon,
    )

    t = q_paired_t(spark, sf_dir).collect()[0]
    s = q_sign_test(spark, sf_dir).collect()[0]
    w = q_wilcoxon(spark, sf_dir).collect()[0]
    assert t.n_pairs > 0
    # the three tests see the same pair set (wilcoxon drops zeros)
    assert s.n_pos + s.n_neg + s.n_zero == t.n_pairs
    assert w.n_used == s.n_pos + s.n_neg
    # W+ is bounded by the total doubled rank mass n(n+1)
    assert 0 <= w.w2_plus <= w.n_used * (w.n_used + 1)


def test_hash_uniformity_is_uniform(spark, sf_dir):
    from celeborn_spark.queries.stats import q_hash_uniformity

    row = q_hash_uniformity(spark, sf_dir).collect()[0]
    assert row.n_buckets == 256
    assert row.chi2 >= 0.0
    assert 0.0 <= row.ks_d <= 1.0
    # the md5 variate IS uniform: chi2 stays near its 255 dof mean
    # (generous x3 bound) and KS-D decays with n
    assert row.chi2 < 3 * 255
    assert row.ks_d < 0.1


# --- r11 batch 25: Benford-2 / price endings / top share / heatmap ---


def test_benford_second_shares_sum(spark, sf_dir):
    from celeborn_spark.queries.stats import q_benford_second

    rows = q_benford_second(spark, sf_dir).collect()
    assert sorted(r.digit for r in rows) == list(range(10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.expected_share for r in rows) - 1.0) < 1e-5
    # second-digit Benford is nearly flat: every expected share ~0.1
    for r in rows:
        assert 0.08 < r.expected_share < 0.13


def test_price_endings_ranked(spark, sf_dir):
    from celeborn_spark.queries.stats import q_price_endings

    rows = q_price_endings(spark, sf_dir).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 <= r.ending <= 99 for r in rows)
    assert len({r.chi2_uniform for r in rows}) == 1


def test_top_share_dominates_fraction(spark, sf_dir):
    from celeborn_spark.queries.stats import q_top_share

    row = q_top_share(spark, sf_dir).collect()[0]
    assert 0 < row.n_top <= row.n_units
    # the top group's revenue share must exceed its population share
    assert row.spend_share > row.top_frac
    assert row.top_frac <= 0.25  # ~20% plus threshold ties


def test_activity_heatmap_covers_grid(spark, sf_dir):
    from celeborn_spark.queries.stats import q_activity_heatmap

    rows = q_activity_heatmap(spark, sf_dir).collect()
    assert len(rows) <= 168
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hour <= 23


# --- r11 batch 26: WoE-IV / Oaxaca / MTBF ---


def test_woe_iv_nonneg_and_directional(spark, sf_dir):
    from celeborn_spark.queries.stats import q_woe_iv

    rows = q_woe_iv(spark, sf_dir).collect()
    assert rows
    ivs = {r.iv for r in rows}
    assert len(ivs) == 1
    # IV is a sum of (share-gap * sign-matched WoE) terms: >= 0 up to
    # micro quantization
    assert ivs.pop() >= -1e-5
    for r in rows:
        assert r.n_pos > 0 and r.n_neg > 0


def test_oaxaca_decomposition_adds_up(spark, sf_dir):
    from celeborn_spark.queries.stats import q_oaxaca

    row = q_oaxaca(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_r > 0
    assert abs(row.gap - (row.explained + row.unexplained)) < 1e-5


def test_user_mtbf_heavy_tail(spark, sf_dir):
    from celeborn_spark.queries.stats import q_user_mtbf

    row = q_user_mtbf(spark, sf_dir).collect()[0]
    assert row.n_gaps > 0
    assert row.mtbf_minutes > 0
    assert 0 <= row.median_gap_minutes


# --- r11 batch 27: biweight / control chart / chi residuals ---


def test_tukey_biweight_near_mean(spark, sf_dir):
    from celeborn_spark.queries.stats import q_tukey_biweight

    row = q_tukey_biweight(spark, sf_dir).collect()[0]
    assert row.n > 0
    # on a bounded, roughly symmetric distribution the biweight
    # center stays within a sd-scale band of the raw mean
    assert abs(row.biweight_mean - row.mean_raw) < 0.5 * row.mean_raw


def test_control_chart_band(spark, sf_dir):
    from celeborn_spark.queries.stats import q_control_chart

    row = q_control_chart(spark, sf_dir).collect()[0]
    assert row.lcl < row.mean_units < row.ucl
    assert row.mr_bar > 0
    # escapes are the exception, not the rule
    assert row.n_above + row.n_below < 0.2 * row.n_days


def test_chi_residuals_mass_balance(spark, sf_dir):
    from celeborn_spark.queries.stats import q_chi_residuals

    rows = q_chi_residuals(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert r.expected > 0
        # the residual is exactly (o - e)/sqrt(e) of the emitted e
        recomputed = (r.n - r.expected) / math.sqrt(r.expected)
        assert abs(recomputed - r.std_residual) < 1e-3
