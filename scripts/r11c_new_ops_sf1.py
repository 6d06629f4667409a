#!/usr/bin/env python3
"""sf0.1-vs-sf1 wall ledger for the r11-continuation part-13..24
operator batches (the 48 queries added in this session) — the same
10x rung discipline as scripts/sf1_rung.py / r11_new_ops_sf1.py.
Run on an idle host after `python scripts/sf1_rung.py --materialize`;
results go to COVERAGE.md.

Usage: python scripts/r11c_new_ops_sf1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW_QUERIES = [
    # part 13-15
    "q_isotonic_calibration",
    "q_periodogram",
    "q_durbin_watson",
    "q_rmst",
    "q_atkinson_index",
    "q_cronbach_alpha",
    "q_fleiss_kappa",
    "q_chow_test",
    "q_mood_median",
    "q_grubbs_test",
    "q_horvitz_thompson",
    "q_pacf",
    # part 16-18
    "q_kuiper_test",
    "q_cramer_von_mises",
    "q_katz_centrality",
    "q_stratified_att",
    "q_anderson_darling",
    "q_cohens_h",
    "q_seasonal_decompose",
    "q_vif",
    "q_mann_kendall",
    "q_poisson_2rate",
    "q_diversity_profile",
    "q_weighted_kappa",
    # part 19-21
    "q_abc_analysis",
    "q_cooks_distance",
    "q_price_elasticity",
    "q_order_gaps",
    "q_kendall_w",
    "q_stuart_maxwell",
    "q_indirect_standardization",
    "q_fisher_z_corr",
    "q_multimodal_ahash",
    "q_ahash_near_dup",
    "q_variance_ratio",
    "q_rbo_overlap",
    # part 22-24
    "q_hurst_rs",
    "q_logistic_growth",
    "q_growth_accounting",
    "q_heaps_law",
    "q_jonckheere",
    "q_dunn_test",
    "q_partial_correlation",
    "q_iqr_outliers",
    "q_paired_t",
    "q_sign_test",
    "q_wilcoxon",
    "q_hash_uniformity",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
)


def main() -> None:
    from celeborn_spark.session import get_spark
    from celeborn_spark import registry

    spark = get_spark(app_name="r11c_new_ops_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    load1 = os.getloadavg()[0]
    print(f"sentinel load1={load1:.2f}")
    print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'growth':>7s}")
    for name in NEW_QUERIES:
        walls = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            walls[sf_label] = best
        g = walls["sf1"] / walls["sf0.1"]
        print(
            f"{name:28s} {walls['sf0.1']:7.2f}s {walls['sf1']:7.2f}s"
            f" {g:6.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
