#!/usr/bin/env python3
"""sf0.1-vs-sf1 wall ledger for the r11-continuation operator batches
(the 23 queries added after the r11 close gates) — the same 10x rung
discipline as scripts/sf1_rung.py, applied to the new surface. Run on
an idle host; results go to COVERAGE.md.

Usage: python scripts/r11_new_ops_sf1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW_QUERIES = [
    "q_recursive_cte",
    "q_listagg",
    "q_sql_pipe",
    "q_sql_udf",
    "q_bradley_terry",
    "q_rouge_overlap",
    "q_odds_ratio",
    "q_bartlett_test",
    "q_bleu_corpus",
    "q_friedman_test",
    "q_ljung_box",
    "q_eigenvector_centrality",
    "q_mantel_haenszel",
    "q_tost_equivalence",
    "q_negbin_fit",
    "q_page_hinkley",
    "q_davies_bouldin",
    "q_permutation_test",
    "q_hosmer_lemeshow",
    "q_embedding_whiten",
    "q_classifier_report",
    "q_gopher_rules",
    "q_mixture_em",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
)


def main() -> None:
    from celeborn_spark.session import get_spark
    from celeborn_spark import registry

    spark = get_spark(app_name="r11_new_ops_sf1")
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
