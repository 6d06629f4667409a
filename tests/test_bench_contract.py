"""Bench/driver contract pins: the headline set is registered, the
correctness window is fully oracle-backed, and the bench line can never
exceed the driver's log-tail budget (round 1 lost its BENCH JSON to
truncation — "parsed": null)."""

from __future__ import annotations

import json

import bench
from celeborn_spark import registry


def test_headline_names_are_registered():
    qs = registry.queries()
    missing = [n for n in bench.headline_names() if n not in qs]
    assert not missing, missing


# The 2 genuinely non-SQL-expressible queries carry self-checking bound
# columns (zlib ratio differential test, sampled_recall_ok), so their
# rows-only status is meaningful. q_approx_stats LEFT this set in r11:
# it now emits exact values + bound booleans that DuckDB can state
# (VERDICT r10 item 2), so it is oracle-backed like everything else.
ROWS_ONLY_ALLOWED = {"q_compression_quality", "q_embedding_near_dup"}


def test_correctness_window_is_oracle_backed():
    """The driver checks the first 50 entries of queries(); a window
    slot without an oracle earns only a rows-only row, so slots go to
    oracle-backed queries — except the 3 self-checking rows-only
    queries explicitly scheduled for their driver rows."""
    qs, oracles = registry.queries(), registry.oracles()
    window = registry.CORRECTNESS_WINDOW
    assert len(window) == 50
    assert list(qs)[:50] == list(window)
    no_oracle = [n for n in window if n not in oracles]
    assert set(no_oracle) <= ROWS_ONLY_ALLOWED, no_oracle


def test_bench_line_fits_driver_tail_budget():
    fake = {n: 99.99 for n in bench.headline_names()}
    line = json.dumps(
        {
            "metric": "wall_sec_total",
            "value": 9999.99,
            "unit": "sec",
            "queries": fake,
            "sf": 0.1,
            "load1": 99.99,
            "jvms": 99,
            "best_of": 2,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, len(line)
