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


def test_correctness_window_is_oracle_backed():
    """The driver checks the first 50 entries of queries(); every slot
    spent on a rows-only query can never earn a green row."""
    qs, oracles = registry.queries(), registry.oracles()
    window = registry.CORRECTNESS_WINDOW
    assert len(window) == 50
    assert list(qs)[:50] == list(window)
    no_oracle = [n for n in window if n not in oracles]
    assert not no_oracle, no_oracle


def test_bench_line_fits_driver_tail_budget():
    fake = {n: 99.99 for n in bench.headline_names()}
    line = json.dumps(
        {
            "metric": "wall_sec_total",
            "value": 9999.99,
            "unit": "sec",
            "queries": fake,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, len(line)
