"""Funnel semantics: strict ordering, first-touch times, non-converts."""

from __future__ import annotations

import datetime as dt

import pytest

from celeborn_spark.operators.funnel import funnel_steps


def _ts(sec):
    return dt.datetime(2026, 1, 1, 0, 0, sec)


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full funnel in order
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        # user 2: purchase BEFORE click -> converts only through click
        (2, _ts(0), "view"), (2, _ts(5), "purchase"), (2, _ts(10), "click"),
        # user 3: click before any view -> stops at view
        (3, _ts(5), "click"), (3, _ts(10), "view"),
        # user 4: never views -> not even step 1
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r.step: r for r in funnel_steps(e, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 3
    assert out["click"].n_users == 2          # users 1 and 2
    assert out["purchase"].n_users == 1       # only user 1
    assert out["view"].avg_step_delay_sec is None
    assert out["click"].avg_step_delay_sec == pytest.approx((10 + 10) / 2)
    assert out["purchase"].avg_step_delay_sec == pytest.approx(10.0)


def test_funnel_requires_steps(spark):
    e = spark.createDataFrame([(1, _ts(0), "view")], ["user_id", "ts", "event_type"])
    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(e, [])
