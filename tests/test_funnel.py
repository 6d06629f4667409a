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


def test_retention_cohorts_counts(spark):
    from celeborn_spark.operators.funnel import retention_cohorts

    rows = [
        # user 1 first active week of Jan 1 (Mon), returns week of Jan 8
        (1, dt.datetime(2024, 1, 2, 10), "view"),
        (1, dt.datetime(2024, 1, 9, 10), "click"),
        # user 2 same cohort, never returns
        (2, dt.datetime(2024, 1, 3, 10), "view"),
        # user 3 cohort of Jan 8
        (3, dt.datetime(2024, 1, 10, 10), "view"),
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        (r.cohort_week, r.week_offset): r.n_active_users
        for r in retention_cohorts(e).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }, got


def test_event_transitions_orders_by_time(spark):
    from celeborn_spark.operators.funnel import event_transitions

    rows = [
        (1, _ts(0), 10, "view"), (1, _ts(5), 11, "click"), (1, _ts(9), 12, "click"),
        (2, _ts(0), 20, "view"), (2, _ts(1), 21, "purchase"),
        # same-timestamp tie broken by event_id: 31 then 32
        (3, _ts(0), 31, "view"), (3, _ts(0), 32, "click"),
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {(r.prev_type, r.next_type): r.n for r in event_transitions(e).collect()}
    assert got == {
        ("view", "click"): 2,
        ("click", "click"): 1,
        ("view", "purchase"): 1,
    }, got
