"""Behavioral checks for the lifecycle/concentration operators beyond
oracle parity: planted streak gaps, censoring semantics in the
Kaplan-Meier curve, Gini bounds on degenerate and concentrated
distributions, and autocorrelation of a planted weekly cycle."""

from __future__ import annotations

import datetime as dt
import math

import pytest

pytestmark = pytest.mark.usefixtures("planted_views")


def _events(spark, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")


def test_streaks_split_on_gap(spark):
    """Days 1,2,3, 5,6 → two streaks (3 and 2); duplicate events on
    one day must not inflate the active-day count."""
    from pyanamo_spark.operators.cohort import q_streaks

    t0 = dt.datetime(2024, 5, 1, 9, 0, 0)
    days = [0, 1, 2, 4, 5, 5]  # day 5 active twice
    _events(
        spark,
        [
            (i, t0 + dt.timedelta(days=d, minutes=i), 1, "view", 0.0)
            for i, d in enumerate(days)
        ],
    )
    r = q_streaks.__wrapped__(spark, "").collect()[0]
    assert (r["n_active_days"], r["n_streaks"], r["longest_streak"]) == (
        5,
        2,
        3,
    )


def test_survival_censors_recent_users(spark):
    """User A churns (last event 30 days before corpus end) at
    duration 2; users B and C are still active at the end (censored)
    with durations 5 and 40. S drops only at observed churn times:
    at t=2, n=3 at risk, 1 death → S=2/3; censored exits never
    multiply a factor in."""
    from pyanamo_spark.operators.cohort import q_survival

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # user 1: days 0..2, then silent; corpus runs 40 more days
        (1, t0, 1, "view", 0.0),
        (2, t0 + dt.timedelta(days=2), 1, "view", 0.0),
        # user 2: days 35..40 (active at end -> censored), dur 5
        (3, t0 + dt.timedelta(days=35), 2, "view", 0.0),
        (4, t0 + dt.timedelta(days=40), 2, "view", 0.0),
        # user 3: days 0..40 (active at end -> censored), dur 40
        (5, t0, 3, "view", 0.0),
        (6, t0 + dt.timedelta(days=40), 3, "view", 0.0),
    ]
    _events(spark, rows)
    km = {
        r["duration_days"]: (r["deaths"], r["at_risk"], r["survival"])
        for r in q_survival.__wrapped__(spark, "").collect()
    }
    assert km[2] == (1, 3, pytest.approx(2 / 3, abs=1e-6))
    # censored exits at 5 and 40: survival stays flat at 2/3
    assert km[5][0] == 0 and km[5][2] == pytest.approx(2 / 3, abs=1e-6)
    assert km[40][0] == 0 and km[40][2] == pytest.approx(2 / 3, abs=1e-6)


def _orders(spark, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    ).createOrReplaceTempView("orders")


def test_gini_equal_and_concentrated(spark):
    """Equal revenues → Gini 0; one customer holding nearly all the
    revenue among 10 → Gini near (n−1)/n and top-decile share ≈ 1."""
    from pyanamo_spark.operators.analytics import q_gini

    d0 = dt.date(2024, 5, 1)
    _orders(spark, [(i, i, d0, 100.0) for i in range(10)])
    r = q_gini.__wrapped__(spark, "").collect()[0]
    assert r["n_entities"] == 10
    assert r["gini"] == pytest.approx(0.0, abs=1e-6)
    assert r["top_decile_share"] == pytest.approx(0.1, abs=1e-6)

    _orders(
        spark,
        [(i, i, d0, 0.01) for i in range(9)] + [(9, 9, d0, 10_000.0)],
    )
    r = q_gini.__wrapped__(spark, "").collect()[0]
    assert r["gini"] > 0.89
    assert r["top_decile_share"] > 0.999


def test_autocorr_weekly_cycle(spark):
    """A pure 7-day cycle has acf_7 ≈ 1 while acf_1 is well below it."""
    from pyanamo_spark.operators.timeseries import q_autocorr

    d0 = dt.date(2024, 1, 1)
    rows = []
    for day in range(70):
        rev = 100.0 + 50.0 * math.sin(2 * math.pi * day / 7)
        rows.append((day, day % 5, d0 + dt.timedelta(days=day), rev))
    _orders(spark, rows)
    r = q_autocorr.__wrapped__(spark, "").collect()[0]
    assert r["n_days"] == 70
    assert r["acf_7"] == pytest.approx(1.0, abs=1e-3)
    assert r["acf_1"] < 0.7


def test_ltv_accumulates_per_cohort_user(spark):
    """Two users in one cohort: purchases of 10 (day 0) and 30
    (day 2) give period revenues 10/30, cumulative 10/40, LTV per
    user 5/20. Non-purchase events never add revenue."""
    from pyanamo_spark.operators.cohort import q_ltv

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        (1, t0, 1, "purchase", 10.0),
        (2, t0 + dt.timedelta(days=2), 1, "purchase", 30.0),
        (3, t0, 2, "view", 999.0),  # same cohort, never converts
    ]
    _events(spark, rows)
    out = {
        r["day_offset"]: (
            r["period_revenue"],
            r["cum_revenue"],
            r["ltv_per_user"],
        )
        for r in q_ltv.__wrapped__(spark, "").collect()
    }
    assert out == {0: (10.0, 10.0, 5.0), 2: (30.0, 40.0, 20.0)}
