"""Behavioral checks for incremental materialized-view maintenance
and the batch-3 series operators: group birth/death in the MV merge,
perfect-seasonal backtest, uniform load index, and degree histograms."""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.usefixtures("planted_views")


def _orders(spark, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double, o_orderpriority string",
    ).createOrReplaceTempView("orders")


def test_mv_refresh_group_birth_and_death(spark):
    """The mutation moduli delete keys ≡0 (mod 97): a group whose only
    member is key 97 must vanish from the refreshed view; a group
    whose only member is an inserted copy (key ≡0 mod 103) must
    appear. Counts must land on the full-recompute answer."""
    from pyanamo_spark.operators.cdc import q_mv_refresh

    d0 = dt.date(2024, 5, 1)
    rows = [
        (97, 1, d0, 50.0, "DYING"),  # deleted -> group DYING empties
        (101, 1, d0, 10.0, "STABLE"),  # price-bumped (+1.0)
        (3, 1, d0, 20.0, "STABLE"),  # untouched
        (103, 1, d0, 30.0, "GROWING"),  # survives AND spawns a copy
    ]
    _orders(spark, rows)
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in q_mv_refresh.__wrapped__(spark, "").collect()
    }
    assert got == {
        "STABLE": (2, 31.0),  # 10+1 bumped, 20 untouched
        "GROWING": (2, 60.0),  # original + inserted copy
    }


def test_backtest_perfect_weekly_series(spark):
    """A series that repeats every 7 days exactly → seasonal-naive MAE
    is 0 while the day-over-day naive is not."""
    from pyanamo_spark.operators.timeseries import q_backtest

    d0 = dt.date(2024, 1, 1)
    rows = [
        (day, 1, d0 + dt.timedelta(days=day), float(100 + 10 * (day % 7)), "P")
        for day in range(28)
    ]
    _orders(spark, rows)
    r = q_backtest.__wrapped__(spark, "").collect()[0]
    assert r["n_eval"] == 21
    assert r["mae_seasonal"] == 0.0 and r["mape_seasonal"] == 0.0
    assert r["mae_naive"] > 0


def test_seasonality_load_index_uniform(spark):
    """One event in each of two cells → every load index is 168/2."""
    from pyanamo_spark.operators.timeseries import q_seasonality

    t0 = dt.datetime(2024, 1, 1, 5, 0, 0)  # a Monday
    spark.createDataFrame(
        [
            (1, t0, 1, "view", 4.0),
            (2, t0 + dt.timedelta(days=1, hours=2), 1, "view", 6.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    out = q_seasonality.__wrapped__(spark, "").collect()
    assert len(out) == 2
    for r in out:
        # fixed-point x 10^4: load 84.0 -> 840000
        assert r["load_index_e4"] == 840000
        assert 0 <= r["dow"] <= 6 and 0 <= r["hr"] <= 23


def test_degree_stats_counts_sides_independently(spark):
    """Parts {1:2 suppliers, 2:1} and suppliers {1:2 parts, 2:1} give
    mirrored histograms; duplicate lineitem rows must not inflate
    degrees."""
    from pyanamo_spark.operators.graph import q_degree_stats

    spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)],
        "l_partkey long, l_suppkey long",
    ).createOrReplaceTempView("lineitem")
    got = {
        (r["side"], r["degree"]): r["n_nodes"]
        for r in q_degree_stats.__wrapped__(spark, "").collect()
    }
    assert got == {
        ("part", 2): 1,
        ("part", 1): 1,
        ("supplier", 2): 1,
        ("supplier", 1): 1,
    }
