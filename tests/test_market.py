"""Behavioral checks for basket rules, top paths, and changepoint:
hand-computable lift on planted baskets, path share arithmetic, and a
planted level shift."""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.usefixtures("planted_views")


def test_basket_rules_lift_and_threshold(spark):
    """Parts 1,2 co-occur in 3 of 6 baskets (lift = 6·3/(3·3) = 2);
    parts 1,3 co-occur only twice → below the min-basket threshold."""
    from pyanamo_spark.operators.market import q_basket_rules

    baskets = {
        1: [1, 2],
        2: [1, 2],
        3: [1, 2],
        4: [1, 3],
        5: [1, 3],
        6: [2, 3],
    }
    rows = [(o, p) for o, parts in baskets.items() for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).createOrReplaceTempView("lineitem")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_baskets"],
            r["support"],
            r["confidence"],
            r["lift"],
        )
        for r in q_basket_rules.__wrapped__(spark, "").collect()
    }
    # item supports: p1=5, p2=4, p3=3 baskets of 6
    assert got[(1, 2)] == (3, 0.5, pytest.approx(3 / 5), pytest.approx(6 * 3 / (5 * 4)))
    assert got[(2, 1)] == (3, 0.5, pytest.approx(3 / 4), pytest.approx(6 * 3 / (5 * 4)))
    assert (1, 3) not in got  # only 2 shared baskets


def test_top_paths_share(spark):
    """Three identical view>purchase days and one lone click day:
    shares 0.75 / 0.25, ordered by frequency."""
    from pyanamo_spark.operators.market import q_top_paths

    t0 = dt.datetime(2024, 5, 1, 8, 0, 0)
    rows = []
    eid = 0
    for day, user in [(0, 1), (1, 1), (0, 2)]:
        base = t0 + dt.timedelta(days=day)
        for minute, typ in [(0, "view"), (5, "purchase")]:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(minutes=minute), user, typ, 0.0)
            )
    eid += 1
    rows.append((eid, t0 + dt.timedelta(days=3), 3, "click", 0.0))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    out = q_top_paths.__wrapped__(spark, "").collect()
    assert [(r["path"], r["n_sessions"], r["share"]) for r in out] == [
        ("view>purchase", 3, 0.75),
        ("click", 1, 0.25),
    ]


def test_changepoint_finds_planted_shift(spark):
    """A series at 100 for 20 days then 200 for 20 days peaks its
    CUSUM at the boundary (last low day)."""
    from pyanamo_spark.operators.timeseries import q_changepoint

    d0 = dt.date(2024, 1, 1)
    rows = [
        (i, 1, d0 + dt.timedelta(days=i), 100.0 if i < 20 else 200.0)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    ).createOrReplaceTempView("orders")
    r = q_changepoint.__wrapped__(spark, "").collect()[0]
    assert r["change_date"] == d0 + dt.timedelta(days=19)
    assert r["cusum_peak"] < 0  # low regime pulls the cumsum down
    assert r["magnitude"] > 1.0


def test_winsorize_caps_planted_whale(spark):
    """19 orders at 100 plus one 10000 whale: the capped mean moves
    back toward 100 and exactly one high cap fires."""
    from pyanamo_spark.operators.advanced import q_winsorize

    d0 = dt.date(2024, 5, 1)
    rows = [(i, 1, d0, 100.0, "P1") for i in range(19)]
    rows.append((99, 1, d0, 10_000.0, "P1"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double, o_orderpriority string",
    ).createOrReplaceTempView("orders")
    r = q_winsorize.__wrapped__(spark, "").collect()[0]
    assert r["n_rows"] == 20 and r["n_capped_high"] == 1
    assert r["mean_raw"] == pytest.approx(595.0)
    assert r["mean_winsorized"] < r["mean_raw"]
    assert r["p05"] == 100.0


def test_time_split_has_no_leakage(spark):
    """train.max_date must not exceed test.min_date and roughly 80%
    of rows land in train."""
    from pyanamo_spark.operators.curation import q_time_split

    d0 = dt.date(2024, 1, 1)
    rows = [
        (i, 1, d0 + dt.timedelta(days=i), 10.0, "P1") for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double, o_orderpriority string",
    ).createOrReplaceTempView("orders")
    got = {
        r["split"]: r for r in q_time_split.__wrapped__(spark, "").collect()
    }
    assert set(got) == {"train", "test"}
    assert got["train"]["max_date"] < got["test"]["min_date"]
    assert 75 <= got["train"]["n_rows"] <= 85


def test_session_stats_bounce_and_duration(spark):
    """User 1: a 2-event 60s session; user 2: a single-event bounce,
    same day → 2 sessions, 1 bounce, avg_events 1.5, avg duration
    30s."""
    from pyanamo_spark.operators.advanced import q_session_stats

    t0 = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0),
        (2, t0 + dt.timedelta(seconds=60), 1, "click", 0.0),
        (3, t0 + dt.timedelta(hours=2), 2, "view", 0.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    r = q_session_stats.__wrapped__(spark, "").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_sessions"], row["bounces"]) == (2, 1)
    assert row["bounce_rate"] == 0.5
    assert row["avg_events"] == 1.5
    assert row["avg_duration_sec"] == 30.0


def test_anomaly_seasonal_flags_offcycle_spike(spark):
    """Five Mondays at 10:00 with value 100 except one at 500: only
    the spiked Monday is flagged; a perfectly constant cell (sd=0)
    never divides by zero and never alarms."""
    from pyanamo_spark.operators.timeseries import q_anomaly_seasonal

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)  # a Monday
    rows = []
    for week in range(5):
        val = 500.0 if week == 2 else 100.0
        rows.append((week, t0 + dt.timedelta(weeks=week), 1, "view", val))
    # constant cell: five Tuesdays at 11:00, always 50
    for week in range(5):
        rows.append(
            (
                10 + week,
                t0 + dt.timedelta(weeks=week, days=1, hours=1),
                1,
                "view",
                50.0,
            )
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    out = q_anomaly_seasonal.__wrapped__(spark, "").collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"] == (t0 + dt.timedelta(weeks=2)).date()
    assert r["actual"] == 500.0
    assert r["expected"] == 180.0
    assert r["z"] > 1.2
