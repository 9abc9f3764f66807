"""Behavioral checks for the resample/gap-fill operator beyond the
oracle: LOCF semantics on a hand-built series with a known gap."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("planted_views")


def test_locf_fills_interior_gap(spark):
    """15:00 observed, 15:15/15:30 empty, 15:45 observed → the two gap
    slots carry 15:00's average forward; slots before a series' first
    observation never exist (grid starts at the series min)."""
    t0 = dt.datetime(2024, 5, 1, 15, 0, 30)
    rows = [
        (1, t0, 10.0, "a"),
        (2, t0 + dt.timedelta(minutes=3), 30.0, "a"),
        (3, t0 + dt.timedelta(minutes=45), 7.0, "a"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double, event_type string"
    ).createOrReplaceTempView("events")
    from pyanamo_spark.operators.timeseries import q_resample

    # __wrapped__ = raw body: run against the ad-hoc events view
    # without the wrapper re-registering the fixture views
    got = {
        (r["slot"].minute): (r["n_events"], r["avg_raw_e4"], r["avg_filled_e4"])
        for r in q_resample.__wrapped__(spark, "")
        .orderBy("slot")
        .collect()
    }
    # fixed-point means: value units x 10^4 (20.0 -> 200000)
    assert got[0] == (2, 200000, 200000)  # 15:00 bucket: avg(10,30)
    assert got[15] == (0, 0, 200000)  # gap carries 20.0 forward
    assert got[30] == (0, 0, 200000)
    assert got[45] == (1, 70000, 70000)
