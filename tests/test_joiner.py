"""Adaptive join planner: every branch must (a) be chosen for the
right profile and (b) produce the plain inner join's rows exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.plans import join_auto


@pytest.fixture(scope="module")
def frames(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(200)]        # hot key: 200/260 rows
        + [(k, i) for k in range(2, 32) for i in range(2)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"label_{k}") for k in range(1, 40)],
        "k long, label string",
    )
    want = sorted(
        (r.k, r.payload, r.label)
        for r in fact.join(dim, "k").collect()
    )
    return fact, dim, want


def _got(joined):
    return sorted(
        (r.k, r.payload, r.label)
        for r in joined.select("k", "payload", "label").collect()
    )


def test_broadcast_branch(frames):
    fact, dim, want = frames
    joined, d = join_auto(fact, dim, "k")
    assert d.strategy == "broadcast"
    assert d.dim_rows == 39
    assert _got(joined) == want


def test_salted_branch(frames):
    fact, dim, want = frames
    joined, d = join_auto(
        fact, dim, "k", broadcast_bytes=0, sample_fraction=1.0
    )
    assert d.strategy == "salted"
    assert d.skew_share > 0.5  # the planted hot key dominates
    assert _got(joined) == want


def test_bloom_branch(frames):
    fact, dim, want = frames
    joined, d = join_auto(
        fact,
        dim,
        "k",
        broadcast_bytes=0,
        skew_share_threshold=1.1,  # unreachable -> skew path off
        sample_fraction=1.0,
    )
    assert d.strategy == "bloom"
    assert _got(joined) == want


def test_shuffle_branch(frames):
    fact, dim, want = frames
    joined, d = join_auto(
        fact,
        dim,
        "k",
        broadcast_bytes=0,
        skew_share_threshold=1.1,
        bloom_max_keys=0,  # bloom path off
        sample_fraction=1.0,
    )
    assert d.strategy == "shuffle"
    assert _got(joined) == want


def test_empty_fact_profiles_cleanly(spark):
    fact = spark.createDataFrame([], "k long, payload long")
    dim = spark.createDataFrame([(1, "x")], "k long, label string")
    joined, d = join_auto(fact, dim, "k", sample_fraction=1.0)
    assert d.skew_share == 0.0 and d.n_sampled == 0
    assert joined.count() == 0
