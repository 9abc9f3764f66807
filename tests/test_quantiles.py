"""Bounded-memory exact percentiles (functions/quantiles.py).

The contract: bit-identical to Spark's exact `percentile` aggregate
(≡ DuckDB quantile_cont) on every path — small groups (whole-sort),
large groups (sketch bracket + below-count + survivor sort), ties,
odd/even counts, and multiple fractions at once.
"""

import random

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.functions.quantiles import (
    exact_group_percentiles,
    exact_group_percentiles_lowcard,
)

PS = {"p25": 0.25, "p50": 0.5, "p75": 0.75}


def _exact(spark, df, gcol, vcol, ps):
    aggs = [
        F.expr(f"percentile({vcol}, {p!r})").alias(name)
        for name, p in ps.items()
    ]
    return {
        tuple(r)[0]: tuple(r)[1:]
        for r in df.groupBy(gcol).agg(*aggs).collect()
    }


def _ours(spark, df, gcol, vcol, ps, **kw):
    out = exact_group_percentiles(df, [gcol], vcol, ps, **kw)
    return {tuple(r)[0]: tuple(r)[1:] for r in out.collect()}


def test_small_groups_match_exact_percentile(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = _ours(spark, li, "l_returnflag", "l_quantity", PS)
    want = _exact(spark, li, "l_returnflag", "l_quantity", PS)
    assert got == want


def test_large_group_takes_prefilter_path_and_matches(spark):
    # one group of 50k values > SMALL_GROUP=20k forces the sketch
    # bracket path; a 500-row group stays on the whole-sort path
    rng = random.Random(7)
    rows = [("big", rng.uniform(0, 1e6)) for _ in range(50_000)] + [
        ("small", rng.uniform(0, 1e6)) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    got = _ours(spark, df, "g", "v", PS)
    want = _exact(spark, df, "g", "v", PS)
    assert got == want


def test_heavy_ties_and_even_odd_counts(spark):
    # margin=0.2 puts the guarantee bound at n≥11, so group a (21
    # rows) takes the sketch-bracket path while b (2) and c (1) are
    # auto-clamped onto the whole-sort path regardless of small_group
    rows = (
        [("a", 1.0)] * 10
        + [("a", 2.0)] * 10
        + [("a", 3.0)]  # odd count, huge tie blocks
        + [("b", 5.0), ("b", 7.0)]  # even count → interpolated median
        + [("c", 9.0)]  # singleton
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = _ours(spark, df, "g", "v", PS, small_group=2, margin=0.2)
    want = _exact(spark, df, "g", "v", PS)
    assert got == want
    assert got["b"][1] == pytest.approx(6.0)


def test_tiny_groups_never_take_bracket_path(spark):
    # a 2-row group cannot satisfy margin ≥ 1/accuracy + 2/n for any
    # margin < 1 — the clamp must route it to the whole-sort path even
    # when the caller's small_group would allow the bracket
    df = spark.createDataFrame([("b", 5.0), ("b", 7.0)], ["g", "v"])
    got = _ours(spark, df, "g", "v", PS, small_group=1)
    want = _exact(spark, df, "g", "v", PS)
    assert got == want
    assert None not in got["b"]


def test_lowcard_histogram_matches_exact_percentile(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        tuple(r)[0]: tuple(r)[1:]
        for r in exact_group_percentiles_lowcard(
            li, ["l_returnflag"], "l_quantity", PS
        ).collect()
    }
    want = _exact(spark, li, "l_returnflag", "l_quantity", PS)
    assert got == want


def test_lowcard_ties_interpolation_and_global_group(spark):
    # heavy ties + even counts exercise the [_lo_rank, _hi_rank)
    # interval logic; the empty group list exercises the global path
    rows = (
        [("a", 1.0)] * 10
        + [("a", 2.0)] * 10
        + [("a", 3.0)]
        + [("b", 5.0), ("b", 7.0)]
        + [("c", 9.0)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        tuple(r)[0]: tuple(r)[1:]
        for r in exact_group_percentiles_lowcard(df, ["g"], "v", PS).collect()
    }
    want = _exact(spark, df, "g", "v", PS)
    assert got == want
    assert got["b"][1] == pytest.approx(6.0)
    [(gmed,)] = exact_group_percentiles_lowcard(
        df, [], "v", {"p50": 0.5}
    ).collect()
    [(want_g,)] = df.agg(F.expr("percentile(v, 0.5)")).collect()
    assert gmed == pytest.approx(want_g)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], ["g", "v"]
    )
    got = _ours(spark, df, "g", "v", {"p50": 0.5})
    assert got["a"][0] == pytest.approx(2.0)


def test_no_exact_percentile_in_plans(spark):
    """The flagged queries must not contain the unbounded-buffer
    `percentile(` aggregate anywhere in their optimized plans."""
    from pyanamo_spark.registry import QUERIES, load_all
    from pyanamo_spark.semantics import ensure_views

    load_all()
    ensure_views(spark, "/root/testdata/sf0.001")
    for name in ("q_percentiles", "q_outliers"):
        plan = QUERIES[name](
            spark, "/root/testdata/sf0.001"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "percentile(" not in plan, name
    # q_percentiles stays lazy on the value-histogram path: the plan's
    # only wide shuffle is the (group, value) count aggregation
    plan = QUERIES["q_percentiles"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "count(1)" in plan
    # q_outliers fits eagerly: its returned plan is the single-scan
    # filter against the collected GROUPS-sized literal stat maps
    plan = QUERIES["q_outliers"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "map(keys:" in plan
