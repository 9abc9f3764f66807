"""Sketch guarantees (functions/sketches.py): the properties that make
approximate answers usable — error bounds and mergeability — pinned
against exactly-computed ground truth. q_heavy_hitters' exact-match
parity is covered by the oracle harness (test_parity.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyanamo_spark.functions.sketches import (
    HH_SUPPORT,
    PCT_ACCURACY,
    approx_percentiles,
)
from pyanamo_spark.registry import QUERIES
from pyanamo_spark import semantics


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    got = {
        r.o_orderstatus: r.approx_q
        for r in approx_percentiles(spark).collect()
    }
    rows = spark.table("orders").select("o_orderstatus", "o_totalprice").collect()
    by_group: dict[str, list[float]] = {}
    for r in rows:
        by_group.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    assert set(got) == set(by_group)
    for status, vals in by_group.items():
        vals.sort()
        n = len(vals)
        for q, v in zip((0.25, 0.5, 0.75), got[status]):
            # GK guarantee: the returned value's rank is within
            # n/accuracy of the target rank (allow ±1 for rank
            # convention at boundaries)
            import bisect

            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v) - 1
            target = q * n
            tol = n / PCT_ACCURACY + 1
            assert lo - tol <= target <= hi + tol + 1, (
                status,
                q,
                v,
                (lo, hi, target),
            )


def test_percentiles_approx_audit_all_green(spark, sf_dir):
    """The declared query's in-engine rank-error audit must certify
    every quantile of every group (this is what the DuckDB oracle
    asserts as literal 1s)."""
    rows = QUERIES["q_percentiles_approx"](spark, sf_dir).collect()
    assert rows, "orders fixture is non-empty"
    for r in rows:
        assert (r.q25_ok, r.q50_ok, r.q75_ok) == (1, 1, 1), r
        assert r.n_orders > 0


def test_heavy_hitters_equals_exact(spark, sf_dir):
    got = {
        (r.user_id, r.n_events)
        for r in QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    }
    counts = (
        spark.table("events").groupBy("user_id").agg(F.count("*").alias("n"))
    )
    total = spark.table("events").count()
    expect = {
        (r.user_id, r.n)
        for r in counts.collect()
        if r.n > HH_SUPPORT * total
    }
    assert got == expect


def test_hll_sketch_mergeability(spark, sf_dir):
    """Union of per-group HLL sketches must equal one global sketch —
    same algorithm, same hashes, so EXACT equality, not approximate.
    This is what makes per-partition sketch rollups sound."""
    toks = spark.table("documents").select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    direct = toks.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("tok")).alias("est")
    ).collect()[0][0]
    merged = (
        toks.groupBy("lang")
        .agg(F.hll_sketch_agg("tok").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0][0]
    )
    assert merged == direct
    # and the estimate is actually close to truth
    exact = toks.select("tok").distinct().count()
    assert math.isclose(merged, exact, rel_tol=0.05)


def test_percentiles_audit_ignores_null_prices(spark, sf_dir):
    """percentile_approx ranks only non-null values; the audit must
    count the same population or null prices inflate p·n past what
    the sketch saw and false-fail the ok-flags."""
    semantics.ensure_views(spark, sf_dir)
    base = spark.table("orders").select("o_orderstatus", "o_totalprice")
    n_real = base.filter(F.col("o_totalprice").isNotNull()).count()
    try:
        # plant one null price per group plus an ALL-null group
        nulls = base.select("o_orderstatus").distinct().select(
            "o_orderstatus", F.lit(None).cast("double").alias("o_totalprice")
        ).union(
            spark.createDataFrame(
                [("Z", None), ("Z", None)],
                "o_orderstatus string, o_totalprice double",
            )
        )
        base.unionByName(nulls).createOrReplaceTempView("orders")
        rows = QUERIES["q_percentiles_approx"].__wrapped__(spark, "").collect()
        assert sum(r.n_orders for r in rows) == n_real
        assert all((r.q25_ok, r.q50_ok, r.q75_ok) == (1, 1, 1) for r in rows)
        # the all-null group has no ranked population: dropped entirely
        assert "Z" not in {r.o_orderstatus for r in rows}
    finally:
        semantics.ensure_views(spark, sf_dir)
