"""Regression: ensure_views must re-register when the sf_dir changes
within one session (a stale memo would silently serve the previous
directory's data)."""

from __future__ import annotations

from pyanamo_spark import semantics


def test_ensure_views_tracks_sf_dir_changes(spark):
    semantics.ensure_views(spark, "/root/testdata/sf0.001")
    n_small = spark.table("tasks").count()
    semantics.ensure_views(spark, "/root/testdata/sf0.01")
    n_big = spark.table("tasks").count()
    assert n_big == 10 * n_small  # orders scale ×10 per sf step
    # and switching back re-registers again
    semantics.ensure_views(spark, "/root/testdata/sf0.001")
    assert spark.table("tasks").count() == n_small


def test_global_rank_single_range_exchange(spark):
    """global_rank_frame's r10 lazy form hangs two consumers (the
    pid-count aggregate and the ranking pass) off ONE
    repartitionByRange: ranks must be exact against a driver sort,
    and the executed plan must show the exchange REUSED, not
    recomputed — pid consistency between the passes rides on it."""
    import random

    from pyspark.sql import functions as F

    from pyanamo_spark.operators.windows import global_rank_frame

    vals = list(range(1000))
    random.Random(7).shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "k long"
    ).repartition(8)
    out = global_rank_frame(df, "k", base=1)
    got = {r.k: r.rank for r in out.collect()}
    assert got == {v: v + 1 for v in range(1000)}
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "ReusedExchange" in plan, plan[:2000]


import pytest  # noqa: E402


@pytest.mark.parametrize(
    "name", ["q_gini", "q_curriculum", "q_global_ids", "q_zipf"]
)
def test_global_rank_consumers_reuse_range_exchange(spark, name):
    """ADVICE r10 (medium): rank correctness in the lazy
    global_rank_frame depends on ReuseExchange deduplicating the range
    exchange between the pid-count pass and the ranking pass — if
    reuse silently failed (complex consumer plan, AQE re-plan, Spark
    upgrade), a recomputed repartitionByRange could re-sample
    different boundaries and the two passes would disagree on
    pid→range mapping, corrupting ranks SILENTLY. Pin the reuse in
    every registered consumer's EXECUTED plan, not just the trivial
    synthetic shape above."""
    from pyanamo_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows  # executed — the adaptive plan below is final
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "ReusedExchange" in plan, (
        f"{name}: executed plan shows NO ReusedExchange — the "
        f"global_rank_frame pid-count and ranking passes each "
        f"computed their own range exchange, so ranks are not "
        f"guaranteed consistent\n{plan[:3000]}"
    )
