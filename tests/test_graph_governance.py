"""Behavioral checks for the graph and governance operators beyond the
oracle-parity harness: structural PageRank properties on a planted hub
graph, transition-matrix row-stochasticity, a planted k-anonymity
violation, and hand-built attribution paths."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("planted_views")


def _plant_lineitem(spark, pairs):
    """Minimal lineitem view carrying just the (part, supplier) pairs."""
    spark.createDataFrame(
        [(p, s) for p, s in pairs], "l_partkey long, l_suppkey long"
    ).createOrReplaceTempView("lineitem")


def test_pagerank_hub_outranks_leaf_and_mass_conserves(spark):
    """Star supplier s1 serves parts 1..8, s2 serves only part 9 (which
    is also served by s1, keeping the graph connected): the hub must
    outrank the leaf supplier, and total rank mass must stay 1 (the
    symmetric graph has no dangling nodes)."""
    from pyanamo_spark.operators.graph import q_pagerank

    _plant_lineitem(
        spark, [(p, 1) for p in range(1, 9)] + [(9, 1), (9, 2)]
    )
    ranks = {
        r["node"]: r["pagerank"]
        for r in q_pagerank.__wrapped__(spark, "").collect()
    }
    assert ranks["s1"] > ranks["s2"]
    # every part served only by s1 ranks below the hub too
    assert ranks["s1"] > ranks["p1"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-3


def test_pagerank_symmetric_nodes_tie(spark):
    """Two suppliers with identical connectivity get identical rank —
    the recurrence must not depend on node ids or input order."""
    from pyanamo_spark.operators.graph import q_pagerank

    _plant_lineitem(spark, [(1, 1), (2, 1), (1, 2), (2, 2)])
    ranks = {
        r["node"]: r["pagerank"]
        for r in q_pagerank.__wrapped__(spark, "").collect()
    }
    assert ranks["s1"] == ranks["s2"]
    assert ranks["p1"] == ranks["p2"]


def test_transitions_rows_are_stochastic(spark):
    """Per-prev-state probabilities sum to 1 and counts match the
    hand-traced path a→b→a→c for one user."""
    from pyanamo_spark.operators.graph import q_transitions

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 7, typ, 0.0)
        for i, typ in enumerate(["a", "b", "a", "c"])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    got = q_transitions.__wrapped__(spark, "").collect()
    trans = {(r["prev_type"], r["next_type"]): (r["n"], r["p"]) for r in got}
    assert trans == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_kanon_flags_planted_unique_row(spark):
    """Six clones of one quasi-identifier tuple are safe at k=5; a
    single distinct row in the same nation is a risky group of 1."""
    from pyanamo_spark.operators.governance import q_kanon

    rows = [(i, "x", 3, 1500.0, "SEG_A") for i in range(6)]
    rows.append((99, "y", 3, 8500.0, "SEG_B"))
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).createOrReplaceTempView("customer")
    out = q_kanon.__wrapped__(spark, "").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_groups"], r["risky_groups"], r["risky_rows"]) == (2, 1, 1)
    assert r["min_group_size"] == 1
    assert r["risk_rate"] == pytest.approx(1 / 7, abs=1e-6)


def test_attribution_first_last_and_direct(spark):
    """User 1: click → view → purchase attributes (first=click,
    last=view). User 2 purchases with no prior touch → direct/direct.
    Touches AFTER a purchase must not attribute to it."""
    from pyanamo_spark.operators.governance import q_attribution

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)

    def ev(i, user, typ, val=10.0):
        return (i, t0 + dt.timedelta(minutes=i), user, typ, val)

    rows = [
        ev(1, 1, "click"),
        ev(2, 1, "view"),
        ev(3, 1, "purchase", 100.0),
        ev(4, 1, "signup"),  # after the purchase: must not count
        ev(5, 2, "purchase", 40.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")
    got = {
        (r["first_touch"], r["last_touch"]): (r["conversions"], r["revenue"])
        for r in q_attribution.__wrapped__(spark, "").collect()
    }
    assert got == {
        ("click", "view"): (1, 100.0),
        ("direct", "direct"): (1, 40.0),
    }


def test_rolling_median_odd_and_even_frames(spark):
    """Median of [10] → 10; [10,30] → 20; [10,30,20] → 20 — exact
    bounded-frame semantics including the even-frame midpoint."""
    from pyanamo_spark.operators.windows import q_rolling_median

    d0 = dt.date(2024, 5, 1)
    rows = [
        (1, 7, d0, 10.0),
        (2, 7, d0 + dt.timedelta(days=1), 30.0),
        (3, 7, d0 + dt.timedelta(days=2), 20.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    ).createOrReplaceTempView("orders")
    got = {
        r["o_orderkey"]: r["rolling_median"]
        for r in q_rolling_median.__wrapped__(spark, "").collect()
    }
    assert got == {1: 10.0, 2: 20.0, 3: 20.0}


def test_curriculum_phases_are_ordered_and_balanced(spark):
    """Phase boundaries must not interleave (max difficulty of phase k
    ≤ min of phase k+1) and phase sizes differ by at most 1."""
    from pyanamo_spark.operators.curation import q_curriculum

    rows = [
        (i, "w " * (i % 7 + 1) + "x" * (3 * i % 11), (i % 7 + 1) * 2 + 3 * i % 11)
        for i in range(22)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars int"
    ).createOrReplaceTempView("documents")
    out = sorted(
        q_curriculum.__wrapped__(spark, "").collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in out] == [1, 2, 3, 4]
    sizes = [r["n_docs"] for r in out]
    assert sum(sizes) == 22 and max(sizes) - min(sizes) <= 1
    for lo, hi in zip(out, out[1:]):
        assert lo["max_difficulty"] <= hi["min_difficulty"]
