"""Randomized parity: the distributed operators must match independent
pure-Python reference implementations on randomized inputs (fixed
seeds — deterministic, but none of the structure is hand-picked).
Stronger than the planted-case tests: the reference recomputes the
whole answer a different way."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("planted_views")


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_pagerank_matches_numpy_reference(spark, seed):
    """Random bipartite graphs: the Spark fixpoint must agree with a
    dense numpy implementation of the identical recurrence to 1e-5."""
    from pyanamo_spark.operators.graph import q_pagerank

    rng = np.random.RandomState(seed)
    pairs = {
        (int(rng.randint(1, 40)), int(rng.randint(1, 12)))
        for _ in range(120)
    }
    spark.createDataFrame(
        sorted(pairs), "l_partkey long, l_suppkey long"
    ).createOrReplaceTempView("lineitem")

    # reference: dense damped iteration over the symmetric edge set
    nodes = sorted({f"p{p}" for p, _ in pairs} | {f"s{s}" for _, s in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    out_edges = defaultdict(list)
    for p, s in pairs:
        out_edges[f"p{p}"].append(f"s{s}")
        out_edges[f"s{s}"].append(f"p{p}")
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for u, outs in out_edges.items():
            share = 0.85 * r[idx[u]] / len(outs)
            for v in outs:
                nxt[idx[v]] += share
        r = nxt

    got = {
        row["node"]: row["pagerank"]
        for row in q_pagerank.__wrapped__(spark, "").collect()
    }
    assert set(got) == set(nodes)
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-5), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


@pytest.mark.parametrize("seed", [3, 17])
def test_mv_refresh_matches_full_recompute(spark, seed):
    """Random order tables: the incremental signed-delta merge must
    equal a pandas recompute of the mutated table exactly."""
    from pyanamo_spark.operators.cdc import (
        _DEL_MOD,
        _INS_MOD,
        _UPD_MOD,
        q_mv_refresh,
    )

    rng = np.random.RandomState(seed)
    d0 = dt.date(2024, 1, 1)
    n_rows = 600
    keys = rng.choice(np.arange(1, 5000), size=n_rows, replace=False)
    prios = rng.choice(["P1", "P2", "P3"], size=n_rows)
    prices = np.round(rng.uniform(10, 1000, size=n_rows), 2)
    rows = [
        (int(k), 1, d0, float(p), str(pr))
        for k, p, pr in zip(keys, prices, prios)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double, o_orderpriority string",
    ).createOrReplaceTempView("orders")

    # reference: apply the moduli mutations in plain Python, re-aggregate
    agg: dict = defaultdict(lambda: [0, 0.0])
    for k, _, _, price, prio in rows:
        if k % _DEL_MOD == 0:
            pass  # deleted
        else:
            p = price + 1.0 if k % _UPD_MOD == 0 else price
            agg[prio][0] += 1
            agg[prio][1] += p
        if k % _INS_MOD == 0:  # inserted copy keeps the original price
            agg[prio][0] += 1
            agg[prio][1] += price
    expected = {
        prio: (c, round(s, 2)) for prio, (c, s) in agg.items() if c > 0
    }

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in q_mv_refresh.__wrapped__(spark, "").collect()
    }
    assert got.keys() == expected.keys()
    for prio, (c, s) in expected.items():
        assert got[prio][0] == c, prio
        assert got[prio][1] == pytest.approx(s, abs=0.011), prio


@pytest.mark.parametrize("seed", [5, 41])
def test_survival_matches_python_km(spark, seed):
    """Random user histories: the windowed Kaplan-Meier must match a
    literal product-form implementation."""
    from pyanamo_spark.operators.cohort import q_survival

    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    horizon = 60
    rows, eid = [], 0
    spans = {}
    for user in range(1, 26):
        start = int(rng.randint(0, 40))
        length = int(rng.randint(0, 20))
        end = min(start + length, horizon)
        spans[user] = (start, end)
        for day in (start, end):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(days=day), user, "view", 0.0)
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")

    corpus_end = max(end for _, end in spans.values())
    durs = sorted(
        (end - start, end < corpus_end - 7)
        for start, end in spans.values()
    )
    # reference KM over distinct durations
    at_risk = len(durs)
    surv, curve = 1.0, {}
    for d in sorted({d for d, _ in durs}):
        deaths = sum(1 for x, obs in durs if x == d and obs)
        leaving = sum(1 for x, _ in durs if x == d)
        if deaths >= at_risk:
            surv = 0.0
        elif deaths:
            surv *= 1 - deaths / at_risk
        curve[d] = (deaths, at_risk, surv)
        at_risk -= leaving

    got = {
        r["duration_days"]: (r["deaths"], r["at_risk"], r["survival"])
        for r in q_survival.__wrapped__(spark, "").collect()
    }
    assert got.keys() == curve.keys()
    for d, (deaths, risk, surv) in curve.items():
        gd, gr, gs = got[d]
        assert (gd, gr) == (deaths, risk), d
        assert gs == pytest.approx(surv, abs=1e-6), d


@pytest.mark.parametrize("seed", [11])
def test_transitions_match_python_counts(spark, seed):
    """Random event streams: counts and row-normalized probabilities
    must match a literal per-user fold."""
    from pyanamo_spark.operators.graph import q_transitions

    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2024, 1, 1)
    states = ["a", "b", "c", "d"]
    rows = []
    per_user = defaultdict(list)
    for eid in range(400):
        user = int(rng.randint(1, 15))
        typ = states[rng.randint(len(states))]
        ts = t0 + dt.timedelta(minutes=eid)
        rows.append((eid, ts, user, typ, 0.0))
        per_user[user].append((ts, eid, typ))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).createOrReplaceTempView("events")

    counts: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    row_tot: Counter = Counter()
    for (a, _), n in counts.items():
        row_tot[a] += n

    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in q_transitions.__wrapped__(spark, "").collect()
    }
    assert got.keys() == set(counts)
    for key, n in counts.items():
        assert got[key][0] == n
        assert got[key][1] == pytest.approx(
            round(n / row_tot[key[0]], 6), abs=1e-6
        )


@pytest.mark.parametrize("seed", [13, 59])
def test_gini_matches_numpy_reference(spark, seed):
    """Random revenue vectors: rank-sum Gini and top-decile share must
    match the direct numpy formula."""
    from pyanamo_spark.operators.analytics import q_gini

    rng = np.random.RandomState(seed)
    d0 = dt.date(2024, 1, 1)
    n = 80
    rev = np.round(rng.lognormal(5, 1.2, size=n), 2)
    rows = [(i, i, d0, float(rev[i])) for i in range(n)]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    ).createOrReplaceTempView("orders")

    x = np.sort(rev)
    ranks = np.arange(1, n + 1)
    gini = 2 * (ranks * x).sum() / (n * x.sum()) - (n + 1) / n
    top = x[ranks > 0.9 * n].sum() / x.sum()

    r = q_gini.__wrapped__(spark, "").collect()[0]
    assert r["n_entities"] == n
    assert r["gini"] == pytest.approx(gini, abs=1e-6)
    assert r["top_decile_share"] == pytest.approx(top, abs=1e-6)
    assert 0 <= r["gini"] < 1


def test_rand_order_is_a_reproducible_permutation(spark, sf_dir):
    """O1: the shuffled output is exactly the todo set (what the r09
    oracle now hash-checks, order-insensitively) and the seeded
    ORDERING — which no oracle can see — is a reproducible permutation,
    not sorted order."""
    from pyanamo_spark import semantics
    from pyanamo_spark.registry import QUERIES

    semantics.ensure_views(spark, sf_dir)
    a = [tuple(r) for r in QUERIES["q_rand_order"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["q_rand_order"](spark, sf_dir).collect()]
    assert a == b  # seeded: same order every run
    todo = {
        tuple(r)
        for r in spark.table("tasks")
        .filter("ItemState = 'todo'")
        .select("itemID", "taskID")
        .collect()
    }
    assert set(a) == todo and len(a) == len(todo)
    assert a != sorted(a)  # actually shuffled


def test_sample_topk_library_and_audit(spark, sf_dir):
    """O4: the raw sample is a reproducible k-subset of tasks; the
    declared audit certifies size/membership/distinctness (the r09
    oracle's literal flags)."""
    from pyanamo_spark import semantics
    from pyanamo_spark.operators.read_path import SAMPLE_K, sample_topk
    from pyanamo_spark.registry import QUERIES

    semantics.ensure_views(spark, sf_dir)
    s1 = sorted(tuple(r) for r in sample_topk(spark).collect())
    s2 = sorted(tuple(r) for r in sample_topk(spark).collect())
    assert s1 == s2
    tasks = {
        tuple(r)
        for r in spark.table("tasks").select("itemID", "taskID").collect()
    }
    assert len(s1) == min(SAMPLE_K, len(tasks))
    assert set(s1) <= tasks
    audit = QUERIES["q_sample_topk"](spark, sf_dir).collect()
    assert len(audit) == 1
    r = audit[0]
    assert (r.n_sampled, r.from_tasks_ok, r.distinct_ok) == (
        min(SAMPLE_K, len(tasks)), 1, 1,
    )
