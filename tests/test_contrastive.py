"""Contrastive triplet mining: planted near-dups become positives,
negatives are deterministic and never near-dups of their anchor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyanamo_spark.operators.contrastive import (
    global_ranks,
    mine_contrastive,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base + " extra tail words here"
    rows = [(1, base), (2, near)] + [
        (i, " ".join(f"w{i}_{j}" for j in range(40)))
        for i in range(3, 40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_global_ranks_contiguous(spark, corpus):
    ranks = {
        r.doc_id: r.rank
        for r in global_ranks(corpus.select("doc_id"), "doc_id").collect()
    }
    ids = sorted(ranks)
    assert sorted(ranks.values()) == list(range(len(ids)))
    # rank order follows key order
    assert [ranks[i] for i in ids] == list(range(len(ids)))


def test_planted_pair_becomes_triplets(spark, corpus):
    trips = mine_contrastive(spark, corpus).collect()
    assert trips, "planted near-dup must be mined"
    anchors = {(t.anchor_id, t.positive_id) for t in trips}
    assert anchors == {(1, 2)}
    for t in trips:
        assert t.negative_id not in (t.anchor_id, t.positive_id)
        assert t.jaccard >= 0.35
    # one row per slot (negatives distinct per slot hash)
    assert len(trips) <= 2
    # deterministic across runs
    again = mine_contrastive(spark, corpus).collect()
    assert sorted(map(tuple, trips)) == sorted(map(tuple, again))


def test_empty_corpus_yields_no_triplets(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert mine_contrastive(spark, empty).count() == 0


def test_contrastive_audit_flags_green_and_catch_regressions(spark, sf_dir):
    """The declared audit certifies the fixture (planted verdicts
    agree, triplet structure sound), and a sabotaged miner (drops all
    triplets) must flip the flags of expected planted pairs."""
    from pyanamo_spark import operators
    from pyanamo_spark.registry import QUERIES

    rows = QUERIES["q_contrastive_pairs"](spark, sf_dir).collect()
    assert rows and all(r.ok == 1 for r in rows)
    assert {r.kind for r in rows} == {"planted", "structure"}
    assert any(
        r.expected_match == 1 for r in rows if r.kind == "planted"
    ), "fixture must contain in-threshold planted pairs"
    mod = operators.contrastive
    orig = mod.mine_contrastive_parts
    try:
        # sabotage: the miner returns nothing (positives AND triplets)
        # — every expected planted pair must flip to ok=0
        mod.mine_contrastive_parts = lambda spark, corpus, **kw: tuple(
            df.filter("anchor_id < 0")
            for df in orig(spark, corpus, **kw)
        )
        broken = QUERIES["q_contrastive_pairs"](spark, sf_dir).collect()
    finally:
        mod.mine_contrastive_parts = orig
    assert all(
        r.ok == (0 if r.expected_match else 1)
        for r in broken
        if r.kind == "planted"
    )
