"""SemDeDup semantic prune: planted-duplicate recovery, keeper
choice, and no-duplicate silence."""

from __future__ import annotations

import pytest

from pyanamo_spark.dedup.semantic import semantic_prune


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _one_hot(i: int, d: int = 8, scale: float = 1.0) -> list[float]:
    v = [0.0] * d
    v[i % d] = scale
    return v


def test_planted_duplicates_pruned_to_min_id_keeper(spark):
    rows = [(i, _one_hot(i)) for i in range(16)]  # seed population
    # exact copies of vector 5 under higher ids
    rows += [(100, _one_hot(5)), (101, _one_hot(5, scale=2.0))]
    out = semantic_prune(_vecs(spark, rows)).collect()
    got = {r["vec_id"]: (r["cluster_id"], r["is_keeper"]) for r in out}
    # one-hot mod 8 makes {i, i+8} duplicate pairs for i in 0..7, and
    # the planted copies extend group 5 to {5, 13, 100, 101}; every
    # group's keeper is its min id
    assert set(got) == set(range(16)) | {100, 101}
    expect_cluster = {vid: vid % 8 for vid in range(16)}
    expect_cluster[100] = expect_cluster[101] = 5  # copies of e_5
    for vid, (cluster, keeper) in got.items():
        assert cluster == expect_cluster[vid]
        assert keeper is (vid == cluster)


def test_no_duplicates_is_silent(spark):
    rows = [(i, _one_hot(i)) for i in range(8)]  # all orthogonal
    assert semantic_prune(_vecs(spark, rows)).count() == 0


def test_null_embedding_ignored(spark):
    rows = [(i, _one_hot(i)) for i in range(8)]
    df = spark.createDataFrame(
        rows + [(99, None)], "vec_id long, embedding array<double>"
    )
    out = semantic_prune(df).collect()
    assert all(r["vec_id"] != 99 for r in out)


def test_semantic_audit_flags_green_and_catch_regressions(spark, sf_dir):
    """The declared audit certifies the fixture (planted identical
    copies pruned against their sources, well-formed clusters), and a
    sabotaged pruner (drops every group) must flip the copy flags."""
    from pyanamo_spark import semantics
    from pyanamo_spark.dedup import semantic as sem
    from pyanamo_spark.registry import QUERIES

    semantics.ensure_views(spark, sf_dir)
    rows = QUERIES["q_semantic_prune"](spark, sf_dir).collect()
    assert rows and all(r.ok == 1 for r in rows)
    kinds = {r.kind for r in rows}
    assert kinds == {"copy", "structure"}
    orig = sem.semantic_prune
    try:
        sem.semantic_prune = lambda vectors, **kw: orig(vectors, **kw).filter(
            "vec_id < 0"
        )
        broken = QUERIES["q_semantic_prune"](spark, sf_dir).collect()
    finally:
        sem.semantic_prune = orig
    assert all(r.ok == 0 for r in broken if r.kind == "copy")
