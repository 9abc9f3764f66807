"""Bloom-pruned and salted join: physical-shape assertions plus the
properties the oracle can't see (pruning is a true superset, the plan
actually exercises the technique instead of degenerating to a
broadcast join, a hot key's rows really spread across salt shards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark.functions.skew import salted_join
from pyanamo_spark.operators.scalejoins import (
    bloom_prune,
    bloom_words,
    q_bloom_join,
    q_salted_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prune_is_exact_superset(spark, sf_dir):
    """Every true join key survives pruning (no false negatives), and
    the survivor set stays close to the true match set (the m=2^20
    filter is effectively exact at fixture cardinalities)."""
    urgent = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = bloom_words(urgent.select("o_orderkey"), "o_orderkey")
    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey"
    )
    pruned = bloom_prune(fact, "l_orderkey", words)
    true_match = fact.join(
        urgent.select("o_orderkey"),
        fact.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    n_fact, n_pruned, n_true = (
        fact.count(),
        pruned.count(),
        true_match.count(),
    )
    # superset: nothing the join needs was dropped
    assert (
        true_match.join(pruned, "l_orderkey", "left_anti").count() == 0
    )
    # effective: the filter removed a meaningful share of the fact
    assert n_pruned < n_fact
    # tight: false-positive rows bounded (k=3, m=2^20 vs ~1.5k keys)
    assert n_pruned - n_true <= max(10, n_fact // 100)


def test_bloom_join_plan_shape(spark, sf_dir):
    """The final join must be sort-merge (MERGE hint honored — with a
    broadcast the bloom demo would be vacuous) and the k probes must be
    broadcast hash joins against the word table."""
    plan = _plan(q_bloom_join(spark, sf_dir))
    assert plan.count("SortMergeJoin") == 1
    assert plan.count("BroadcastHashJoin") == 3


def test_salted_join_plan_and_sharding(spark, sf_dir):
    """Plan is sort-merge on (key, salt); a hot key's fact rows land in
    >1 salt shard so no single task inherits the whole key."""
    plan = _plan(q_salted_join(spark, sf_dir))
    assert "SortMergeJoin" in plan
    # sharding: the heaviest custkey spreads across multiple salts
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k")
    )
    hot = orders.groupBy("k").count().orderBy(F.desc("count")).first()
    if hot["count"] >= 8:
        salted = orders.withColumn(
            "_salt",
            (F.monotonically_increasing_id() % 16).cast("int"),
        )
        shards = (
            salted.filter(F.col("k") == hot["k"])
            .select("_salt")
            .distinct()
            .count()
        )
        assert shards > 1


def test_salted_join_equals_plain_join(spark):
    """Row-identical to the plain inner join, including a hot key with
    80% of the fact and a dim key with no fact rows."""
    fact = spark.createDataFrame(
        [(1, i) for i in range(80)]
        + [(2, i) for i in range(15)]
        + [(3, i) for i in range(5)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cool"), (4, "orphan")],
        "k long, label string",
    )
    got = (
        salted_join(fact, dim, "k", n_salts=4)
        .groupBy("k", "label")
        .count()
        .orderBy("k")
        .collect()
    )
    want = (
        fact.join(dim, "k")
        .groupBy("k", "label")
        .count()
        .orderBy("k")
        .collect()
    )
    assert got == want
