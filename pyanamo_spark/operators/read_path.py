"""Read path — the client.py query surface, Spark-first.

Reference behaviors rebuilt (SURVEY.md §2.2/§2.4/§2.6):
  - getToDoItems state query + ProjectionExpression
    (/root/reference/code/client.py:74-135) → filter + select; the GSI
    seek (client.py:88) becomes partition pruning when the tasks table
    is partitioned by ItemState — Catalyst prunes for free.
  - point lookups (client.py:139-184) → key-equality filter.
  - itemCounter (client.py:188-219) → one groupBy instead of three
    sequential index queries; map-side partial aggregation means no
    driver materialization (the reference pulls every item into RAM).
  - random work-order shuffle (client.py:133) → seeded orderBy(rand)
    — obsolete on Spark (the scheduler assigns disjoint partitions;
    SURVEY §4 R5) but kept for parity.

At 100 TB: all of these are scan+filter+project plans whose predicates
and projections push down to parquet; the only shuffle is the single
groupBy in the counter, on a 4-value key (tiny exchange after partial
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def _tasks(spark: SparkSession) -> DataFrame:
    return spark.table("tasks")


@register(
    "q_filter_project",
    oracle="""
SELECT itemID, taskID, ItemState
FROM tasks
WHERE ItemState = 'todo'
""",
    needs_views=("tasks",),
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 getToDoItems: state equi-filter + field projection
    (client.py:74-135; projection build 96-120)."""
    return (
        _tasks(spark)
        .filter(F.col("ItemState") == "todo")
        .select("itemID", "taskID", "ItemState")
    )


@register(
    "q_point_lookup",
    oracle="""
SELECT itemID, ItemState
FROM tasks
WHERE itemID = 'item_42'
""",
    needs_views=("tasks",),
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 getCurrentState: point lookup by itemID projecting ItemState
    (client.py:139-159); P3 getLockID (client.py:163-184) is the same
    plan shape with a different projected column."""
    return (
        _tasks(spark)
        .filter(F.col("itemID") == "item_42")
        .select("itemID", "ItemState")
    )


@register(
    "q_state_counts",
    oracle="""
SELECT ItemState, COUNT(*) AS n_items,
       string_agg(itemID, ',' ORDER BY itemID) AS items
FROM tasks
WHERE ItemState IN ('todo', 'locked', 'done')
GROUP BY ItemState
""",
    needs_views=("tasks",),
)
def q_state_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 itemCounter: per-state counts + item lists for
    todo/locked/done (client.py:188-219). The reference runs three
    index queries and counts client-side; here one partial-aggregated
    groupBy on a 3-value key."""
    return (
        _tasks(spark)
        .filter(F.col("ItemState").isin("todo", "locked", "done"))
        .groupBy("ItemState")
        .agg(
            F.count("*").alias("n_items"),
            F.array_join(F.sort_array(F.collect_list("itemID")), ",").alias(
                "items"
            ),
        )
    )


@register(
    "q_limit",
    oracle="""
SELECT itemID, taskID, ItemState
FROM tasks
ORDER BY itemID
LIMIT 10
""",
    needs_views=("tasks",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 head/limit probes (gVCF_Check.sh:13, managing-item-logs.py:188)
    — deterministic via orderBy before limit (a TakeOrderedAndProject
    plan: no full sort, no full shuffle)."""
    return (
        _tasks(spark)
        .select("itemID", "taskID", "ItemState")
        .orderBy("itemID")
        .limit(10)
    )


@register(
    "q_nest_filter",
    oracle="""
SELECT itemID, nestID, script
FROM nests
WHERE status = 'todo'
""",
    needs_views=("tasks", "nests"),
)
def q_nest_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 nest-status filter (runner.py:101-105): skip nests whose
    Status != 'todo' — the per-item Python loop becomes a filter over
    the exploded nest table."""
    return (
        spark.table("nests")
        .filter(F.col("status") == "todo")
        .select("itemID", "nestID", "script")
    )


@register(
    "q_rand_order",
    oracle=None,
    rows_only_reason=(
    "seeded rand() — reproducible within Spark, but DuckDB's PRNG"
    " differs so engines can never hash-agree; row count and schema"
    " are still driver-checked"
    ),
)
def q_rand_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 random work-order shuffle (client.py:133, runner.py:97):
    seeded rand so the run is reproducible within Spark; declared
    rows-only since DuckDB's PRNG differs (SURVEY §7.4.3)."""
    from pyanamo_spark import semantics  # noqa: F401

    return (
        spark.table("tasks")
        .filter(F.col("ItemState") == "todo")
        .select("itemID", "taskID")
        .orderBy(F.rand(42))
    )


@register(
    "q_sample_topk",
    oracle=None,
    rows_only_reason=(
    "seeded random sample — same PRNG-divergence contract as"
    " q_rand_order; sample size is pinned by tests"
    ),
)
def q_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 random input sampling (`aws s3 ls | sort -R | head`,
    Tailoring the Example Docker.md:160) → seeded rand + limit;
    rows-only for the same PRNG reason as q_rand_order."""
    return (
        spark.table("tasks")
        .select("itemID", "taskID")
        .orderBy(F.rand(42))
        .limit(10)
    )
