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
    oracle="""
SELECT itemID, taskID
FROM tasks
WHERE ItemState = 'todo'
""",
    needs_views=("tasks",),
)
def q_rand_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 random work-order shuffle (client.py:133, runner.py:97):
    seeded rand so the run is reproducible within Spark. Oracle-checked
    as of r09: the driver's value hash is ORDER-INSENSITIVE (rows are
    canonicalized sorted), so while DuckDB's PRNG can never replay the
    ordering, the shuffled CONTENT — exactly the todo items, each once
    — is fully checkable; the ordering properties themselves
    (reproducibility, actual permutation) stay pinned by
    tests/test_randomized_parity.py."""
    from pyanamo_spark import semantics  # noqa: F401

    return (
        spark.table("tasks")
        .filter(F.col("ItemState") == "todo")
        .select("itemID", "taskID")
        .orderBy(F.rand(42))
    )


#: O4 sample size (`aws s3 ls | sort -R | head`)
SAMPLE_K = 10


def sample_topk(spark: SparkSession) -> DataFrame:
    """Raw O4 random sample (library form): seeded rand + limit —
    reproducible within Spark, PRNG-divergent across engines."""
    return (
        spark.table("tasks")
        .select("itemID", "taskID")
        .orderBy(F.rand(42))
        .limit(SAMPLE_K)
    )


@register(
    "q_sample_topk",
    oracle=f"""
SELECT CAST(LEAST({SAMPLE_K}, COUNT(*)) AS BIGINT) AS n_sampled,
       CAST(1 AS INTEGER) AS from_tasks_ok,
       CAST(1 AS INTEGER) AS distinct_ok
FROM tasks
""",
    needs_views=("tasks",),
)
def q_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 random input sampling, audited (the in-engine certification
    pattern): the sampled ROWS are PRNG-specific, but the sample's
    guarantees are not — exactly LEAST(k, |tasks|) rows, every one a
    real task, no row twice. The declared output emits those three
    facts as scalars the oracle re-derives/asserts; the raw sample
    stays available as ``sample_topk``."""
    s = sample_topk(spark)
    member = (
        spark.table("tasks")
        .select("itemID", "taskID")
        .dropDuplicates(["itemID", "taskID"])
        .withColumn("_in", F.lit(1))
    )
    joined = s.join(member, ["itemID", "taskID"], "left")
    return joined.agg(
        F.count("*").alias("n_sampled"),
        F.coalesce(F.min(F.coalesce(F.col("_in"), F.lit(0))), F.lit(1))
        .cast("int")
        .alias("from_tasks_ok"),
        (
            F.count_distinct(F.col("itemID"), F.col("taskID"))
            == F.count("*")
        )
        .cast("int")
        .alias("distinct_ok"),
    )
