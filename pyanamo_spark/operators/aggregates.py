"""Aggregations — manager.py/executor.py analytics, Spark-first.

The flagship reference question is "how far along is my workflow?"
(/root/reference/README.md:11): state counts + the nested-task progress
histogram. The reference computes both client-side over fully
materialized scans; here they are partial-aggregated groupBys that never
leave the cluster.

Bucket semantics preserved exactly from
/root/reference/code/manager.py:880-903 (see semantics.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: pct expression must be identical in both engines: double divide, *100,
#: truncate — mirrors int(float(L/N)*100) at manager.py:880
_PCT_SQL = "CAST(FLOOR((CAST(Log_Length AS DOUBLE) / Nested_Tasks) * 100) AS BIGINT)"

_BUCKET_SQL = f"""
CASE
  WHEN pct = 0 THEN 'todo'
  WHEN pct >= 1 AND pct <= 25 THEN 'Q1'
  WHEN pct > 25 AND pct <= 50 THEN 'Q2'
  WHEN pct > 50 AND pct <= 75 THEN 'Q3'
  WHEN pct > 75 AND pct <= 99 THEN 'Q4'
  WHEN pct = 100 THEN 'done'
END
"""


@register(
    "q_progress_histogram",
    oracle=f"""
WITH locked AS (
  SELECT itemID, {_PCT_SQL} AS pct
  FROM tasks
  WHERE ItemState = 'locked' AND is_nested
),
bucketed AS (
  SELECT itemID, {_BUCKET_SQL} AS bucket FROM locked
  UNION ALL
  SELECT itemID, ItemState AS bucket FROM tasks
  WHERE ItemState IN ('todo', 'done')
)
SELECT bucket, COUNT(*) AS n_items,
       string_agg(itemID, ',' ORDER BY itemID) AS items
FROM bucketed
GROUP BY bucket
""",
    needs_views=("tasks",),
)
def q_progress_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 summarize_nestedTasks (manager.py:840-911): bucketized
    progress histogram. todo/done item states short-circuit to their
    buckets (manager.py:865-870); locked nested items are bucketized by
    pct = trunc(Log_Length/Nested_Tasks*100) (manager.py:880-903).

    Locked *single* items are excluded: the reference would KeyError on
    their missing Nested_Tasks — capability preserved, crash not.
    """
    tasks = spark.table("tasks")
    locked = (
        tasks.filter((F.col("ItemState") == "locked") & F.col("is_nested"))
        .withColumn("pct", F.expr(_PCT_SQL))
        .withColumn("bucket", F.expr(_BUCKET_SQL))
        .select("itemID", "bucket")
    )
    short_circuit = tasks.filter(
        F.col("ItemState").isin("todo", "done")
    ).select("itemID", F.col("ItemState").alias("bucket"))
    return (
        locked.unionAll(short_circuit)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_items"),
            F.array_join(F.sort_array(F.collect_list("itemID")), ",").alias(
                "items"
            ),
        )
    )


@register(
    "q_line_count",
    oracle="""
SELECT itemID, nestID,
       CAST(len(string_split(stdout, chr(10))) AS BIGINT) AS n_lines
FROM nests
WHERE status = 'done'
""",
    needs_views=("tasks", "nests"),
)
def q_line_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 Log_Length newline count: len(stdout.split('\\n')) per done
    task (executor.py:80)."""
    return (
        spark.table("nests")
        .filter(F.col("status") == "done")
        .select(
            "itemID",
            "nestID",
            F.size(F.split(F.col("stdout"), "\n")).cast("long").alias("n_lines"),
        )
    )


@register(
    "q_done_nests",
    oracle="""
SELECT itemID,
       COUNT(CASE WHEN status = 'done' THEN 1 END) AS done_nests
FROM nests
GROUP BY itemID
""",
    needs_views=("tasks", "nests"),
)
def q_done_nests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 done-nest counter: the reference maintains it as an atomic
    ADD per finished nest (modifier.py:240-249); recomputed here as a
    conditional count over the exploded nest table — idempotent, no
    read-modify-write."""
    return (
        spark.table("nests")
        .groupBy("itemID")
        .agg(F.count(F.when(F.col("status") == "done", 1)).alias("done_nests"))
    )


@register(
    "q_item_finalize",
    oracle="""
SELECT itemID,
       CASE WHEN COUNT(CASE WHEN status = 'done' THEN 1 END) = MAX(Nested_Tasks)
            THEN 'done' ELSE 'Wall_Time_Exceeded' END AS final_state
FROM nests
GROUP BY itemID
""",
    needs_views=("tasks", "nests"),
)
def q_item_finalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/M7 item-finalize predicate: Log_Length == Nested_Tasks → done
    else Wall_Time_Exceeded (modifier.py:193-203) — a conditional
    aggregate over the nest table instead of a per-item update."""
    return (
        spark.table("nests")
        .groupBy("itemID")
        .agg(
            F.when(
                F.count(F.when(F.col("status") == "done", 1))
                == F.max("Nested_Tasks"),
                "done",
            )
            .otherwise("Wall_Time_Exceeded")
            .alias("final_state")
        )
    )


@register(
    "q_width_profile",
    oracle="""
SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS width,
       COUNT(*) AS n_docs
FROM documents
GROUP BY width
""",
)
def q_width_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 record-width profile (`awk '{print NF}' | sort | uniq -c`,
    gVCF_Check.sh:15): distinct token-widths with counts, over the
    documents fixture."""
    return (
        spark.table("documents")
        .select(F.size(F.split(F.col("text"), " ")).cast("long").alias("width"))
        .groupBy("width")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q_threshold_counts",
    oracle="""
SELECT COUNT(CASE WHEN l_quantity > 10 THEN 1 END) AS gt_10,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS gt_25,
       COUNT(CASE WHEN l_quantity > 40 THEN 1 END) AS gt_40,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
FROM lineitem
""",
)
def q_threshold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10 threshold + line/variant counts (gVCF_Check.sh:14-30):
    the reference sorts then greps three times; one pass of conditional
    aggregates replaces `sort -n | awk '$1 > t' | wc -l` ×3 — no sort
    needed at all."""
    li = spark.table("lineitem")
    return li.agg(
        F.count(F.when(F.col("l_quantity") > 10, 1)).alias("gt_10"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("gt_25"),
        F.count(F.when(F.col("l_quantity") > 40, 1)).alias("gt_40"),
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
