"""The engine run — the reference's flagship path (SURVEY.md §3.1) as
one declarative pipeline.

Reference control flow (pyanamo.py:48-138 → runner.py:144-238):
fetch todo items → lock each (2 reads + 1 write + 1-4 s sleep) →
fork nest processes → Popen each script → write logs/state per nest →
finalize item → repeat until the wall-time budget trips.

Spark rebuild: ``read → filter(todo) → explode(nests) →
repartition(N) → mapInPandas(execute) → aggregate → finalize states →
write post-state + results``. The lock protocol disappears (the driver
assigns each partition to exactly one task — SURVEY §4 R6); the
two-level process pools become ``parallelism`` partitions (R7); the
wall-time budget is a driver-side TimeKeeper between batches (R10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.executor.pipe import execute_nests
from pyanamo_spark.executor.timekeeper import TimeKeeper


def instance_identity(spark: SparkSession) -> dict[str, str]:
    """F19: who-am-I introspection with a graceful fallback chain.

    The reference resolves batch-job id → cloud instance id → hostname
    (/root/reference/code/modifier.py:47-67) so every state write is
    attributable to a runner.  The Spark analogues, tried in order:
    the cluster-unique ``applicationId``, the driver-host conf, and
    finally the local hostname — the same "best id available, never
    fail" contract.
    """
    import socket

    sc = spark.sparkContext
    try:
        host = sc.getConf().get("spark.driver.host")
    except Exception:
        host = None
    return {
        "application_id": sc.applicationId,
        "runner_host": host or socket.gethostname(),
        "app_name": sc.appName,
    }


def run_engine(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    item_filter: str | None = None,
    parallelism: int = 8,
    wall_time_seconds: float | None = None,
) -> dict[str, DataFrame]:
    """Process every todo item end-to-end; write results + post-state.

    Returns {"results", "post_tasks", "summary"} DataFrames (reading
    back what was written, so callers observe the durable state).
    ``item_filter`` is a SQL predicate over the tasks view (e.g.
    "taskID = 'task_7'") bounding the work slice; ``wall_time_seconds``
    arms a TimeKeeper checked between the execute and finalize phases.
    """
    semantics.ensure_views(spark, sf_dir)
    keeper = (
        TimeKeeper(wall_time_seconds) if wall_time_seconds is not None else None
    )
    tasks = spark.table("tasks")
    if item_filter:
        tasks = tasks.filter(item_filter)
    todo = tasks.filter(F.col("ItemState") == "todo")

    # nested items: their still-todo nests; single items: one pseudo-nest
    # (Task_0, the whole task_script) — the reference's degenerate case
    # (runner.py:168,190-194)
    nested_work = (
        spark.table("nests")
        .join(todo.select("itemID"), "itemID", "left_semi")
        .filter(F.col("status") == "todo")
        .select("itemID", "nestID", "script")
    )
    single_work = todo.filter(~F.col("is_nested")).select(
        "itemID",
        F.lit("Task_0").alias("nestID"),
        F.col("task_script").alias("script"),
    )
    work = nested_work.unionByName(single_work)

    results = execute_nests(work, parallelism=parallelism)
    results_path = os.path.join(out_dir, "results")
    results.write.mode("overwrite").parquet(results_path)
    results = spark.read.parquet(results_path)

    if keeper:
        keeper.check()

    # finalize (modifier.py:193-203): a nested item is done when its
    # done-nest count — previously-done (its old Log_Length, Schema.md:40)
    # plus newly-succeeded — reaches Nested_Tasks; a single item is done
    # when its one pseudo-nest exited 0 and Log_Length becomes the stdout
    # newline count. Items with no pending nests finalize straight to
    # done (the reference's skip-all loop still finalizes,
    # runner.py:101-140).
    per_item = results.groupBy("itemID").agg(
        F.count("*").alias("n_run"),
        F.count(F.when(F.col("exit_code") == 0, 1)).alias("n_ok"),
        F.sum("n_lines").alias("total_lines"),
    )
    joined = tasks.join(per_item, "itemID", "left")
    is_todo = F.col("ItemState") == "todo"
    n_ok = F.coalesce(F.col("n_ok"), F.lit(0))
    n_run = F.coalesce(F.col("n_run"), F.lit(0))
    new_done_nests = F.col("Log_Length") + n_ok
    # Done_Date stamping (modifier.py:129-175): finalized items get the
    # reference's date string; failures carry the 'Error-' prefix
    # (modifier.py:167, preserved verbatim — SURVEY §7.4.2)
    from pyanamo_spark.semantics import DATE_FMT_SPARK

    now_str = F.date_format(F.current_timestamp(), DATE_FMT_SPARK)
    post = (
        joined.withColumn(
            "new_state",
            F.when(
                is_todo & F.col("is_nested"),
                F.when(
                    (n_ok == n_run)
                    & (new_done_nests == F.col("Nested_Tasks")),
                    "done",
                ).otherwise("Wall_Time_Exceeded"),
            )
            .when(
                is_todo,
                F.when(n_ok == n_run, "done").otherwise("Wall_Time_Exceeded"),
            )
            .otherwise(F.col("ItemState")),
        )
        .withColumn(
            "Log_Length",
            F.when(is_todo & F.col("is_nested"), new_done_nests)
            .when(is_todo, F.coalesce(F.col("total_lines"), F.lit(0)))
            .otherwise(F.col("Log_Length")),
        )
        .withColumn(
            "Done_Date",
            F.when(is_todo & (F.col("new_state") == "done"), now_str)
            .when(
                is_todo & (F.col("new_state") == "Wall_Time_Exceeded"),
                F.concat(F.lit("Error-"), now_str),
            )
            .otherwise(F.col("Done_Date")),
        )
        .drop("ItemState", "n_run", "n_ok", "total_lines")
        .withColumnRenamed("new_state", "ItemState")
    )
    post_path = os.path.join(out_dir, "post_tasks")
    # production: partition the post-state by ItemState so the hot
    # `ItemState = :s` predicate (the reference's GSIs) prunes partitions
    post.write.mode("overwrite").partitionBy("ItemState").parquet(post_path)
    post = spark.read.parquet(post_path)

    # F19: stamp the run summary with the runner's identity so durable
    # output is attributable, as the reference stamps DynamoDB writes
    ident = instance_identity(spark)
    summary = post.groupBy("ItemState").agg(F.count("*").alias("n_items"))
    for k, v in ident.items():
        summary = summary.withColumn(k, F.lit(v))
    return {"results": results, "post_tasks": post, "summary": summary}
