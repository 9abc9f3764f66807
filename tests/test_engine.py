"""End-to-end engine-run test (SURVEY.md §3.1): todo items → subprocess
execution → state finalize → durable post-state, on a bounded work
slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.engine import run_engine


def test_engine_processes_todo_slice(spark, sf_dir, tmp_path):
    out = run_engine(
        spark,
        sf_dir,
        str(tmp_path),
        item_filter="taskID = 'task_7'",
        parallelism=4,
    )
    semantics.ensure_views(spark, sf_dir)
    before = spark.table("tasks").filter("taskID = 'task_7'")
    n_todo_before = before.filter("ItemState = 'todo'").count()
    assert n_todo_before > 0

    post = out["post_tasks"]
    # every previously-todo item reached a terminal state (seq always
    # exits 0, so all should be done)
    assert post.filter("ItemState = 'todo'").count() == 0
    assert (
        post.filter("ItemState = 'done'").count()
        == n_todo_before + before.filter("ItemState = 'done'").count()
    )
    # non-todo items pass through untouched
    assert (
        post.filter("ItemState = 'locked'").count()
        == before.filter("ItemState = 'locked'").count()
    )

    # spot-check a result row against real seq semantics
    row = (
        out["results"]
        .filter("exit_code = 0 AND stdout <> ''")
        .orderBy("itemID", "nestID")
        .limit(1)
        .collect()
    )
    assert row, "engine must have produced at least one non-empty stdout"
    r = row[0]
    parts = r.stdout.strip().split("\n")
    assert all(p.lstrip("-").isdigit() for p in parts)

    # single items: Log_Length is the stdout newline count; nested:
    # the done-nest count — both must be consistent with results
    was_todo = {
        r.itemID
        for r in before.filter("ItemState = 'todo' AND NOT is_nested")
        .select("itemID")
        .collect()
    }
    done_single = [
        r
        for r in post.filter("ItemState = 'done' AND NOT is_nested")
        .select("itemID", "Log_Length")
        .collect()
        if r.itemID in was_todo
    ]
    if done_single:
        by_item = {
            r.itemID: r.n_lines
            for r in out["results"]
            .groupBy("itemID")
            .agg(F.sum("n_lines").alias("n_lines"))
            .collect()
        }
        for r in done_single[:5]:
            assert r.Log_Length == by_item[r.itemID]


def test_engine_post_state_partitioned_by_state(spark, sf_dir, tmp_path):
    run_engine(
        spark,
        sf_dir,
        str(tmp_path),
        item_filter="taskID = 'task_11'",
        parallelism=4,
    )
    import glob
    import os

    parts = glob.glob(os.path.join(str(tmp_path), "post_tasks", "ItemState=*"))
    # hive-partitioned by ItemState so state-predicate scans prune
    assert parts, "post_tasks must be partitioned by ItemState"


def test_instance_identity_fallback_chain(spark, sf_dir, tmp_path):
    """F19: the run is attributable — applicationId + host stamped on
    the summary (reference modifier.py:47-67 fallback chain)."""
    from pyanamo_spark.engine import instance_identity, run_engine

    ident = instance_identity(spark)
    assert ident["application_id"]  # local-* app id, never empty
    assert ident["runner_host"]
    out = run_engine(
        spark,
        sf_dir,
        str(tmp_path),
        item_filter="taskID = 'task_3'",
        parallelism=2,
    )
    row = out["summary"].limit(1).collect()[0]
    assert row["application_id"] == ident["application_id"]
    assert row["runner_host"] == ident["runner_host"]
