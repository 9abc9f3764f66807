"""State-machine writes as pure DataFrame→DataFrame transforms
(SURVEY.md §2.7).

The reference mutates DynamoDB rows in place (UpdateExpression per
item); at 100 TB the equivalent is a declarative transform producing
the post-state relation, written back with partition overwrite (or
Delta/Iceberg MERGE when a transactional format is adopted — the
transform is the same plan either way, SURVEY §7.4.5). Each declared
query returns the post-state so the oracle can check the update logic
itself.

The reference's lock protocol (M6, modifier.py:71-125) is NOT in any
hot path: Spark's driver assigns each partition to exactly one task,
which supersedes the optimistic lock + verify + 1-4 s sleep dance
(SURVEY §4 R5/R6) — that's a 2-8 s/item tax removed by construction.
The protocol's semantics are still covered: ``operators/locking.py``
implements the verify-lock dance (M6 + F12 lockID + F13 jitter) as a
deterministic, oracle-checked batch simulation (``q_lock_protocol``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


@register(
    "q_bulk_update",
    oracle="""
SELECT itemID,
       CASE WHEN taskID = 'task_7' AND ItemState = 'todo'
            THEN 'locked' ELSE ItemState END AS ItemState
FROM tasks
""",
    needs_views=("tasks",),
)
def q_bulk_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 updateItemStates (manager.py:248-274): bulk point-update of
    ItemState over an id set. The reference loops update_item per id;
    here one conditional projection over the whole table — the id set
    (taskID = 'task_7', todo) is a predicate, not a driver-side list."""
    return spark.table("tasks").select(
        "itemID",
        F.when(
            (F.col("taskID") == "task_7") & (F.col("ItemState") == "todo"),
            "locked",
        )
        .otherwise(F.col("ItemState"))
        .alias("ItemState"),
    )


@register(
    "q_item_reset",
    oracle="""
SELECT itemID,
       CASE WHEN hit THEN 'todo' ELSE ItemState END AS ItemState,
       CASE WHEN hit THEN 'NULL' ELSE lockID END AS lockID,
       CASE WHEN hit THEN 'NULL' ELSE InstanceID END AS InstanceID,
       CASE WHEN hit THEN 'NULL' ELSE Lock_Date END AS Lock_Date,
       CASE WHEN hit THEN 'NULL' ELSE Done_Date END AS Done_Date,
       CASE WHEN hit THEN 0 ELSE Log_Length END AS Log_Length
FROM (
  SELECT *, (ItemState = 'locked' AND taskID = 'task_3') AS hit FROM tasks
)
""",
    needs_views=("tasks",),
)
def q_item_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 reset_itemState (manager.py:465-549): full unlock — reset
    lockID, state, dates, InstanceID, Log_Length for stale locked
    items. Seven per-field UpdateExpressions in the reference collapse
    into one multi-column conditional projection."""
    hit = (F.col("ItemState") == "locked") & (F.col("taskID") == "task_3")

    def reset(col: str, value):
        return F.when(hit, value).otherwise(F.col(col)).alias(col)

    return spark.table("tasks").select(
        "itemID",
        reset("ItemState", F.lit("todo")),
        reset("lockID", F.lit("NULL")),
        reset("InstanceID", F.lit("NULL")),
        reset("Lock_Date", F.lit("NULL")),
        reset("Done_Date", F.lit("NULL")),
        reset("Log_Length", F.lit(0).cast("long")),
    )


@register(
    "q_map_update",
    oracle="""
SELECT itemID, nestID,
       CASE WHEN ItemState = 'locked' AND nest_idx = 0 AND status = 'todo'
            THEN 'done' ELSE status END AS status,
       CASE WHEN ItemState = 'locked' AND nest_idx = 0 AND status = 'todo'
            THEN 'PyAnamo:' || chr(9) || 'manual' ELSE stdout END AS stdout
FROM nests
""",
    needs_views=("tasks", "nests"),
)
def q_map_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 updateNestedItem (modifier.py:219-249): nested-path update of
    one Task_i entry (Log.<nest> = ..., TaskScript.<nest>.Status = done).
    In the exploded child-table model the per-key map surgery is a row
    update: mark each locked item's first still-todo nest done."""
    hit = (
        (F.col("ItemState") == "locked")
        & (F.col("nest_idx") == 0)
        & (F.col("status") == "todo")
    )
    return spark.table("nests").select(
        "itemID",
        "nestID",
        F.when(hit, "done").otherwise(F.col("status")).alias("status"),
        F.when(hit, F.concat(F.lit("PyAnamo:"), F.lit("\t"), F.lit("manual")))
        .otherwise(F.col("stdout"))
        .alias("stdout"),
    )


@register(
    "q_map_remove",
    oracle="""
SELECT itemID, nestID,
       CASE WHEN taskID = 'task_5' AND nestID = 'Task_2'
            THEN 'todo' ELSE status END AS status,
       CASE WHEN taskID = 'task_5' AND nestID = 'Task_2'
            THEN 'NULL' ELSE stdout END AS stdout
FROM nests
""",
    needs_views=("tasks", "nests"),
)
def q_map_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/M12 updateNestedItemState / delete_nestedTasks
    (manager.py:553-598, 727-793): reset one nest key — Status back to
    todo, REMOVE its Log entry. Map-entry removal becomes a row-level
    conditional reset ('NULL' sentinel restored, matching
    manager.py:295-298 semantics)."""
    hit = (F.col("taskID") == "task_5") & (F.col("nestID") == "Task_2")
    return spark.table("nests").select(
        "itemID",
        "nestID",
        F.when(hit, "todo").otherwise(F.col("status")).alias("status"),
        F.when(hit, "NULL").otherwise(F.col("stdout")).alias("stdout"),
    )


@register(
    "q_delete_anti",
    oracle="""
SELECT itemID, taskID
FROM tasks
WHERE itemID NOT IN (SELECT itemID FROM tasks WHERE taskID = 'task_9')
""",
    needs_views=("tasks",),
)
def q_delete_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 delete_singleItem (manager.py:690-723): batch delete by id
    list → left-anti join against the doomed-id set; the surviving
    relation is the post-state."""
    tasks = spark.table("tasks")
    doomed = tasks.filter(F.col("taskID") == "task_9").select("itemID")
    return tasks.join(doomed, "itemID", "left_anti").select("itemID", "taskID")


@register(
    "q_merge_upsert",
    oracle="""
WITH source AS (
  SELECT itemID, 'done' AS ItemState, Log_Length + 1 AS Log_Length
  FROM tasks WHERE taskID = 'task_2'
  UNION ALL
  SELECT 'item_new_' || CAST(i AS STRING) AS itemID,
         'todo' AS ItemState, CAST(0 AS BIGINT) AS Log_Length
  FROM generate_series(0, 4) AS g(i)
)
SELECT t.itemID,
       COALESCE(s.ItemState, t.ItemState) AS ItemState,
       COALESCE(s.Log_Length, t.Log_Length) AS Log_Length
FROM tasks t LEFT JOIN source s USING (itemID)
UNION ALL
SELECT s.itemID, s.ItemState, s.Log_Length
FROM source s ANTI JOIN tasks t USING (itemID)
""",
    needs_views=("tasks",),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a transform: WHEN MATCHED THEN UPDATE, WHEN NOT
    MATCHED THEN INSERT — the Delta/Iceberg MERGE semantics over the
    plain-parquet post-state model (SURVEY §7.4.5). The source batch is
    a deterministic re-ingest: every task_2 item finalized (state done,
    log grown), plus five brand-new todo items.

    Scale plan: NOT a full-outer join (which would shuffle every
    target column both ways). Updates apply via a *broadcast* left
    join — the source batch is small by construction, so the 100 TB
    target never moves; inserts come from a left-anti of the source
    against the target's key column only. Production then writes the
    union back with partition overwrite (or hands the same source to
    MERGE INTO on a transactional table format — same plan shape,
    file-pruned)."""
    t = spark.table("tasks")
    target = t.select("itemID", "ItemState", "Log_Length")
    upd_src = t.filter(F.col("taskID") == "task_2").select(
        "itemID",
        F.lit("done").alias("ItemState"),
        (F.col("Log_Length") + 1).alias("Log_Length"),
    )
    new_src = spark.range(5).select(
        F.concat(F.lit("item_new_"), F.col("id").cast("string")).alias(
            "itemID"
        ),
        F.lit("todo").alias("ItemState"),
        F.lit(0).cast("long").alias("Log_Length"),
    )
    source = upd_src.unionByName(new_src)
    return merge_frames(target, source, "itemID")


def merge_frames(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """The MERGE post-state: WHEN MATCHED update every shared non-key
    column, WHEN NOT MATCHED insert. Broadcast left join + left-anti —
    the target never shuffles (see q_merge_upsert's scale note)."""
    cols = [c for c in target.columns if c != key]
    updated = (
        target.alias("t")
        .join(F.broadcast(source).alias("s"), key, "left")
        .select(
            key,
            *[F.coalesce(f"s.{c}", f"t.{c}").alias(c) for c in cols],
        )
    )
    inserts = source.select(key, *cols).join(
        target.select(key), key, "left_anti"
    )
    return updated.unionByName(inserts)


def merge_upsert_commit(
    spark: SparkSession, table_dir: str, source: DataFrame, key: str
) -> int:
    """q_merge_upsert's WRITE path: apply ``merge_frames`` against the
    committed snapshot and publish the post-state as the next snapshot
    (sources/snapshots.py). Readers concurrently resolving the table
    see wholly the pre-merge or wholly the post-merge version — the
    either-or guarantee tests/test_snapshots.py races. Returns the
    committed version."""
    from pyanamo_spark.sources.snapshots import (
        snapshot_commit,
        snapshot_read,
    )

    target = snapshot_read(spark, table_dir)
    return snapshot_commit(
        spark, table_dir, merge_frames(target, source, key)
    )


@register(
    "q_nest_build",
    oracle="""
SELECT doc_id,
       'Task_' || CAST(i - 1 AS STRING) AS nestID,
       'echo ' || (string_split(text, ' '))[i] AS script
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, least(5, len(string_split(text, ' '))))) AS i
  FROM documents
)
""",
)
def q_nest_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 import_nested_item (manager.py:313-358): split taskArgs on
    the nested delimiter and fan out Task_i entries, script = base
    command + arg_i (nest build at manager.py:326-335). Demonstrated
    over documents: first 5 whitespace tokens become nested task args.
    posexplode keeps the Task_i ordinal without any window or shuffle."""
    docs = spark.table("documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 5)).alias(
            "pos", "word"
        ),
    ).select(
        "doc_id",
        F.concat(F.lit("Task_"), F.col("pos").cast("string")).alias("nestID"),
        F.concat(F.lit("echo "), F.col("word")).alias("script"),
    )


@register(
    "q_partition_split",
    oracle="""
WITH mined AS (
  SELECT itemID, nestID,
         len(list_filter(string_split(stdout, chr(10)),
                         x -> len(string_split(x, chr(9))) = 7)) > 0 AS ok
  FROM nests
  WHERE status = 'done'
)
SELECT 'Completed' AS subset, itemID, nestID FROM mined WHERE ok
UNION ALL
SELECT 'Failed' AS subset, itemID, nestID FROM mined WHERE NOT ok
""",
    needs_views=("tasks", "nests"),
)
def q_partition_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completed-vs-Failed split of done tasks by the 7-tab-field
    golden-output contract (managing-item-logs.py:103-127).

    A partition-by-predicate: the two-filters-unioned form evaluates
    the derived nests view (and the contract predicate) twice, so the
    split is computed in ONE pass as a tag column — identical rows,
    half the work. The genuine set-op family lives in q_setops."""
    done = spark.table("nests").filter(F.col("status") == "done")
    ok = F.exists(
        F.split(F.col("stdout"), "\n"),
        lambda line: F.size(F.split(line, "\t")) == 7,
    )
    return done.select(
        F.when(ok, "Completed").otherwise("Failed").alias("subset"),
        "itemID",
        "nestID",
    )
