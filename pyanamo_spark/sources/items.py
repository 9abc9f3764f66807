"""Item sources and the results sink (SURVEY.md §2.1 S3/S4/S9/S13).

Reference read paths:
  - readFile (manager.py:123-130): whole-file-into-RAM text read →
    ``spark.read.text`` split-read.
  - read_jsonFile (manager.py:113-119): JSON item documents →
    ``spark.read.json`` with an explicit schema (never inference at
    100 TB — a schema mismatch should fail the plan, not silently
    widen types).

Reference result sink (use-cases/managing-item-logs.py:150-204):
SQLite table with a composite primary key; duplicate keys rejected on
insert. Spark mapping: an idempotent parquet upsert — new rows
anti-joined against existing keys so re-runs never duplicate
(the MERGE shape; swap the writer for Delta/Iceberg MERGE INTO or
``df.write.jdbc`` against a real warehouse without touching callers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

#: item-document schema for JSON ingest (PyAnamo Schema.md:14-57)
ITEM_JSON_SCHEMA = (
    "itemID string, taskID string, TaskScript string, TaskArgs string, "
    "ItemState string, lockID string"
)


def read_items_text(spark: SparkSession, path: str) -> DataFrame:
    """S3 readFile: line-oriented source, blank lines dropped
    (manager.py:419's filter), trailing whitespace stripped
    (manager.py:129's rstrip)."""
    return (
        spark.read.text(path)
        .select(F.rtrim(F.col("value")).alias("line"))
        .filter(F.col("line") != "")
    )


def read_items_json(spark: SparkSession, path: str) -> DataFrame:
    """S4 read_jsonFile with engine defaults applied (M1 semantics:
    ItemState 'todo', lockID 'NULL' — manager.py:291-301)."""
    df = spark.read.schema(ITEM_JSON_SCHEMA).json(path)
    return df.select(
        "itemID",
        "taskID",
        F.col("TaskScript").alias("task_script"),
        F.col("TaskArgs").isNotNull().alias("is_nested"),
        F.coalesce(F.col("ItemState"), F.lit("todo")).alias("ItemState"),
        F.coalesce(F.col("lockID"), F.lit("NULL")).alias("lockID"),
    )


def upsert_results(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    key_cols: list[str],
) -> DataFrame:
    """S13 idempotent results sink: append only rows whose composite
    key is not already present (the SQLite PRIMARY KEY dup-rejection,
    managing-item-logs.py:188-204). Within-batch duplicates keep one
    row per key (min over remaining columns for determinism).

    Returns the post-state table. At scale this is Delta/Iceberg
    ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT``; on plain parquet
    it is an anti-join + append, with the read of existing keys pruned
    to the key columns only.
    """
    deduped = new_rows.dropDuplicates(key_cols)
    try:
        existing_keys = spark.read.parquet(path).select(*key_cols)
        fresh = deduped.join(existing_keys, key_cols, "left_anti")
    except AnalysisException:
        fresh = deduped  # first write — nothing to collide with
    fresh.write.mode("append").parquet(path)
    return spark.read.parquet(path)
