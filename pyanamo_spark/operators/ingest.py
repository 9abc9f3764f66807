"""Ingest — the import-items.py path as one vectorized read
(SURVEY.md §2.1 S3-S5, §2.7 M1-M3, §3.2).

The reference reads the whole delimited file into driver RAM, splits
rows in Python, and issues one DynamoDB put_item per row
(manager.py:411-461, 363-407). Here the same capability is
``spark.read.csv`` with header + separator options, a blank-line
filter, default-column construction, and a single batched write — at
100 TB the file is split-read in parallel and never touches the driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: delimited import fixture (FIXTURES.md §C.1) — matches the
#: itemID|TaskID|TaskScript|TaskArgs layout of
#: /root/reference/import-items.py:25-28 and README.md:54-79, including
#: a blank line that must be filtered (manager.py:419) and both single
#: and nested items (nested delim ',').
IMPORT_CSV = """itemID|TaskID|TaskScript|TaskArgs
Seq_Tests|Seq_8_2_1|seq|8,2,1
Single_1|EchoA|echo hello|

Single_2|EchoB|echo world|
Nested_2|SeqPair|seq|4,9
"""


def _fixture_path() -> str:
    # content-addressed name: editing IMPORT_CSV yields a fresh file
    # (a fixed name would silently serve the stale cached copy), and
    # concurrent users writing identical content collide harmlessly
    import hashlib

    digest = hashlib.md5(IMPORT_CSV.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"pyanamo_spark_import_items_{digest}.csv"
    )
    if not os.path.exists(path):
        tmp = path + f".{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            fh.write(IMPORT_CSV)
        os.replace(tmp, path)
    return path


@register(
    "q_ingest_csv",
    oracle="""
SELECT * FROM (VALUES
  ('Seq_Tests', 'Seq_8_2_1', 'seq', TRUE, CAST(3 AS BIGINT), 'todo', 'NULL'),
  ('Single_1', 'EchoA', 'echo hello', FALSE, CAST(NULL AS BIGINT), 'todo', 'NULL'),
  ('Single_2', 'EchoB', 'echo world', FALSE, CAST(NULL AS BIGINT), 'todo', 'NULL'),
  ('Nested_2', 'SeqPair', 'seq', TRUE, CAST(2 AS BIGINT), 'todo', 'NULL')
) AS t(itemID, taskID, task_script, is_nested, Nested_Tasks, ItemState, lockID)
""",
)
def q_ingest_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/M1/M3 import_from_file (manager.py:411-461): delimited read
    with header detection, blank-line filter, single-vs-nested
    discrimination by TaskArgs presence, and engine-default columns
    (ItemState='todo', lockID='NULL' — manager.py:291-301). The
    reference's per-row put_item loop becomes one declarative plan."""
    df = (
        spark.read.option("header", True)
        .option("sep", "|")
        .csv(_fixture_path())
    )
    return (
        df.filter(F.col("itemID").isNotNull())  # blank-line filter (P4)
        .select(
            "itemID",
            F.col("TaskID").alias("taskID"),
            F.col("TaskScript").alias("task_script"),
            F.col("TaskArgs").isNotNull().alias("is_nested"),
            F.when(
                F.col("TaskArgs").isNotNull(),
                F.size(F.split(F.col("TaskArgs"), ",")),
            )
            .cast("long")
            .alias("Nested_Tasks"),
            F.lit("todo").alias("ItemState"),
            F.lit("NULL").alias("lockID"),
        )
    )


@register(
    "q_json_roundtrip",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       to_json({'k': CAST(json_extract_string(props, '$.k') AS BIGINT)})
         AS props_json
FROM events
""",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 JSON serialize/deserialize (managing-item-logs.py:240-254,
    manager.py:113-119): extract a field from the JSON props column and
    re-serialize — from_json/get_json_object + to_json, all JVM-side."""
    events = spark.table("events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.select(
        "event_id",
        k.alias("k"),
        F.to_json(F.struct(k.alias("k"))).alias("props_json"),
    )
