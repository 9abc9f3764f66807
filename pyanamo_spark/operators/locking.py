"""Optimistic lock protocol twin (SURVEY.md §2.7 M6, §2.8 F12/F13).

The reference's work-claiming dance (code/modifier.py:71-125,
``verifyItem``): read ItemState; if 'todo', generate a 30-char
alphanumeric lockID (F12, modifier.py:42), blind-write
lockID/ItemState='locked'/Lock_Date/InstanceID (M6, ``lockItem``,
modifier.py:71-95), sleep a random 1-4 s jitter (F13,
modifier.py:118; same jitter family at parallel_processes.py:35-38
and runner.py:228,235), then re-read lockID — the worker owns the
item iff its own lockID persisted, i.e. the LAST concurrent writer
wins and every loser walks away. Cost in the reference: 2 reads + 1
write + a 1-4 s sleep per item, per contender.

On Spark this protocol is subsumed by construction — the driver
assigns each partition to exactly one task, so no two workers ever
race an item (the equivalence argument in ``mutation.py`` and SURVEY
§4 R5/R6 stands; nothing in the engine's hot path runs this dance).
``q_lock_protocol`` exists so the semantics themselves are covered
and oracle-checked: it simulates W workers racing the todo items as
ONE declarative plan — the random draws (work-order overlap, lockID,
write order, jitter) are replaced by deterministic md5-derived values
computable identically in Spark and DuckDB, and the winner-per-item
rule is exactly "last write persists". ``random_lock_id`` is the
faithful F12 generator for callers that want real randomness (the
query uses the seeded twin so the oracle can replay it).

100 TB design: todo items never leave the cluster — the 4-row worker
dimension is broadcast, every derived value is a codegen'd string
hash, and the only shuffle is the itemID-partitioned winner window
followed by a W-group aggregate. Contrast with the reference's
per-item lock tax (BASELINE.md): 2-8 s/item serial vs one scan.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: F12 alphabet (modifier.py:42): ascii letters + digits.
LOCK_ALPHABET = string.ascii_letters + string.digits

#: lockID length (modifier.py:42).
LOCK_ID_LEN = 30

#: simulated contenders in q_lock_protocol.
LOCK_WORKERS = 4


def random_lock_id(rng: random.Random | None = None) -> str:
    """F12 (modifier.py:42): a 30-char alphanumeric conflict token.

    ``rng`` injects a seeded ``random.Random`` for reproducibility;
    default draws from the module-level generator like the reference.
    """
    r = rng if rng is not None else random
    return "".join(r.choice(LOCK_ALPHABET) for _ in range(LOCK_ID_LEN))


def jitter_seconds(hash_col: Column) -> Column:
    """F13 (modifier.py:118): the 1-4 s verify-delay, as a value.

    The reference sleeps ``random.randint(1, 4)`` between its lock
    write and the verify re-read. A declarative plan has nothing to
    sleep for, so the jitter becomes a deterministic column derived
    from a hash char — same 1..4 range, replayable by the oracle.
    """
    return (F.lit(1) + F.ascii(F.substring(hash_col, 2, 1)) % 4).cast("long")


def deterministic_lock_id(key: Column) -> Column:
    """Seeded twin of :func:`random_lock_id` for oracle-checked plans.

    30 hex chars (a subset of the F12 alphabet) from two chained md5
    draws, so the oracle can derive the identical token.
    """
    return F.substring(
        F.concat(
            F.md5(F.concat(key, F.lit("#lock"))),
            F.md5(F.concat(key, F.lit("#lock2"))),
        ),
        1,
        LOCK_ID_LEN,
    )


@register(
    "q_lock_protocol",
    oracle="""
WITH workers AS (
  SELECT 'sim-' || CAST(i AS STRING) AS instance_id
  FROM generate_series(0, 3) t(i)
),
attempts AS (
  SELECT
    t.itemID,
    w.instance_id,
    md5(t.itemID || '#' || w.instance_id) AS h,
    substr(md5(t.itemID || '#' || w.instance_id || '#lock')
           || md5(t.itemID || '#' || w.instance_id || '#lock2'),
           1, 30) AS lock_id,
    1 + ascii(substr(md5(t.itemID || '#' || w.instance_id), 2, 1)) % 4
      AS jitter_s,
    md5(t.itemID || '#' || w.instance_id || '#write') AS wpri
  FROM (SELECT itemID FROM tasks WHERE ItemState = 'todo') t
  CROSS JOIN workers w
  WHERE ascii(substr(md5(t.itemID || '#' || w.instance_id), 1, 1)) % 2 = 0
),
ranked AS (
  SELECT *, MAX(wpri) OVER (PARTITION BY itemID) AS wmax
  FROM attempts
)
SELECT
  instance_id,
  COUNT(*) AS n_attempted,
  COUNT(CASE WHEN wpri = wmax THEN 1 END) AS n_locked,
  CAST(SUM(jitter_s) AS BIGINT) AS total_jitter_s,
  COALESCE(MIN(CASE WHEN wpri = wmax THEN lock_id END), '') AS lock_digest
FROM ranked
GROUP BY instance_id
""",
    needs_views=("tasks",),
)
def q_lock_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6+F12+F13 twin: W workers race the todo items, last write wins.

    Faithful mapping of verifyItem (modifier.py:99-125):

    - the non-todo early-return is the source filter (only 'todo'
      items enter the race);
    - each worker attempts the items its shuffled work order reaches —
      simulated as a ~50% deterministic coin per (item, worker);
    - lockItem's blind overwrite + post-jitter re-read means the item
      belongs to whichever contender wrote LAST — simulated by ranking
      write priorities per item and crowning the max;
    - per worker the output reports attempts, wins, the total F13
      jitter its serial loop would have slept, and the min winning
      lockID as a cross-engine digest of the F12 derivation.

    The 4-row worker dim is broadcast; the winner resolution is one
    itemID-partitioned window; aggregation is W groups.
    """
    tasks = spark.table("tasks")
    workers = spark.range(LOCK_WORKERS).select(
        F.concat(F.lit("sim-"), F.col("id").cast("string")).alias(
            "instance_id"
        )
    )
    todo = tasks.filter(F.col("ItemState") == "todo").select("itemID")
    key = F.concat(F.col("itemID"), F.lit("#"), F.col("instance_id"))
    attempts = (
        todo.crossJoin(F.broadcast(workers))
        .withColumn("h", F.md5(key))
        .filter(F.ascii(F.substring(F.col("h"), 1, 1)) % 2 == 0)
        .withColumn("lock_id", deterministic_lock_id(key))
        .withColumn("jitter_s", jitter_seconds(F.col("h")))
        .withColumn("wpri", F.md5(F.concat(key, F.lit("#write"))))
    )
    ranked = attempts.withColumn(
        "wmax", F.max("wpri").over(Window.partitionBy("itemID"))
    )
    won = F.col("wpri") == F.col("wmax")
    return ranked.groupBy("instance_id").agg(
        F.count(F.lit(1)).alias("n_attempted"),
        F.count(F.when(won, 1)).alias("n_locked"),
        F.sum("jitter_s").alias("total_jitter_s"),
        F.coalesce(
            F.min(F.when(won, F.col("lock_id"))), F.lit("")
        ).alias("lock_digest"),
    )
