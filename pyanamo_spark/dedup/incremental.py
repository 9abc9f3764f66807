"""Incremental deduplication against a persisted fingerprint store.

At 100 TB, dedup is not a one-shot global job: batches arrive
continuously and must dedup against everything already accepted. The
production pattern:

  1. a fingerprint store — parquet of (fingerprint, doc_id) laid out
     as one ``batch=<id>`` partition directory per accepted batch
  2. each new batch hashes its docs, dedups WITHIN the batch (exact
     groupBy on the digest), then anti-joins the store to drop docs
     already seen in ANY earlier batch
  3. survivors write their fingerprints as the batch's own partition —
     never rewriting or re-reading-while-writing existing data

Only digests (16 bytes/row) ever shuffle; raw text stays columnar at
rest; nothing is collected to the driver. In production the store is
additionally bucketed by fingerprint so the anti-join probe is
exchange-free per bucket.

The invariant the test pins: ingesting in N batches leaves exactly the
same accepted multiset of fingerprints as ONE global exact dedup —
cross-batch collisions keep the earlier batch's keeper
(first-accepted-wins, the semantics a continuous pipeline actually
has).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def fingerprint_batch(batch: DataFrame) -> DataFrame:
    """(doc_id, text) -> within-batch-deduped (fingerprint, doc_id):
    one digest groupBy, min(doc_id) keeper."""
    return (
        batch.select(F.col("doc_id"), F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def batch_committed(store_dir: str, batch_id: int) -> bool:
    """True iff ``batch=<id>`` was FULLY written: gate on the write
    committer's ``_SUCCESS`` marker, not directory existence — a crash
    mid-``accept_batch`` leaves a partial directory (e.g. only
    ``_temporary/``), and skipping on ``isdir`` would silently drop the
    replayed epoch's records."""
    return os.path.isfile(
        os.path.join(store_dir, f"batch={batch_id}", "_SUCCESS")
    )


def clear_partial_batch(store_dir: str, batch_id: int) -> None:
    """Remove a crash-orphaned partial ``batch=<id>`` directory (one
    without a ``_SUCCESS`` marker) so a replayed epoch can re-accept
    cleanly — ``accept_batch`` writes with ``errorifexists``."""
    out = os.path.join(store_dir, f"batch={batch_id}")
    if os.path.isdir(out) and not batch_committed(store_dir, batch_id):
        shutil.rmtree(out)


def accept_batch(
    spark: SparkSession, batch: DataFrame, store_dir: str, batch_id: int
) -> DataFrame:
    """Dedup ``batch`` against the store, write survivors' prints as
    the batch's own ``batch=<id>`` partition, return the accepted
    (fingerprint, doc_id) rows."""
    prints = fingerprint_batch(batch)
    # "seen" means actual batch partitions — the directory may already
    # exist holding only hidden side-state (a streaming _checkpoint)
    has_batches = os.path.isdir(store_dir) and any(
        d.startswith("batch=") for d in os.listdir(store_dir)
    )
    if has_batches:
        seen = spark.read.parquet(store_dir).select("fingerprint")
        prints = prints.join(seen, "fingerprint", "left_anti")
    out = os.path.join(store_dir, f"batch={batch_id}")
    prints.select("fingerprint", "doc_id").write.mode(
        "errorifexists"
    ).parquet(out)
    return spark.read.parquet(out)


def accepted_corpus(spark: SparkSession, store_dir: str) -> DataFrame:
    """The full accepted fingerprint set (all batch partitions)."""
    return spark.read.option("basePath", store_dir).parquet(store_dir)


def compact_store(spark: SparkSession, store_dir: str) -> int:
    """Rewrite every ``batch=*`` partition down to one file.

    Each ``accept_batch`` write inherits the anti-join's shuffle
    parallelism, so a batch partition lands as up to
    ``spark.sql.shuffle.partitions`` small files; after thousands of
    accepted batches the store is a classic small-files swamp — every
    future anti-join probe pays an open/footer-read per file.
    Compaction clusters each batch into a single task
    (``repartition("batch")``) and rewrites the partitions through a
    shadow directory, swapping them in only after the full rewrite
    succeeds. Hidden side-state in the store root (a streaming
    ``_checkpoint``) is untouched, the partition set and the accepted
    (fingerprint, doc_id, batch) rows are byte-identical, and a crash
    mid-compaction leaves either the old or the new layout per
    partition — never a torn one, since os.rename is atomic per dir.

    Returns the number of batch partitions compacted. Not safe to run
    concurrently with ``accept_batch`` (production fences with the same
    batch-directory convention: a compactor lease partition).
    """
    batches = [
        d for d in os.listdir(store_dir) if d.startswith("batch=")
    ]
    if not batches:
        return 0
    shadow = store_dir.rstrip("/") + "__compacting"
    shutil.rmtree(shadow, ignore_errors=True)
    (
        accepted_corpus(spark, store_dir)
        .repartition("batch")
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(shadow)
    )
    for d in batches:
        new = os.path.join(shadow, d)
        if not os.path.isdir(new):  # never true: every batch has rows
            continue
        old = os.path.join(store_dir, d)
        shutil.rmtree(old)
        os.rename(new, old)
    shutil.rmtree(shadow)
    return len(batches)


#: cross-batch duplicate id offset for the declared query's corpus
DUP_OFFSET = 2_000_000
#: batch-packing radix for the oracle's argmin (ids stay below it)
_RADIX = 10_000_000


@register(
    "q_dedup_incremental",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, md5(text) AS fp, CAST(doc_id % 3 AS INT) AS batch
  FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, md5(text), 2
  FROM documents WHERE doc_id % 10 = 0
)
SELECT fp AS fingerprint,
       CAST(MIN(batch * {_RADIX} + doc_id) % {_RADIX} AS BIGINT) AS doc_id,
       CAST(MIN(batch * {_RADIX} + doc_id) // {_RADIX} AS INT) AS batch
FROM corpus
GROUP BY fp
""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup as a declared query: three batches (docs split
    by doc_id % 3, plus every 10th doc re-arriving in the last batch as
    a cross-batch duplicate) flow through the fingerprint store, and
    the result is the full accepted corpus with each keeper's batch.

    The oracle replays first-accepted-wins declaratively: the keeper of
    a fingerprint is argmin over (batch, doc_id), packed into one
    integer so a plain MIN expresses the lexicographic order. Each call
    builds its store under a fresh temp dir — the query is about the
    accept protocol, not the storage location.
    """
    docs = spark.table("documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text"
    )
    third = F.col("doc_id") % 3
    batches = [
        docs.filter(third == 0),
        docs.filter(third == 1),
        docs.filter(third == 2).unionByName(dups),
    ]
    store = os.path.join(
        tempfile.mkdtemp(prefix="pyanamo_incr_dedup_"), "prints"
    )
    for batch_id, batch in enumerate(batches):
        accept_batch(spark, batch, store, batch_id)
    return accepted_corpus(spark, store).select(
        "fingerprint", "doc_id", F.col("batch").cast("int").alias("batch")
    )
