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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint_batch(batch: DataFrame) -> DataFrame:
    """(doc_id, text) -> within-batch-deduped (fingerprint, doc_id):
    one digest groupBy, min(doc_id) keeper."""
    return (
        batch.select(F.col("doc_id"), F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def accept_batch(
    spark: SparkSession, batch: DataFrame, store_dir: str, batch_id: int
) -> DataFrame:
    """Dedup ``batch`` against the store, write survivors' prints as
    the batch's own ``batch=<id>`` partition, return the accepted
    (fingerprint, doc_id) rows."""
    prints = fingerprint_batch(batch)
    if os.path.exists(store_dir):
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
