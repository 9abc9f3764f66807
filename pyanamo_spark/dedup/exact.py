"""Exact deduplication (X1): hash-groupBy on a content fingerprint.

At 100 TB: dedupe on the 128-bit digest (16 bytes/row through the
shuffle), never the raw text; min(doc_id) picks the canonical survivor
deterministically. The digest shuffle is the only exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


@register(
    "q_dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, md5(text) AS fingerprint FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, md5(text) AS fingerprint
  FROM documents WHERE doc_id % 100 = 0
)
SELECT fingerprint,
       MIN(doc_id) AS keeper,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY fingerprint
HAVING COUNT(*) > 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents plus verbatim copies of every 100th
    doc (the fixture has no natural duplicates): group by md5(text),
    keep min(doc_id), report duplicate groups."""
    docs = spark.table("documents")
    copies = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(copies)
    return (
        corpus.select("doc_id", F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )
