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


@register(
    "q_dedup_stats",
    oracle="""
WITH corpus AS (
  SELECT doc_id, n_chars, md5(text) AS fingerprint FROM documents
  UNION ALL
  SELECT doc_id + 1000000, n_chars, md5(text)
  FROM documents WHERE doc_id % 100 = 0
),
per_print AS (
  SELECT fingerprint,
         COUNT(*) AS n_copies,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MIN(n_chars) AS BIGINT) AS keeper_chars
  FROM corpus GROUP BY fingerprint
)
SELECT COUNT(*) + CAST(SUM(n_copies - 1) AS BIGINT) AS n_docs,
       COUNT(*) AS n_unique,
       CAST(SUM(n_copies - 1) AS BIGINT) AS n_dup_docs,
       ROUND(SUM(n_copies - 1) * 1.0
             / (COUNT(*) + SUM(n_copies - 1)), 6) AS dup_ratio,
       CAST(SUM(total_chars - keeper_chars) AS BIGINT) AS wasted_chars
FROM per_print
""",
)
def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication report — the executive summary a
    curation run ends with: doc/unique/duplicate counts, duplicate
    ratio, and characters that exact dedup would reclaim. One digest
    aggregation (16 bytes/row through the only wide shuffle) then a
    singleton rollup of the per-fingerprint partials."""
    docs = spark.table("documents")
    copies = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "n_chars"
    )
    corpus = docs.select("doc_id", "text", "n_chars").unionByName(copies)
    per_print = corpus.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.count("*").alias("n_copies"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("keeper_chars"),
    )
    dup = F.sum(F.col("n_copies") - 1)
    return per_print.agg(
        (F.count("*") + dup).alias("n_docs"),
        F.count("*").alias("n_unique"),
        dup.alias("n_dup_docs"),
        F.round(dup / (F.count("*") + dup), 6).alias("dup_ratio"),
        F.sum(F.col("total_chars") - F.col("keeper_chars")).alias(
            "wasted_chars"
        ),
    )


@register(
    "q_dup_by_source",
    oracle="""
WITH corpus AS (
  SELECT doc_id, source, md5(text) AS fp FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'recrawl', md5(text)
  FROM documents WHERE doc_id % 100 = 0
),
per_fp AS (
  SELECT fp, COUNT(*) AS n, COUNT(DISTINCT source) AS ns
  FROM corpus GROUP BY fp
)
SELECT c.source,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN p.n > 1 THEN 1 END) AS dup_docs,
       ROUND(COUNT(CASE WHEN p.n > 1 THEN 1 END) * 1.0 / COUNT(*), 6)
         AS dup_rate,
       COUNT(CASE WHEN p.ns > 1 THEN 1 END) AS cross_source_docs,
       ROUND(COUNT(CASE WHEN p.ns > 1 THEN 1 END) * 1.0 / COUNT(*), 6)
         AS cross_source_rate
FROM corpus c
JOIN per_fp p ON p.fp = c.fp
GROUP BY c.source
""",
)
def q_dup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication diagnostics over the corpus plus a
    planted 'recrawl' source (verbatim copies of every 100th doc —
    the fixture has no natural duplicates): for each source, how many
    of its documents have a copy ANYWHERE, and how many have a copy
    in ANOTHER source. The triage table that decides which source to
    dedup against which (q_source_overlap gives the pairwise detail;
    q_dedup_stats the corpus total).

    Scale shape: digest-only — one (fp) aggregation bounded by
    distinct content, one digest-keyed join back (text never
    shuffles; 16-byte digests do), and a SOURCES-sized rollup.
    """
    docs = spark.table("documents").select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    recrawl = (
        spark.table("documents")
        .filter(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.lit("recrawl").alias("source"),
            F.md5("text").alias("fp"),
        )
    )
    corpus = docs.unionByName(recrawl)
    per_fp = corpus.groupBy("fp").agg(
        F.count("*").alias("n"),
        F.count_distinct("source").alias("ns"),
    )
    dup = F.count(F.when(F.col("n") > 1, 1))
    cross = F.count(F.when(F.col("ns") > 1, 1))
    return (
        corpus.join(per_fp, "fp")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            dup.alias("dup_docs"),
            F.round(dup / F.count("*"), 6).alias("dup_rate"),
            cross.alias("cross_source_docs"),
            F.round(cross / F.count("*"), 6).alias("cross_source_rate"),
        )
    )
