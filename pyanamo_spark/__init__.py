"""pyanamo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BrenKenna/pyanamo, re-expressed Spark-first.

The reference (/root/reference) is a DynamoDB-backed pilot-job framework;
its query surface (indexed state queries, projections, counters,
group-by-state summaries, progress histograms, nested-map updates,
delimited ingest, log mining, enrichment joins, monitoring loops) is
rebuilt here as declarative DataFrame/SQL plans that Catalyst optimizes,
plus the LLM-data-pipeline extension operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout:
  session.py    — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
  catalog.py    — fixture-table loaders / temp-view registration
  semantics.py  — reference-faithful semantics encoded once, rendered for
                  both Spark SQL and the DuckDB oracle dialect
  registry.py   — declared-query registry (queries() + oracle_sql())
  operators/    — read path, aggregates, joins, windows, mutation, ingest,
                  logs, set ops
  functions/    — scalar/text/vector function layer
  dedup/        — exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  similarity/   — brute-force + LSH-bucketed top-k vector search
  multimodal/   — binary-column plumbing with stubbed codecs
  executor/     — subprocess pipe stage, wall-time budget, sink router
  streaming/    — Structured Streaming monitors
"""

__version__ = "0.1.0"

from pyanamo_spark.registry import QUERIES, ORACLES  # noqa: F401
