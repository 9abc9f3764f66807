"""Deduplication operators for training-data pipelines (SURVEY.md §2.10
X1/X2 + north star): exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine.

The fixture corpus has no natural duplicates, so near-dup operators run
over ``corpus_with_mutants``: documents plus a deterministic mutated
copy of every 100th doc (two tokens appended, doc_id offset by
1,000,000). The construction is pure SQL, so DuckDB oracles can rebuild
the identical corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MUTANT_OFFSET = 1_000_000
MUTANT_SUFFIX = " mutated token"

#: DuckDB/Spark-shared SQL for the mutant corpus (dialect-neutral)
CORPUS_SQL = f"""
SELECT doc_id, text, lang FROM documents
UNION ALL
SELECT doc_id + {MUTANT_OFFSET} AS doc_id,
       text || '{MUTANT_SUFFIX}' AS text,
       lang
FROM documents
WHERE doc_id % 100 = 0
"""


def corpus_with_mutants(spark: SparkSession) -> DataFrame:
    docs = spark.table("documents").select("doc_id", "text", "lang")
    mutants = (
        spark.table("documents")
        .filter(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(MUTANT_SUFFIX)).alias("text"),
            "lang",
        )
    )
    return docs.unionByName(mutants)


def shingles(col, k: int = 3):
    """Word k-shingles as an array column (distinct not applied).

    The tokenization is bound once per row via a single-element
    ``transform`` wrapper: higher-order functions are interpreted with
    no common-subexpression elimination, so naming ``split`` inside the
    per-shingle lambda would re-split the text once per output element
    (~50x per doc on the fixture corpus).
    """
    return F.expr(
        f"transform(array(split({col}, ' ')),"
        f" w -> transform(sequence(1, greatest(size(w) - {k - 1}, 1)),"
        f"   i -> array_join(slice(w, i, {k}), ' ')))[0]"
    )
