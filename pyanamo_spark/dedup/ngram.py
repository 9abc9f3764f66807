"""n-gram Jaccard near-duplicate detection (north star), oracle-checked.

Unlike the MinHash path (probabilistic, xxhash-based, rows-only), this
variant is exact and fully SQL-expressible: block pairs on
(lang, token-count bucket), compare word-trigram sets. Blocking keeps
the pair count linear-ish; at 100 TB you'd use the MinHash bands as the
blocking key instead — same join shape.

Note the fixture vocabulary is tiny (~30 words), so *token-set* Jaccard
is degenerate (long docs contain every word); trigram shingles keep
cross-doc similarity low and mutant-pair similarity high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup import CORPUS_SQL, shingles
from pyanamo_spark.registry import register

THRESHOLD = 0.6


@register(
    "q_dedup_ngram",
    oracle=f"""
WITH corpus AS (
{CORPUS_SQL}
),
prepped AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) // 20 AS size_bucket,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
         )) AS sh
  FROM corpus
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM prepped a
JOIN prepped b
  ON a.lang = b.lang AND a.size_bucket = b.size_bucket
 AND a.doc_id < b.doc_id
WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= {THRESHOLD}
""",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star n-gram Jaccard dedup: blocked self-join +
    trigram-set Jaccard ≥ 0.6 over the mutant corpus."""
    from pyanamo_spark.dedup import corpus_with_mutants

    corpus = corpus_with_mutants(spark)
    prepped = corpus.select(
        "doc_id",
        "lang",
        (F.size(F.split("text", " ")) / 20).cast("int").alias("size_bucket"),
        F.array_distinct(shingles("text")).alias("sh"),
    )
    a, b = prepped.alias("a"), prepped.alias("b")
    jaccard = F.round(
        F.size(F.array_intersect("a.sh", "b.sh"))
        / F.size(F.array_union("a.sh", "b.sh")).cast("double"),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.size_bucket") == F.col("b.size_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= THRESHOLD)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "jaccard",
        )
    )
