"""Embedding-cosine near-duplicate detection (north star),
oracle-checked.

Pairs are blocked on ``label`` (standing in for an ANN/LSH bucket — at
100 TB the blocking key comes from pyanamo_spark.similarity.lsh, same
join shape) and verified with exact cosine similarity via higher-order
functions. The threshold filter applies to the *rounded* value on both
engines so borderline pairs can't diverge on last-ulp noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.vectors import cosine
from pyanamo_spark.registry import register

THRESHOLD = 0.35

from pyanamo_spark.functions.vectors import duckdb_cosine_sql  # noqa: E402

#: oracle-side cosine in pure DOUBLE (see duckdb_cosine_sql docstring)
COS = duckdb_cosine_sql("a.embedding", "b.embedding")


@register(
    "q_dedup_embed",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({COS}, 6) AS cos_sim
FROM embeddings a
JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({COS}, 6)
      >= {THRESHOLD}
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star embedding near-dup: label-blocked self-join + cosine
    ≥ 0.35 (the fixture's random vectors top out near 0.46, so the
    threshold selects the true high-similarity tail)."""
    emb = spark.table("embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    cos = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos_sim",
        )
    )
