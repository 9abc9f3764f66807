"""Embedding-cosine near-duplicate detection (north star),
oracle-checked.

Pairs are blocked on ``label`` (standing in for an ANN/LSH bucket — at
100 TB the blocking key comes from pyanamo_spark.similarity.lsh, same
join shape) and verified with exact cosine similarity. Norms are
precomputed per vector *before* the self-join — computing them inside
the pair stage triples the per-pair flops (dot(a,a) and dot(b,b) are
recomputed for every partner). The threshold filter applies to the
*rounded* value on both engines so borderline pairs can't diverge on
last-ulp noise; the oracle mirrors the exact association
``dot / (norm_a * norm_b)`` with the same precomputed-norm CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.vectors import (
    dot,
    duckdb_dot_sql,
    duckdb_sq_sum_sql,
)
from pyanamo_spark.registry import register

THRESHOLD = 0.35

_DOT = duckdb_dot_sql("a.embedding", "b.embedding")
_COS = f"({_DOT} / (a.nrm * b.nrm))"


@register(
    "q_dedup_embed",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         sqrt({duckdb_sq_sum_sql("embedding")}) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_COS}, 6) AS cos_sim
FROM e a
JOIN e b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_COS}, 6) >= {THRESHOLD}
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star embedding near-dup: label-blocked self-join + cosine
    ≥ 0.35 (the fixture's random vectors top out near 0.46, so the
    threshold selects the true high-similarity tail)."""
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    a, b = emb.alias("a"), emb.alias("b")
    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
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
