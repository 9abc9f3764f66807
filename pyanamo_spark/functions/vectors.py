"""Vector math over array<float> embedding columns (SURVEY.md §2.10 X5).

Everything here is higher-order built-ins (transform/aggregate/zip_with)
— JVM-side, no Python round-trip. Elements are cast to double before
arithmetic so the sequential fold matches the DuckDB oracle bit-for-bit
at the rounded precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register


def duckdb_dot_sql(a: str, b: str) -> str:
    """DuckDB dot product in pure DOUBLE (matches the Spark
    zip_with/aggregate fold element-for-element)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
    )


def duckdb_sq_sum_sql(v: str) -> str:
    """DuckDB Σx² in pure DOUBLE."""
    return (
        f"list_sum(list_transform({v},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def duckdb_cosine_sql(a: str, b: str) -> str:
    """DuckDB SQL for cosine similarity computed entirely in DOUBLE.

    DuckDB's built-in list_cosine_similarity accumulates FLOAT[] inputs
    in float32 and returns FLOAT — it diverges from double math in the
    7th digit, so oracles mirror the Spark expression tree instead:
    dot / sqrt(xx * yy), every element cast to double first.
    """
    def sq(v: str) -> str:
        return (
            f"list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )

    dot_ab = (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
    )
    return f"({dot_ab} / sqrt({sq(a)} * {sq(b)}))"


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns via zip_with +
    aggregate — the building block for cosine similarity."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # dot / sqrt(xx * yy) — the same association DuckDB's
    # list_cosine_similarity uses, so rounded values match bit-for-bit
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


@register(
    "q_vector_math",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
FROM embeddings
""",
)
def q_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 multimodal/vector columns: per-embedding dimension, sum, and
    L2 norm through transform/aggregate higher-order functions."""
    emb = spark.table("embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x)
    sq_sum = F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    )
