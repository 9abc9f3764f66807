"""IVF (inverted-file) approximate nearest neighbor search — the
second scale path for X3 alongside sign-LSH (similarity/knn.py).

Structure (FAISS IVF-flat shape, composed from DataFrame ops only):
  1. coarse quantizer: 16 centroids — deterministic seeds (the 16
     lowest vec_ids) refined by one Lloyd iteration, computed with
     posexplode → per-(cluster, dim) means → re-assembled arrays.
     No MLlib model artifact: the centroid table IS the index.
  2. assignment: every vector joins its nearest centroid (broadcast
     16-row centroid table; argmin via min-of-struct, no window).
  3. search: a query probes its ``NPROBE`` nearest centroids and ranks
     only vectors in those inverted lists.

At 100 TB the assignment column is the partition key of the stored
table: a probe reads nprobe/C of the data (2/16 here), and the
centroid refinement is a one-pass aggregation per iteration. Rows-only
(argmin tie-breaks and centroid arithmetic are not worth mirroring in
the oracle); recall and self-match are asserted in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.functions.vectors import dot
from pyanamo_spark.registry import register

N_CENTROIDS = 16
NPROBE = 2
K = 5
N_QUERIES = 3


def _nearest(df: DataFrame, centroids: DataFrame, n: int = 1) -> DataFrame:
    """Attach each row's n nearest centroid ids by cosine."""
    scored = df.join(F.broadcast(centroids)).withColumn(
        "c_cos",
        dot(F.col("embedding"), F.col("c_emb"))
        / (F.col("nrm") * F.col("c_nrm")),
    )
    if n == 1:
        # argmin without a window: max of (cos, centroid_id) structs
        return (
            scored.groupBy("vec_id")
            .agg(F.max(F.struct("c_cos", "centroid_id")).alias("best"))
            .select("vec_id", F.col("best.centroid_id").alias("centroid_id"))
        )
    w = W.partitionBy("vec_id").orderBy(
        F.col("c_cos").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= n)
        .select("vec_id", "centroid_id")
    )


def build_index(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids): the inverted lists and the
    coarse quantizer after one Lloyd refinement of seed centroids."""
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    seeds = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    assign0 = _nearest(emb, seeds, 1)
    # Lloyd step: per-(cluster, dim) mean → re-assembled centroid arrays
    refined = (
        emb.join(assign0, "vec_id")
        .select(
            "centroid_id", F.posexplode("embedding").alias("dim", "val")
        )
        .groupBy("centroid_id", "dim")
        .agg(F.avg("val").alias("mean"))
        .groupBy("centroid_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean"))
            ).alias("dims")
        )
        .select(
            "centroid_id",
            F.expr("transform(dims, d -> d.mean)").alias("c_emb"),
        )
        .withColumn("c_nrm", F.sqrt(dot(F.col("c_emb"), F.col("c_emb"))))
    )
    assignments = _nearest(emb, refined, 1)
    return assignments, refined


@register("q_knn_ivf", oracle=None)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF search: queries (vec_id < 3) probe their 2 nearest
    refined centroids and rank only those inverted lists."""
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    assignments, centroids = build_index(spark)
    listed = emb.join(assignments, "vec_id")

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    probes = _nearest(queries, centroids, NPROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    q_side = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    ).join(probes, "query_id")

    scored = listed.join(
        F.broadcast(q_side), "centroid_id"
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )
