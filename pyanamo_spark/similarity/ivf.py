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


def _lloyd_step(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd iteration: assign, then per-(cluster, dim) means
    re-assembled into centroid arrays."""
    assign = _nearest(emb, centroids, 1)
    return (
        emb.join(assign, "vec_id")
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


def _materialize_centroids(spark: SparkSession, centroids: DataFrame):
    """Collect the (tiny) centroid table to the driver and re-create it
    — the small-model-to-driver move every k-means implementation makes.
    Each Lloyd iteration otherwise doubles the lineage (its assignment
    join re-derives every previous iteration), turning iteration N into
    O(2^N) recomputation."""
    rows = centroids.collect()
    return spark.createDataFrame(
        rows, "centroid_id bigint, c_emb array<double>, c_nrm double"
    )


def build_index(
    spark: SparkSession, iters: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids): the inverted lists and the
    coarse quantizer after ``iters`` Lloyd refinements of the seed
    centroids. Each iteration is one pass over the data (assignment
    broadcast join + per-dim aggregation); the 16-row centroid model
    is materialized on the driver between iterations."""
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    seeds = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    centroids = seeds
    for _ in range(max(1, iters)):
        centroids = _materialize_centroids(
            spark, _lloyd_step(emb, centroids)
        )
    assignments = _nearest(emb, centroids, 1)
    return assignments, centroids


def write_index(spark: SparkSession, index_dir: str, iters: int = 2) -> None:
    """Persist the IVF index: inverted lists as parquet PARTITIONED BY
    centroid_id (the probe unit), centroids as a side table.

    This is the production shape the inline q_knn_ivf only simulates:
    build once, then every search is a partition-pruned read of
    nprobe/N_CENTROIDS of the corpus — the scan never touches
    unprobed lists. Re-partitioning by centroid_id also co-locates
    each list into its own files, so a probe is sequential I/O."""
    assignments, centroids = build_index(spark, iters)
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    (
        emb.join(assignments, "vec_id")
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{index_dir}/lists")
    )
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")


def search_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = K,
    nprobe: int = NPROBE,
) -> DataFrame:
    """Search a stored IVF index: probe selection against the tiny
    centroid table, then a partition-pruned scan of only the probed
    inverted lists.

    The probed centroid ids are collected (≤ nprobe × n_queries
    values) and pushed as a literal IN filter on the partition column —
    static partition pruning the scan planner honors unconditionally
    (the broadcast-join-driven alternative relies on runtime dynamic
    partition pruning; the literal form is guaranteed and testable).

    ``queries`` needs (vec_id, embedding) columns."""
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    lists = spark.read.parquet(f"{index_dir}/lists")
    q = queries.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    probes = _nearest(q, centroids, nprobe).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    probe_ids = sorted(
        {r.centroid_id for r in probes.select("centroid_id").collect()}
    )
    q_side = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    ).join(probes, "query_id")
    scored = (
        lists.filter(F.col("centroid_id").isin(probe_ids))
        .join(F.broadcast(q_side), "centroid_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


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
