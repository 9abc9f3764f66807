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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.functions.vectors import dot
from pyanamo_spark.registry import register

N_CENTROIDS = 16
NPROBE = 2
K = 5
N_QUERIES = 3


def _nearest(df: DataFrame, centroids: DataFrame, n: int = 1) -> DataFrame:
    """Attach each row's n nearest centroid ids by cosine.

    The centroid model is tiny by construction (N_CENTROIDS rows), so
    it rides into every task as a closure-captured numpy matrix and the
    scoring is one BLAS matmul per Arrow batch inside ``mapInPandas`` —
    no cross join, no per-(vector, centroid) row blowup, no argmin
    shuffle. The earlier DataFrame form (broadcast cross join +
    max-of-struct groupBy) shuffled |corpus| × |centroids| scored rows
    to reduce them straight back down; this emits exactly n rows per
    vector map-side. Ties break toward the lower centroid id (argmax on
    a stable sort), matching the struct-ordering tie-break it replaces."""
    rows = sorted(
        centroids.collect(), key=lambda r: r.centroid_id
    )
    if not rows:
        raise ValueError(
            "IVF needs a non-empty centroid model — the corpus has no "
            "embeddings to seed from"
        )
    c_ids = np.array([r.centroid_id for r in rows], dtype=np.int64)
    c_mat = np.stack([np.asarray(r.c_emb, dtype=np.float64) for r in rows])
    c_unit = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    take = min(n, len(c_ids))

    def assign(batches):
        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]  # unassignable rows
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0.0] = 1.0
            sims = (mat / nrm[:, None]) @ c_unit.T
            # n is 1 or 2 here; argsort on N_CENTROIDS cols is cheap
            order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(), take
                    ),
                    "centroid_id": c_ids[order].ravel(),
                }
            )

    return df.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, centroid_id bigint"
    )


def _lloyd_step(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd iteration: assign, then a per-cluster vectorized mean
    — one shuffle of (centroid_id, embedding) and a numpy column mean
    per group. The earlier posexplode → per-(cluster, dim) aggregation
    form shuffled |corpus| × dim scalar rows for the same result."""
    assign = _nearest(emb, centroids, 1)

    def mean_centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = (
            np.stack(pdf["embedding"].to_numpy())
            .astype(np.float64)
            .mean(axis=0)
        )
        return pd.DataFrame(
            {
                "centroid_id": [int(pdf["centroid_id"].iloc[0])],
                "c_emb": [m.tolist()],
                "c_nrm": [float(np.linalg.norm(m))],
            }
        )

    return (
        emb.join(assign, "vec_id")
        .select("centroid_id", "embedding")
        .groupBy("centroid_id")
        .applyInPandas(
            mean_centroid,
            "centroid_id bigint, c_emb array<double>, c_nrm double",
        )
    )


def build_index(
    spark: SparkSession, iters: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids): the inverted lists and the
    coarse quantizer after ``iters`` Lloyd refinements of the seed
    centroids. Each iteration is one pass over the data. Lineage stays
    flat across iterations because ``_nearest`` collects the incoming
    16-row centroid model to the driver — the small-model-to-driver
    move every k-means implementation makes; without it iteration N
    re-derives every previous iteration."""
    emb = spark.table("embeddings").withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    seeds = emb.filter(
        (F.col("vec_id") < N_CENTROIDS) & F.col("embedding").isNotNull()
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    centroids = seeds
    for _ in range(max(1, iters)):
        centroids = _lloyd_step(emb, centroids)
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


def append_to_index(
    spark: SparkSession, index_dir: str, vectors: DataFrame
) -> dict[int, int]:
    """Incrementally add vectors to a stored IVF index WITHOUT a
    rebuild: assign against the FROZEN stored centroids, append into
    the centroid-partitioned lists. New vectors are visible to the
    next ``search_index`` call (partition pruning is unchanged — the
    appended files land inside existing centroid_id partitions, or
    create new ones only if a list was previously empty).

    ``vectors`` must carry the lists' base columns (vec_id, embedding,
    label) so appended parquet files share the schema.

    Returns {centroid_id: n_appended} — the caller's rebuild signal:
    because centroids are frozen, a drifting corpus degrades recall by
    IMBALANCE first (hot lists grow, probes scan more than
    1/N_CENTROIDS of the corpus), so monitor the running list sizes
    and re-run ``write_index`` when the largest list exceeds a few
    multiples of the mean. This is the FAISS/IVF operational contract:
    cheap adds between periodic re-trains."""
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    v = vectors.withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    assignments = _nearest(v, centroids, 1)
    appended = v.join(assignments, "vec_id")
    (
        appended.repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(f"{index_dir}/lists")
    )
    return {
        r.centroid_id: r.n
        for r in assignments.groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }


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


@register(
    "q_knn_ivf",
    oracle=f"""
SELECT vec_id AS query_id,
       CAST(LEAST({K}, (SELECT COUNT(*) FROM embeddings)) AS BIGINT)
         AS n_exact,
       CAST(1 AS INTEGER) AS self_ok,
       CAST(1 AS INTEGER) AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF search, audited: probe the 2 nearest refined centroids,
    rank only those inverted lists, then certify the result in-engine
    against the exact brute-force ranking (knn.ann_audit) — self at
    rank 1 with cosine 1.0, recall@k ≥ IVF_RECALL_FLOOR (measured
    0.8-1.0 across sf0.001-0.1 probing 2/16 lists), exact top-k
    counts. The raw neighbor rows stay available as ``ivf_topk``;
    the DECLARED output is the audit because probe membership follows
    the seeded k-means partition DuckDB cannot replay."""
    from pyanamo_spark.similarity.knn import (
        IVF_RECALL_FLOOR,
        ann_audit,
    )

    return ann_audit(spark, ivf_topk(spark, sf_dir), IVF_RECALL_FLOOR)


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw IVF top-k (library form): queries (vec_id < 3) probe their
    2 nearest refined centroids and rank only those inverted lists."""
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
