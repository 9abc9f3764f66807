"""Semantic deduplication (SemDeDup-shaped): cluster, then prune
within clusters.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540) prune web corpora by
k-means-clustering document embeddings and dropping all but one member
of every within-cluster near-duplicate group. The two Spark-native
pieces already exist here and compose directly:

  - the coarse k-means quantizer from ``similarity/ivf.py`` (the IVF
    index's clustering IS SemDeDup's clustering — deterministic seeds,
    Lloyd refinement passes, broadcast 16-row model)
  - the per-block BLAS pair stage from ``dedup/embedding.py`` (one
    numpy matmul per cluster, only id pairs leave Python)
  - connected components + min-id keeper from ``dedup/clusters.py``

Scale shape: the only data-sized movements are one shuffle keyed on
centroid_id (bounded blocks — a cluster is at most the corpus/k
expectation, and a skewed mega-cluster is visible in the assignment
histogram before the quadratic stage runs) and the id-pair graph.
The known SemDeDup recall trade — a near-dup pair straddling two
clusters is never compared — is inherent to the method, not this
implementation; raising ``iters`` tightens clusters and shrinks the
boundary loss.

Rows-only (k-means + argmin tie-breaks are not worth mirroring in
SQL); planted-duplicate behavior is pinned in tests/test_semantic.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup.clusters import connected_components
from pyanamo_spark.dedup.embedding import block_candidates
from pyanamo_spark.functions.vectors import dot
from pyanamo_spark.registry import register
from pyanamo_spark.similarity.ivf import N_CENTROIDS, _lloyd_step, _nearest

#: within-cluster cosine at or above this is a semantic duplicate
THRESHOLD = 0.35


def _fit_centroids(emb: DataFrame, iters: int) -> DataFrame:
    """Deterministic seed pick (lowest vec_ids) + Lloyd refinements —
    the same quantizer ``similarity/ivf.build_index`` fits, over a
    caller-supplied corpus."""
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
    return centroids


def semantic_prune(
    vectors: DataFrame,
    iters: int = 1,
    threshold: float = THRESHOLD,
) -> DataFrame:
    """(vec_id, cluster_id, is_keeper) for every vector in a
    within-cluster near-duplicate group; unmatched vectors are not
    emitted (at corpus scale "no duplicate" is the overwhelming case
    and labeling it would dwarf the answer — same contract as
    q_dedup_clusters).

    ``vectors`` needs (vec_id, embedding) columns. The keeper is the
    min vec_id of each connected duplicate group.
    """
    emb = vectors.withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    centroids = _fit_centroids(emb, iters)
    blocks = emb.join(_nearest(emb, centroids, 1), "vec_id")
    pairs = (
        blocks.select("centroid_id", "vec_id", "embedding")
        .groupBy("centroid_id")
        .applyInPandas(
            lambda pdf: block_candidates(pdf, threshold),
            "vec_a long, vec_b long",
        )
    )
    labels = connected_components(
        pairs.select(
            F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
        )
    )
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_keeper"),
    )


@register("q_semantic_prune", oracle=None)
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means blocks via the IVF
    quantizer, per-cluster BLAS cosine pairs, connected-component
    keeper selection."""
    return semantic_prune(
        spark.table("embeddings").select("vec_id", "embedding")
    )
