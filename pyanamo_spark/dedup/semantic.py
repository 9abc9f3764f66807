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
    numpy matmul per cluster), fused with a block-LOCAL union-find:
    since a vector belongs to exactly one k-means block, duplicate
    components cannot span blocks, so the per-block components ARE
    the global components — no distributed label-propagation rounds
    (``dedup/clusters.py``) are needed here, unlike pair graphs from
    multi-bucket blocking (LSH bands) where a doc appears in many
    buckets and components genuinely chain across them

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

import numpy as np
import pandas as pd

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


def _prune_block(pdf: pd.DataFrame, lo: float) -> pd.DataFrame:
    """One k-means block -> (vec_id, cluster_id, is_keeper) for its
    near-duplicate groups: full-matrix cosine, then union-find over
    the above-threshold pairs, all local to the block.

    Because every vector belongs to exactly one block, duplicate
    components can never span blocks — so connected components here
    IS the global answer, with zero extra Spark jobs (the earlier
    form ran the distributed label-propagation loop over the pair
    graph: 4+ shuffle rounds to rediscover per-block structure)."""
    empty = pd.DataFrame(
        {"vec_id": [], "cluster_id": [], "is_keeper": []}
    ).astype({"vec_id": "int64", "cluster_id": "int64", "is_keeper": "bool"})
    pdf = pdf[pdf["embedding"].notna()]
    if len(pdf) < 2:
        return empty
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0.0] = 1.0
    sims = (mat @ mat.T) / np.outer(nrm, nrm)
    ai, bi = np.nonzero(np.triu(sims >= lo, k=1))
    if not len(ai):
        return empty
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ai.tolist(), bi.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    members = np.unique(np.concatenate([ai, bi]))
    roots = np.array([find(int(m)) for m in members])
    # component label = min vec_id in the component
    comp_min: dict[int, int] = {}
    for m, r in zip(members.tolist(), roots.tolist()):
        v = int(ids[m])
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    labels = np.array([comp_min[int(r)] for r in roots], dtype=np.int64)
    vec_ids = ids[members].astype(np.int64)
    return pd.DataFrame(
        {
            "vec_id": vec_ids,
            "cluster_id": labels,
            "is_keeper": vec_ids == labels,
        }
    )


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
    return (
        blocks.select("centroid_id", "vec_id", "embedding")
        .groupBy("centroid_id")
        .applyInPandas(
            lambda pdf: _prune_block(pdf, threshold),
            "vec_id long, cluster_id long, is_keeper boolean",
        )
    )


@register(
    "q_semantic_prune",
    oracle=None,
    rows_only_reason=(
    "k-means block assignment depends on seeded init and float"
    " iteration; tests pin keeper semantics and prune-rate bounds on"
    " planted clusters"
    ),
)
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means blocks via the IVF
    quantizer, per-cluster BLAS cosine pairs, connected-component
    keeper selection."""
    return semantic_prune(
        spark.table("embeddings").select("vec_id", "embedding")
    )
