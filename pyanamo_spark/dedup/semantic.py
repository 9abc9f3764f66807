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

Oracle-checked via the planted identical-copy audit (r09): k-means +
argmin tie-breaks are not worth mirroring in SQL, but an exact copy is
GUARANTEED prunable (same block, cosine exactly 1), so the declared
query certifies that plus cluster well-formedness; planted-cluster
behavior stays pinned in tests/test_semantic.py.
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


#: identical-embedding copies planted into the AUDIT corpus (the
#: q_dedup_exact / q_dedup_simhash precedent): an exact copy has
#: identical distances to every centroid (same block under the
#: deterministic argmin tie-break) and within-block cosine exactly
#: 1.0, so SemDeDup MUST prune it against its source — a guarantee
#: DuckDB can re-derive without replaying k-means
_COPY_OFFSET = 1_000_000


@register(
    "q_semantic_prune",
    oracle=f"""
SELECT 'copy' AS kind, vec_id AS id, CAST(1 AS INTEGER) AS ok
FROM embeddings
WHERE vec_id % 100 = 0 AND embedding IS NOT NULL
UNION ALL
SELECT 'structure', CAST(-1 AS BIGINT), CAST(1 AS INTEGER)
""",
)
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table, audited: k-means blocks via
    the IVF quantizer, per-block BLAS cosine pairs, connected-component
    keeper selection (``semantic_prune``), certified in-engine on two
    fronts the oracle re-derives —

    - ``kind='copy'``: one row per planted identical-embedding copy
      (every 100th vector, replanted at +{_COPY_OFFSET}). A copy is
      guaranteed prunable — same block by the deterministic argmin
      tie-break, cosine exactly 1.0 ≥ {THRESHOLD} — so ``ok``
      certifies source and copy both appear, share a cluster, and at
      most one of them is the keeper. A block-assignment,
      thresholding, or union-find regression flips it.
    - ``kind='structure'``: one global row certifying the duplicate
      groups are well-formed — every cluster has ≥ 2 members, exactly
      one keeper, and its label/keeper is the min member vec_id.

    Block membership itself is seeded-k-means-specific (why this seat
    was rows-only); planted-cluster prune-rate bounds stay pinned in
    tests/test_semantic.py."""
    emb = spark.table("embeddings").select("vec_id", "embedding")
    # planted ids must clear the natural domain: the copy audit maps
    # out-rows back via vec_id - _COPY_OFFSET with only an id >= 0
    # filter, so a natural vec_id >= the offset would produce spurious
    # join rows and corrupt verdicts silently — fail loudly instead
    # (ADVICE r09)
    max_id = emb.agg(F.max("vec_id")).first()[0]
    if max_id is not None and max_id >= _COPY_OFFSET:
        # ValueError, not assert: stripped under python -O (ADVICE r10)
        raise ValueError(
            f"audit-corpus id collision: max natural vec_id {max_id} >= "
            f"planted offset {_COPY_OFFSET}; raise the offset above the "
            f"id domain before trusting the audit verdicts"
        )
    copies = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"), "embedding"
    )
    out = semantic_prune(emb.unionByName(copies)).persist()
    planted = emb.filter(
        (F.col("vec_id") % 100 == 0) & F.col("embedding").isNotNull()
    ).select(F.col("vec_id").alias("id"))
    orig = out.select(
        F.col("vec_id").alias("id"),
        F.col("cluster_id").alias("c_a"),
        F.col("is_keeper").alias("k_a"),
    )
    copy = out.select(
        (F.col("vec_id") - _COPY_OFFSET).alias("id"),
        F.col("cluster_id").alias("c_b"),
        F.col("is_keeper").alias("k_b"),
    ).filter(F.col("id") >= 0)
    copy_audit = (
        planted.join(orig, "id", "left")
        .join(copy, "id", "left")
        .select(
            F.lit("copy").alias("kind"),
            "id",
            (
                F.col("c_a").isNotNull()
                & F.col("c_b").isNotNull()
                & (F.col("c_a") == F.col("c_b"))
                & ~(
                    F.coalesce(F.col("k_a"), F.lit(False))
                    & F.coalesce(F.col("k_b"), F.lit(False))
                )
            )
            .cast("int")
            .alias("ok"),
        )
    )
    structure = (
        out.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_keeper").cast("int")).alias("n_keep"),
            F.min("vec_id").alias("min_id"),
            F.max(
                F.when(F.col("is_keeper"), F.col("vec_id"))
            ).alias("keeper_id"),
        )
        .agg(
            # vacuous no-clusters case coalesces to 1 (the contract is
            # sound over zero groups — the contrastive precedent); the
            # oracle asserts the same literal 1
            F.coalesce(
                F.min(
                    (
                        (F.col("n") >= 2)
                        & (F.col("n_keep") == 1)
                        & (F.col("min_id") == F.col("cluster_id"))
                        & (F.col("keeper_id") == F.col("cluster_id"))
                    ).cast("int")
                ),
                F.lit(1),
            ).alias("ok")
        )
        .select(
            F.lit("structure").alias("kind"),
            F.lit(-1).cast("long").alias("id"),
            F.col("ok").cast("int"),
        )
    )
    return copy_audit.unionByName(structure)
