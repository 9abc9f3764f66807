"""Contrastive triplet mining: (anchor, positive, negative) document
triplets for embedding-model training — positives from verified
near-duplicate pairs, negatives drawn deterministically from the
corpus at large.

A retrieval/embedding model trains on exactly this shape (SimCSE/DPR
style); a data engine that already finds near-dups (the positive
signal) and numbers the corpus (the sampling frame) can emit training
triplets as one more query:

- positives: MinHash-LSH candidate pairs (banded self-join on band
  ids, never content — dedup/minhash.candidate_pairs) verified by
  exact Jaccard over hashed shingles at ``jaccard_min``
- negatives: for anchor a and slot i, the document at global rank
  ``xxhash64(a, i) mod n_docs`` — a pure row property, so the sample
  is identical across reruns, engines, and partitionings (the
  q_hash_split determinism contract), with no RNG state to ship
- the rank→doc mapping is the q_global_ids scale pattern (range
  exchange + per-partition rank + driver-cumsum offsets, nothing
  single-partition); the negative lookup is one narrow join on the
  rank key
- accidental positives (a sampled negative that IS a near-dup of the
  anchor) are removed by an anti-join against the verified pair set,
  both orientations — at corpus scale the loss is ~|dups|/n per slot,
  and dropping beats silently training on a false negative

Rows-only: LSH banding is seeded-hash-specific (xxhash64), not
oracle-expressible; tests pin planted positives, negative determinism,
and the no-false-negative guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup.minhash import candidate_pairs
from pyanamo_spark.operators.windows import global_rank_frame
from pyanamo_spark.registry import register

#: exact-Jaccard floor for a candidate pair to count as a positive
JACCARD_MIN = 0.35
#: negatives per (anchor, positive) pair
N_NEGATIVES = 2


def global_ranks(df: DataFrame, key: str) -> DataFrame:
    """(key, rank): contiguous 0-based ranks of ``key`` — the shared
    global-rank scale frame (operators/windows.global_rank_frame):
    range exchange whose width tracks the input, per-partition
    row_number, driver cumsum of partition counts broadcast back. No
    single-partition window, no constant parallelism."""
    return global_rank_frame(df, key, base=0)


def mine_contrastive(
    spark: SparkSession,
    corpus: DataFrame,
    jaccard_min: float = JACCARD_MIN,
    n_negatives: int = N_NEGATIVES,
) -> DataFrame:
    """(anchor_id, positive_id, jaccard, slot, negative_id) triplets."""
    pairs = candidate_pairs(spark, corpus)
    positives = (
        pairs.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_min)
        .select(
            F.col("doc_a").alias("anchor_id"),
            F.col("doc_b").alias("positive_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        # pairs-sized; three consumers below (slot fan-out, both
        # anti-join orientations) — materialize once or each re-runs
        # the whole LSH band pipeline
        .localCheckpoint()
    )
    ranks = global_ranks(corpus.select("doc_id"), "doc_id")
    n_docs = ranks.count()
    if n_docs == 0:
        return positives.withColumns(
            {"slot": F.lit(0), "negative_id": F.lit(None).cast("long")}
        ).limit(0)
    slots = positives.select(
        "*",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_negatives)])
        ).alias("slot"),
    )
    cand = slots.withColumn(
        "neg_rank",
        F.pmod(F.xxhash64("anchor_id", "slot"), F.lit(n_docs)),
    )
    neg = cand.join(
        ranks.select(
            F.col("rank").alias("neg_rank"),
            F.col("doc_id").alias("negative_id"),
        ),
        "neg_rank",
    ).drop("neg_rank")
    # drop self-hits and accidental near-dup negatives (both pair
    # orientations) — never train on a false negative
    pair_set = positives.select("anchor_id", "positive_id").unionByName(
        positives.select(
            F.col("positive_id").alias("anchor_id"),
            F.col("anchor_id").alias("positive_id"),
        )
    )
    return (
        neg.filter(
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_id") != F.col("positive_id"))
        )
        .join(
            pair_set.select(
                "anchor_id",
                F.col("positive_id").alias("negative_id"),
            ),
            ["anchor_id", "negative_id"],
            "left_anti",
        )
        .select("anchor_id", "positive_id", "jaccard", "slot", "negative_id")
    )


@register(
    "q_contrastive_pairs",
    oracle=None,
    rows_only_reason=(
    "positives come from LSH candidate buckets and negatives from"
    " seeded hashing — both engine-specific; test_contrastive.py pins"
    " triplet structure and anchor/positive similarity floors"
    ),
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplets over the documents fixture. Rows-only
    (LSH banding is engine-hash-specific); planted-duplicate recall,
    negative determinism, and false-negative exclusion are pinned in
    tests/test_contrastive.py."""
    return mine_contrastive(spark, spark.table("documents"))
