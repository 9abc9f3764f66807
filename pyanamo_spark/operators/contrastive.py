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

Oracle-checked via the planted ground-truth audit (r09): LSH banding
is seeded-hash-specific (xxhash64), but DuckDB recomputes the exact
shingle-Jaccard verdict of every planted mutant pair and the declared
query certifies the miner agreed, plus the triplet contract (negatives
distinct, no false negatives, slots unique); negative determinism
stays pinned in tests/test_contrastive.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup import MUTANT_SUFFIX
from pyanamo_spark.dedup.minhash import _SH_SQL, candidate_pairs
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
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(anchor_id, positive_id, jaccard, slot, negative_id) triplets.

    ``pairs`` lets the declared query hand in the memoized
    mutant-corpus candidate table (minhash.mutant_candidate_pairs) so
    the LSH pipeline is shared with q_dedup_near; ad-hoc corpora
    (tests) compute their own candidates."""
    if pairs is None:
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
    oracle=f"""
WITH planted AS (
  SELECT doc_id, text, text || '{MUTANT_SUFFIX}' AS mut
  FROM documents WHERE doc_id % 100 = 0 AND text IS NOT NULL
),
sh AS (
  SELECT doc_id,
         {_SH_SQL.format(c="text")} AS a,
         {_SH_SQL.format(c="mut")} AS b
  FROM planted
)
SELECT 'planted' AS kind, doc_id AS id,
       CAST(ROUND(CAST(len(list_intersect(a, b)) AS DOUBLE)
                  / (len(a) + len(b) - len(list_intersect(a, b))), 6)
            >= {JACCARD_MIN} AS INTEGER) AS expected_match,
       CAST(1 AS INTEGER) AS ok
FROM sh
UNION ALL
SELECT 'structure', CAST(-1 AS BIGINT), CAST(1 AS INTEGER),
       CAST(1 AS INTEGER)
""",
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining, audited: the full LSH-positive +
    hash-negative pipeline runs over the mutant corpus
    (``mine_contrastive``), then the DECLARED output certifies it
    against ground truth the oracle re-derives —

    - ``kind='planted'``: one row per planted mutant source.
      ``expected_match`` is the exact 3-shingle Jaccard verdict of
      (text, text+suffix) at the {JACCARD_MIN} positive floor, which
      DuckDB recomputes exactly (the q_dedup_near machinery); ``ok``
      certifies the miner agreed — anchor/positive triplets present
      when expected (with ≥ 1 surviving negative slot), absent when
      not.
    - ``kind='structure'``: one global row certifying the triplet
      contract over the WHOLE output: negatives never equal their
      anchor or positive, no negative is a verified near-dup of its
      anchor in either orientation (the no-false-negative guarantee),
      and slots are distinct within each (anchor, positive) pair.

    Negative ids themselves are seeded-hash-specific (why this seat
    was rows-only); negative determinism and planted recall stay
    pinned in tests/test_contrastive.py."""
    from pyanamo_spark.dedup import (
        MUTANT_OFFSET,
        corpus_with_mutants,
        shingles,
    )

    from pyanamo_spark.dedup.minhash import mutant_candidate_pairs

    corpus = corpus_with_mutants(spark)
    trips = mine_contrastive(
        spark, corpus, pairs=mutant_candidate_pairs(spark, sf_dir)
    ).persist()

    def hs(col_sql: str):
        return F.array_distinct(
            F.transform(shingles(col_sql), lambda s: F.xxhash64(s))
        )

    planted = (
        spark.table("documents")
        # null text drops on BOTH sides (the null-row contract): the
        # shingle expressions would null-propagate into a NULL verdict
        .filter((F.col("doc_id") % 100 == 0) & F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("id"),
            hs("text").alias("h_a"),
            hs(f"concat(text, '{MUTANT_SUFFIX}')").alias("h_b"),
        )
    )
    jac = F.size(F.array_intersect("h_a", "h_b")) / F.size(
        F.array_union("h_a", "h_b")
    )
    expected = planted.select(
        "id",
        (F.round(jac, 6) >= JACCARD_MIN).cast("int").alias("expected_match"),
    )
    found = (
        trips.filter(
            F.col("positive_id") - F.col("anchor_id") == MUTANT_OFFSET
        )
        .select(F.col("anchor_id").alias("id"))
        .distinct()
        .withColumn("_found", F.lit(1))
    )
    planted_audit = expected.join(found, "id", "left").select(
        F.lit("planted").alias("kind"),
        "id",
        "expected_match",
        (F.coalesce(F.col("_found"), F.lit(0)) == F.col("expected_match"))
        .cast("int")
        .alias("ok"),
    )
    pair_set = trips.select("anchor_id", "positive_id").distinct()
    false_negs = trips.join(
        pair_set.select(
            F.col("anchor_id").alias("a"),
            F.col("positive_id").alias("n"),
        ).unionByName(
            pair_set.select(
                F.col("positive_id").alias("a"),
                F.col("anchor_id").alias("n"),
            )
        ),
        (F.col("anchor_id") == F.col("a"))
        & (F.col("negative_id") == F.col("n")),
        "left_semi",
    )
    struct_flags = trips.agg(
        F.coalesce(
            F.min(
                (
                    (F.col("negative_id") != F.col("anchor_id"))
                    & (F.col("negative_id") != F.col("positive_id"))
                ).cast("int")
            ),
            F.lit(1),
        ).alias("neg_distinct_ok"),
    ).crossJoin(
        false_negs.agg(
            (F.count("*") == 0).cast("int").alias("no_false_neg_ok")
        )
    ).crossJoin(
        trips.groupBy("anchor_id", "positive_id")
        .agg(
            (F.count_distinct("slot") == F.count("slot"))
            .cast("int")
            .alias("s_ok")
        )
        .agg(F.coalesce(F.min("s_ok"), F.lit(1)).alias("slots_ok"))
    )
    structure = struct_flags.select(
        F.lit("structure").alias("kind"),
        F.lit(-1).cast("long").alias("id"),
        F.lit(1).cast("int").alias("expected_match"),
        (
            (F.col("neg_distinct_ok") == 1)
            & (F.col("no_false_neg_ok") == 1)
            & (F.col("slots_ok") == 1)
        )
        .cast("int")
        .alias("ok"),
    )
    return planted_audit.unionByName(structure)
