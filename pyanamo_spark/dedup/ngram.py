"""n-gram Jaccard near-duplicate detection (north star), oracle-checked.

Unlike the MinHash path (probabilistic, xxhash-based, rows-only), this
variant is exact and fully SQL-expressible: block pairs on
(lang, token-count bucket), compare word-trigram sets. Blocking keeps
the pair count linear-ish; at 100 TB you'd use the MinHash bands as the
blocking key instead — same join shape.

Note the fixture vocabulary is tiny (~30 words), so *token-set* Jaccard
is degenerate (long docs contain every word); trigram shingles keep
cross-doc similarity low and mutant-pair similarity high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.dedup import CORPUS_SQL, shingles
from pyanamo_spark.registry import register

THRESHOLD = 0.6


@register(
    "q_dedup_ngram",
    oracle=f"""
WITH corpus AS (
{CORPUS_SQL}
),
prepped AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) // 20 AS size_bucket,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
         )) AS sh
  FROM corpus
),
sized AS (
  SELECT doc_id, lang, size_bucket, sh, len(sh) AS n_sh FROM prepped
),
scored AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) AS inter,
         a.n_sh AS na, b.n_sh AS nb
  FROM sized a
  JOIN sized b
    ON a.lang = b.lang AND a.size_bucket = b.size_bucket
   AND a.doc_id < b.doc_id
   AND LEAST(a.n_sh, b.n_sh)
       >= CAST({THRESHOLD} AS DOUBLE) * GREATEST(a.n_sh, b.n_sh)
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
FROM scored
WHERE ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= {THRESHOLD}
""",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star n-gram Jaccard dedup: blocked self-join +
    trigram-set Jaccard ≥ 0.6 over the mutant corpus.

    Two scale optimizations (both result-preserving):
      - size-ratio prefilter: jaccard ≥ t implies
        min(|A|,|B|) ≥ t·max(|A|,|B|), checked on precomputed set sizes
        before any set intersection runs
      - |A∪B| = |A|+|B|-|A∩B|, so only the intersection is computed —
        array_union over every candidate pair was ~half the work
    """
    from pyanamo_spark.dedup import corpus_with_mutants

    corpus = corpus_with_mutants(spark)
    # Inverted-index set-similarity join (PPJoin-style, exact):
    #   1. shingles hashed to 64-bit longs (|distinct hashes| =
    #      |distinct shingles| absent a ~1e-15 collision, so jaccard is
    #      unchanged and the string-set oracle still matches)
    #   2. explode (doc, shingle) and self-join on the shingle within
    #      the block — work is proportional to shingles actually
    #      SHARED by pairs, not |A|·|B| per candidate pair
    #   3. count shared shingles per pair → |A∩B|;
    #      |A∪B| = |A|+|B|-|A∩B|
    # Pairs sharing nothing never materialize (their jaccard is 0).
    prepped = corpus.select(
        "doc_id",
        "lang",
        (F.size(F.split("text", " ")) / 20).cast("int").alias("size_bucket"),
        F.array_distinct(
            F.transform(shingles("text"), lambda s: F.xxhash64(s))
        ).alias("sh"),
    ).withColumn("n_sh", F.size("sh")).persist()
    # persisted: both sides of the posting self-join re-tokenize the
    # corpus otherwise; the explode itself is cheap to redo
    postings = prepped.select(
        "doc_id", "lang", "size_bucket", "n_sh", F.explode("sh").alias("h")
    )
    a, b = postings.alias("a"), postings.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.size_bucket") == F.col("b.size_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio prefilter: jaccard ≥ t ⟹ min ≥ t·max
            & (
                F.least("a.n_sh", "b.n_sh")
                >= F.lit(THRESHOLD).cast("double")
                * F.greatest("a.n_sh", "b.n_sh")
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jaccard = F.round(
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")),
        6,
    )
    return (
        pair_counts.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
