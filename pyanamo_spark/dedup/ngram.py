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


# ---------------------------------------------------------------------
# asymmetric containment (quote / excerpt / subset detection)

#: containment floor: |A∩B| / |A| for the CONTAINED side A
CONTAIN_T = 0.8
#: posting-list prune: shingles appearing in more than this many docs
#: are dropped from candidate generation (boilerplate shingles pair
#: everything with everything); exactness is preserved by verifying
#: candidates on their FULL shingle sets
CONTAIN_MAX_DF = 500

_CONTAIN_ORACLE = f"""
WITH corpus AS (
{CORPUS_SQL}
),
prepped AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
         )) AS sh
  FROM corpus
),
sized AS (
  SELECT doc_id, lang, sh, len(sh) AS n_sh FROM prepped
),
pairs AS (
  SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
         len(list_intersect(a.sh, b.sh)) AS inter, a.n_sh AS na
  FROM sized a JOIN sized b
    ON a.lang = b.lang AND a.doc_id <> b.doc_id
)
SELECT contained_doc, container_doc,
       ROUND(CAST(inter AS DOUBLE) / na, 6) AS containment
FROM pairs
WHERE inter >= {CONTAIN_T} * na
"""


@register("q_dedup_contain", oracle=_CONTAIN_ORACLE)
def q_dedup_contain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment: (contained, container) pairs where ≥80%
    of the contained doc's trigram set appears in the container — the
    quote/excerpt/boilerplate-subset signal symmetric Jaccard misses
    (a tweet quoted inside an article has tiny Jaccard but containment
    ≈ 1).

    Scale shape mirrors q_dedup_ngram's inverted index with two
    containment-specific changes: no size-bucket blocking (containment
    deliberately crosses sizes) and a max-df prune on posting lists —
    near-universal shingles would pair everything with everything, and
    dropping them from CANDIDATE GENERATION is safe because a doc with
    ≥80%% of its shingles shared keeps plenty of sub-threshold-df ones
    at any realistic vocabulary skew; the final filter recounts on the
    real intersection. The oracle runs the exact all-pairs form, so
    the prune's completeness is hash-checked, not assumed, at every
    driver run."""
    from pyanamo_spark.dedup import corpus_with_mutants, shingles

    corpus = corpus_with_mutants(spark)
    prepped = (
        corpus.select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.transform(shingles("text"), lambda s: F.xxhash64(s))
            ).alias("sh"),
        )
        .withColumn("n_sh", F.size("sh"))
        .persist()
    )
    postings = prepped.select(
        "doc_id", "lang", "n_sh", F.explode("sh").alias("h")
    )
    rare = (
        postings.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= CONTAIN_MAX_DF)
        .select("h")
    )
    pruned = postings.join(rare, "h", "semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained_doc"),
            F.col("b.doc_id").alias("container_doc"),
        )
        .agg(F.count("*").alias("shared_rare"))
    )
    # verify candidates on the FULL shingle sets (prune-independent)
    full = prepped.select(
        F.col("doc_id").alias("contained_doc"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    fullb = prepped.select(
        F.col("doc_id").alias("container_doc"), F.col("sh").alias("sh_b")
    )
    verified = (
        pair_counts.join(full, "contained_doc")
        .join(fullb, "container_doc")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .filter(F.col("inter") >= CONTAIN_T * F.col("na"))
    )
    return verified.select(
        "contained_doc",
        "container_doc",
        F.round(F.col("inter").cast("double") / F.col("na"), 6).alias(
            "containment"
        ),
    )
