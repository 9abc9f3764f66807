"""n-gram Jaccard near-duplicate detection (north star), oracle-checked.

Unlike the MinHash path (probabilistic, xxhash-based, rows-only), this
variant is exact and fully SQL-expressible: block pairs on
(lang, token-count bucket), compare word-trigram sets. Candidate
generation uses PREFIX FILTERING (the AllPairs/PPJoin family): each
doc's shingles are ranked by global document frequency ascending, and
only the first ``|A| - ceil(t*|A|) + 1`` participate in the posting
self-join. Any pair with Jaccard >= t shares >= ceil(t*|A|) elements,
which cannot all hide in the dropped suffix, so at least one shared
shingle survives in BOTH prefixes — recall is guaranteed by the
pigeonhole bound, not by a frequency-threshold assumption. High-df
boilerplate shingles (the d^2 join blowup at scale: a shingle in d docs
contributes d^2 candidate rows) rank last and fall outside almost every
prefix. The exact blocked all-pairs oracle hash-checks completeness on
every driver run.

Note the fixture vocabulary is tiny (~30 words), so *token-set* Jaccard
is degenerate (long docs contain every word); trigram shingles keep
cross-doc similarity low and mutant-pair similarity high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    """North-star n-gram Jaccard dedup: blocked candidate generation +
    exact trigram-set Jaccard ≥ 0.6 over the mutant corpus.

    Scale shape (all result-preserving, completeness re-checked by the
    exact all-pairs oracle):
      - PREFIX FILTER: J(A,B) ≥ t ⟹ |A∩B| ≥ ceil(t·|A|), so the
        dropped suffix of ceil(t·|A|)−1 highest-df shingles cannot
        contain the whole intersection — posting lists shrink to
        (1−t)·|A|+1 entries holding each doc's RAREST shingles, and a
        shingle appearing in d docs no longer contributes d² candidate
        rows unless it is rare enough to sit in prefixes (this was the
        22x-at-10x-data superlinearity: near-dup density grows with
        corpus size, boilerplate df grows linearly).
      - size-ratio prefilter: jaccard ≥ t implies
        min(|A|,|B|) ≥ t·max(|A|,|B|), checked on precomputed sizes.
      - candidates verify on the FULL shingle arrays (one array
        intersect per candidate pair, candidates ≈ true near-dups);
        |A∪B| = |A|+|B|−|A∩B| so only the intersection is computed.
    """
    from pyanamo_spark.dedup import corpus_with_mutants

    corpus = corpus_with_mutants(spark)
    prepped = corpus.select(
        "doc_id",
        "lang",
        (F.size(F.split("text", " ")) / 20).cast("int").alias("size_bucket"),
        F.array_distinct(
            F.transform(shingles("text"), lambda s: F.xxhash64(s))
        ).alias("sh"),
    ).withColumn("n_sh", F.size("sh")).persist()
    # persisted: posting build, df count, and the verify stage all read
    # the tokenized corpus; re-tokenizing three times dominates at scale
    postings = prepped.select(
        "doc_id", "lang", "size_bucket", "n_sh", F.explode("sh").alias("h")
    )
    # global document frequency — the total order for prefix ranking
    # (df asc, h asc as tiebreak). Rarest-first puts boilerplate last.
    # df = 1 shingles are dropped BEFORE ranking: they cannot generate
    # a candidate (no second doc shares them), and excluding them from
    # the prefix keeps the recall proof intact — every shared shingle
    # has df >= 2, and the number of df>=2 shingles a doc leaves out of
    # its prefix is still <= ceil(t|A|) - 1 < the required overlap. On
    # a real corpus most shingles are unique, so this shrinks the
    # ranked set (and the per-doc window) by the long df=1 tail.
    df_tab = postings.groupBy("h").agg(F.count("*").alias("df"))
    ranked = postings.join(
        df_tab.filter(F.col("df") >= 2), "h"
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")
        ),
    )
    # prefix length |A| - ceil(t|A|) + 1; the per-doc window shuffle is
    # doc-length-bounded (SortExec spills on pathological docs)
    prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n_sh") - F.ceil(F.lit(THRESHOLD) * F.col("n_sh")) + 1
    ).select("doc_id", "lang", "size_bucket", "n_sh", "h")
    a, b = prefix.alias("a"), prefix.alias("b")
    candidates = (
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
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact verification on full shingle sets — prune-independent
    full_a = prepped.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    full_b = prepped.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    verified = (
        candidates.join(full_a, "doc_a")
        .join(full_b, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jaccard = F.round(
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")),
        6,
    )
    return (
        verified.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------
# asymmetric containment (quote / excerpt / subset detection)

#: containment floor: |A∩B| / |A| for the CONTAINED side A
CONTAIN_T = 0.8

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
    deliberately crosses sizes), and the candidate prune is a one-sided
    PREFIX FILTER with GUARANTEED recall: containment ≥ T requires
    |A∩B| ≥ ceil(T·|A|) shared shingles, so dropping only the
    ceil(T·|A|)−1 highest-df shingles from the CONTAINED side's
    postings cannot hide the whole intersection — at least one shared
    shingle survives in A's prefix, and the container side keeps FULL
    postings, so every qualifying pair is generated. (An earlier
    absolute max-df cutoff silently missed contained docs whose shared
    shingles were all boilerplate — exactly the content containment
    targets; the pigeonhole prefix bound has no such assumption and
    tightens, not loosens, as df distributions skew at scale.) The
    final filter recounts on the real intersection; the oracle runs
    the exact all-pairs form, so completeness is hash-checked at every
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
    # global df ascending = the prefix total order (rarest first);
    # boilerplate shingles rank last and leave almost every prefix.
    # df = 1 shingles drop before ranking: no second doc shares them,
    # and every shared shingle has df >= 2, so the pigeonhole recall
    # bound is unchanged (see q_dedup_ngram)
    df_tab = postings.groupBy("h").agg(F.count("*").alias("df"))
    ranked = postings.join(
        df_tab.filter(F.col("df") >= 2), "h"
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")
        ),
    )
    # contained-side prefix: |A| - ceil(T·|A|) + 1 lowest-df shingles
    a_prefix = ranked.filter(
        F.col("rnk")
        <= F.col("n_sh") - F.ceil(F.lit(CONTAIN_T) * F.col("n_sh")) + 1
    ).select("doc_id", "lang", "h")
    b_full = postings.select("doc_id", "lang", "h")
    a, b = a_prefix.alias("a"), b_full.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("contained_doc"),
            F.col("b.doc_id").alias("container_doc"),
        )
        .distinct()
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
        candidates.join(full, "contained_doc")
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
