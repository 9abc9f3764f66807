"""Training-data curation operators (north star): deterministic
train/val/test splitting, pattern scrubbing, benchmark decontamination.

These are the pipeline stages between dedup and training that the
reference's ETL orchestration implies but never ships (its items carry
opaque task scripts — see SURVEY.md §2.10); here they are first-class
declared queries over the ``documents`` table.

Scale notes (100 TB):
  - hash-split is a pure narrow projection — no shuffle, no state, and
    the assignment is stable under repartitioning/backfill because it
    depends only on the row's own key
  - scrubbing is one codegen'd regexp pass per row — at scale the only
    cost is the scan itself
  - decontamination broadcasts the benchmark n-gram set (benchmarks are
    tiny relative to the corpus) and aggregates map-side; the corpus
    side never shuffles document text, only (doc_id, hit) pairs
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.dedup import shingles
from pyanamo_spark.registry import register

#: hex-prefix boundaries: 12/16 train, 2/16 val, 2/16 test
_VAL_LO, _TEST_LO = "c", "e"

#: entity terms standing in for PII patterns — the fixture corpus is a
#: closed-vocabulary word soup, so real email/phone regexes would match
#: nothing; the expression shape (alternation -> placeholder + count)
#: is exactly what a production scrubber compiles to
_SCRUB_PATTERN = r"\b(customer|supplier)\b"
_PLACEHOLDER = "<ENTITY>"

#: benchmark membership: every 500th doc
_BENCH_MOD = 500

#: stratified-sample keep thresholds, per stratum, as 4-hex-digit
#: prefixes: keep iff md5(doc_id:lang)[:4] < threshold, i.e. rate =
#: int(threshold, 16) / 65536. Strata absent from the map keep all
#: rows. en is ~3x over-represented in the fixture mixture → 0.3125;
#: zh trimmed lightly → 0.875.
_STRATA_THRESHOLDS = {"en": "5000", "zh": "e000"}


@register(
    "q_hash_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{_VAL_LO}'
            THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{_TEST_LO}'
            THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from a content-free,
    engine-portable hash of the document key (md5 hex prefix:
    12/16 train, 2/16 val, 2/16 test).

    Keying on doc_id rather than a random() draw makes the split stable
    across reruns, engines, partitionings, and incremental arrivals —
    the property a training pipeline actually needs from its split."""
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return spark.table("documents").select(
        "doc_id",
        F.when(prefix < _VAL_LO, "train")
        .when(prefix < _TEST_LO, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_scrub",
    oracle=f"""
SELECT doc_id,
       regexp_replace(text, '{_SCRUB_PATTERN}', '{_PLACEHOLDER}', 'g')
         AS scrubbed,
       CAST(len(regexp_extract_all(text, '{_SCRUB_PATTERN}')) AS BIGINT)
         AS n_scrubbed
FROM documents
""",
)
def q_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing: replace entity terms with a placeholder and
    count replacements per doc — one vectorized regexp pass, the same
    plan a PII scrubber (emails/phones/ids) runs at scale."""
    return spark.table("documents").select(
        "doc_id",
        F.regexp_replace("text", _SCRUB_PATTERN, _PLACEHOLDER).alias(
            "scrubbed"
        ),
        F.regexp_count("text", F.lit(_SCRUB_PATTERN))
        .cast("long")
        .alias("n_scrubbed"),
    )


@register(
    "q_decontaminate",
    oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
         )) AS sh
  FROM documents
),
bench AS (
  SELECT DISTINCT unnest(sh) AS gram, doc_id AS bench_id
  FROM grams WHERE doc_id % {_BENCH_MOD} = 0
),
corpus AS (
  SELECT doc_id, unnest(sh) AS gram
  FROM grams WHERE doc_id % {_BENCH_MOD} != 0
)
SELECT c.doc_id,
       CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_hits
FROM corpus c
JOIN bench b USING (gram)
GROUP BY c.doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    trigram with a held-out benchmark set (every 500th doc), with the
    count of distinct benchmark docs hit.

    Production uses longer n-grams (e.g. 13-grams); the fixture's ~30
    word vocabulary needs trigrams for non-degenerate overlap. The
    benchmark side collapses to distinct (gram, bench_id) pairs and is
    broadcast — the corpus side's text never shuffles."""
    docs = spark.table("documents")
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text"))).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("gram", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").cast("long").alias("n_bench_hits")
        )
    )


def _strata_case_sql() -> str:
    whens = "\n".join(
        f"  WHEN '{lang}' THEN"
        f" substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4)"
        f" < '{thr}'"
        for lang, thr in sorted(_STRATA_THRESHOLDS.items())
    )
    return f"CASE lang\n{whens}\n  ELSE TRUE END"


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {_strata_case_sql()}
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling for mixture rebalancing: each language
    stratum keeps a configured fraction of its docs (en downsampled
    ~3x to level the fixture's language skew), decided per row by a
    content-free hash of (doc_id, lang).

    Like q_hash_split, hashing the key instead of drawing random()
    makes the sample a pure row property: stable under reruns,
    repartitioning, engine changes, and incremental arrivals (a
    backfilled doc keeps or drops identically), and the whole operator
    is a narrow codegen'd filter — no shuffle, no sample() RNG state,
    nothing driver-side. The salt ':'+lang decorrelates the draw from
    q_hash_split's split assignment so sampling doesn't bias splits.
    """
    draw = F.substring(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("lang")
            )
        ),
        1,
        4,
    )
    keep = F.lit(True)
    for lang, thr in _STRATA_THRESHOLDS.items():
        keep = F.when(F.col("lang") == lang, draw < thr).otherwise(keep)
    return spark.table("documents").filter(keep).select("doc_id", "lang")


#: context-length chunking: window of CHUNK tokens, stride CHUNK-OVERLAP
_CHUNK, _OVERLAP = 32, 8
_STRIDE = _CHUNK - _OVERLAP


@register(
    "q_chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
idx AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(
           0, (greatest(n - {_CHUNK}, 0) + {_STRIDE - 1}) // {_STRIDE}
         )) AS c
  FROM t
)
SELECT doc_id,
       CAST(c AS BIGINT) AS chunk_idx,
       array_to_string(toks[c * {_STRIDE} + 1 : c * {_STRIDE} + {_CHUNK}], ' ')
         AS chunk,
       CAST(least(n - c * {_STRIDE}, {_CHUNK}) AS BIGINT) AS chunk_tokens
FROM idx
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: every document becomes overlapping
    token windows (32 tokens, stride 24 → 8-token overlap), the step
    between curation and packing when documents exceed the training
    context. The final window is allowed to run short rather than
    re-reading tokens, and every token lands in at least one chunk.

    A narrow projection + explode: tokenize once, derive the window
    starts arithmetically, slice per window — no shuffle, no UDF, and
    the chunk count per doc is (n - chunk)/stride + 1 so output size
    is linear in input tokens regardless of document length skew."""
    return (
        spark.table("documents")
        .withColumn("toks", F.split("text", " "))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "c",
            F.explode(
                F.expr(
                    f"sequence(0, (greatest(n - {_CHUNK}, 0)"
                    f" + {_STRIDE - 1}) div {_STRIDE})"
                )
            ),
        )
        .select(
            "doc_id",
            F.col("c").cast("long").alias("chunk_idx"),
            F.expr(
                f"array_join(slice(toks, c * {_STRIDE} + 1, {_CHUNK}), ' ')"
            ).alias("chunk"),
            F.expr(f"least(n - c * {_STRIDE}, {_CHUNK})")
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


#: fixed-size sample: docs kept per language
_GROUP_SAMPLE_K = 10


@register(
    "q_group_sample",
    oracle=f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '#k'), doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= {_GROUP_SAMPLE_K}
""",
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sampling (k docs per language) — the
    deterministic replacement for per-group reservoir sampling.
    Ordering by a key hash is a uniform random draw that is also a
    pure row property, so the k chosen docs are identical across
    reruns, engines, and partitionings — and the "sample" is just a
    rank filter any engine can replay.

    Scale: the window sorts within each stratum; for strata of
    billions of rows the same result is produced cheaply by
    pre-filtering on a generous hash-prefix threshold (expected
    several×k survivors — the q_stratified_sample move) and ranking
    only the survivors, keeping the sort bounded."""
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#k"))),
        "doc_id",
    )
    return (
        spark.table("documents")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _GROUP_SAMPLE_K)
        .select("doc_id", "lang")
    )


#: mixture temperature: rates ∝ share^ALPHA (α<1 upweights the tail)
MIX_ALPHA = 0.7
#: documents the rebalanced mixture should total
MIX_TARGET = 10_000


@register(
    "q_mixture_weights",
    oracle=f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
powered AS (
  SELECT source, n_docs,
         POWER(n_docs * 1.0 / (SELECT SUM(n_docs) FROM counts),
               {MIX_ALPHA}) AS p
  FROM counts
)
SELECT source, n_docs,
       ROUND(p / (SELECT SUM(p) FROM powered), 6) AS mix_weight,
       CAST(ROUND({MIX_TARGET} * p / (SELECT SUM(p) FROM powered), 0)
            AS BIGINT) AS target_docs
FROM powered
""",
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual /
    multi-source sampling rule: weight ∝ share^α with α = {MIX_ALPHA},
    which upweights tail sources without letting any head source
    dominate). Everything past the one map-side-combinable source
    count is window math on the SOURCES-sized aggregate; the emitted
    per-source target_docs drive q_stratified_sample's keep rates."""
    from pyspark.sql import Window as W

    w = W.partitionBy()
    counts = (
        spark.table("documents").groupBy("source").agg(
            F.count("*").alias("n_docs")
        )
    )
    p = F.pow(
        F.col("n_docs") / F.sum("n_docs").over(w), F.lit(MIX_ALPHA)
    )
    z = F.sum(p).over(w)
    return counts.select(
        "source",
        "n_docs",
        F.round(p / z, 6).alias("mix_weight"),
        F.round(F.lit(MIX_TARGET) * p / z, 0)
        .cast("long")
        .alias("target_docs"),
    )
