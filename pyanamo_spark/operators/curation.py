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

    Scale: the rank<=k filter plans as WindowGroupLimit in
    partial+final mode (verified in the formatted plan, r10) — every
    map task keeps only its k smallest hashes per stratum BEFORE the
    exchange, so the per-stratum window never sorts a
    billion-row stratum; the shuffle carries at most
    k x strata x tasks rows and the final rank runs over
    k x tasks rows per stratum."""
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


#: weighted-sample scale: P(keep) = n_chars / _WS_SCALE (≈50% overall
#: on the fixture's length distribution; uncapped lengths keep at 1)
_WS_SCALE = 600.0


@register(
    "q_weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
WHERE n_chars >= {_WS_SCALE}
   OR substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8)
      < lpad(lower(to_hex(CAST(floor(n_chars / {_WS_SCALE} * 4294967296)
                               AS BIGINT))), 8, '0')
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling: keep each document with
    probability proportional to its length (the importance-sampling
    move a data mixer uses to bias toward long documents without a
    global sort or a normalizing pass).

    Determinism is the design: the coin flip is the 32-bit md5 prefix
    of the doc key compared against the weight-derived threshold
    rendered in hex — a pure row property, so the sample is identical
    across reruns, engines, partitionings, and incremental arrivals,
    and the oracle replays it exactly (both engines emit lowercase hex;
    equal-length lexicographic compare == numeric compare). Scale: one
    codegen'd scan-side filter, no shuffle, no state; weights ≥ the
    scale keep with probability 1 via the explicit guard (a 9-hex-digit
    threshold would corrupt the string compare)."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws")))
    threshold = F.lpad(
        F.lower(
            F.hex(
                F.floor(
                    F.col("n_chars") / _WS_SCALE * F.lit(4294967296.0)
                ).cast("long")
            )
        ),
        8,
        "0",
    )
    return (
        spark.table("documents")
        .filter(
            (F.col("n_chars") >= _WS_SCALE)
            | (F.substring(key, 1, 8) < threshold)
        )
        .select("doc_id", "n_chars")
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


#: q_curation_funnel quality gate (milli-score; fixture median ~704)
FUNNEL_QUALITY_MIN = 600

_FUNNEL_QUALITY_SQL = """CAST(
  LEAST(100, len(string_split(text, ' '))) * 4
  + CASE WHEN n_chars BETWEEN 50 AND 2000 THEN 300 ELSE 0 END
  + LEAST(300, (3000 * len(list_filter(string_split(text, ' '),
                           t -> t IN ({stops}))))
               // len(string_split(text, ' ')))
 AS BIGINT)"""


@register(
    "q_curation_funnel",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
cnt AS (SELECT term, SUM(tf) AS c FROM tf GROUP BY 1),
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cnt),
nll AS (
  SELECT tf.doc_id,
         ROUND(-SUM(tf.tf * ln((cnt.c + 1.0) / (tot.n + tot.v)))
               / SUM(tf.tf), 4) AS nll
  FROM tf JOIN cnt USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id
),
base AS (
  SELECT d.doc_id, d.n_chars, nll.nll,
         d.doc_id = MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS s2,
         {quality} >= {qmin} AS qok
  FROM documents d JOIN nll USING (doc_id)
),
q AS (SELECT *, s2 AND qok AS s3 FROM base),
med AS (SELECT quantile_cont(nll, 0.5) AS m FROM q WHERE s3),
f AS (
  SELECT q.*,
         q.s3 AND q.nll <= med.m AS s4,
         q.s3 AND q.nll <= med.m
           AND substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 1) < '{val_lo}'
           AS s5
  FROM q CROSS JOIN med
),
agg AS (
  SELECT COUNT(*) AS n1, CAST(SUM(n_chars) AS BIGINT) AS c1,
         COUNT(CASE WHEN s2 THEN 1 END) AS n2,
         CAST(SUM(CASE WHEN s2 THEN n_chars END) AS BIGINT) AS c2,
         COUNT(CASE WHEN s3 THEN 1 END) AS n3,
         CAST(SUM(CASE WHEN s3 THEN n_chars END) AS BIGINT) AS c3,
         COUNT(CASE WHEN s4 THEN 1 END) AS n4,
         CAST(SUM(CASE WHEN s4 THEN n_chars END) AS BIGINT) AS c4,
         COUNT(CASE WHEN s5 THEN 1 END) AS n5,
         CAST(SUM(CASE WHEN s5 THEN n_chars END) AS BIGINT) AS c5
  FROM f
)
SELECT 1 AS stage_rank, 'raw' AS stage, n1 AS n_docs, c1 AS n_chars FROM agg
UNION ALL SELECT 2, 'dedup', n2, c2 FROM agg
UNION ALL SELECT 3, 'quality', n3, c3 FROM agg
UNION ALL SELECT 4, 'fluent', n4, c4 FROM agg
UNION ALL SELECT 5, 'train', n5, c5 FROM agg
""",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel report: how many documents (and
    chars) survive each stage of a standard training-data pipeline —
    exact dedup -> quality gate -> LM-fluency gate -> train split.
    The composition query a pipeline owner runs before committing a
    corpus build; each stage reuses the exact expression its
    standalone operator registers.

    Scale shape: one pass computes per-doc survival flags (the dedup
    keeper window shuffles on the 16-byte text digest, not the text;
    the LM join is q_lm_score's term-keyed plan), the fluency cutoff
    is the bounded-memory exact median of the quality survivors
    (functions/quantiles.py) broadcast back as one row, and the five
    funnel rows come from a single final aggregation — counts never
    require materializing any intermediate corpus.
    """
    from pyanamo_spark.functions.quantiles import exact_group_percentiles
    from pyanamo_spark.functions.text import lm_score, quality_expr

    docs = spark.table("documents")
    nll = lm_score(docs).select("doc_id", "nll")
    w = W.partitionBy(F.md5("text"))
    # the flag table is consumed three times (median sketch, median
    # verify, final aggregation); checkpointing the text-free
    # (doc_id, n_chars, nll, s2, s3) projection — a few numeric
    # columns per doc — cuts the re-derivation of the LM join +
    # dedup window from every consumer's lineage (without it the
    # composed plan carries ~90 printed exchanges).
    base = (
        docs.join(nll, "doc_id")
        .withColumn("s2", F.col("doc_id") == F.min("doc_id").over(w))
        .withColumn(
            "s3",
            F.col("s2")
            & (quality_expr() >= F.lit(FUNNEL_QUALITY_MIN)),
        )
        .select("doc_id", "n_chars", "nll", "s2", "s3")
        .localCheckpoint()
    )
    med = exact_group_percentiles(
        base.filter("s3"), [], "nll", {"m": 0.5}
    )
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    f = (
        base.crossJoin(F.broadcast(med))
        .withColumn("s4", F.col("s3") & (F.col("nll") <= F.col("m")))
        .withColumn("s5", F.col("s4") & (prefix < F.lit(_VAL_LO)))
    )
    agg = f.agg(
        F.count("*").alias("n1"),
        F.sum("n_chars").alias("c1"),
        *[
            a
            for i in (2, 3, 4, 5)
            for a in (
                F.count(F.when(F.col(f"s{i}"), 1)).alias(f"n{i}"),
                F.sum(
                    F.when(F.col(f"s{i}"), F.col("n_chars"))
                ).alias(f"c{i}"),
            )
        ],
    )
    return agg.selectExpr(
        "inline(array("
        "struct(1 AS stage_rank, 'raw' AS stage, n1 AS n_docs, c1 AS n_chars),"
        "struct(2 AS stage_rank, 'dedup' AS stage, n2 AS n_docs, c2 AS n_chars),"
        "struct(3 AS stage_rank, 'quality' AS stage, n3 AS n_docs, c3 AS n_chars),"
        "struct(4 AS stage_rank, 'fluent' AS stage, n4 AS n_docs, c4 AS n_chars),"
        "struct(5 AS stage_rank, 'train' AS stage, n5 AS n_docs, c5 AS n_chars)))"
    )


# splice the reusable stage expressions into the funnel oracle template
from pyanamo_spark.functions.text import _STOP_LIST_SQL as _FUNNEL_STOPS  # noqa: E402
from pyanamo_spark.functions.text import STOPWORDS as _FUNNEL_STOP_SET  # noqa: E402
from pyanamo_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["q_curation_funnel"] = _ORACLES["q_curation_funnel"].format(
    quality=_FUNNEL_QUALITY_SQL.format(stops=_FUNNEL_STOPS),
    qmin=FUNNEL_QUALITY_MIN,
    val_lo=_VAL_LO,
)


@register(
    "q_group_split",
    oracle=f"""
SELECT doc_id, source,
       CASE WHEN substr(md5(source || ':gs'), 1, 1) < '{_VAL_LO}'
            THEN 'train'
            WHEN substr(md5(source || ':gs'), 1, 1) < '{_TEST_LO}'
            THEN 'val' ELSE 'test' END AS split
FROM documents
""",
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test assignment: the split key is the
    SOURCE, not the document — every document of a source lands in the
    same split (the GroupKFold discipline). Doc-keyed splitting leaks
    near-duplicates and syndicated copies across the train/eval
    boundary, because duplicates cluster within and across sources;
    group-keying is the standard defense (and composes with
    q_decontaminate for cross-source leakage).

    Same engine-portable md5-prefix mechanism as q_hash_split — a pure
    row property, no shuffle, stable under reruns and incremental
    arrivals of new docs from known sources."""
    prefix = F.substring(
        F.md5(F.concat(F.col("source"), F.lit(":gs"))), 1, 1
    )
    return spark.table("documents").select(
        "doc_id",
        "source",
        F.when(prefix < _VAL_LO, "train")
        .when(prefix < _TEST_LO, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------
# training-shard plan

#: output shard count for the shard-plan report
N_SHARDS = 8

_SHARD_ORACLE = f"""
SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
            AS INTEGER) % {N_SHARDS} AS BIGINT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY 1
"""


@register("q_shard_plan", oracle=_SHARD_ORACLE)
def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: assign every document to one of
    N_SHARDS output shards by the engine-portable md5-byte hash (the
    q_hash_split determinism contract — stable under reruns, engines,
    repartitioning, and incremental arrivals) and report per-shard
    volume. The report IS the writer's plan: `df.write.partitionBy`
    on the same expression produces exactly these shards, and the
    near-equal n_docs/total_chars rows are the balance check a
    dataloader needs before training starts. One aggregation; at
    100 TB the hash assignment is a narrow codegen'd expression on
    the scan."""
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int")
        % N_SHARDS
    ).cast("long")
    return (
        spark.table("documents")
        .groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@register(
    "q_curriculum",
    oracle="""
WITH d AS (
  SELECT doc_id, n_chars,
         ROUND(ln(1 + n_chars)
               * (n_chars * 1.0 / len(string_split(text, ' '))),
               6) AS difficulty
  FROM documents
),
r AS (
  SELECT doc_id, n_chars, difficulty,
         ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS rnk,
         COUNT(*) OVER () AS total
  FROM d
)
SELECT CAST(1 + FLOOR((rnk - 1) * 4.0 / total) AS BIGINT) AS phase,
       COUNT(*) AS n_docs,
       ROUND(AVG(difficulty), 4) AS avg_difficulty,
       ROUND(MIN(difficulty), 6) AS min_difficulty,
       ROUND(MAX(difficulty), 6) AS max_difficulty,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM r
GROUP BY phase
""",
)
def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: score every document's difficulty (mean
    word length × log-length — longer words and longer texts read
    harder), rank the corpus easy→hard, and cut it into 4 equal
    curriculum phases with per-phase volume stats — the schedule a
    curriculum-trained run consumes phase by phase.

    Scale shape: the global easy→hard ordering is the single
    operation that canNOT be a naive ``row_number()`` window (one
    task at 100 TB); it reuses :func:`~pyanamo_spark.operators.windows.
    global_rank_frame` — range exchange on (difficulty, doc_id) with
    input-tracked width, per-partition rank, broadcast offsets. Phase
    is then a pure expression over rank (floor((rank−1)·K/total)), and
    the readout is one 4-row aggregation. Difficulty is rounded before
    ranking so both engines order identical values; doc_id breaks ties.
    """
    from pyanamo_spark.operators.windows import global_rank_frame

    docs = spark.table("documents").select(
        "doc_id",
        "n_chars",
        F.round(
            F.log(1 + F.col("n_chars"))
            * (F.col("n_chars") / F.size(F.split(F.col("text"), " "))),
            6,
        ).alias("difficulty"),
    )
    total = docs.count()  # bounded driver scalar: corpus row count
    ranks = global_rank_frame(docs, "difficulty", "doc_id", base=1)
    phase = (
        1 + F.floor((F.col("rank") - 1) * 4.0 / F.lit(total))
    ).cast("long")
    return (
        ranks.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy(phase.alias("phase"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("difficulty"), 4).alias("avg_difficulty"),
            F.round(F.min("difficulty"), 6).alias("min_difficulty"),
            F.round(F.max("difficulty"), 6).alias("max_difficulty"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q_time_split",
    oracle="""
WITH ds AS (
  SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d,
         DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS dn
  FROM orders
),
cut AS (SELECT quantile_cont(dn, 0.8) AS c FROM ds)
SELECT CASE WHEN dn <= (SELECT c FROM cut) THEN 'train' ELSE 'test' END
         AS split,
       COUNT(*) AS n_rows,
       MIN(d) AS min_date,
       MAX(d) AS max_date,
       ROUND(SUM(o_totalprice), 2) AS total_value
FROM ds
GROUP BY split
""",
)
def q_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split: everything at or before the 80th
    percentile date trains, the future tests — the split that
    evaluates forecasting/ranking models without time leakage (hash
    and group splits — q_hash_split, q_group_split — cannot give
    this guarantee; a temporally shuffled eval set leaks tomorrow
    into training). The readout proves the guarantee by construction:
    train.max_date ≤ test.min_date.

    Scale shape: the cutoff is an exact interpolated percentile of
    the day number via the bounded-memory quantile machinery —
    a 1-row broadcast scalar, not a driver round-trip — and the
    split labeling + readout is ONE aggregation over the scan.
    """
    from pyanamo_spark.functions.quantiles import exact_group_percentiles

    ds = spark.table("orders").select(
        "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("dn"),
    )
    cut = exact_group_percentiles(ds, [], "dn", {"c": 0.8})
    split = F.when(F.col("dn") <= F.col("c"), "train").otherwise("test")
    return (
        ds.join(F.broadcast(cut))
        .groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("d").alias("min_date"),
            F.max("d").alias("max_date"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "q_dataset_card",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         len(string_split(text, ' ')) AS ws_tokens,
         md5(text) AS fp
  FROM documents
),
lang_top AS (
  SELECT lang, COUNT(*) AS c FROM base GROUP BY lang
  ORDER BY c DESC, lang LIMIT 1
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       ROUND(1.0 - COUNT(DISTINCT fp) * 1.0 / COUNT(*), 6)
         AS exact_dup_ratio,
       ROUND(AVG(n_chars), 4) AS mean_doc_chars,
       ROUND(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 4)
         AS median_doc_chars,
       (SELECT lang FROM lang_top) AS top_lang,
       ROUND((SELECT c FROM lang_top) * 1.0 / COUNT(*), 6)
         AS top_lang_share
FROM base
""",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one row summarizing the corpus the way a
    published datasheet would — volume (docs/chars/whitespace
    tokens), provenance breadth (sources, languages, dominant
    language share), exact-duplicate ratio, and document-length
    centre (mean + exact median). The single-scan executive summary
    every release ships with; the deep dives are the dedicated
    operators (q_dedup_stats, q_lang_mix, q_table_stats).

    Scale shape: ONE aggregation over the scan carries everything
    except the median and the dominant language. Exact distincts
    (source/lang/fingerprint) are Expand-rewritten two-phase
    aggregates (documented to swap for HLL sketches at the 100 TB
    tier — q_approx_distinct shows the path); the median takes the
    value-histogram percentile path (n_chars is integral, shuffle
    carries distinct values, not rows); the 1-row dominant-language
    and median frames broadcast-join onto the summary row.
    """
    from pyanamo_spark.functions.quantiles import (
        exact_group_percentiles_lowcard,
    )

    base = spark.table("documents").select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.md5(F.col("text")).alias("fp"),
    )
    lang_top = (
        base.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("c").alias("top_c"))
    )
    med = exact_group_percentiles_lowcard(
        base, [], "n_chars", {"med": 0.5}
    ).select(F.col("med"))
    summary = base.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("ws_tokens").cast("long").alias("total_ws_tokens"),
        F.round(1.0 - F.count_distinct("fp") / F.count("*"), 6).alias(
            "exact_dup_ratio"
        ),
        F.round(F.avg("n_chars"), 4).alias("mean_doc_chars"),
    )
    return (
        summary.join(F.broadcast(med))
        .join(F.broadcast(lang_top))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "total_chars",
            "total_ws_tokens",
            "exact_dup_ratio",
            "mean_doc_chars",
            F.round(F.col("med").cast("double"), 4).alias(
                "median_doc_chars"
            ),
            "top_lang",
            F.round(F.col("top_c") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
        )
    )


@register(
    "q_score_calibrate",
    oracle="""
WITH sc AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS raw_score
  FROM documents
),
n AS (SELECT source, COUNT(*) AS ns FROM sc GROUP BY source),
h AS (
  SELECT source, raw_score, COUNT(*) AS c
  FROM sc GROUP BY source, raw_score
),
cum AS (
  SELECT source, raw_score,
         SUM(c) OVER (PARTITION BY source ORDER BY raw_score) AS le
  FROM h
)
SELECT sc.doc_id, sc.source,
       CAST(sc.raw_score AS BIGINT) AS raw_score,
       ROUND(cum.le * 1.0 / n.ns, 6) AS calibrated
FROM sc
JOIN cum USING (source, raw_score)
JOIN n USING (source)
""",
)
def q_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: map each document's raw score
    (whitespace token count here — any integral/bucketed score works)
    to its within-source ECDF, so "keep the top 30%" means the same
    thing in every source regardless of how its raw distribution
    shifts — the quantile-normalization step a mixed-corpus quality
    gate needs before one threshold can govern all sources.

    Scale shape: the per-source ECDF is computed on the (source,
    value) HISTOGRAM — one map-combined aggregation whose size is the
    score grid, not the corpus — with a cumulative window over that
    bounded grid, then joined back onto the scan by (source, value).
    No per-document window: the naive percent_rank() per source puts
    each source's entire corpus through one window task. Continuous
    scores must be bucketed to a grid first (same trade as
    q_percentiles' value-histogram path).
    """
    sc = spark.table("documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("raw_score"),
    )
    n = sc.groupBy("source").agg(F.count("*").alias("ns"))
    h = sc.groupBy("source", "raw_score").agg(F.count("*").alias("c"))
    wcum = (
        W.partitionBy("source")
        .orderBy("raw_score")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = h.select(
        "source", "raw_score", F.sum("c").over(wcum).alias("le")
    )
    return (
        sc.join(cum, ["source", "raw_score"])
        .join(n, "source")
        .select(
            "doc_id",
            "source",
            "raw_score",
            F.round(F.col("le") / F.col("ns"), 6).alias("calibrated"),
        )
    )


@register(
    "q_token_budget",
    oracle=f"""
WITH d AS (
  SELECT ROUND(len(list_filter(string_split(text, ' '),
                               t -> t IN ({_FUNNEL_STOPS})))
               * 1.0 / len(string_split(text, ' ')), 2) AS s,
         len(string_split(text, ' ')) AS toks
  FROM documents
),
g AS (SELECT s, COUNT(*) AS c, SUM(toks) AS t FROM d GROUP BY s),
tot AS (SELECT SUM(t) AS total_toks FROM g),
cum AS (
  SELECT s, c, t,
         SUM(t) OVER (ORDER BY s DESC) AS ct
  FROM g
)
SELECT ROUND(CAST(0.5 * (SELECT total_toks FROM tot) AS DOUBLE), 2)
         AS budget_tokens,
       ROUND(MIN(s), 2) AS threshold_score,
       CAST(SUM(c) AS BIGINT) AS n_docs_selected,
       CAST(SUM(t) AS BIGINT) AS tokens_selected,
       ROUND(SUM(t) / (0.5 * (SELECT total_toks FROM tot)), 6)
         AS utilization
FROM cum
WHERE ct <= 0.5 * (SELECT total_toks FROM tot)
""",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted best-first selection: spend a token budget (half the
    corpus here) on the highest-quality documents — greedy by
    stopword-density score, whole score-buckets at a time — and
    report the resulting quality threshold, docs/tokens selected, and
    budget utilization. The planning query behind "give me the best
    N tokens for this training run".

    Scale shape: the naive form sorts every document globally and
    runs a document-sized cumulative window (one task at 100 TB).
    Here quality is bucketed to a 2-decimal grid, so selection
    happens on the GRID: one map-combined (score → docs, tokens)
    aggregate, a cumulative window over ≤101 buckets ordered
    best-first, and a single-row readout. Per-document selection is
    then a threshold broadcast (score ≥ threshold) — the same
    grid-not-corpus trade as q_score_calibrate and q_percentiles.
    """
    toks = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_FUNNEL_STOP_SET)))
    d = spark.table("documents").select(
        F.round(stop_hits / F.size(toks), 2).alias("s"),
        F.size(toks).cast("long").alias("toks"),
    )
    g = d.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("toks").alias("t")
    )
    tot = g.agg(F.sum("t").alias("total_toks"))
    wcum = (
        W.orderBy(F.col("s").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = g.select("s", "c", "t", F.sum("t").over(wcum).alias("ct"))
    budget = 0.5 * F.col("total_toks")
    return (
        cum.join(F.broadcast(tot))
        .filter(F.col("ct") <= budget)
        .agg(
            F.round(F.first(budget), 2).alias("budget_tokens"),
            F.round(F.min("s"), 2).alias("threshold_score"),
            F.sum("c").cast("long").alias("n_docs_selected"),
            F.sum("t").cast("long").alias("tokens_selected"),
            F.round(F.sum("t") / F.first(budget), 6).alias("utilization"),
        )
    )
