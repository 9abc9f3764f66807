"""Cross-document repeated-span detection (substring-dedup signal).

Doc-level dedup (`dedup/exact.py`) and line-level boilerplate removal
(`dedup/lines.py`) miss mid-document copied passages — the case
suffix-array dedup targets in training-data pipelines. The tractable
distributed form: slide a word n-gram window over every document and
surface spans that recur across distinct documents; downstream removal
can then anchor on the flagged spans.

Scale shape (same discipline as `dedup/lines.py`): the counting
shuffle carries ONLY 8-byte xxhash64 gram digests; span text is
recovered
afterwards with a digest-keyed shuffle hash join against the
surviving digest set. The survivor set is NOT assumed bounded — at
min_docs this low, a heavily-duplicated crawl can surface a large
fraction of all grams, so a forced broadcast would be a scale
hazard; AQE still downgrades the shuffle join to a broadcast at
runtime whenever the survivors actually are small.

Reference parity: the reference's log salvage scans for repeated
sentinel tags inside task logs (/root/reference/code/executor.py tag
handling); this generalizes that "find recurring substrings" idea to
corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanamo_spark.registry import register
from pyanamo_spark.session import spread

SPAN_WORDS = 5
#: a span is duplicated when it occurs in >= this many distinct docs
MIN_DOCS = 3

def gram_array():
    """All overlapping SPAN_WORDS-gram strings of the word array `_w`.

    Documents shorter than the span yield an EMPTY array via an
    explicit branch — `sequence(1, greatest(n-4, 0))` looks right but
    Spark's sequence STEPS DOWNWARD when stop < start, producing
    [1, 0] and a slice(start=0) runtime error on any sub-span doc.
    """
    return F.when(
        F.size("_w") >= SPAN_WORDS,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (SPAN_WORDS - 1)),
            lambda i: F.array_join(F.slice("_w", i, SPAN_WORDS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_spans(corpus: DataFrame) -> DataFrame:
    """(doc_id, gram): every overlapping SPAN_WORDS-gram per document.

    The text is split ONCE per document and the gram windows slice the
    cached array — inlining the split into the per-gram lambda makes
    Catalyst re-tokenize the whole document for every gram, an O(len²)
    blowup (measured 2.2 s → 0.4 s on the sf0.1 corpus).

    The repartition exists for the same reason as q_pdf_extract's
    (sources/pdf.py): tokenize+gram-build is CPU-heavy per row while
    the fixture corpus is a few large parquet splits, so the explode
    stage otherwise inherits the scan's 2-split parallelism and
    strands the other cores. One narrow (doc_id, text) shuffle beats
    serializing the gram work; on a real multi-thousand-split corpus
    the scan already provides the parallelism and the exchange is a
    no-op-sized rebalance.
    """
    words = spread(corpus, "doc_id", "text").select(
        "doc_id", F.split("text", " ").alias("_w")
    )
    return words.select("doc_id", F.explode(gram_array()).alias("gram"))


def duplicated_spans(
    corpus: DataFrame, min_docs: int = MIN_DOCS
) -> DataFrame:
    """Spans occurring in >= min_docs distinct documents.

    Returns (gram, n_docs, n_hits) — n_hits counts every occurrence
    including repeats within one document.
    """
    grams = doc_spans(corpus)
    counts = (
        grams.groupBy(F.xxhash64("gram").alias("gram_hash"))
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_hits"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    # Text recovery: the survivor set scales with corpus duplication, so
    # never force a broadcast of it. Dedup the gram text first (the join
    # input is then one row per distinct span, not per occurrence), then
    # a digest-keyed shuffle hash join; AQE turns it into a broadcast at
    # runtime iff the survivors really are small. Distinct-FIRST is
    # deliberate: its partial aggregation collapses repeated gram text
    # map-side before any shuffle, which a join-then-dedup order cannot
    # do (measured 1.6x worse at sf1 — every occurrence's text crossed
    # the wire).
    uniq = grams.select(
        F.xxhash64("gram").alias("gram_hash"), "gram"
    ).distinct()
    return uniq.join(counts.hint("shuffle_hash"), "gram_hash").select(
        "gram", "n_docs", "n_hits"
    )


@register(
    "q_dup_spans",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(1, len(w) - {SPAN_WORDS - 1})) AS i
  FROM words
  WHERE len(w) >= {SPAN_WORDS}
),
grams AS (
  SELECT doc_id,
         array_to_string(w[i : i + {SPAN_WORDS - 1}], ' ') AS gram
  FROM pos
)
SELECT gram,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_hits
FROM grams
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
""",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated {SPAN_WORDS}-word spans: the
    substring-level duplication report (span text, distinct-doc count,
    total occurrences) with a digest-only counting shuffle."""
    return duplicated_spans(spark.table("documents"))


def duplicated_passages(
    corpus: DataFrame, min_docs: int = MIN_DOCS
) -> DataFrame:
    """Maximal duplicated passages per document: the word-interval a
    removal pass would actually cut.

    ``duplicated_spans`` reports WHICH grams recur; a pipeline deleting
    copied passages needs WHERE — and isolated gram hits must merge
    into their maximal run (a 50-word copied paragraph is 46
    overlapping 5-grams, one interval). Plan:

      1. position table (doc_id, i, gram digest) — one tokenize per
         doc, digests only past the explode
      2. duplicated-digest set by distinct-doc count (digest-only
         counting shuffle, same as duplicated_spans)
      3. digest-keyed join marks each doc's duplicated positions
      4. gaps-and-islands per doc: a new passage starts when the gap
         to the previous duplicated position exceeds SPAN_WORDS (the
         covered word intervals no longer touch); islands become
         (start_word, end_word) via min/max

    Scale shape: the only data-sized shuffles carry (doc_id, i,
    8-byte xxhash64 digest); the island window partitions by doc_id,
    so its
    sort is bounded by document length, never corpus size. Returns
    (doc_id, start_word, end_word, n_words), word positions 1-based
    inclusive.

    Reference parity: generalizes the reference's repeated-sentinel log
    salvage (/root/reference/code/executor.py tag handling) from "find
    the marker" to "find and bound every copied region".
    """
    words = spread(corpus, "doc_id", "text").select(
        "doc_id", F.split("text", " ").alias("_w")
    )
    # checkpoint the position table: both consumers below (the
    # duplicated-digest aggregate and the hits join) hold it in their
    # lineage, and Spark executes each lineage independently — without
    # materialization the tokenize+explode+hash pass runs TWICE (the
    # executed plan shows no ReusedExchange: the two consumers project
    # differently, so their exchanges can never canonicalize equal).
    # The checkpointed rows are (doc_id, i, 8-byte hash) — no text —
    # so the materialization is position-count × 20 bytes
    pos = (
        words.select(
            "doc_id", F.posexplode(gram_array()).alias("_p", "gram")
        )
        .select(
            "doc_id",
            (F.col("_p") + 1).alias("i"),
            F.xxhash64("gram").alias("gram_hash"),
        )
        .localCheckpoint()
    )
    dup = (
        pos.groupBy("gram_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram_hash")
    )
    hits = pos.join(dup.hint("shuffle_hash"), "gram_hash").select(
        "doc_id", "i"
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    flagged = hits.withColumn(
        "_new",
        F.when(
            F.col("i") - F.lag("i").over(w) > F.lit(SPAN_WORDS), 1
        ).otherwise(
            F.when(F.lag("i").over(w).isNull(), 1).otherwise(0)
        ),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("doc_id", "_island")
        .agg(
            F.min("i").alias("start_word"),
            (F.max("i") + (SPAN_WORDS - 1)).alias("end_word"),
        )
        .select(
            "doc_id",
            "start_word",
            "end_word",
            (
                F.col("end_word") - F.col("start_word") + 1
            ).alias("n_words"),
        )
    )


@register(
    "q_dup_passages",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(1, len(w) - {SPAN_WORDS - 1})) AS i
  FROM words
  WHERE len(w) >= {SPAN_WORDS}
),
grams AS (
  SELECT doc_id, i,
         array_to_string(w[i : i + {SPAN_WORDS - 1}], ' ') AS gram
  FROM pos
),
dup AS (
  SELECT gram FROM grams
  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
),
hits AS (
  SELECT g.doc_id, g.i FROM grams g JOIN dup USING (gram)
),
flagged AS (
  SELECT doc_id, i,
         CASE WHEN LAG(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                OR i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                     > {SPAN_WORDS}
              THEN 1 ELSE 0 END AS f
  FROM hits
),
isl AS (
  SELECT doc_id, i,
         SUM(f) OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM flagged
)
SELECT doc_id,
       MIN(i) AS start_word,
       MAX(i) + {SPAN_WORDS - 1} AS end_word,
       MAX(i) + {SPAN_WORDS - 1} - MIN(i) + 1 AS n_words
FROM isl
GROUP BY doc_id, island
""",
)
def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated passages: per document, the
    1-based inclusive word intervals covered by {SPAN_WORDS}-grams that
    recur in >= {MIN_DOCS} docs, overlapping hits merged into their
    maximal run — the intervals a substring-removal pass deletes."""
    return duplicated_passages(spark.table("documents"))


def _source_gram_digests(corpus: DataFrame) -> DataFrame:
    """The distinct (source, gram_hash) span-digest table, checkpointed
    — ONE tokenize+gram pass shared by every consumer that needs the
    per-source distinct gram set (the exact pair matrix and the HLL
    sketch leg of q_overlap_estimate).

    source rides the explode directly — joining spans back to their
    documents on doc_id would add a data-sized shuffle for nothing.
    The checkpoint exists because every consumer holds the
    scan+explode+distinct lineage independently (no ReusedExchange —
    join-key aliasing keeps self-join legs from canonicalizing equal);
    materializing the post-distinct rows (source + 8-byte hash) pays
    the heavy pass once.
    """
    words = spread(corpus, "source", "text").select(
        "source", F.split("text", " ").alias("_w")
    )
    return (
        words.select("source", F.explode(gram_array()).alias("gram"))
        .select("source", F.xxhash64("gram").alias("gram_hash"))
        .distinct()
        .localCheckpoint()
    )


def source_overlap(
    corpus: DataFrame, gs: DataFrame | None = None
) -> DataFrame:
    """(source_a, source_b, n_shared_grams): how many distinct spans
    each pair of sources has in common — the provenance/leakage matrix
    (which sources syndicate or copy from each other).

    Scale shape: the distinct (source, gram) reduction shuffles only
    8-byte xxhash64 digests; the pair join's fan-out per gram is
    bounded by C(#sources, 2) — a catalog-sized constant — never by
    corpus size. Pass ``gs`` (a ``_source_gram_digests`` frame) to
    share the corpus pass with other consumers (q_overlap_estimate).
    """
    if gs is None:
        gs = _source_gram_digests(corpus)
    gs = gs.select("source", "gram_hash")
    a, b = gs.alias("a"), gs.alias("b")
    return (
        a.join(b, "gram_hash")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared_grams"))
    )


@register(
    "q_source_overlap",
    oracle=f"""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, source, w,
         unnest(generate_series(1, len(w) - {SPAN_WORDS - 1})) AS i
  FROM words
  WHERE len(w) >= {SPAN_WORDS}
),
gs AS (
  SELECT DISTINCT source,
         array_to_string(w[i : i + {SPAN_WORDS - 1}], ' ') AS gram
  FROM pos
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_grams
FROM gs a JOIN gs b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
""",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source span-overlap matrix: distinct {SPAN_WORDS}-word
    spans shared per source pair — the syndication/leakage report that
    tells a curation pipeline which sources duplicate each other."""
    return source_overlap(spark.table("documents"))


#: HLL precision: rank error ≈ 1.04/√2^lgk ≈ 0.8% at 14. The
#: inclusion-exclusion subtraction sees the error of THREE estimates,
#: each proportional to the SET sizes (not the overlap) — so small
#: overlaps between big sources carry absolute error ~2.5% of
#: |A|+|B|. Sketch size 16 KiB/source at 14; raise lgk for tighter
#: triage, or hand hot pairs to the exact matrix.
_OVERLAP_LGK = 14


def source_overlap_estimate(
    corpus: DataFrame, gs: DataFrame | None = None
) -> DataFrame:
    """Sketch-based overlap matrix — the 100 TB path for
    ``source_overlap``. The exact form's pair join fans every shared
    digest out per source pair; at petabyte scale the digest table
    itself is the cost. This variant reduces each source to ONE
    mergeable HLL sketch (Spark 4's native datasketches aggregate) in
    a single map-side-combined pass, then estimates pair overlap by
    inclusion-exclusion (|A∩B| = |A| + |B| − |A∪B|) over the
    sources-sized sketch table.

    Everything after the one corpus pass is catalog-sized: C(n,2)
    pairs × a few-KB sketches. Error is the HLL rank error (~1.6% at
    lgk=12) amplified by the subtraction — fine for the syndication
    triage this feeds (which pairs deserve the exact report), wrong
    tool for exact dedup accounting (that stays ``source_overlap``).

    The sketch inserts each distinct gram's xxhash64 digest from the
    shared ``_source_gram_digests`` frame (pass ``gs`` to reuse an
    already-checkpointed one). r12 change note: the pre-r12 form ran
    its own corpus pass sketching md5(gram) of every OCCURRENCE;
    estimates moved within the same ±1% rank-error band (measured
    worst |err|/tol 0.43 across the driver SFs and sf1, vs 1.0 for a
    flag flip) and became strictly MORE deterministic — HLL register
    state is a pure function of the distinct input set, so the
    distinct-fed sketch is invariant to partitioning/core count
    (verified identical at 8/16/32 cores), while the old duplicate
    stream drifted ~0.8% with partition boundaries.
    """
    if gs is None:
        gs = _source_gram_digests(corpus)
    sk = (
        gs.groupBy("source")
        .agg(F.hll_sketch_agg("gram_hash", F.lit(_OVERLAP_LGK)).alias("sk"))
        .withColumn("n_est", F.hll_sketch_estimate("sk"))
    )
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.greatest(
                F.lit(0),
                (
                    F.col("a.n_est")
                    + F.col("b.n_est")
                    - F.hll_sketch_estimate(
                        F.hll_union(F.col("a.sk"), F.col("b.sk"))
                    )
                ),
            ).alias("est_shared_grams"),
        )
    )


@register(
    "q_overlap_estimate",
    oracle=f"""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, source, w,
         unnest(generate_series(1, len(w) - {SPAN_WORDS - 1})) AS i
  FROM words
  WHERE len(w) >= {SPAN_WORDS}
),
gs AS (
  SELECT DISTINCT source,
         array_to_string(w[i : i + {SPAN_WORDS - 1}], ' ') AS gram
  FROM pos
),
exact AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS n
  FROM gs a JOIN gs b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
),
srcs AS (SELECT DISTINCT source FROM gs)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS exact_shared,
       CAST(1 AS INTEGER) AS within_tol
FROM srcs a
JOIN srcs b ON a.source < b.source
LEFT JOIN exact e ON e.source_a = a.source AND e.source_b = b.source
""",
)
def q_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-estimated cross-source span overlap (HLL
    inclusion-exclusion), audited: every pair's estimate is certified
    in-engine against the exact shared-gram matrix within the sketch's
    error budget — three ±0.8% (lgk=14) estimates feed the
    subtraction, each proportional to SET size, so the bound is
    2.5% of |A|+|B| in source word counts (+5 absolute for tiny
    sources; same bound tests/test_spans_lines.py derives). The raw
    estimates stay available as ``source_overlap_estimate``; the
    DECLARED output is (pair, exact count, within-tolerance flag)
    because HLL register contents are engine-specific, but the exact
    counts and the tolerance guarantee are precisely what the triage
    consumer relies on — so that is what DuckDB asserts.

    Scale shape (r12): the sketch leg and the exact matrix share ONE
    tokenize+gram corpus pass (the checkpointed
    ``_source_gram_digests`` frame — the sketch inserts the distinct
    digests, see ``source_overlap_estimate`` for the error-margin
    measurement), and the per-source word counts for the tolerance
    aggregate map-side as sum(size(split)) — no exploded-word
    exchange. Three corpus passes became one plus a map-only scan."""
    docs = spark.table("documents")
    gs = _source_gram_digests(docs)
    est = source_overlap_estimate(docs, gs=gs)
    exact = source_overlap(docs, gs=gs)
    # per-source word count == count of exploded split() tokens: a
    # null text explodes to zero rows, so filter those docs rather
    # than letting size(NULL) = -1 poison the sum; an all-null source
    # then stays absent from `sizes`, exactly as under explode
    sizes = (
        docs.filter(F.col("text").isNotNull())
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_words"))
    )
    tol = 0.025 * (F.col("sa.n_words") + F.col("sb.n_words")) + 5
    return (
        est.join(
            exact,
            ["source_a", "source_b"],
            "left",
        )
        .join(
            F.broadcast(sizes.alias("sa")),
            F.col("source_a") == F.col("sa.source"),
        )
        .join(
            F.broadcast(sizes.alias("sb")),
            F.col("source_b") == F.col("sb.source"),
        )
        .select(
            "source_a",
            "source_b",
            F.coalesce(F.col("n_shared_grams"), F.lit(0))
            .cast("long")
            .alias("exact_shared"),
            (
                F.abs(
                    F.col("est_shared_grams")
                    - F.coalesce(F.col("n_shared_grams"), F.lit(0))
                )
                <= tol
            )
            .cast("int")
            .alias("within_tol"),
        )
    )
