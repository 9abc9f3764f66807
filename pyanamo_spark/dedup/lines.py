"""Line/paragraph-level boilerplate dedup (CCNet-style).

Removes lines that repeat across many *distinct* documents (site
headers, cookie banners, license footers) while leaving unique content
untouched — the standard pre-training cleanup pass that doc-level dedup
(`dedup/exact.py`) cannot express.

The fixture's documents are single-line, so "lines" are deterministic
10-word chunks (both engines slice identically); two 10-word boilerplate
headers are planted on doc_id % 5 / % 3 subsets so the operator has
something real to find.

At 100 TB: only 8-byte line digests travel through the counting
shuffle (the text stays where it was scanned); the surviving boilerplate
set is tiny (boilerplate is by definition low-cardinality/high-frequency)
so the removal join is a broadcast, and the rebuild groupBy re-uses the
document partitioning. Mirrors the reference's log-line salvage idea
(/root/reference/code/pyanamo.py taskLogs handling) at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register
from pyanamo_spark.session import spread

#: exactly 10 words each so planted headers stay chunk-aligned
HEADER_A = "terms of service apply to this content all rights reserved"
HEADER_B = "subscribe to our newsletter for updates delivered every single day"

WORDS_PER_LINE = 10
#: a line is boilerplate when it appears in >= this many distinct docs
MIN_DOCS = 30

#: chunk windows slice a once-split word array (`_w`) — inlining the
#: split into the lambda would re-tokenize the document per chunk
_CHUNK_EXPR = f"""
transform(
  sequence(0, cast(ceil(size(_w) / {WORDS_PER_LINE}.0) as int) - 1),
  i -> array_join(slice(_w, i * {WORDS_PER_LINE} + 1, {WORDS_PER_LINE}), ' ')
)
"""


def chunk_lines(corpus: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, line_no, line): 10-word chunks.

    Repartitions the narrow (doc_id, text) rows first for the same
    reason as dedup/spans.py doc_spans: the chunk explode is CPU-heavy
    per row and would otherwise inherit the fixture scan's 2-split
    parallelism."""
    return (
        spread(corpus, "doc_id", "text")
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.posexplode(F.expr(_CHUNK_EXPR)).alias("line_no", "line"),
        )
    )


def boilerplate_lines(lines: DataFrame, min_docs: int = MIN_DOCS) -> DataFrame:
    """Line digests occurring in >= min_docs distinct documents.

    Counts distinct docs per 64-bit xxhash64 digest — ONLY the 8-byte
    hash travels through the counting shuffle; line text stays in the
    scan partitions and is recovered later by joining the (tiny)
    surviving digest set back against the lines. (The digest is
    internal — the oracle groups on line text and the emitted
    clean_fingerprint stays md5 — so the cheaper narrower hash is
    free; collisions are ~1e-9 at fixture scale.)
    """
    return (
        lines.groupBy(F.xxhash64("line").alias("line_hash"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(lines: DataFrame, boiler: DataFrame) -> DataFrame:
    """Per-doc summary after dropping boilerplate lines.

    Returns (doc_id, n_lines, n_removed, clean_fingerprint) where
    clean_fingerprint is md5 of the kept lines rejoined in order.
    Boilerplate membership is decided on the digest (broadcast of the
    surviving hash set), so no text re-shuffles here either.
    """
    flagged = lines.join(
        F.broadcast(boiler.select("line_hash", F.lit(1).alias("is_boiler"))),
        F.xxhash64(lines["line"]) == boiler["line_hash"],
        "left",
    ).drop("line_hash")
    kept = F.when(F.col("is_boiler").isNull(), F.struct("line_no", "line"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.coalesce("is_boiler", F.lit(0))).alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("clean_fingerprint"),
    )


def _planted_corpus(docs: DataFrame) -> DataFrame:
    """Prepend chunk-aligned boilerplate headers to fixture subsets."""
    text = F.col("text")
    text = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit(HEADER_B + " "), text)
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit(HEADER_A + " "), text)
    ).otherwise(text)
    return docs.select("doc_id", text.alias("text"))


@register(
    "q_dedup_lines",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN '{HEADER_A} ' ELSE '' END ||
         CASE WHEN doc_id % 3 = 0 THEN '{HEADER_B} ' ELSE '' END ||
         text AS text
  FROM documents
),
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
),
numbered AS (
  SELECT doc_id, w,
         unnest(generate_series(
           0, CAST(ceil(len(w) / {WORDS_PER_LINE}.0) AS BIGINT) - 1)) AS line_no
  FROM words
),
chunks AS (
  SELECT doc_id, line_no,
         array_to_string(
           w[line_no * {WORDS_PER_LINE} + 1 : (line_no + 1) * {WORDS_PER_LINE}],
           ' ') AS line
  FROM numbered
),
boiler AS (
  SELECT line FROM chunks
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
)
SELECT c.doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       md5(coalesce(string_agg(CASE WHEN b.line IS NULL THEN c.line END,
                               ' ' ORDER BY c.line_no), ''))
         AS clean_fingerprint
FROM chunks c LEFT JOIN boiler b USING (line)
GROUP BY c.doc_id
HAVING n_removed > 0
""",
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate-line removal over documents with planted
    headers: chunk to 10-word lines, flag lines present in >= 30 distinct
    docs, report per-doc removal counts + cleaned-text fingerprint."""
    corpus = _planted_corpus(spark.table("documents"))
    lines = chunk_lines(corpus)
    boiler = boilerplate_lines(lines)
    return remove_boilerplate(lines, boiler).filter(F.col("n_removed") > 0)


def _check_store_format(spark: SparkSession, store_dir: str) -> DataFrame:
    """Open a boilerplate store and fail loudly unless ``line_hash`` is
    the xxhash64 BIGINT format (r08+). Digests from the legacy md5-hex
    format can never match bigints, so a mixed store would silently
    stop flagging old boilerplate; both the read path and the append
    path run this guard."""
    df = spark.read.option("basePath", store_dir).parquet(store_dir)
    kind = dict(df.dtypes).get("line_hash")
    if kind != "bigint":
        raise ValueError(
            f"boilerplate store at {store_dir!r} has line_hash type "
            f"{kind!r}; this version writes xxhash64 BIGINT digests — "
            "a pre-r08 (md5 string) store must be rebuilt from its "
            "source batches, mixed digests can never match"
        )
    return df


def update_boilerplate_store(
    spark: SparkSession, store_dir: str, batch: DataFrame, batch_id: str
) -> DataFrame:
    """Fold one crawl batch into a persistent boilerplate-count store.

    The store holds one ``batch=<id>`` partition of per-batch
    (line_hash, n_docs) partial counts — the same additive-partition
    shape as the incremental dedup fingerprint store
    (dedup/incremental.py): appends never rewrite history, each update
    shuffles only the NEW batch's digests, and the current boilerplate
    set is a sum-then-threshold over the partials (count-distinct is
    not mergeable across batches, so the partials add exactly ONLY if
    doc_ids never recur across batches). That disjointness assumption
    is ENFORCED, not just documented: every batch also records its
    distinct doc_ids as a ``_seen_docs/batch=<id>`` partition
    (underscore-prefixed, so the partial-count scans never touch it)
    and an update whose doc_ids intersect the seen set raises BEFORE
    anything is written — a re-crawl fails loudly instead of silently
    double-counting a line toward the boilerplate threshold. The check
    is an exact distributed semi-join on the 8-byte id column (the
    same cost class as the fingerprint store's anti-join), so there
    are no false rejections for interleaved-but-disjoint id spaces.
    Returns this batch's partial counts as written.
    """
    import os

    # Reject a legacy (md5-string) store BEFORE writing anything:
    # deferring the format check to current_boilerplate would let this
    # append a bigint partial batch first, leaving a mixed-type store
    # that the later error tells the user to rebuild — after the
    # corruption has already been written.
    if os.path.isdir(store_dir) and any(
        d.startswith("batch=") for d in os.listdir(store_dir)
    ):
        _check_store_format(spark, store_dir)
    ids = batch.select("doc_id").distinct()
    docs_root = os.path.join(store_dir, "_seen_docs")
    has_docs = os.path.isdir(docs_root) and any(
        d.startswith("batch=") for d in os.listdir(docs_root)
    )
    if has_docs:
        seen = spark.read.parquet(docs_root).select("doc_id")
        dup = [r["doc_id"] for r in ids.join(seen, "doc_id").limit(3).collect()]
        if dup:
            raise ValueError(
                f"batch {batch_id!r} re-ingests doc_ids already folded "
                f"into the store (e.g. {dup}): per-batch distinct "
                f"counts would double-count them — remap the batch's "
                f"id space or drop the re-crawled docs first"
            )
    partial = (
        chunk_lines(batch)
        .groupBy(F.xxhash64("line").alias("line_hash"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
    )
    out = os.path.join(store_dir, f"batch={batch_id}")
    partial.write.mode("errorifexists").parquet(out)
    ids.write.mode("errorifexists").parquet(
        os.path.join(docs_root, f"batch={batch_id}")
    )
    return spark.read.parquet(out)


def current_boilerplate(
    spark: SparkSession, store_dir: str, min_docs: int = MIN_DOCS
) -> DataFrame:
    """The live boilerplate digest set: sum the per-batch partials and
    threshold. Mergeable by construction — the scan reads only the
    (8-byte digest, count) partials, never any text.

    Store format: ``line_hash`` is an xxhash64 BIGINT as of r08 (the
    earlier format used md5 hex strings). Digests from the two formats
    can never match each other, so a mixed store would silently stop
    flagging old boilerplate — the type check below fails loudly
    instead; rebuild legacy stores from their source batches."""
    df = _check_store_format(spark, store_dir)
    return (
        df.groupBy("line_hash")
        .agg(F.sum("n_docs").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
