"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) leg
and a dense (embedding-cosine) leg — the standard first stage of a
modern RAG/retrieval stack, and fully oracle-checkable because both
legs and the fusion are deterministic rank arithmetic.

Query model: each query id carries BOTH a term list (functions/
text.BM25_QUERIES) and a dense representation — the centroid of a
labeled seed set of embeddings (query-by-example, computed IN the
engine on both sides so no vector literals ride in the SQL).

RRF (Cormack et al.): score(d) = Σ_legs 1/(k + rank_leg(d)), k=60.
Rank fusion needs no score calibration between legs — exactly why
it is the robust default when one leg is BM25 logits and the other
cosine similarities.

Scale shape: at 100 TB each leg is already top-N — BM25 from an
impact-ordered postings pruning, dense from the partition-pruned IVF
index (similarity/ivf.py) — and the fusion is a full-outer join of
two (query, N)-sized rank frames: work is legs-sized, never
corpus-sized. Here both legs rank the full corpus exactly so the
DuckDB oracle can replay them verbatim.

Determinism discipline: every float that feeds a ROW_NUMBER is
rounded to 6 decimals on BOTH engines first (centroid means, cosine,
RRF sum), with doc_id as the final tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyanamo_spark.functions.text import BM25_SCORE_CTES, bm25_scores
from pyanamo_spark.registry import register

#: query id → embedding label whose centroid is the dense query vector
QUERY_LABELS: tuple[tuple[str, int], ...] = (("q1", 0), ("q2", 1), ("q3", 2))
RRF_K = 60
TOP = 5
DIM = 64


def _fold_sum(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)


def query_centroids(spark: SparkSession) -> DataFrame:
    """(query_id, c): per-query dense vector = mean of its label's
    embeddings, each coordinate rounded so both engines share the
    exact centroid. GROUPS-sized output."""
    qlabel = spark.createDataFrame(
        list(QUERY_LABELS), "query_id string, label int"
    )
    return (
        spark.table("embeddings")
        .join(F.broadcast(qlabel), "label")
        .select(
            "query_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "d", "v"
            ),
        )
        .groupBy("query_id", "d")
        .agg(F.round(F.avg("v"), 6).alias("v"))
        .groupBy("query_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "v"))).alias("s")
        )
        .select(
            "query_id", F.transform("s", lambda x: x["v"]).alias("c")
        )
    )


@register(
    "q_hybrid_search",
    oracle=f"""
WITH {BM25_SCORE_CTES},
lex_rank AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS r
  FROM bm25_scored
),
qlabel(query_id, label) AS (
  VALUES {", ".join(f"('{q}', {lbl})" for q, lbl in QUERY_LABELS)}
),
dims AS (SELECT unnest(generate_series(1, {DIM})) AS d),
cent AS (
  SELECT q.query_id, dm.d,
         ROUND(AVG(CAST(e.embedding[dm.d] AS DOUBLE)), 6) AS v
  FROM embeddings e
  JOIN qlabel q ON e.label = q.label
  CROSS JOIN dims dm
  GROUP BY q.query_id, dm.d
),
centv AS (
  SELECT query_id, list(v ORDER BY d) AS c FROM cent GROUP BY query_id
),
dense AS (
  SELECT cv.query_id, e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(cv.c, CAST(e.embedding AS DOUBLE[])), 6)
           AS cos
  FROM embeddings e CROSS JOIN centv cv
),
dense_rank AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, doc_id
         ) AS r
  FROM dense
),
fused AS (
  SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
         COALESCE(l.doc_id, dn.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({RRF_K} + l.r), 0)
               + COALESCE(1.0 / ({RRF_K} + dn.r), 0), 6) AS rrf
  FROM lex_rank l
  FULL JOIN dense_rank dn
    ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id
),
final AS (
  SELECT query_id, doc_id, rrf,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id
         ) AS rnk
  FROM fused
)
SELECT query_id, doc_id, rrf, CAST(rnk AS BIGINT) AS rnk
FROM final WHERE rnk <= {TOP}
""",
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per query by RRF over the BM25 leg and the
    centroid-cosine dense leg (full outer on (query, doc): a doc
    ranked by only one leg still fuses)."""
    lex = bm25_scores(spark)
    wl = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    lex_rank = lex.select(
        "query_id", "doc_id", F.row_number().over(wl).alias("r")
    )

    # norms hoist OUT of the pair row (r12): nc depends only on the
    # query (3 rows) and ne only on the document, but the old form
    # re-folded both 64-dim arrays on every (doc, query) pair — two of
    # the three per-pair interpreted HOF folds were redundant. Each
    # norm is now computed once on its own side before the broadcast
    # cross join (the knn.py _with_norm discipline); the arithmetic is
    # the identical fold in the identical order, so cos is
    # bit-identical and the declared output unchanged.
    cent = query_centroids(spark).withColumn(
        "nc", F.sqrt(_fold_sum(F.transform("c", lambda x: x * x)))
    )
    emb = spark.table("embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    ).withColumn(
        "ne", F.sqrt(_fold_sum(F.transform("e", lambda x: x * x)))
    )
    dot = _fold_sum(F.zip_with("c", "e", lambda a, b: a * b))
    dense = (
        emb.crossJoin(F.broadcast(cent))  # GROUPS-sized centroid table
        .select(
            "query_id",
            "doc_id",
            F.round(
                dot / F.nullif(F.col("nc") * F.col("ne"), F.lit(0.0)), 6
            ).alias("cos"),
        )
    )
    wd = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "doc_id")
    dense_rank = dense.select(
        "query_id", "doc_id", F.row_number().over(wd).alias("r")
    )

    fused = (
        lex_rank.withColumnRenamed("r", "rl")
        .join(
            dense_rank.withColumnRenamed("r", "rd"),
            ["query_id", "doc_id"],
            "full_outer",
        )
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("rd")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .filter(F.col("rnk") <= TOP)
        .select("query_id", "doc_id", "rrf", "rnk")
    )
