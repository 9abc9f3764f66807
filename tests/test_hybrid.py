"""Hybrid RRF retrieval: centroid construction and leg-fusion sanity
(the exact result set is pinned by the DuckDB oracle via the parity
harness; these tests check the retrieval SEMANTICS are sensible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.registry import QUERIES, load_all
from pyanamo_spark.similarity.hybrid import QUERY_LABELS, TOP, query_centroids

load_all()


def test_query_centroids_shape(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    rows = query_centroids(spark).collect()
    assert sorted(r["query_id"] for r in rows) == ["q1", "q2", "q3"]
    for r in rows:
        assert len(r["c"]) == 64


def test_dense_leg_retrieves_own_cluster(spark, sf_dir):
    """A label-centroid query should rank members of its own embedding
    cluster on top — the query-by-example contract."""
    semantics.ensure_views(spark, sf_dir)
    cent = query_centroids(spark)
    emb = spark.table("embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    from collections import Counter

    from pyspark.sql.window import Window

    def fold(col):
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    cos = fold(F.zip_with("c", "e", lambda a, b: a * b)) / (
        F.sqrt(fold(F.transform("c", lambda x: x * x)))
        * F.sqrt(fold(F.transform("e", lambda x: x * x)))
    )
    top = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("cos", cos)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cos").desc())
            ),
        )
        .filter(F.col("rk") <= 10)
        .collect()
    )
    want = dict(QUERY_LABELS)
    for q in ("q1", "q2", "q3"):
        labels = [r["label"] for r in top if r["query_id"] == q]
        counts = Counter(labels)
        # the query's own label is the modal label of its dense top-10
        # (fixture clusters overlap, so plurality — not dominance — is
        # the honest contract)
        assert counts[want[q]] == max(counts.values()), (q, labels)


def test_fusion_output_contract(spark, sf_dir):
    rows = QUERIES["q_hybrid_search"](spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert sorted(by_q) == ["q1", "q2", "q3"]
    for q, rs in by_q.items():
        assert [r["rnk"] for r in sorted(rs, key=lambda r: r["rnk"])] == list(
            range(1, TOP + 1)
        )
        # RRF scores decrease with rank (ties broken by doc_id keep order)
        scores = [r["rrf"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert scores == sorted(scores, reverse=True)
        # both-leg winners beat the single-leg ceiling for some row:
        # 2/(60+1) is the max fused score, 1/61 the single-leg max
        assert scores[0] > 1.0 / 61
