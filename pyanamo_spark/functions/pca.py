"""Distributed PCA / whitening over an embedding column.

The standard preprocessing step before embedding-based dedup,
clustering, or ANN indexing (whitening makes cosine/L2 distances
behave; dimensionality reduction shrinks ANN indexes). The reference
has no linear-algebra surface — this is a north-star extension in the
X5 vector-column family (SURVEY §2.10).

Scale shape (the only one that works at 100 TB):

  pass 1   mapInPandas computes per-Arrow-batch moment partials
           [n, Σx (d), ΣxᵀX (d×d)] — one 4 KB row per batch, BLAS
           matmul inside, raw vectors never leave their partitions.
  combine  posexplode the flattened partials and groupBy-sum the
           (1 + d + d²) coordinates — a shuffle of a few thousand
           scalar rows regardless of corpus size.
  driver   eigh of the d×d covariance (d ≤ a few hundred, trivial),
           deterministic sign convention, broadcast of the k×d
           projection matrix as column literals.
  project  pure JVM expressions (zip_with/aggregate dot products) —
           no Python in the per-row path, whole-stage codegen intact.

The covariance itself is oracle-checked cell-by-cell against DuckDB
(`q_embed_covariance`); the eigendecomposition is driver-side numpy on
a d×d matrix, verified by orthonormality/variance tests
(tests/test_pca.py) since SQL cannot express it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

DIM = 64  # fixture embedding dimensionality
TOP_K = 8


def moment_partials(df: DataFrame, col: str, d: int) -> DataFrame:
    """One row per Arrow batch: flattened [n, Σx, ΣXᵀX] (1+d+d²)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            m = np.concatenate(([float(len(X))], X.sum(axis=0), (X.T @ X).ravel()))
            yield pd.DataFrame({"m": [m.tolist()]})

    return (
        df.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(gen, "m array<double>")
    )


def moment_sums(df: DataFrame, col: str, d: int) -> DataFrame:
    """(idx, v): coordinate-wise sums of the moment partials.

    idx 0 = n, 1..d = Σx, d+1.. = row-major ΣXᵀX. Tiny (1+d+d² rows)
    and independent of corpus size.
    """
    return (
        moment_partials(df, col, d)
        .select(F.posexplode("m").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
    )


def moment_cells(df: DataFrame, col: str, d: int) -> DataFrame:
    """Upper-triangle moment cells (di, dj, sxy, sx, sy, n), 0-based —
    the ONE decode of moment_sums' flat layout (idx 0 = n, 1..d = Σx,
    d+1.. = row-major ΣXᵀX), shared by the covariance operator and the
    q_pca_project whitening audit so the layout lives in one place."""
    m = moment_sums(df, col, d)
    n_row = m.filter(F.col("idx") == 0).select(F.col("v").alias("n"))
    s = m.filter((F.col("idx") >= 1) & (F.col("idx") <= d)).select(
        (F.col("idx") - 1).alias("dim"), F.col("v").alias("s")
    )
    xtx = m.filter(F.col("idx") > d).select(
        ((F.col("idx") - 1 - d) / d).cast("long").alias("di"),
        ((F.col("idx") - 1 - d) % d).alias("dj"),
        F.col("v").alias("sxy"),
    )
    si = s.select(F.col("dim").alias("di"), F.col("s").alias("sx"))
    sj = s.select(F.col("dim").alias("dj"), F.col("s").alias("sy"))
    return (
        xtx.filter(F.col("di") <= F.col("dj"))
        .join(F.broadcast(si), "di")
        .join(F.broadcast(sj), "dj")
        .crossJoin(F.broadcast(n_row))
    )


def covariance_df(df: DataFrame, col: str, d: int) -> DataFrame:
    """Upper-triangle sample covariance (i, j, cov), 1-based dims.

    Pure DataFrame algebra over the (1+d+d²)-row moment table —
    oracle-checkable and exactly the textbook (ΣXᵀX − ΣxΣxᵀ/n)/(n−1).
    """
    return (
        moment_cells(df, col, d)
        .select(
            (F.col("di") + 1).cast("long").alias("i"),
            (F.col("dj") + 1).cast("long").alias("j"),
            # 4 decimals, not 6: the cells are sums of float partials whose
            # addition order varies per run (Arrow batch boundaries, combine
            # order), giving ~1e-7 run-to-run noise on float32 inputs. A 5e-5
            # rounding boundary keeps ~500x headroom so the hash is stable.
            # + 0.0 collapses IEEE -0.0 to +0.0 (the coarser rounding
            # can now produce exact zeros, and engines disagree on the
            # zero's sign)
            (
                F.round(
                    (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                    / (F.col("n") - 1),
                    4,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def fit_pca(df: DataFrame, col: str, d: int, k: int) -> dict:
    """Fit PCA from the distributed moments; returns a broadcastable
    model {mean: d, components: k×d rows, eigvals: k}.

    Sign convention: each component's largest-|entry| coordinate is
    made positive, so the decomposition is deterministic across runs
    (eigenvectors are otherwise sign-ambiguous).
    """
    rows = moment_sums(df, col, d).collect()
    m = np.zeros(1 + d + d * d)
    for r in rows:
        m[r["idx"]] = r["v"]
    n, s, xtx = m[0], m[1 : 1 + d], m[1 + d :].reshape(d, d)
    if n < 2:
        raise ValueError(
            f"fit_pca needs >= 2 rows with non-null {col}, got {int(n)}"
        )
    mean = s / n
    cov = (xtx - np.outer(s, s) / n) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # k × d
    vals = eigvals[order]
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return {"mean": mean, "components": comps, "eigvals": vals, "n": int(n)}


def _dot_lit(col: Column, w: np.ndarray) -> Column:
    """JVM-side dot product of an array column with a literal vector."""
    lit = F.array(*[F.lit(float(x)) for x in w])
    return F.aggregate(
        F.zip_with(col, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def project(
    df: DataFrame, col: str, model: dict, whiten: bool = False
) -> DataFrame:
    """Append `proj` (array<double>, length k): centered projection
    onto the principal components; whiten divides by √eigval so every
    output coordinate has unit variance. All-JVM expressions — the
    model rides in as literals, no UDF, no shuffle."""
    centered = F.zip_with(
        F.col(col).cast("array<double>"),
        F.array(*[F.lit(float(x)) for x in model["mean"]]),
        lambda a, b: a - b,
    ).alias("_c")
    out = df.withColumn("_c", centered)
    comps = model["components"]
    scales = (
        np.sqrt(np.maximum(model["eigvals"], 1e-12))
        if whiten
        else np.ones(len(comps))
    )
    proj = F.array(
        *[
            _dot_lit(F.col("_c"), comps[i] / scales[i])
            for i in range(len(comps))
        ]
    )
    return out.withColumn("proj", proj).drop("_c")


_COV_ORACLE = f"""
WITH dims AS (SELECT unnest(generate_series(1, {DIM})) AS d),
pairs AS (
  SELECT d1.d AS i, d2.d AS j FROM dims d1, dims d2 WHERE d1.d <= d2.d
),
stats AS (
  SELECT p.i, p.j,
         SUM(CAST(e.embedding[p.i] AS DOUBLE)
             * CAST(e.embedding[p.j] AS DOUBLE)) AS sxy,
         SUM(CAST(e.embedding[p.i] AS DOUBLE)) AS sx,
         SUM(CAST(e.embedding[p.j] AS DOUBLE)) AS sy,
         COUNT(*) AS n
  FROM embeddings e, pairs p
  GROUP BY p.i, p.j
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       ROUND((sxy - sx * sy / n) / (n - 1), 4) + 0.0 AS cov
FROM stats
"""


@register("q_embed_covariance", oracle=_COV_ORACLE)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance of the embedding table (upper triangle,
    2080 cells at d=64) from map-side BLAS moment partials — the
    oracle-checked half of the PCA pipeline."""
    emb = spark.table("embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    return covariance_df(emb, "embedding", DIM)


def pca_project(spark: SparkSession) -> DataFrame:
    """Raw whitened top-{TOP_K} projection of every embedding
    (vec_id, label, proj array<double>): fit from distributed moments,
    project with literal-matrix JVM expressions. Component signs are
    convention-dependent — consume through q_pca_project's audit when
    an engine-independent contract is needed."""
    emb = spark.table("embeddings").filter(F.col("embedding").isNotNull())
    model = fit_pca(emb, "embedding", DIM, TOP_K)
    return project(emb, "embedding", model, whiten=True)


#: the whitening contract is EXACT in exact arithmetic (the projected
#: sample covariance is the identity by construction, the projected
#: mean is zero); the tolerance only absorbs float64 reassociation
#: between the moment pass and the audit's recomputation (~1e-10)
_WHITEN_TOL = 1e-6


@register(
    "q_pca_project",
    oracle=f"""
WITH dims AS (SELECT unnest(generate_series(1, {TOP_K})) AS d)
SELECT CAST(d1.d AS BIGINT) AS i, CAST(d2.d AS BIGINT) AS j,
       (SELECT COUNT(embedding) FROM embeddings) AS n,
       CAST(1 AS INTEGER) AS cov_ok,
       CAST(1 AS INTEGER) AS mean_ok
FROM dims d1 JOIN dims d2 ON d1.d <= d2.d
""",
)
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitened top-{TOP_K} PCA projection, audited: the projection
    (pca_project) certified in-engine against the whitening contract —
    for every component pair (i ≤ j) the projected sample covariance
    is δᵢⱼ and the projected mean is 0, both within {_WHITEN_TOL}
    (exact identities in exact arithmetic; see _WHITEN_TOL). The
    oracle re-derives the component grid and the exact row count n and
    asserts every flag: a wrong eigvec, a broken centering, a skipped
    whitening scale, or a dropped row each flips a cell. Raw
    projections stay available as ``pca_project`` — eigenvector signs
    are convention-dependent, which is exactly why the declared output
    certifies the contract instead. Covariance input itself is
    oracle-checked cell-by-cell as q_embed_covariance.

    The audit's moments ride the SAME BLAS moment_partials pass the
    fit uses (over the projected column this time) — a 45-expression
    JVM aggregate over the fold-dot projections measured ~3x slower
    from expression compilation alone."""
    out = pca_project(spark)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    target = F.when(F.col("di") == F.col("dj"), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        moment_cells(out.select("proj"), "proj", TOP_K)
        .select(
            (F.col("di") + 1).cast("long").alias("i"),
            (F.col("dj") + 1).cast("long").alias("j"),
            F.col("n").cast("long").alias("n"),
            (F.abs(cov - target) <= _WHITEN_TOL).cast("int").alias(
                "cov_ok"
            ),
            (
                (F.abs(F.col("sx") / F.col("n")) <= _WHITEN_TOL)
                & (F.abs(F.col("sy") / F.col("n")) <= _WHITEN_TOL)
            )
            .cast("int")
            .alias("mean_ok"),
        )
    )
