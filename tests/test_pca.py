"""Distributed PCA: moments vs numpy, eigvec invariants, projection
parity, whitening variance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyanamo_spark import semantics
from pyanamo_spark.functions.pca import (
    DIM,
    covariance_df,
    fit_pca,
    project,
)


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    rows = (
        spark.table("embeddings").select("vec_id", "embedding").collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, X


def test_covariance_matches_numpy(spark, sf_dir, emb_np):
    _, X = emb_np
    expected = np.cov(X, rowvar=False, ddof=1)
    emb = spark.table("embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    got = covariance_df(emb, "embedding", DIM).collect()
    assert len(got) == DIM * (DIM + 1) // 2
    for r in got:
        assert abs(r["cov"] - round(expected[r["i"] - 1, r["j"] - 1], 4)) < 2e-4


def test_fit_pca_invariants(spark, sf_dir, emb_np):
    _, X = emb_np
    model = fit_pca(spark.table("embeddings"), "embedding", DIM, 8)
    C = model["components"]
    # orthonormal rows
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-9)
    # eigvals descending and match numpy's top spectrum
    vals = np.linalg.eigvalsh(np.cov(X, rowvar=False, ddof=1))[::-1][:8]
    assert np.allclose(model["eigvals"], vals, atol=1e-9)
    assert all(
        model["eigvals"][i] >= model["eigvals"][i + 1] for i in range(7)
    )
    # deterministic sign: largest-|entry| coordinate positive
    for c in C:
        assert c[np.argmax(np.abs(c))] > 0
    # mean matches
    assert np.allclose(model["mean"], X.mean(axis=0), atol=1e-12)


def test_projection_parity_and_whitening(spark, sf_dir, emb_np):
    ids, X = emb_np
    emb = spark.table("embeddings")
    model = fit_pca(emb, "embedding", DIM, 8)
    out = project(emb, "embedding", model, whiten=True)
    got = {r["vec_id"]: np.array(r["proj"]) for r in out.collect()}
    P = np.stack([got[i] for i in ids])
    centered = X - model["mean"]
    expected = centered @ model["components"].T / np.sqrt(model["eigvals"])
    assert np.allclose(P, expected, atol=1e-9)
    # whitened coordinates have unit sample variance
    assert np.allclose(P.var(axis=0, ddof=1), 1.0, atol=1e-6)


def test_projection_is_jvm_only(spark, sf_dir):
    """The per-row projection plan must stay in codegen — no
    Python/Arrow eval nodes (the model rides as literals)."""
    semantics.ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    model = fit_pca(emb, "embedding", DIM, 4)
    plan = (
        project(emb, "embedding", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
