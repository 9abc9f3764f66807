"""Embedding-cosine near-duplicate detection (north star),
oracle-checked.

Pairs are blocked on ``label`` (standing in for an ANN/LSH bucket — at
100 TB the blocking key comes from pyanamo_spark.similarity.lsh, same
join shape) and resolved in two stages:

  1. **Candidate stage** — per-block ``applyInPandas`` computes the full
     similarity matrix with one numpy float64 matmul and emits only the
     pairs at or above ``THRESHOLD - CAND_MARGIN``. Vectorized BLAS is
     ~100x the throughput of evaluating a per-pair expression, and the
     output is just (vec_a, vec_b) id pairs — the quadratic pair space
     never materializes as rows.
  2. **Verify stage** — the few survivors re-join the embeddings (two
     broadcast hash joins, no shuffle) and the cosine is recomputed with
     the *exact* sequential-fold expression the DuckDB oracle mirrors
     (``dot / (nrm_a * nrm_b)``, every element cast to double, left-to-
     right aggregate). Output values therefore match the oracle
     bit-for-bit at the rounded precision; numpy only ever *selects*
     pairs, with a margin wider than matmul-vs-fold reassociation noise
     AND the half-ulp of ROUND(x, 6), so it can neither drop nor add a
     pair relative to the one-stage plan.

At 100 TB this is the standard block-then-verify ANN shape: blocks are
bounded (LSH bucket), the matmul is per-block local work after one
shuffle on the blocking key, and only id pairs cross the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.functions.vectors import (
    dot,
    duckdb_dot_sql,
    duckdb_sq_sum_sql,
)
from pyanamo_spark.registry import register

THRESHOLD = 0.35
# the candidate matmul runs in FLOAT32 (2x the flops/byte of float64,
# half the sims-matrix memory): measured |cos32 − cos64| ≤ 3.6e-7 on
# the fixture, theoretical ~1e-6 for 64-dim unit vectors — the margin
# keeps ~100x headroom over that AND over the 5e-7 half-step of
# ROUND(x, 6) at the boundary, so float32 can only ADD candidates the
# exact float64 verify stage then rejects, never drop a true pair
CAND_MARGIN = 1e-4

#: candidate-matmul row-chunk: keeps the (chunk × block) sims slab
#: cache-resident and bounds memory to chunk·|block|·4 bytes — the
#: monolithic |block|² matrix measured 15x slower at sf1 block sizes
#: (2 000 rows) from cache misses + the full lower triangle it wasted
_CAND_CHUNK = 512

_DOT = duckdb_dot_sql("a.embedding", "b.embedding")
_COS = f"({_DOT} / (a.nrm * b.nrm))"


def _block_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
    """One label block -> candidate (vec_a, vec_b) pairs at or above
    the module threshold minus the verify margin. Exactly ONE
    positional arg: applyInPandas dispatches on arity and would pass
    (key, pdf) to anything two-parameter."""
    return block_candidates(pdf, THRESHOLD - CAND_MARGIN)


def block_candidates(pdf: pd.DataFrame, lo: float) -> pd.DataFrame:
    """Candidate (vec_a, vec_b) pairs by chunked upper-triangle cosine
    in float32; pairs at or above ``lo`` survive (see CAND_MARGIN for
    why float32 selection is safe under the exact float64 verify)."""
    pdf = pdf[pdf["embedding"].notna()]  # null vectors match nothing
    if len(pdf) < 2:
        return pd.DataFrame({"vec_a": [], "vec_b": []}, dtype="int64")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    nrm = np.linalg.norm(mat, axis=1).astype(np.float32)
    nrm[nrm == 0.0] = 1.0  # zero vectors match nothing either way
    n = len(ids)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for i0 in range(0, n, _CAND_CHUNK):
        i1 = min(i0 + _CAND_CHUNK, n)
        # columns start at the chunk's own row offset: the strictly
        # lower triangle is never computed, halving the flops
        sims = (mat[i0:i1] @ mat[i0:].T) / np.outer(
            nrm[i0:i1], nrm[i0:]
        )
        ai, bi = np.nonzero(sims >= lo)
        ga, gb = ai + i0, bi + i0
        keep = gb > ga
        out_a.append(ga[keep])
        out_b.append(gb[keep])
    ai = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
    bi = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
    return pd.DataFrame(
        {
            "vec_a": np.minimum(ids[ai], ids[bi]),
            "vec_b": np.maximum(ids[ai], ids[bi]),
        }
    )


@register(
    "q_dedup_embed",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         sqrt({duckdb_sq_sum_sql("embedding")}) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_COS}, 6) AS cos_sim
FROM e a
JOIN e b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND({_COS}, 6) >= {THRESHOLD}
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star embedding near-dup: label-blocked numpy candidate
    matmul, exact-expression verify at cosine ≥ 0.35 (the fixture's
    random vectors top out near 0.46, so the threshold selects the true
    high-similarity tail)."""
    emb = spark.table("embeddings")
    candidates = (
        emb.select("label", "vec_id", "embedding")
        .groupBy("label")
        .applyInPandas(_block_candidates, "vec_a long, vec_b long")
    )
    with_norm = emb.withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    ea = with_norm.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = with_norm.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = F.round(
        dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("nrm_a") * F.col("nrm_b")),
        6,
    )
    return (
        F.broadcast(candidates)
        .join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= THRESHOLD)
        .select("vec_a", "vec_b", "cos_sim")
    )
