"""SimHash near-duplicate detection (north star).

The 64-bit SimHash is computed in a vectorized Pandas UDF (Arrow batch
transfer — the sanctioned slow path for bit-twiddling Spark expressions
can't do cheaply); everything downstream is DataFrame ops:

  - candidate blocking: split the 64-bit signature into 8 × 8-bit
    chunks; by pigeonhole, any pair within Hamming distance 7 differs
    in at most 7 chunks and therefore shares at least one exact chunk
    → self-join on (chunk_idx, chunk_value). Detection within the
    radius is guaranteed, not probabilistic; pairs beyond it are out
    of scope (the classic SimHash blocking trade)
  - verification: F.bit_count(a XOR b) ≤ HAMMING_MAX, JVM-side

Token hashes use md5 (stable across workers/runs — never Python's
builtin hash(), which is salted per process).

Rows-only: DuckDB has no SimHash; Spark-side determinism is asserted in
tests/test_dedup.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from pyanamo_spark.dedup import corpus_with_mutants
from pyanamo_spark.registry import register

HAMMING_MAX = 7
N_CHUNKS = 8
CHUNK_BITS = 8


def _simhash64(text: str) -> int:
    """Reference implementation (tests use it as an independent check);
    the UDF below is the vectorized equivalent."""
    acc = [0] * 64
    for tok in text.split(" "):
        h = int.from_bytes(
            hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
        )
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if acc[b] > 0:
            sig |= 1 << b
    # interpret as signed 64-bit for Spark LongType
    return sig - (1 << 64) if sig >= (1 << 63) else sig


#: executor-lifetime token→hash memo; real corpora repeat tokens
#: heavily (Zipf), so this converges to the vocabulary and stays small
_TOK_CACHE: dict[str, int] = {}


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Whole-batch-vectorized simhash, no per-document Python loop:

      1. one pandas str.split over the batch; all docs' tokens flatten
         into a single array with per-doc offsets
      2. factorize the flat tokens → md5 runs ONCE per distinct token
         (memoized across batches too); a take() rebuilds the flat
         uint64 hash stream
      3. np.unpackbits views the hashes as a (total_tokens, 64) 0/1
         matrix — little-endian bit order makes column b exactly
         ``(h >> b) & 1`` — at 1 byte per bit instead of 8
      4. np.add.reduceat at the doc offsets → per-doc bit votes; the
         majority test and a shift-dot repack the 64 sign bits

    The earlier per-doc form (loop + per-doc broadcast) spent ~90% of
    q_dedup_simhash's wall time in this UDF; this form is one C pass
    per stage over the whole Arrow batch.
    """
    if len(texts) == 0:  # zero-row Arrow batch: concatenate([]) raises
        return pd.Series([], dtype="int64")
    # null-safe: a null doc hashes like the empty string; callers drop
    # null rows before pairing so these never produce bogus matches
    toks = texts.fillna("").str.split(" ")
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    codes, uniques = pd.factorize(flat)
    uniq_hashes = np.empty(len(uniques), dtype=np.uint64)
    for i, tok in enumerate(uniques):
        h = _TOK_CACHE.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            _TOK_CACHE[tok] = h
        uniq_hashes[i] = h
    hashes = uniq_hashes[codes]
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # unpack + segment-sum in ~256-doc chunks: the (tokens, 64) bit
    # matrix then stays cache-resident, which is worth >10x — one
    # monolithic reduceat over a full 5k-doc batch walks the whole
    # matrix strided and measured seconds instead of milliseconds
    chunk = 256
    tok_bounds = np.append(starts, len(hashes))
    votes = np.empty((len(lens), 64), dtype=np.int64)
    for d0 in range(0, len(lens), chunk):
        d1 = min(d0 + chunk, len(lens))
        seg = np.unpackbits(
            hashes[tok_bounds[d0]:tok_bounds[d1]]
            .view(np.uint8)
            .reshape(-1, 8),
            axis=1,
            bitorder="little",
        )
        votes[d0:d1] = np.add.reduceat(
            seg, starts[d0:d1] - starts[d0], axis=0, dtype=np.int64
        )
    set_bits = 2 * votes > lens[:, None]
    bit_idx = np.arange(64, dtype=np.uint64)
    sig = (set_bits.astype(np.uint64) << bit_idx[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pd.Series(sig.view(np.int64))


@F.pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return _simhash_batch(texts)


def _chunks(sig_col):
    """8 × (chunk_idx, 8-bit chunk value) structs from a signed i64."""
    return F.expr(
        f"transform(sequence(0, {N_CHUNKS - 1}),"
        f" c -> struct(c AS chunk_idx,"
        f"   (shiftrightunsigned({sig_col}, c * {CHUNK_BITS})"
        f"    & {2**CHUNK_BITS - 1}) AS chunk_val))"
    )


@register("q_dedup_simhash", oracle=None)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star SimHash dedup: pairs within Hamming distance 7 over
    the mutant corpus, found via chunk-blocked self-join."""
    corpus = (
        corpus_with_mutants(spark)
        .where(F.col("text").isNotNull())  # nothing to compare
        .withColumn("sig", simhash_udf(F.col("text")))
    )
    # persisted: the self-join otherwise runs the simhash pandas UDF
    # over the full corpus on BOTH aliases; 4 skinny rows/doc is far
    # cheaper to hold than a second UDF pass over all text
    chunked = (
        corpus.select(
            "doc_id", "sig", F.explode(_chunks("sig")).alias("ch")
        )
        .select("doc_id", "sig", "ch.chunk_idx", "ch.chunk_val")
        .persist()
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
