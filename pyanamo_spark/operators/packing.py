"""Sequence packing for training-batch assembly (north star).

The step between tokenization and batching: pack variable-length
documents into fixed-token-budget bins so training sequences waste no
padding. Exact global bin packing is inherently sequential (NP-hard
and order-dependent), so the scale shape is the standard compromise:

  1. shard docs into ``N_BUCKETS`` deterministic key-hash buckets —
     one shuffle, the only one in the plan
  2. pack each bucket independently with greedy first-fit-decreasing
     inside ``applyInPandas`` (a per-bucket scalar state, vectorized
     token counting)
  3. bin ids are (bucket, local_bin) pairs packed into one long, so
     they are globally unique and stable across reruns

Packing loss vs a global pack is O(1) bins per bucket (the last bin of
each), negligible when the bucket's token mass is many times the bin
capacity — at 100 TB each bucket packs millions of tokens against a
~10^4 budget. Oracle-checked via the packing-contract audit (r09):
greedy bin ids are not SQL-expressible, but the invariants a consumer
relies on ARE — capacity respected, every doc placed exactly once,
the first-fit fill guarantee — so the declared query certifies them
per document; determinism stays pinned in tests/test_packing.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

BIN_CAPACITY = 256
N_BUCKETS = 16
#: bucket b's bins are numbered b * _BIN_STRIDE + local_idx
_BIN_STRIDE = 1_000_000


def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing within one bucket. Ties broken by doc_id so
    the packing is a pure function of the bucket's contents."""
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    bucket = int(pdf["bucket"].iloc[0])
    bins: list[int] = []  # remaining capacity per open bin
    assigned = []
    for tok in pdf["n_tokens"]:
        tok = int(tok)
        for i, rem in enumerate(bins):
            if rem >= tok:
                assigned.append(i)
                bins[i] = rem - tok
                break
        else:
            # oversized docs get a dedicated (overflowing) bin
            assigned.append(len(bins))
            bins.append(max(BIN_CAPACITY - tok, 0))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"],
            "bin_id": [bucket * _BIN_STRIDE + a for a in assigned],
        }
    )


def pack_sequences(spark: SparkSession) -> DataFrame:
    """Raw packing assignment: documents → (doc_id, n_tokens, bin_id)
    with every bin's token sum ≤ {BIN_CAPACITY} (single oversized docs
    get their own bin). Bin ids depend on first-fit-decreasing
    iteration order — consume through q_pack_sequences' audit when an
    engine-independent contract is needed."""
    # null-text docs drop at the stage boundary (the null-row
    # contract): a null split would reach _pack_bucket as NaN
    docs = (
        spark.table("documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.pmod(F.hash("doc_id"), F.lit(N_BUCKETS)).alias("bucket"),
        )
    )
    return docs.groupBy("bucket").applyInPandas(
        _pack_bucket, "doc_id long, n_tokens long, bin_id long"
    )


@register(
    "q_pack_sequences",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(1 AS INTEGER) AS bin_ok,
       CAST(1 AS INTEGER) AS fill_ok
FROM documents
WHERE text IS NOT NULL
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star sequence packing, audited per document: the
    first-fit-decreasing assignment (pack_sequences) certified
    in-engine with the two invariants a training-batch consumer relies
    on —

    - ``bin_ok``: the doc's bin totals ≤ {BIN_CAPACITY} tokens, OR the
      doc is oversized (> {BIN_CAPACITY}) and sits alone in its bin;
    - ``fill_ok``: the doc's bucket has at most one bin under half
      capacity (the first-fit guarantee — two half-empty bins would
      have merged), i.e. packing efficiency didn't silently regress.

    The oracle re-derives doc_id + exact n_tokens and asserts both
    flags, which also certifies every doc was packed EXACTLY once
    (a dropped doc fails the row-count compare; a double-packed doc
    fails the hash on its duplicated row). Raw bin ids stay available
    as ``pack_sequences`` — they are iteration-order-specific, which
    is exactly why the declared output certifies invariants instead."""
    # persisted: three consumers (bin totals, bucket fills, the final
    # join) would otherwise re-run the FFD stage per subtree — the
    # assignment is a skinny 24 B/row frame
    packed = pack_sequences(spark).persist()
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count("*").alias("bin_docs"),
    )
    bin_ok = (
        (F.col("bin_tokens") <= BIN_CAPACITY)
        | ((F.col("bin_docs") == 1) & (F.col("n_tokens") > BIN_CAPACITY))
    ).cast("int")
    under_half = (F.col("bin_tokens") < BIN_CAPACITY / 2).cast("int")
    fills = (
        bins.withColumn("bucket", (F.col("bin_id") / _BIN_STRIDE).cast("long"))
        .groupBy("bucket")
        .agg((F.sum(under_half) <= 1).cast("int").alias("fill_ok"))
    )
    # bins is corpus-sized/fill-factor — a plain shuffle join (AQE may
    # still broadcast it at small sf); only the 16-row fills broadcasts
    return (
        packed.join(bins, "bin_id")
        .withColumn("bucket", (F.col("bin_id") / _BIN_STRIDE).cast("long"))
        .join(F.broadcast(fills), "bucket")
        .select("doc_id", "n_tokens", bin_ok.alias("bin_ok"), "fill_ok")
    )
