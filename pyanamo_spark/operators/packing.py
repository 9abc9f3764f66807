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
~10^4 budget. Declared rows-only: greedy packing is not
SQL-expressible; the invariants (capacity respected, every doc placed
exactly once, determinism, fill efficiency) are pinned in
tests/test_packing.py.
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


@register(
    "q_pack_sequences",
    oracle=None,
    rows_only_reason=(
    "bin assignment depends on first-fit-decreasing iteration order,"
    " which no SQL can replay; tests/test_packing.py property-checks"
    " the <=256-token bin invariant and single-bin oversize rule"
    ),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star sequence packing: documents → (doc_id, n_tokens,
    bin_id) with every bin's token sum ≤ 256 (single oversized docs get
    their own bin)."""
    docs = spark.table("documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.pmod(F.hash("doc_id"), F.lit(N_BUCKETS)).alias("bucket"),
    )
    return docs.groupBy("bucket").applyInPandas(
        _pack_bucket, "doc_id long, n_tokens long, bin_id long"
    )
