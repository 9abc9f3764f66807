"""Hypothesis property tests for the per-bucket FFD packer.

``_pack_bucket`` is the sequential core of q_pack_sequences
(operators/packing.py) — a pure pandas function, so its invariants can
be fuzzed hard without a SparkSession: random token multisets must
always pack with capacity respected, nothing lost or duplicated, FFD's
fill guarantee held, and the result a pure function of the multiset
(input order must not matter — Spark gives applyInPandas no row-order
guarantee, so order sensitivity would be a real distributed-correctness
bug, not a style issue).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.operators.packing import BIN_CAPACITY, _pack_bucket

tokens_lists = st.lists(
    st.integers(min_value=1, max_value=2 * BIN_CAPACITY),
    min_size=1,
    max_size=200,
)


def _bucket_df(tokens: list[int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(len(tokens)),
            "n_tokens": tokens,
            "bucket": 3,
        }
    )


@settings(max_examples=200, deadline=None)
@given(tokens_lists)
def test_capacity_and_coverage(tokens):
    out = _pack_bucket(_bucket_df(tokens))
    # every doc placed exactly once, token counts preserved
    assert sorted(out["doc_id"]) == list(range(len(tokens)))
    assert (
        out.sort_values("doc_id")["n_tokens"].tolist() == tokens
    )
    # capacity: a bin over budget must be a single oversized doc
    by_bin = out.groupby("bin_id")["n_tokens"].agg(["sum", "count"])
    over = by_bin[by_bin["sum"] > BIN_CAPACITY]
    assert (over["count"] == 1).all()
    assert (over["sum"] > BIN_CAPACITY).all() if len(over) else True


@settings(max_examples=200, deadline=None)
@given(tokens_lists)
def test_ffd_fill_guarantee(tokens):
    """Any-fit invariant: at most ONE bin ends at most half full — if
    two were, the later one's first item would have fit in the earlier.
    (The token-mass lower bound is NOT a valid stand-in for OPT here:
    five 129-token docs need five 256-bins but only ceil(645/256)=3 by
    mass.) Corollary: bin count < 2 * mass/capacity + 1."""
    out = _pack_bucket(_bucket_df(tokens))
    by_bin = out.groupby("bin_id")["n_tokens"].sum()
    assert (by_bin <= BIN_CAPACITY / 2).sum() <= 1
    n_bins = out["bin_id"].nunique()
    assert n_bins <= 2 * sum(tokens) / BIN_CAPACITY + 1


@settings(max_examples=100, deadline=None)
@given(tokens_lists, st.randoms(use_true_random=False))
def test_order_invariance(tokens, rnd):
    """The packing is a function of the multiset: shuffling input rows
    (Spark gives no partition row order) must not change any
    assignment."""
    base = _pack_bucket(_bucket_df(tokens))
    shuffled_df = (
        _bucket_df(tokens)
        .sample(frac=1.0, random_state=rnd.randint(0, 2**31))
        .reset_index(drop=True)
    )
    shuffled = _pack_bucket(shuffled_df)
    key = lambda df: sorted(zip(df["doc_id"], df["bin_id"]))
    assert key(base) == key(shuffled)


def test_bin_ids_carry_bucket_stride():
    out = _pack_bucket(_bucket_df([10, 20, 30]))
    from pyanamo_spark.operators.packing import _BIN_STRIDE

    assert (out["bin_id"] // _BIN_STRIDE == 3).all()
