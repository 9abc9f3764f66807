"""Property-based tests (hypothesis, pure-Python — no Spark session
per example) for the WAV codec and the weighted-sample hex-threshold
encoding trick."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.multimodal.wav import decode_wav, encode_wav, wav_info


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    rate=st.sampled_from([4000, 8000, 16000, 44100]),
    stereo=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_int16_exact(samples, rate, stereo):
    arr = np.array(samples, dtype=np.int16)
    if stereo:
        arr = np.stack([arr, arr[::-1]], axis=-1)
    payload = encode_wav(arr, rate=rate)
    back = decode_wav(payload)
    assert back.shape == arr.shape
    assert np.array_equal(
        np.round(back * 32768.0).astype(np.int16), arr
    )
    nch, got_rate, n = wav_info(payload)
    assert (nch, got_rate, n) == (2 if stereo else 1, rate, len(samples))


@given(
    samples=st.lists(
        st.floats(
            min_value=-1.0, max_value=1.0, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_wav_float_roundtrip_within_quantization(samples):
    """Encode scales by 32767, decode divides by 32768 (the soundfile
    convention) — worst case |x|/32768 scale slack + half-LSB rounding
    = 1.5 LSB at |x| = 1."""
    arr = np.array(samples, dtype=np.float64)
    back = decode_wav(encode_wav(arr, rate=8000))
    assert np.max(np.abs(back - arr)) <= 1.5 / 32768.0 + 1e-12


def _keep(doc_id: int, weight: float) -> bool:
    """Pure-Python mirror of q_weighted_sample's engine predicate."""
    if weight >= 1.0:
        return True
    prefix = hashlib.md5(f"{doc_id}:ws".encode()).hexdigest()[:8]
    threshold = format(int(weight * 4294967296), "x").rjust(8, "0")
    return prefix < threshold


@given(
    doc_id=st.integers(min_value=0, max_value=2**62),
    weight=st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
)
@settings(max_examples=500, deadline=None)
def test_weighted_sample_hex_compare_equals_numeric(doc_id, weight):
    """The lexicographic 8-hex-digit compare must agree with the
    numeric interpretation for every weight — including the ≥1.0
    guard region where a 9-digit threshold would corrupt the string
    compare (that's exactly why the guard exists)."""
    got = _keep(doc_id, weight)
    u = int(
        hashlib.md5(f"{doc_id}:ws".encode()).hexdigest()[:8], 16
    )
    want = weight >= 1.0 or u < int(weight * 4294967296)
    assert got == want


@given(weight=st.floats(min_value=0.05, max_value=0.95))
@settings(max_examples=20, deadline=None)
def test_weighted_sample_rate_tracks_weight(weight):
    """Over a fixed id population the keep rate approximates the
    weight (md5 uniformity) — a 10-point tolerance on 2000 ids."""
    n = 2000
    kept = sum(_keep(i, weight) for i in range(n))
    assert abs(kept / n - weight) < 0.10
