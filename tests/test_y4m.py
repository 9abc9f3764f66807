"""YUV4MPEG2 codec invariants (multimodal/y4m.py): header-arithmetic
frame offsets (no body scan), colorspace coverage, strided sampling."""

from __future__ import annotations

import numpy as np
import pytest

from pyanamo_spark.multimodal.y4m import decode_y4m, encode_y4m, probe_y4m


def _smooth(t, h, w):
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 255 // max(w - 1, 1)) + (y * 128 // max(h - 1, 1))) // 2
    return np.stack(
        [
            np.stack([base, 255 - base, np.full_like(base, 40 + 10 * i)], -1)
            for i in range(t)
        ]
    ).astype(np.uint8)


def test_c444_roundtrip_within_one_lsb():
    rng = np.random.default_rng(6)
    v = rng.integers(0, 256, size=(5, 12, 16, 3), dtype=np.uint8)
    out = decode_y4m(encode_y4m(v, colorspace="444"))
    assert np.abs(out.astype(int) - v.astype(int)).max() <= 1


def test_c420_and_c422_smooth_content():
    v = _smooth(4, 12, 16)
    for cs in ("420jpeg", "420", "422"):
        out = decode_y4m(encode_y4m(v, colorspace=cs))
        assert out.shape == v.shape
        # chroma subsampling on smooth gradients stays tight
        assert np.abs(out.astype(int) - v.astype(int)).mean() <= 4.0


def test_mono_exact_and_probe_math():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, size=(3, 6, 8), dtype=np.uint8)
    enc = encode_y4m(g)
    meta = probe_y4m(enc)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 6, 3)
    assert meta["colorspace"] == "mono"
    # offsets computed from the header must index real frame data
    assert all(sz == 48 for _, sz in meta["frames"])
    assert np.array_equal(decode_y4m(enc), np.repeat(g[..., None], 3, -1))


def test_strided_sampling_skips_reads():
    v = _smooth(7, 8, 8)
    enc = encode_y4m(v, colorspace="444")
    assert np.array_equal(decode_y4m(enc, every=3), decode_y4m(enc)[::3])
    assert decode_y4m(enc, max_frames=2).shape[0] == 2


def test_bad_magic_and_odd_dims_raise():
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(_smooth(1, 7, 9), colorspace="420")
    with pytest.raises(NotImplementedError, match="colorspace"):
        encode_y4m(_smooth(1, 8, 8), colorspace="411")


def test_pipeline_registers_y4m():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "video/y4m" in CODECS
    out = CODECS["video/y4m"](encode_y4m(_smooth(2, 8, 8), colorspace="444"))
    assert np.asarray(out).shape == (2, 8, 8, 3)
