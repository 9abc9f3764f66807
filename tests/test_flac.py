"""FLAC codec: lossless round-trips across every subframe type,
residual method, channel decorrelation, wasted bits, CRC/MD5
integrity, and pipeline integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.multimodal.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
    flac_info,
)


def _q16(x):
    return np.round(np.clip(x, -1, 1) * 32767) / 32768


def _tone(n=4000, f=440.0, rate=16000, amp=0.5):
    return amp * np.sin(2 * np.pi * f * np.arange(n) / rate)


# ---------------------------------------------------------------- CRC


def test_crc8_known_vector():
    # x^8+x^2+x+1 over '123456789' is the standard check value 0xF4
    assert _crc8(b"123456789") == 0xF4


def test_crc16_known_vector():
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) over '123456789'
    assert _crc16(b"123456789") == 0xFEE8


# ---------------------------------------------------------- roundtrip


@pytest.mark.parametrize("mode", ["verbatim", "fixed2", "lpc"])
def test_mono_roundtrip_lossless(mode):
    x = _tone()
    out = decode_flac(encode_flac(x, mode=mode, blocksize=1024))
    assert out.shape == x.shape
    assert np.abs(out - _q16(x)).max() < 1e-12


@pytest.mark.parametrize("porder", [0, 1, 3])
@pytest.mark.parametrize("rice2", [False, True])
def test_partitioned_residuals(porder, rice2):
    x = _tone(4096)
    out = decode_flac(
        encode_flac(x, blocksize=2048, mode="lpc", porder=porder, rice2=rice2)
    )
    assert np.abs(out - _q16(x)).max() < 1e-12


@pytest.mark.parametrize(
    "channel_mode", ["indep", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation(channel_mode):
    rng = np.random.default_rng(3)
    left = _tone(3000)
    right = 0.8 * left + 0.05 * rng.uniform(-1, 1, 3000)
    stx = np.stack([left, right], axis=-1)
    out = decode_flac(
        encode_flac(stx, channel_mode=channel_mode, mode="lpc", blocksize=1024)
    )
    assert out.shape == (3000, 2)
    assert np.abs(out - _q16(stx)).max() < 1e-12


def test_constant_subframe_tiny():
    blob = encode_flac(np.zeros(2000), 8000)
    assert len(blob) < 200
    assert (decode_flac(blob) == 0).all()


def test_wasted_bits_roundtrip():
    # every sample a multiple of 16 -> 4 wasted bits stripped
    rng = np.random.default_rng(4)
    ints = (rng.integers(-2000, 2000, 1500) * 16).astype(np.int64)
    out = decode_flac(encode_flac(ints, bps=16, mode="fixed2"))
    assert np.abs(out * 32768 - ints).max() < 1e-9


def test_escape_partition_on_noise():
    rng = np.random.default_rng(5)
    noise = rng.uniform(-1, 1, 3000)
    out = decode_flac(encode_flac(noise, mode="fixed2", porder=1))
    assert np.abs(out - _q16(noise)).max() < 1e-12


def test_lpc_beats_verbatim_on_tonal_audio():
    x = _tone(8000)
    assert len(encode_flac(x, mode="lpc")) < 0.6 * len(
        encode_flac(x, mode="verbatim")
    )


def test_many_frames_utf8_numbers():
    # >128 frames exercises the 2-byte UTF-8 frame-number branch
    x = _tone(140 * 64)
    out = decode_flac(encode_flac(x, blocksize=64, mode="fixed2"))
    assert np.abs(out - _q16(x)).max() < 1e-12


@settings(max_examples=20, deadline=None)
@given(
    st.integers(50, 600),
    st.sampled_from(["verbatim", "fixed2", "lpc"]),
    st.integers(0, 2),
)
def test_property_roundtrip(n, mode, porder):
    rng = np.random.default_rng(n)
    x = rng.uniform(-0.99, 0.99, n)
    out = decode_flac(encode_flac(x, blocksize=256, mode=mode, porder=porder))
    assert np.abs(out - _q16(x)).max() < 1e-12


# ----------------------------------------------------------- metadata


def test_flac_info_fields():
    info = flac_info(encode_flac(_tone(1234), rate=22050))
    assert info["sample_rate"] == 22050
    assert info["n_channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["n_frames"] == 1234


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_flac(b"NOPE" + b"\x00" * 40)


def test_corruption_detected():
    blob = bytearray(encode_flac(_tone(2000)))
    blob[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|MD5"):
        decode_flac(bytes(blob))


def test_header_corruption_detected():
    blob = bytearray(encode_flac(_tone(500), blocksize=256))
    # flip a bit inside the first frame header (after 4+4+38-byte
    # STREAMINFO block = offset 46; header starts there)
    blob[48] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|sync|blocksize"):
        decode_flac(bytes(blob))


# ------------------------------------------------------ registry glue


def test_pipeline_flac_registered():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "audio/flac" in CODECS
    x = _tone(800)
    out = CODECS["audio/flac"](encode_flac(x, mode="lpc"))
    assert np.abs(out - _q16(x)).max() < 1e-12
