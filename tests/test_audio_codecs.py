"""Audio codec family: G.711 companding, extended WAV encodings
(float / 24-bit / 8-bit / μ-law / A-law), and the AIFF container."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.multimodal import g711
from pyanamo_spark.multimodal.aiff import (
    _read_extended,
    _write_extended,
    aiff_info,
    decode_aiff,
    encode_aiff,
)
from pyanamo_spark.multimodal.wav import decode_wav, encode_wav, wav_info


def _tone(n=400, seed=2):
    return np.random.default_rng(seed).uniform(-0.9, 0.9, n)


# -------------------------------------------------------------- G.711


def test_ulaw_code_involution():
    """decode→re-encode reproduces every μ-law code point except 0x7F,
    the spec's negative-zero (it decodes to 0, which re-encodes to the
    positive-zero code 0xFF)."""
    codes = np.arange(256, dtype=np.uint8)
    rt = g711.linear_to_ulaw(g711.ulaw_to_linear(codes))
    mism = np.nonzero(rt != codes)[0]
    assert mism.tolist() == [0x7F]
    assert rt[0x7F] == 0xFF


def test_alaw_code_involution():
    codes = np.arange(256, dtype=np.uint8)
    rt = g711.linear_to_alaw(g711.alaw_to_linear(codes))
    assert (rt == codes).all()


def test_g711_decode_ranges():
    assert int(g711.ulaw_to_linear(np.array([0x00]))[0]) == -32124
    assert int(g711.ulaw_to_linear(np.array([0x80]))[0]) == 32124
    assert int(g711.ulaw_to_linear(np.array([0xFF]))[0]) == 0
    a = g711.alaw_to_linear(np.arange(256, dtype=np.uint8))
    assert a.min() == -32256 and a.max() == 32256


@settings(max_examples=200, deadline=None)
@given(st.integers(-32768, 32767))
def test_g711_quantization_bounds(s):
    """Per-sample error stays inside the companding segment step."""
    x = np.array([s], dtype=np.int16)
    for enc, dec, step_bits in (
        (g711.linear_to_ulaw, g711.ulaw_to_linear, 3),
        (g711.linear_to_alaw, g711.alaw_to_linear, 4),
    ):
        back = int(dec(enc(x))[0])
        # largest step: top segment quantum (<= 1024 / 16-bit domain)
        assert abs(back - s) <= 1024, (enc.__name__, s, back)
        if abs(s) < 48:  # near zero the step is the smallest quantum
            assert abs(back - s) <= 16 + 8


# ----------------------------------------------------- WAV encodings


@pytest.mark.parametrize(
    "encoding,tol",
    [
        ("pcm16", 1 / 16000),
        ("pcm24", 1 / 4e6),
        ("pcm8", 1 / 100),
        ("float32", 1e-6),
    ],
)
def test_wav_pcm_variants_roundtrip(encoding, tol):
    x = _tone()
    out = decode_wav(encode_wav(x, 16000, encoding=encoding))
    assert out.shape == x.shape
    assert np.abs(out - x).max() < tol


@pytest.mark.parametrize("encoding", ["ulaw", "alaw"])
def test_wav_g711_roundtrip_relative(encoding):
    x = _tone()
    out = decode_wav(encode_wav(x, 8000, encoding=encoding))
    rel = np.abs(out - x) / np.maximum(np.abs(x), 2e-2)
    assert rel.max() < 0.07


def test_wav_g711_stereo_and_info():
    st_sig = np.random.default_rng(5).uniform(-0.5, 0.5, (300, 2))
    blob = encode_wav(st_sig, 22050, encoding="ulaw")
    assert wav_info(blob) == (2, 22050, 300)
    out = decode_wav(blob)
    assert out.shape == (300, 2)


def test_wav_stdlib_reads_our_pcm16():
    import io
    import wave

    blob = encode_wav(_tone(), 44100)
    with wave.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getnframes()) == (
            1,
            44100,
            400,
        )


def test_wav_extensible_wrapper_decodes():
    """WAVE_FORMAT_EXTENSIBLE header resolves to its sub-format tag."""
    import struct

    x = _tone(100)
    blob = bytearray(encode_wav(x, 8000))
    # rebuild with an extensible fmt chunk wrapping PCM
    tag_off = 20  # RIFF(12) + 'fmt '(4) + size(4)
    old_fmt = bytes(blob[tag_off : tag_off + 16])
    sub = struct.pack("<H", 1) + b"\x00\x00" + b"\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    ext_fmt = (
        struct.pack("<H", 0xFFFE)
        + old_fmt[2:16]
        + struct.pack("<HHI", 22, 16, 0x3)
        + sub
    )
    data_part = bytes(blob[tag_off + 16 :])
    new = (
        bytes(blob[:16])
        + struct.pack("<I", len(ext_fmt))
        + ext_fmt
        + data_part
    )
    new = b"RIFF" + struct.pack("<I", len(new) - 8) + new[8:]
    out = decode_wav(new)
    assert np.abs(out - x).max() < 1 / 16000


def test_wav_bad_signature_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + b"\x00" * 64)


# --------------------------------------------------------------- AIFF


@pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000, 96000])
def test_extended_float_roundtrip(rate):
    assert _read_extended(_write_extended(float(rate))) == rate


@pytest.mark.parametrize(
    "bits,tol", [(16, 1 / 16000), (24, 1 / 4e6), (32, 1e-8), (8, 1 / 60)]
)
def test_aiff_roundtrip(bits, tol):
    x = _tone()
    out = decode_aiff(encode_aiff(x, 44100, bits=bits))
    assert out.shape == x.shape
    assert np.abs(out - x).max() < tol


def test_aiff_stereo_info():
    st_sig = np.random.default_rng(6).uniform(-0.5, 0.5, (250, 2))
    blob = encode_aiff(st_sig, 22050)
    assert aiff_info(blob) == (2, 22050, 250)
    assert decode_aiff(blob).shape == (250, 2)


def test_aiff_bad_signature_raises():
    with pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"JUNK" + b"\x00" * 64)


# ------------------------------------------------------ registry glue


def test_pipeline_audio_codecs_registered():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "audio/aiff" in CODECS
    x = _tone(120)
    out = CODECS["audio/aiff"](encode_aiff(x, 8000))
    assert np.abs(out - x).max() < 1 / 16000
    out2 = CODECS["audio/wav"](encode_wav(x, 8000, encoding="alaw"))
    assert out2.shape == x.shape
