"""GIF (LZW/interlace/animation) and BMP codecs: exact round-trips —
both formats are lossless, so every branch must reproduce pixels
bit-for-bit — plus probe/error paths and codec-registry integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.multimodal.bmp import decode_bmp, encode_bmp
from pyanamo_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    probe_gif,
)


def _palette_image(rng, h, w, n_colors):
    colors = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    return colors[rng.integers(0, n_colors, size=(h, w))]


# ------------------------------------------------------------ GIF LZW


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=400),
    st.integers(4, 8),
)
def test_lzw_roundtrip(indices, min_code_size):
    arr = np.array(indices, dtype=np.uint8)
    data = _lzw_encode(arr, min_code_size)
    out = _lzw_decode(data, min_code_size, len(arr))
    assert (out == arr).all()


def test_lzw_table_cap_clear_path():
    # long random stream with a large alphabet forces the dictionary
    # past 4096 entries -> mid-stream clear + rebuild
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=60_000).astype(np.uint8)
    out = _lzw_decode(_lzw_encode(arr, 8), 8, len(arr))
    assert (out == arr).all()


def test_lzw_kwkwk_pattern():
    # 'ababab...' style repetition exercises the code==len(table) case
    arr = np.array([0, 1] * 50 + [0] * 30, dtype=np.uint8)
    out = _lzw_decode(_lzw_encode(arr, 2), 2, len(arr))
    assert (out == arr).all()


# ---------------------------------------------------------- GIF image


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("n_colors", [2, 16, 256])
def test_gif_still_roundtrip_exact(interlace, n_colors):
    rng = np.random.default_rng(n_colors)
    img = _palette_image(rng, 29, 41, n_colors)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out == img).all()


def test_gif_grayscale_input_expands():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    out = decode_gif(encode_gif(gray))
    assert out.shape == (8, 8, 3)
    assert (out[:, :, 0] == gray).all()


def test_gif_animation_composites_frames():
    f0 = np.full((12, 10, 3), (10, 20, 30), np.uint8)
    f1 = f0.copy()
    f1[2:6, 2:6] = (200, 0, 0)
    f2 = f1.copy()
    f2[6:10, 4:8] = (0, 200, 0)
    anim = np.stack([f0, f1, f2])
    blob = encode_gif(anim, disposal=1, delay_cs=10)
    out = decode_gif(blob)
    assert out.shape == (3, 12, 10, 3)
    assert (out == anim).all()
    meta = probe_gif(blob)
    assert meta["n_frames"] == 3
    assert (meta["width"], meta["height"]) == (10, 12)
    assert meta["version"] == "89a"


def test_gif_frame_sampling_after_composite():
    frames = np.stack(
        [np.full((6, 6, 3), i * 20, np.uint8) for i in range(5)]
    )
    out = decode_gif(encode_gif(frames), every=2)
    assert out.shape == (3, 6, 6, 3)
    assert (out[1] == frames[2]).all()


def test_gif_transparency_keeps_underlying_pixel():
    # frame 2 paints only half the canvas; the transparent color in the
    # second frame must leave frame 1's pixels visible
    f0 = np.full((8, 8, 3), (1, 2, 3), np.uint8)
    f1 = np.full((8, 8, 3), (9, 9, 9), np.uint8)
    f1[:4] = (1, 2, 3)  # matches transparent_color -> not painted
    blob = encode_gif(
        np.stack([f0, f1]), transparent_color=(1, 2, 3), disposal=1
    )
    out = decode_gif(blob)
    # bottom half painted, top half shows frame 0's (identical) color
    assert (out[1][4:] == (9, 9, 9)).all()
    assert (out[1][:4] == (1, 2, 3)).all()


def test_gif_too_many_colors_raises():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOPE" + b"\x00" * 32)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(2, 32),
    st.booleans(),
)
def test_gif_property_roundtrip(h, w, n_colors, interlace):
    rng = np.random.default_rng(h * 1000 + w * 10 + n_colors)
    img = _palette_image(rng, h, w, n_colors)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert (out == img).all()


# --------------------------------------------------------------- BMP


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_rgb_roundtrip_exact(bpp, top_down):
    rng = np.random.default_rng(bpp)
    img = rng.integers(0, 256, size=(23, 31, 3)).astype(np.uint8)
    out = decode_bmp(encode_bmp(img, bpp=bpp, top_down=top_down))
    assert (out == img).all()


def test_bmp_8bit_gray_palette():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(17, 19)).astype(np.uint8)
    out = decode_bmp(encode_bmp(gray, bpp=8))
    assert out.shape == (17, 19, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()


def test_bmp_odd_width_stride_padding():
    # widths 1..5 sweep every 4-byte row-padding remainder
    rng = np.random.default_rng(6)
    for w in range(1, 6):
        img = rng.integers(0, 256, size=(7, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_compression_raises():
    blob = bytearray(encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    blob[30:34] = (1).to_bytes(4, "little")  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(blob))


def test_bmp_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + b"\x00" * 60)


# ------------------------------------------------------ registry glue


def test_pipeline_codecs_registered():
    from pyanamo_spark.multimodal.pipeline import CODECS, decode_image

    assert "image/gif" in CODECS and "image/bmp" in CODECS
    img = _palette_image(np.random.default_rng(0), 9, 9, 4)
    assert (decode_image(encode_gif(img), "image/gif") == img).all()
    assert (decode_image(encode_bmp(img), "image/bmp") == img).all()
