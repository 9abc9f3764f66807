"""TIFF codec: exact round-trips over compression × predictor ×
strip-size, plus hand-built fixtures for the decode-only paths
(big-endian 'MM', palette, WhiteIsZero)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyanamo_spark.multimodal.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _gray(h=23, w=31, seed=1):
    return (
        np.random.default_rng(seed).integers(0, 256, size=(h, w)).astype(np.uint8)
    )


def _rgb(h=19, w=27, seed=2):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, size=(h, w, 3))
        .astype(np.uint8)
    )


# --------------------------------------------------------- primitives


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=600))
def test_tiff_lzw_roundtrip(data):
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data


def test_tiff_lzw_early_change_and_cap():
    # random bytes force width transitions at 510/1022/2046 and the
    # 12-bit table reset
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=30_000).astype(np.uint8).tobytes()
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=400))
def test_packbits_roundtrip(data):
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_packbits_compresses_runs():
    row = b"\x07" * 120 + b"\x01\x02\x03"
    enc = _packbits_encode(row)
    assert len(enc) < 12
    assert _packbits_decode(enc, len(row)) == row


# --------------------------------------------------------- roundtrips


@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("predictor", [False, True])
@pytest.mark.parametrize("rows_per_strip", [None, 7])
def test_tiff_roundtrip_exact(compression, predictor, rows_per_strip):
    for img in (_gray(), _rgb()):
        blob = encode_tiff(
            img,
            compression=compression,
            predictor=predictor,
            rows_per_strip=rows_per_strip,
        )
        out = decode_tiff(blob)
        assert out.shape == img.shape and (out == img).all()


def test_lzw_predictor_compresses_gradients():
    yy, xx = np.mgrid[0:40, 0:50]
    grad = (yy * 3 + xx).astype(np.uint8)
    none = len(encode_tiff(grad, compression="none"))
    lzw = len(encode_tiff(grad, compression="lzw", predictor=True))
    assert lzw < none / 3


# ----------------------------------------------- hand-built fixtures


def _build_tiff(bo, entries, pixel_data, extra=b""):
    """Minimal single-IFD TIFF with inline tag values."""
    out = bytearray((b"II" if bo == "<" else b"MM"))
    out += struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, val in entries:
        fmt = {3: "H", 4: "I"}[typ]
        vals = val if isinstance(val, list) else [val]
        vb = b"".join(struct.pack(bo + fmt, v) for v in vals)
        out += struct.pack(bo + "HHI", tag, typ, cnt) + vb.ljust(4, b"\x00")
    out += struct.pack(bo + "I", 0)
    assert len(out) == data_off
    out += extra + pixel_data
    return bytes(out)


def test_big_endian_decode():
    img = _gray(5, 6, seed=9)
    data_off = 8 + 2 + 12 * 6 + 4
    blob = _build_tiff(
        ">",
        [
            (256, 3, 1, 6),
            (257, 3, 1, 5),
            (259, 3, 1, 1),
            (262, 3, 1, 1),
            (273, 4, 1, data_off),
            (279, 4, 1, 30),
        ],
        img.tobytes(),
    )
    assert (decode_tiff(blob) == img).all()


def test_white_is_zero_inverts():
    img = _gray(4, 4, seed=10)
    data_off = 8 + 2 + 12 * 6 + 4
    blob = _build_tiff(
        "<",
        [
            (256, 3, 1, 4),
            (257, 3, 1, 4),
            (259, 3, 1, 1),
            (262, 3, 1, 0),  # WhiteIsZero
            (273, 4, 1, data_off),
            (279, 4, 1, 16),
        ],
        img.tobytes(),
    )
    assert (decode_tiff(blob) == 255 - img).all()


def test_palette_decode():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    # ColorMap: 16-bit per channel, all reds then greens then blues
    pal8 = np.array(
        [[10, 20, 30], [40, 50, 60], [70, 80, 90], [200, 210, 220]],
        dtype=np.uint8,
    )
    cmap16 = (pal8.T.astype(np.uint32) * 257).ravel().tolist()
    n_entries = 7
    hdr_end = 8 + 2 + 12 * n_entries + 4
    cmap_off = hdr_end
    data_off = cmap_off + 2 * len(cmap16)
    cmap_bytes = b"".join(struct.pack("<H", v) for v in cmap16)
    blob = _build_tiff(
        "<",
        [
            (256, 3, 1, 2),
            (257, 3, 1, 2),
            (259, 3, 1, 1),
            (262, 3, 1, 3),  # palette
            (273, 4, 1, data_off),
            (279, 4, 1, 4),
            (320, 3, len(cmap16), cmap_off),
        ],
        idx.tobytes(),
        extra=cmap_bytes,
    )
    out = decode_tiff(blob)
    assert out.shape == (2, 2, 3)
    assert (out == pal8[idx]).all()


# ---------------------------------------------------------- guards


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + b"\x00" * 40)


def test_unsupported_compression_raises():
    img = _gray(4, 4)
    blob = bytearray(encode_tiff(img))
    # tag 259 value: find and set to 4 (CCITT G.4)
    n = struct.unpack("<H", blob[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", blob[off : off + 2])[0] == 259:
            blob[off + 8 : off + 10] = struct.pack("<H", 4)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(blob))


def test_pipeline_tiff_registered():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "image/tiff" in CODECS
    img = _rgb(9, 9, seed=4)
    assert (
        CODECS["image/tiff"](encode_tiff(img, compression="lzw")) == img
    ).all()
