"""Pure-Python PNG codec: stdlib ``zlib`` + numpy de-filtering.

The container ships no image libraries, but PNG needs none — the
format is zlib-compressed scanlines with five per-row predictors
(RFC 2083). This module gives the multimodal pipeline a REAL decode
path (``multimodal/pipeline.py`` registers it as ``image/png``) so
decode → resize → featurize runs end to end on actual pixels; the
``NotImplementedError`` stub remains only for formats with no
pure-Python route (JPEG's DCT entropy coding, audio codecs).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. 16-bit and Adam7 interlace
raise with a clear message — fixtures and the overwhelming majority
of real-world PNGs are 8-bit non-interlaced.

The encoder exists for fixture generation and round-trip tests; it
can force any filter type per row, which is what lets the tests
exercise every unfilter branch without binary blobs in the repo.

Reference parity: the reference's model-scoring ETL decodes assets
inside task scripts (/root/reference/code/use-cases/example_docker/
classify-ancestry-trace.r:21-29); here decode is a first-class,
Arrow-batched column operation instead of a subprocess.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline predictors. Filter 0/2 are vectorized
    (2 = Up only needs the finished previous row); 1/3/4 carry an
    in-row byte dependency and run as small loops — decode cost is
    irrelevant next to the zlib inflate for fixture-sized images."""
    rows = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.uint16)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray: (H, W) for grayscale, (H, W, C)
    otherwise. Palette images are expanded to RGB."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    width = height = None
    bitdepth = colortype = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bitdepth != 8:
        raise NotImplementedError(f"PNG bit depth {bitdepth} (only 8)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if colortype not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {colortype}")
    ch = _CHANNELS[colortype]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    img = _unfilter(raw, height, stride, ch)
    if colortype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        return palette[img.reshape(height, width)]
    if ch == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    c16 = cur.astype(np.int16)
    left = np.zeros_like(c16)
    left[bpp:] = c16[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        return cur
    if ftype == 1:
        return ((c16 - left) & 0xFF).astype(np.uint8)
    if ftype == 2:
        return ((c16 - up) & 0xFF).astype(np.uint8)
    if ftype == 3:
        return ((c16 - ((left + up) >> 1)) & 0xFF).astype(np.uint8)
    if ftype == 4:
        pred = np.array(
            [
                _paeth(int(a), int(b), int(c))
                for a, b, c in zip(left, up, upleft)
            ],
            dtype=np.int16,
        )
        return ((c16 - pred) & 0xFF).astype(np.uint8)
    raise ValueError(f"invalid PNG filter type {ftype}")


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 ndarray (H,W) / (H,W,3) / (H,W,4) → PNG bytes.

    ``filter_type`` forces one predictor on every scanline (a real
    encoder would pick per-row); exposing it lets tests drive each
    unfilter branch of :func:`decode_png`.
    """
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        colortype, ch = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        h, w, ch = a.shape
        colortype = 2 if ch == 3 else 6
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    flat = a.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        lines.extend(_filter_row(filter_type, flat[y], prev, ch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )
