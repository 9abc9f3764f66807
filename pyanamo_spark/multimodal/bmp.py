"""Pure-Python BMP codec: uncompressed BI_RGB DIBs in a file wrapper.

BMP is the trivial member of the corpus-image family — the same DIB
pixel grid ``avi.py`` already parses inside uncompressed AVI frames,
prefixed by BITMAPFILEHEADER + BITMAPINFOHEADER. Kept as its own
module because standalone .bmp files add what container frames lack:
the file header's pixel-data offset, 8-bit palette (BGRX quads),
32-bit BGRA, and top-down rows via negative biHeight.

Supported: 8-bit palette, 24-bit BGR, 32-bit BGRA, bottom-up and
top-down, BI_RGB only (RLE4/RLE8 compression raises — vanishingly
rare in real corpora). Decode returns (H, W, 3) uint8 (alpha dropped
from 32-bit like most consumers); the encoder exists for fixtures and
round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, width, height_raw = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size}")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression}: only BI_RGB has a "
            f"pure-Python route (RLE4/RLE8 are vanishingly rare)"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp}: expected 8/24/32")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    stride = (width * bpp // 8 + 3) // 4 * 4
    grid = np.frombuffer(
        payload[data_off : data_off + stride * height], dtype=np.uint8
    ).reshape(height, stride)
    if not top_down:
        grid = grid[::-1]
    if bpp == 8:
        # palette: BGRX quads right after the info header
        (n_colors,) = struct.unpack("<I", payload[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        quads = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(n_colors, 4)
        palette = quads[:, 2::-1]  # BGRX -> RGB
        return np.ascontiguousarray(palette[grid[:, :width]])
    px = grid[:, : width * (bpp // 8)].reshape(height, width, bpp // 8)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB


def encode_bmp(
    img: np.ndarray, bpp: int = 24, top_down: bool = False
) -> bytes:
    """uint8 (H, W, 3) or (H, W) → BMP bytes (8-bit gray-palette,
    24-bit BGR, or 32-bit BGRA with opaque alpha)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    palette = b""
    if bpp == 8:
        if a.ndim == 3:  # collapse to luma for the gray palette
            a = a.mean(axis=2).astype(np.uint8)
        h, w = a.shape
        palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
        rows = a
    elif bpp in (24, 32):
        if a.ndim == 2:
            a = np.repeat(a[..., None], 3, axis=-1)
        h, w, _ = a.shape
        bgr = a[:, :, ::-1]
        if bpp == 32:
            rows = np.concatenate(
                [bgr, np.full((h, w, 1), 255, np.uint8)], axis=2
            ).reshape(h, w * 4)
        else:
            rows = bgr.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported encode depth {bpp}")
    stride = (w * bpp // 8 + 3) // 4 * 4
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * bpp // 8] = rows.reshape(h, -1)
    if not top_down:
        padded = padded[::-1]
    data_off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,
        stride * h,
        2835,
        2835,
        256 if bpp == 8 else 0,
        0,
    )
    body = info + palette + padded.tobytes()
    head = b"BM" + struct.pack("<IHHI", 14 + len(body), 0, 0, data_off)
    return head + body
