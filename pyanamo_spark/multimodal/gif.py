"""Pure-Python GIF codec (GIF87a/GIF89a): LZW + interlace + animation.

After JPEG and PNG, GIF is the image format a web-scale corpus hits
next — and it needs no external library: the format is an LSB-first
variable-width LZW bitstream over palette indices (the public spec,
GIF89a, 1990). This module gives ``multimodal/pipeline.py`` a real
``image/gif`` decode path alongside png/jpeg/wav/avi/y4m.

Supported: global and per-frame local color tables, the 4-pass row
interlace, GIF89a extension blocks (graphic control: transparency +
disposal, comment, application — e.g. NETSCAPE looping), and
multi-frame animations composited per the disposal semantics
(unspecified/keep, restore-to-background, restore-to-previous).
Animations return (T, H, W, 3); stills return (H, W, 3) like
``decode_png``. The encoder exists for fixture generation and
round-trip tests (still or animated, optional interlace, optional
transparency), so every decode branch is exercised without binary
blobs in the repo.

Reference parity: the reference decodes assets inside task scripts
(classify-ancestry-trace.r:21-29); here decode is an Arrow-batched
column stage (pipeline.py), and probe/frame-sampling never touch
pixel bytes for skipped frames — same design as ``avi.py``.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH

#: (row offset, row step) of the four GIF interlace passes
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first bitstream, variable 3..12-bit codes,
    clear/end control codes, KwKwK handling."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = bits = pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while bits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            if len(table) == 1 << width and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF: LZW ended short of the pixel grid")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode`; emits a leading clear code and
    resets the table at 4096 entries, matching the decoder's cap."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    current = b""
    for k in indices.astype(np.uint8).tobytes():
        nxt = current + bytes([k])
        if nxt in table:
            current = nxt
            continue
        emit(table[current], width)
        if next_code < _TABLE_CAP:
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
                # the decoder's table lags ours by one append (it only
                # learns an entry from the NEXT code), so width grows
                # one entry after our table passes 2^width
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        current = bytes([k])
    if current:
        emit(table[current], width)
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decode


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed data sub-blocks; returns (data, pos
    past the 0 terminator)."""
    chunks = []
    while True:
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + size])
        pos += size


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def probe_gif(payload: bytes) -> dict:
    """Header + block walk without LZW work: version, canvas size,
    frame byte ranges (descriptor offset, end) — the skip-decode path
    for frame sampling, same contract as ``probe_avi``."""
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF: bad signature")
    width, height, packed = struct.unpack("<HHB", payload[6:11])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames: list[tuple[int, int]] = []
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            start = pos
            pos += 2
            _, pos = _sub_blocks(payload, pos)
            del start
        elif block == 0x2C:  # image descriptor
            start = pos
            fpacked = payload[pos + 9]
            pos += 10
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW min code size
            _, pos = _sub_blocks(payload, pos)
            frames.append((start, pos))
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    return {
        "version": payload[3:6].decode("ascii"),
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_gif(payload: bytes, every: int = 1, max_frames: int | None = None):
    """GIF bytes → uint8 ndarray: (H, W, 3) for a still, (T, H, W, 3)
    for an animation. Frames composite per the GIF89a graphic-control
    semantics (transparent index skips, disposal keep / background /
    previous); ``every``/``max_frames`` subsample AFTER compositing —
    unlike MJPEG, GIF frames are deltas, so earlier frames must still
    be decoded to render later ones."""
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF: bad signature")
    width, height, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", payload[6:13]
    )
    # bounded-allocation guard: a corrupt header must not trigger a
    # multi-GB canvas allocation before the (inevitably failing)
    # parse; 2^26 px (~200 MB RGB) is this codec's supported ceiling
    if width * height > (1 << 26):
        raise ValueError(
            f"GIF: {width}x{height} exceeds the decoder's pixel bound"
        )
    pos = 13
    global_pal: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        canvas[:] = global_pal[bg_idx]
    background = canvas.copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos + 1]
            pos += 2
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = data[3] if gpacked & 0x01 else None
            # comment (0xFE) / application (0xFF, e.g. NETSCAPE loop)
            # blocks carry no pixels — consumed and ignored
        elif block == 0x2C:
            left, top, fw, fh, fpacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            pal = global_pal
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF: frame has no color table")
            min_code = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
            if fpacked & 0x40:
                idx = _deinterlace(idx)
            saved = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + fh, left : left + fw]
            if transparent is None:
                region[:] = pal[idx]
            else:
                opaque = idx != transparent
                region[opaque] = pal[idx][opaque]
            frames.append(canvas.copy())
            if disposal == 2:  # restore to background
                canvas[top : top + fh, left : left + fw] = background[
                    top : top + fh, left : left + fw
                ]
            elif disposal == 3 and saved is not None:
                canvas = saved
            disposal = 0
            transparent = None
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    if len(frames) == 1:
        return frames[0]
    picks = frames[::every]
    if max_frames is not None:
        picks = picks[:max_frames]
    return np.stack(picks)


# ------------------------------------------------------------- encode


def _build_palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (N,3), per-frame index grids (T,H,W)) from uint8 RGB
    frames; raises if the fixture uses more than 256 distinct colors."""
    flat = frames.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"encode_gif: {len(pal)} distinct colors (>256); quantize first"
        )
    return pal, inverse.reshape(frames.shape[:3]).astype(np.uint8)


def encode_gif(
    frames: np.ndarray,
    interlace: bool = False,
    delay_cs: int = 4,
    transparent_color: tuple[int, int, int] | None = None,
    disposal: int = 1,
) -> bytes:
    """uint8 (H, W, 3) / (H, W) / (T, H, W, 3) → GIF bytes.

    Stills emit a bare GIF87a-style stream (GIF89a header, no
    extensions) unless transparency is requested; animations emit one
    graphic-control extension per frame. ``transparent_color`` maps
    that RGB to the transparent index in every frame."""
    a = np.ascontiguousarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[..., None], 3, axis=-1)
    if a.ndim == 3:
        a = a[None]
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"unsupported frame array shape {frames.shape}")
    t, h, w, _ = a.shape
    pal, idx = _build_palette(a)
    trans_idx: int | None = None
    if transparent_color is not None:
        hit = np.nonzero((pal == np.array(transparent_color)).all(axis=1))[0]
        if len(hit):
            trans_idx = int(hit[0])
    pal_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((2 << (pal_bits - 1), 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_full.tobytes()
    min_code = max(2, pal_bits)
    for f in range(t):
        if t > 1 or trans_idx is not None:
            gpacked = (disposal & 0x07) << 2 | (
                0x01 if trans_idx is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, gpacked])
            out += struct.pack("<H", delay_cs)
            out += bytes([trans_idx or 0, 0])
        out += bytes([0x2C])
        out += struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
        )
        grid = idx[f]
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, step) for s, step in _INTERLACE_PASSES]
            )
            grid = grid[order]
        out += bytes([min_code])
        data = _lzw_encode(grid.ravel(), min_code)
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
