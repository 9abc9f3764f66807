"""Pure-Python MJPEG-AVI video codec: RIFF container + per-frame JPEG.

Video was the last multimodal stub. Full inter-frame codecs (H.264…)
have no pure-Python route, but Motion-JPEG — every frame an
independent baseline JPEG inside a RIFF/AVI container — needs exactly
two things this package already has: a chunk parser (the PNG/WAV
modules' style) and the baseline JPEG codec (``multimodal/jpeg.py``).
That makes one real, end-to-end video decode path: container parse →
frame extraction → JPEG decode → ndarray (T, H, W, C), with frame
SAMPLING (every k-th frame) done at the container level so a sampler
never decodes the frames it skips — the property that matters when a
100 TB corpus holds hour-long clips and the pipeline wants 1 frame
per second.

The encoder exists for fixture generation and round-trip tests
(mirroring png.py/wav.py/jpeg.py): minimal-but-standard AVI
(avih + strl 'vids' + movi '00dc' chunks + idx1).

Supported frame codecs: MJPEG (baseline or progressive per-frame
JPEG), uncompressed DIB (bottom-up BGR rows, 4-byte aligned — the
BI_RGB form), and — the INTER-FRAME path (r09) — Microsoft RLE8
(``MRLE``/BI_RLE8, the documented Windows AVI delta codec): frames
carry run/absolute pixel ops plus END-OF-LINE / END-OF-BITMAP /
DELTA-SKIP escapes, and every pixel the ops don't touch RETAINS the
previous frame's value — a real temporal-prediction chain, so frame
sampling still walks every frame's ops to keep the framebuffer
coherent and only materializes the selected ones (the intra-frame
codecs skip un-sampled frames entirely). Modern motion-compensated
codecs (H.264…) remain a documented ``NotImplementedError``;
YUV4MPEG2 streams live in ``y4m.py``.
"""

from __future__ import annotations

import struct

import numpy as np

from pyanamo_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) within [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def probe_avi(payload: bytes) -> dict:
    """Container metadata + frame byte-ranges WITHOUT decoding frames.

    Returns {width, height, n_frames, usec_per_frame, codec,
    frames: [(offset, size), ...]}. This is the cheap pass a sampler
    runs on every asset; pixel decode happens only for selected
    frames.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    meta = {
        "width": None, "height": None, "n_frames": None,
        "usec_per_frame": None, "codec": None, "frames": [],
        "palette": None,
    }

    cur_stream = [b""]  # fccType of the most recent strh in this strl

    def walk(start: int, end: int) -> None:
        for fourcc, off, size in _chunks(payload, start, end):
            if fourcc == b"LIST":
                if payload[off : off + 4] == b"strl":
                    # each stream list re-establishes its type: a strl
                    # missing its strh must NOT inherit the previous
                    # stream's 'vids' and get its strf palette-parsed
                    cur_stream[0] = b""
                walk(off + 4, off + size)  # skip the list-type fourcc
            elif fourcc == b"avih":
                usec, _rate, _pad, _flags, total = struct.unpack(
                    "<IIIII", payload[off : off + 20]
                )
                w, h = struct.unpack("<II", payload[off + 32 : off + 40])
                meta.update(
                    usec_per_frame=usec, n_frames=total, width=w, height=h
                )
            elif fourcc == b"strh":
                cur_stream[0] = payload[off : off + 4]
                if cur_stream[0] == b"vids":
                    meta["codec"] = payload[off + 4 : off + 8].decode(
                        "ascii", "replace"
                    )
            elif fourcc == b"strf" and size >= 40:
                # only the VIDEO stream's strf is a BITMAPINFOHEADER —
                # an audio strf (WAVEFORMATEX...) parsed as one reads
                # garbage bpp/biClrUsed and clobbers/crashes the palette
                if cur_stream[0] != b"vids":
                    continue
                # palettized streams (RLE8) append biClrUsed (or 2^bpp)
                # RGBQUADs after the 40 header bytes
                bpp, = struct.unpack("<H", payload[off + 14 : off + 16])
                used, = struct.unpack("<I", payload[off + 32 : off + 36])
                if bpp == 8:
                    n = min(used or 256, 256)
                    raw = payload[off + 40 : off + 40 + 4 * n]
                    quads = np.frombuffer(
                        raw[: len(raw) - len(raw) % 4], dtype=np.uint8
                    ).reshape(-1, 4)
                    meta["palette"] = quads[:, 2::-1].copy()  # BGR0→RGB
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append((off, size))

    walk(12, len(payload))
    if meta["codec"] is None or meta["width"] is None:
        raise ValueError("AVI missing stream/main headers")
    return meta


def _apply_rle8(data: bytes, buf: np.ndarray) -> None:
    """Apply one BI_RLE8 frame's ops onto the retained index
    framebuffer (rows bottom-up, matching the BMP coordinate system).
    Escapes: 00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy
    delta-skip (the inter-frame mechanism — skipped pixels keep the
    previous frame's values), 00 n(≥3) absolute run (word-padded)."""
    h, w = buf.shape
    pos, x, y = 0, 0, 0
    n = len(data)
    while pos + 2 <= n:
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded run: b0 copies of palette index b1
            end = min(x + b0, w)
            if y < h:
                buf[y, x:end] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
        elif b1 == 1:  # end of bitmap
            return
        elif b1 == 2:  # delta: skip right dx, up dy
            if pos + 2 > n:
                raise ValueError("RLE8 delta escape truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: b1 literal pixels, padded to word
            if pos + b1 > n:
                raise ValueError("RLE8 absolute run truncated")
            end = min(x + b1, w)
            if y < h:
                buf[y, x:end] = np.frombuffer(
                    data[pos : pos + (end - x)], dtype=np.uint8
                )
            x += b1
            pos += b1 + (b1 & 1)
    raise ValueError("RLE8 frame ended without an end-of-bitmap escape")


def decode_avi(payload: bytes, every: int = 1, max_frames: int | None = None) -> np.ndarray:
    """AVI bytes → uint8 ndarray (T, H, W, C).

    ``every`` samples every k-th frame. For the intra-frame codecs
    (MJPEG/DIB) skipped frames are never decoded — their byte ranges
    come from the container index. The inter-frame codec (MRLE) must
    apply every frame's ops to keep the framebuffer chain coherent,
    but only the SELECTED frames are materialized through the palette
    into RGB output.
    """
    meta = probe_avi(payload)
    codec = meta["codec"].strip("\x00 ").upper()
    picks = meta["frames"][::every]
    if max_frames is not None:
        picks = picks[:max_frames]
    if codec in ("MRLE", "RLE8", "RLE "):
        if meta["palette"] is None:
            raise ValueError("RLE8 AVI stream carries no palette")
        w, h = meta["width"], meta["height"]
        pal = meta["palette"]
        wanted = {off for off, _ in picks}
        buf = np.zeros((h, w), dtype=np.uint8)
        frames = []
        for off, size in meta["frames"]:
            _apply_rle8(payload[off : off + size], buf)
            if off in wanted:
                frames.append(pal[buf[::-1]])  # bottom-up → top-down
                if len(frames) >= len(picks):
                    break  # no later frame is wanted — skip the tail
    elif codec in ("MJPG", "MJPA"):
        frames = [
            decode_jpeg(payload[off : off + size]) for off, size in picks
        ]
    elif codec in ("DIB", "RGB", ""):
        # uncompressed BI_RGB: bottom-up BGR rows, 4-byte-aligned
        w, h = meta["width"], meta["height"]
        stride = (w * 3 + 3) // 4 * 4
        frames = []
        for off, size in picks:
            if size < stride * h:
                raise ValueError("DIB frame chunk shorter than its grid")
            rows = np.frombuffer(
                payload[off : off + stride * h], dtype=np.uint8
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            frames.append(rows[::-1, :, ::-1])  # flip rows, BGR -> RGB
    else:
        raise NotImplementedError(
            f"AVI codec {meta['codec']!r}: MJPEG, uncompressed DIB and "
            f"RLE8 delta frames have pure-Python routes; register an "
            f"external decoder in CODECS for motion-compensated codecs "
            f"(H.264…)"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    stack = np.stack(frames)
    if stack.ndim == 3:  # grayscale frames -> add channel axis
        stack = stack[..., None]
    return stack


def _rle8_row(row: np.ndarray) -> bytearray:
    """One row's pixels as encoded runs (no trailing escape)."""
    out = bytearray()
    i, w = 0, len(row)
    while i < w:
        v = row[i]
        j = i + 1
        while j < w and j - i < 255 and row[j] == v:
            j += 1
        out += bytes((j - i, int(v)))
        i = j
    return out


def _encode_mrle_frame(
    idx: np.ndarray, prev: np.ndarray | None
) -> bytes:
    """One BI_RLE8 frame over bottom-up index rows: the keyframe
    (``prev is None``) encodes every row; delta frames emit DELTA-SKIP
    escapes over unchanged rows so their pixels are simply retained —
    the temporal prediction that makes mostly-static video cheap."""
    h, _w = idx.shape
    out = bytearray()
    pending_skip = 0  # rows to jump without touching pixels
    for y in range(h):
        if prev is not None and np.array_equal(idx[y], prev[y]):
            pending_skip += 1
            continue
        while pending_skip:
            d = min(pending_skip, 255)
            out += bytes((0, 2, 0, d))
            pending_skip -= d
        out += _rle8_row(idx[y])
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap (trailing skips implicit)
    return bytes(out)


def encode_avi(
    frames: np.ndarray, fps: int = 10, quality: int = 90,
    codec: str = "MJPG",
) -> bytes:
    """uint8 ndarray (T,H,W,3) or (T,H,W) → AVI bytes
    (``codec="MJPG"`` per-frame JPEG, ``codec="DIB"`` uncompressed
    bottom-up BGR, ``codec="MRLE"`` palettized RLE8 with frame 0 as
    the keyframe and row-skip delta frames after — needs ≤256
    distinct colors across the clip, which synthetic/screen content
    satisfies; quantize first otherwise)."""
    a = np.ascontiguousarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        t, h, w = a.shape
    elif a.ndim == 4 and a.shape[3] == 3:
        t, h, w, _ = a.shape
    else:
        raise ValueError(f"unsupported frame array shape {a.shape}")
    palette = b""
    if codec == "MJPG":
        jpegs = [encode_jpeg(a[i], quality=quality) for i in range(t)]
    elif codec == "DIB":
        if a.ndim == 3:
            a = np.repeat(a[..., None], 3, axis=-1)
        stride = (w * 3 + 3) // 4 * 4
        jpegs = []
        for i in range(t):
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = a[i, ::-1, :, ::-1].reshape(h, w * 3)
            jpegs.append(rows.tobytes())
    elif codec == "MRLE":
        rgb = a[..., None].repeat(3, -1) if a.ndim == 3 else a
        flat = rgb.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"MRLE needs ≤256 distinct colors, clip has "
                f"{len(colors)}; quantize before encoding"
            )
        idx_frames = inverse.astype(np.uint8).reshape(t, h, w)[
            :, ::-1, :
        ]  # bottom-up rows, BMP order
        jpegs = []
        prev = None
        for i in range(t):
            jpegs.append(_encode_mrle_frame(idx_frames[i], prev))
            prev = idx_frames[i]
        quads = np.zeros((len(colors), 4), dtype=np.uint8)
        quads[:, :3] = colors[:, ::-1]  # RGB → BGR0
        palette = quads.tobytes()
    else:
        raise ValueError(f"unsupported encode codec {codec!r}")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, max_bytes * fps, 0, 0x10, t, 0, 1, max_bytes, w, h,
        0, 0, 0, 0,
    )
    fourcc = {"MJPG": b"MJPG", "DIB": b"DIB ", "MRLE": b"MRLE"}[codec]
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, t,
                      max_bytes, 0xFFFFFFFF & (2**32 - 1), 0,
                      0, 0, w, h)
    )
    # BITMAPINFOHEADER; biCompression = 'MJPG', 1 (BI_RLE8) or 0
    # (BI_RGB); RLE8 streams append their RGBQUAD palette
    if codec == "MRLE":
        compression, bitcount, clr_used = b"\x01\x00\x00\x00", 8, len(palette) // 4
    elif codec == "MJPG":
        compression, bitcount, clr_used = b"MJPG", 24, 0
    else:
        compression, bitcount, clr_used = b"\x00\x00\x00\x00", 24, 0
    strf = (
        struct.pack(
            "<IiiHH4sIiiII", 40, w, h, 1, bitcount, compression,
            w * h * 3, 0, 0, clr_used, 0,
        )
        + palette
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list-type)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
