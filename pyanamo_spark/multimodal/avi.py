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
JPEG) and uncompressed DIB (bottom-up BGR rows, 4-byte aligned — the
BI_RGB form). Inter-frame codecs (H.264…) remain a documented
``NotImplementedError``; YUV4MPEG2 streams live in ``y4m.py``.
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
    }

    def walk(start: int, end: int) -> None:
        for fourcc, off, size in _chunks(payload, start, end):
            if fourcc == b"LIST":
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
                if payload[off : off + 4] == b"vids":
                    meta["codec"] = payload[off + 4 : off + 8].decode(
                        "ascii", "replace"
                    )
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append((off, size))

    walk(12, len(payload))
    if meta["codec"] is None or meta["width"] is None:
        raise ValueError("AVI missing stream/main headers")
    return meta


def decode_avi(payload: bytes, every: int = 1, max_frames: int | None = None) -> np.ndarray:
    """MJPEG-AVI bytes → uint8 ndarray (T, H, W, C).

    ``every`` samples every k-th frame; skipped frames are never
    JPEG-decoded (their byte ranges come from the container index).
    """
    meta = probe_avi(payload)
    codec = meta["codec"].strip("\x00 ").upper()
    picks = meta["frames"][::every]
    if max_frames is not None:
        picks = picks[:max_frames]
    if codec in ("MJPG", "MJPA"):
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
            f"AVI codec {meta['codec']!r}: only MJPEG and uncompressed "
            f"DIB have pure-Python routes; register an external decoder "
            f"in CODECS for others"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    stack = np.stack(frames)
    if stack.ndim == 3:  # grayscale frames -> add channel axis
        stack = stack[..., None]
    return stack


def encode_avi(
    frames: np.ndarray, fps: int = 10, quality: int = 90,
    codec: str = "MJPG",
) -> bytes:
    """uint8 ndarray (T,H,W,3) or (T,H,W) → AVI bytes
    (``codec="MJPG"`` per-frame JPEG, ``codec="DIB"`` uncompressed
    bottom-up BGR)."""
    a = np.ascontiguousarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        t, h, w = a.shape
    elif a.ndim == 4 and a.shape[3] == 3:
        t, h, w, _ = a.shape
    else:
        raise ValueError(f"unsupported frame array shape {a.shape}")
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
    fourcc = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, t,
                      max_bytes, 0xFFFFFFFF & (2**32 - 1), 0,
                      0, 0, w, h)
    )
    # BITMAPINFOHEADER; biCompression = 'MJPG' or 0 (BI_RGB)
    compression = b"MJPG" if codec == "MJPG" else b"\x00\x00\x00\x00"
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, compression, w * h * 3, 0, 0, 0, 0
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
