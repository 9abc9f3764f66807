"""Pure-Python AIFF codec: IFF chunks + big-endian PCM + the 80-bit
extended-float sample rate (Apple's interchange format — the other
uncompressed audio container a corpus contains besides RIFF WAV).

Supported: AIFF and AIFC with 'NONE' compression, 8/16/24/32-bit PCM
(AIFF 8-bit is signed, unlike WAV), mono/multichannel. Compressed
AIFC variants raise; G.711-companded audio in the wild almost always
arrives as WAV (``wav.py`` handles tags 6/7).

Decode matches ``wav.py``'s contract — float64 in [-1, 1], mono (n,),
multichannel (n, ch) — so the two modules are interchangeable behind
``CODECS``. The stdlib ``aifc`` module was removed in Python 3.13, so
the chunk walk and the 80-bit float conversion are implemented here.
"""

from __future__ import annotations

import math
import struct

import numpy as np


def _read_extended(b: bytes) -> float:
    """IEEE 754 80-bit extended (big-endian) → float."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    val = mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)
    return -val if se >> 15 else val


def _write_extended(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    m, e = math.frexp(abs(x))  # |x| = m * 2**e, m in [0.5, 1)
    return struct.pack(">HQ", sign | (e - 1 + 16383), int(m * 2.0**64))


def _chunks(payload: bytes):
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF: bad FORM signature")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def aiff_info(payload: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) from COMM only."""
    for cid, body in _chunks(payload):
        if cid == b"COMM":
            nch, nframes, _bits = struct.unpack(">hIh", body[:8])
            return nch, int(round(_read_extended(body[8:18]))), nframes
    raise ValueError("not an AIFF: missing COMM chunk")


def decode_aiff(payload: bytes) -> np.ndarray:
    """AIFF bytes → float64 in [-1, 1]; mono (n,), multichannel (n, ch)."""
    is_aifc = payload[8:12] == b"AIFC"
    comm = ssnd = None
    for cid, body in _chunks(payload):
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or ssnd is None:
        raise ValueError("not an AIFF: missing COMM/SSND chunk")
    nch, nframes, bits = struct.unpack(">hIh", comm[:8])
    if is_aifc and len(comm) >= 22:
        ctype = comm[18:22]
        if ctype not in (b"NONE", b"\x00\x00\x00\x00"):
            raise NotImplementedError(
                f"AIFC compression {ctype!r}: only 'NONE' has a "
                f"pure-Python route here"
            )
    offset, _blocksize = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + offset : 8 + offset + nframes * nch * (bits // 8)]
    if bits == 16:
        data = np.frombuffer(raw, ">i2").astype(np.float64) / 32768.0
    elif bits == 8:  # AIFF 8-bit is SIGNED (WAV's is unsigned)
        data = np.frombuffer(raw, "i1").astype(np.float64) / 128.0
    elif bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]  # big-endian
        v -= (v & 0x800000) << 1
        data = v.astype(np.float64) / 8388608.0
    elif bits == 32:
        data = np.frombuffer(raw, ">i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM AIFF")
    return data.reshape(-1, nch) if nch > 1 else data


def encode_aiff(
    samples: np.ndarray, rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode float [-1, 1] (or int16 verbatim) samples to AIFF bytes."""
    arr = np.asarray(samples)
    if arr.dtype.kind == "f":
        f = np.clip(arr, -1.0, 1.0)
    else:
        f = arr.astype(np.float64) / 32768.0
    if f.ndim == 1:
        f = f[:, None]
    nframes, nch = f.shape
    if bits == 16:
        body = np.round(f * 32767.0).astype(">i2").tobytes()
    elif bits == 8:
        body = np.round(f * 127.0).astype("i1").tobytes()
    elif bits == 24:
        v = np.round(f * 8388607.0).astype(np.int32).ravel()
        out = np.empty((v.size, 3), np.uint8)
        out[:, 0] = (v >> 16) & 0xFF
        out[:, 1] = (v >> 8) & 0xFF
        out[:, 2] = v & 0xFF
        body = out.tobytes()
    elif bits == 32:
        body = np.round(f * 2147483647.0).astype(">i4").tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    comm = struct.pack(">hIh", nch, nframes, bits) + _write_extended(
        float(rate)
    )
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return (
        b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks
    )
