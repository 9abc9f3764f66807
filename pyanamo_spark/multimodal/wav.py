"""Pure-Python WAV codec: RIFF parsing + numpy, no optional library —
mirroring multimodal/png.py's role for images. Registered as the
``audio/wav`` fallback codec so the audio decode→featurize path runs
for real in this container (soundfile, when present, wins via
``setdefault``).

Supported WAVE format tags: 1 (PCM, 8/16/24/32-bit), 3 (IEEE float32/
float64), 6 (G.711 A-law) and 7 (G.711 μ-law) via ``g711.py``, plus
WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappers of any of those — the format
spread an audio corpus actually contains, short of lossy codecs.

Sample convention matches soundfile's: decode returns float64 in
[-1, 1] (int16 PCM divided by 32768), mono as shape (n,), multichannel
as (n, ch); encode accepts float in [-1, 1] or integer samples taken
as int16 verbatim, and can emit any supported encoding for fixtures.

Reference parity: the reference ships binary artifacts through its
task pipe as opaque files (`/root/reference/code/executor.py` stages
S3 objects for the subprocess); decoding them into typed arrays is the
north-star multimodal extension SURVEY.md §2.10 X5 directs.
"""

from __future__ import annotations

import struct

import numpy as np

from pyanamo_spark.multimodal import g711

_TAG_PCM = 1
_TAG_FLOAT = 3
_TAG_ALAW = 6
_TAG_ULAW = 7
_TAG_EXTENSIBLE = 0xFFFE

#: encoder name -> (format tag, bits per sample)
_ENCODINGS = {
    "pcm16": (_TAG_PCM, 16),
    "pcm24": (_TAG_PCM, 24),
    "pcm8": (_TAG_PCM, 8),
    "float32": (_TAG_FLOAT, 32),
    "ulaw": (_TAG_ULAW, 8),
    "alaw": (_TAG_ALAW, 8),
}


def _chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF signature")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """(format tag, n_channels, sample_rate, bits, data) with the
    EXTENSIBLE wrapper unwrapped to its sub-format tag."""
    fmt = data = None
    for cid, body in _chunks(payload):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    tag, nch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == _TAG_EXTENSIBLE:
        # cbSize(2) validBits(2) channelMask(4) SubFormat GUID whose
        # first two bytes are the real format tag
        (tag,) = struct.unpack("<H", fmt[24:26])
    return tag, nch, rate, bits, data


def wav_info(payload: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) from the header only —
    no sample data is touched, so metadata pruning stays cheap."""
    tag, nch, rate, bits, data = _parse(payload)
    bytes_per = 4 if (tag == _TAG_FLOAT and bits == 32) else max(bits // 8, 1)
    return nch, rate, len(data) // (bytes_per * nch)


def decode_wav(payload: bytes) -> np.ndarray:
    """WAV bytes → float64 in [-1, 1]; mono (n,), multichannel (n, ch)
    — the same contract soundfile.read provides, so the two codecs are
    interchangeable in ``CODECS['audio/wav']``."""
    tag, nch, _rate, bits, raw = _parse(payload)
    if tag == _TAG_PCM:
        if bits == 16:
            data = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit WAV is unsigned
            data = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v & 0x800000) << 1  # sign-extend bit 23
            data = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            data = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    elif tag == _TAG_FLOAT:
        kind = "<f4" if bits == 32 else "<f8"
        data = np.frombuffer(raw, kind).astype(np.float64)
    elif tag == _TAG_ULAW:
        data = g711.ulaw_to_linear(np.frombuffer(raw, np.uint8))
        data = data.astype(np.float64) / 32768.0
    elif tag == _TAG_ALAW:
        data = g711.alaw_to_linear(np.frombuffer(raw, np.uint8))
        data = data.astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"WAV format tag {tag}")
    return data.reshape(-1, nch) if nch > 1 else data


def encode_wav(
    samples: np.ndarray, rate: int = 8000, encoding: str = "pcm16"
) -> bytes:
    """Encode samples to WAV bytes in any supported encoding.

    Float input is taken in [-1, 1] (clipped); integer input is taken
    as int16 verbatim. Shape (n,) is mono, (n, ch) interleaves ch
    channels."""
    if encoding not in _ENCODINGS:
        raise ValueError(f"unknown encoding {encoding!r}")
    tag, bits = _ENCODINGS[encoding]
    arr = np.asarray(samples)
    if arr.dtype.kind == "f":
        f = np.clip(arr, -1.0, 1.0)
        i16 = np.round(f * 32767.0).astype(np.int16)
    else:
        i16 = arr.astype(np.int16)
        f = i16.astype(np.float64) / 32768.0
    if i16.ndim == 1:
        i16, f = i16[:, None], np.atleast_2d(f.T).T

    if encoding == "pcm16":
        body = i16.astype("<i2").tobytes()
    elif encoding == "pcm8":
        body = (i16.astype(np.int32) // 256 + 128).astype("u1").tobytes()
    elif encoding == "pcm24":
        v = (np.clip(f, -1.0, 1.0) * 8388607.0).round().astype(np.int32)
        flat = v.ravel()
        out = np.empty((flat.size, 3), np.uint8)
        out[:, 0] = flat & 0xFF
        out[:, 1] = (flat >> 8) & 0xFF
        out[:, 2] = (flat >> 16) & 0xFF
        body = out.tobytes()
    elif encoding == "float32":
        body = f.astype("<f4").tobytes()
    elif encoding == "ulaw":
        body = g711.linear_to_ulaw(i16.ravel()).tobytes()
    else:  # alaw
        body = g711.linear_to_alaw(i16.ravel()).tobytes()

    nch = i16.shape[1]
    bytes_per = bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, nch, rate, rate * nch * bytes_per, nch * bytes_per,
        bits,
    )
    riff = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
        + (b"\x00" if len(body) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
