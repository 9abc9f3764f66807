"""Pure-stdlib WAV codec: RIFF/PCM encode + decode with ``wave`` and
numpy — no optional audio library needed, mirroring multimodal/png.py's
role for images. Registered as the ``audio/wav`` fallback codec so the
audio decode→featurize path runs for real in this container (soundfile,
when present, wins via ``setdefault``).

Sample convention matches soundfile's: decode returns float64 in
[-1, 1] (int16 PCM divided by 32768), mono as shape (n,), multichannel
as (n, ch); encode accepts float in [-1, 1] (scaled by 32767) or
integer samples taken as int16 verbatim.

Reference parity: the reference ships binary artifacts through its
task pipe as opaque files (`/root/reference/code/executor.py` stages
S3 objects for the subprocess); decoding them into typed arrays is the
north-star multimodal extension SURVEY.md §2.10 X5 directs.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode samples to 16-bit PCM WAV bytes.

    Float input is clipped to [-1, 1] and scaled by 32767; integer
    input is written as int16 verbatim. Shape (n,) is mono, (n, ch)
    interleaves ch channels."""
    arr = np.asarray(samples)
    if arr.dtype.kind == "f":
        arr = np.round(np.clip(arr, -1.0, 1.0) * 32767.0)
    arr = arr.astype("<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())  # C-order == interleaved frames
    return buf.getvalue()


def wav_info(payload: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) from the WAV header only —
    no sample data is touched, so metadata pruning stays cheap."""
    with wave.open(io.BytesIO(payload)) as w:
        return w.getnchannels(), w.getframerate(), w.getnframes()


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode 8/16-bit PCM WAV bytes to float64 in [-1, 1].

    Mono returns shape (n,); multichannel (n, ch) — the same contract
    soundfile.read provides, so the two codecs are interchangeable in
    ``CODECS['audio/wav']``."""
    with wave.open(io.BytesIO(payload)) as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        data = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM WAV")
    return data.reshape(-1, nch) if nch > 1 else data
