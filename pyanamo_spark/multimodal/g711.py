"""G.711 companding (μ-law / A-law), vectorized in numpy.

The ITU-T G.711 logarithmic codecs are the telephony/voice-corpus
formats a speech pipeline hits right after PCM — 8-bit companded
samples expanding to 13/14-bit linear. Implemented from the public
spec's segment tables (the classic CCITT reference arithmetic), no
per-sample Python: encode/decode are whole-array numpy expressions
plus one 256-entry table lookup.

``wav.py`` dispatches WAVE format tags 6 (A-law) and 7 (μ-law) here;
AIFF-C compression types 'ulaw'/'alaw' would route the same way.
"""

from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
_ALAW_MAX = 0x7FFF

#: segment upper edges for the A-law 13-bit magnitude (post >>3)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def _ulaw_decode_table() -> np.ndarray:
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = ((u & 0x0F) << 3) + _ULAW_BIAS
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0))
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """μ-law bytes → int16 linear samples (14-bit magnitude)."""
    return _ULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """A-law bytes → int16 linear samples (13-bit magnitude)."""
    return _ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → μ-law bytes (CCITT segment arithmetic)."""
    s = np.asarray(samples, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), _ULAW_CLIP) + _ULAW_BIAS
    # exponent = position of the top set bit above bit 7 (0..7)
    exponent = np.clip(np.frexp(mag.astype(np.float64))[1] - 8, 0, 7)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → A-law bytes."""
    s = np.asarray(samples, dtype=np.int32) >> 3  # 16 -> 13 bit
    mask = np.where(s >= 0, 0xD5, 0x55)
    mag = np.where(s >= 0, s, -s - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag)
    shift = np.where(seg < 2, 1, seg)
    aval = np.where(
        seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F)
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)
