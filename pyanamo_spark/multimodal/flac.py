"""Pure-Python FLAC codec (decode-complete for the core spec).

FLAC is the audio format large speech corpora actually ship
(LibriSpeech, MLS, Common Voice exports), so the audio pipeline needs
a real decode path for it — and the format is tractable without any
library: an MSB-first bitstream of frames, each frame carrying one
subframe per channel (CONSTANT / VERBATIM / FIXED order 0-4 / LPC up
to order 32) whose residuals are Rice-coded in partitions, plus
inter-channel decorrelation (left/side, right/side, mid/side).

Decode supports: all subframe types, both residual methods (RICE /
RICE2) including the escape-to-raw-bits case, wasted bits, all four
channel assignments, every block-size/sample-rate/bps header code,
and UTF-8-coded frame numbers. Header CRC-8 and frame CRC-16 are
verified. 8/16/24-bit streams return the ``wav.py`` float contract.

The encoder exists for fixtures and round-trip tests; it emits
CONSTANT subframes for flat signals, VERBATIM, or FIXED order-2 with
Rice residuals (`mode=`), exercising the decoder's main branches with
bit-exact expectations. STREAMINFO carries the spec's MD5 of the
unencoded samples, which decode re-checks.

Scale note: this codec runs inside Arrow-batched ``mapInPandas``
stages (multimodal/pipeline.py) on whole payloads — per-asset Python,
never per-sample numpy round-trips in the hot loop beyond the Rice
reader, which is bounded by fixture sizes; a production deployment
registers a native decoder in ``CODECS`` and everything above the
codec layer is unchanged.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: FIXED-predictor coefficients by order (the spec's polynomial set)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "bytepos", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bytepos = bytepos
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self.bitpos
            take = min(n, avail)
            cur = self.data[self.bytepos]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_utf8_number(self) -> int:
        first = self.read(8)
        if first < 0x80:
            return first
        n_more = 0
        mask = 0x40
        while first & mask:
            n_more += 1
            mask >>= 1
        val = first & (mask - 1)
        for _ in range(n_more):
            val = (val << 6) | (self.read(8) & 0x3F)
        return val

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.bits -= 8
            self.out.append((self.acc >> self.bits) & 0xFF)
        self.acc &= (1 << self.bits) - 1

    def align(self) -> None:
        if self.bits:
            self.write(0, 8 - self.bits)

    def bytes(self) -> bytes:
        assert self.bits == 0
        return bytes(self.out)


# ------------------------------------------------------------- decode


def flac_info(payload: bytes) -> dict:
    """STREAMINFO fields without decoding frames."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC: bad signature")
    pos = 4
    while pos < len(payload):
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            r = _BitReader(body)
            r.read(16), r.read(16)  # min/max blocksize
            r.read(24), r.read(24)  # min/max framesize
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            return {
                "sample_rate": rate,
                "n_channels": nch,
                "bits_per_sample": bps,
                "n_frames": total,
                "md5": body[18:34],
                "frames_offset": pos + 4 + length if hdr & 0x80 else None,
            }
        pos += 4 + length
        if hdr & 0x80:
            break
    raise ValueError("not a FLAC: missing STREAMINFO")


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read(4)
    n_part = 1 << porder
    out: list[int] = []
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            if raw:
                out.extend(r.read_signed(raw) for _ in range(n))
            else:
                out.extend([0] * n)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        samples = [r.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        # the order-n FIXED predictor is polynomial differencing, so
        # reconstruction is its inverse: n successive integrations
        # (cumsums), the k-th seeded by the k-th forward difference of
        # the warmup at its own position (np.diff(warm, k)[0]) —
        # vectorized instead of a per-sample Python loop; the final
        # integration reproduces the warmup samples themselves
        seq = np.asarray(resid, dtype=np.int64)
        warm_arr = np.asarray(warm, dtype=np.int64)
        for k in range(order - 1, -1, -1):
            init = np.diff(warm_arr, k)[0]
            seq = np.cumsum(np.concatenate(([init], seq)))
        samples = seq
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = r.read_signed(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        samples = list(warm)
        for e in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((acc >> shift) + e)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    arr = np.array(samples, dtype=np.int64)
    return arr << wasted if wasted else arr


def decode_flac(payload: bytes, verify_md5: bool = True) -> np.ndarray:
    """FLAC bytes → float64 in [-1, 1]; mono (n,), multichannel
    (n, ch) — the shared audio-codec contract."""
    info = flac_info(payload)
    nch, bps = info["n_channels"], info["bits_per_sample"]
    total = info["n_frames"]
    # skip all metadata blocks
    pos = 4
    while True:
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        pos += 4 + length
        if hdr & 0x80:
            break
    r = _BitReader(payload, pos)
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while got < total:
        hdr_start = r.bytepos
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy (we accept both)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)  # reserved
        r.read_utf8_number()  # frame/sample number
        if bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            blocksize = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError(f"FLAC: reserved blocksize code {bs_code}")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample-rate code")
        fbps = _BPS.get(bps_code, bps)
        # CRC-8 covers the header bytes up to (not incl.) the crc byte
        r.align()
        if _crc8(payload[hdr_start : r.bytepos]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC: channel count changed mid-stream")
            subs = [_read_subframe(r, blocksize, fbps) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, blocksize, fbps)
            side = _read_subframe(r, blocksize, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(r, blocksize, fbps + 1)
            right = _read_subframe(r, blocksize, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side: mid=(L+R)>>1 (dropped LSB
            # rides in side's parity), side=L-R
            mid = _read_subframe(r, blocksize, fbps)
            side = _read_subframe(r, blocksize, fbps + 1)
            mid2 = (mid << 1) | (side & 1)
            subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        r.align()
        frame_end = r.bytepos
        crc = struct.unpack(">H", payload[frame_end : frame_end + 2])[0]
        if _crc16(payload[hdr_start:frame_end]) != crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        r = _BitReader(payload, frame_end + 2)
        for c in range(nch):
            chans[c].append(subs[c])
        got += blocksize
    data = np.stack([np.concatenate(c)[:total] for c in chans], axis=-1)
    if verify_md5 and info["md5"] != b"\x00" * 16:
        width = bps // 8
        le = data.astype("<i4")
        raw = bytearray()
        flat = le.ravel()  # interleaved
        b = flat.astype("<i4").tobytes()
        for i in range(0, len(b), 4):
            raw += b[i : i + width]
        if hashlib.md5(bytes(raw)).digest() != info["md5"]:
            raise ValueError("FLAC: decoded-audio MD5 mismatch")
    out = data.astype(np.float64) / float(1 << (bps - 1))
    return out[:, 0] if nch == 1 else out


# ------------------------------------------------------------- encode


def _write_residual_rice(
    w: _BitWriter,
    resid: np.ndarray,
    blocksize: int,
    order: int,
    porder: int = 0,
    rice2: bool = False,
) -> None:
    """RICE/RICE2 residual: ``porder`` partitions of 2^-porder of the
    block (first one short by the predictor order), mean-derived
    parameter per partition, escape-to-raw for incompressible ones."""
    plen = 5 if rice2 else 4
    escape = (1 << plen) - 1
    w.write(1 if rice2 else 0, 2)
    w.write(porder, 4)
    off = 0
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[off : off + n]
        off += n
        zz = (np.abs(part) << 1) - (part < 0).astype(np.int64)
        mean = max(float(zz.mean()) if zz.size else 0.0, 1.0)
        param = int(np.ceil(np.log2(mean + 1)))
        if param >= escape:  # incompressible: raw-bit escape
            raw = max(int(np.abs(part).max()).bit_length() + 1, 1)
            w.write(escape, plen)
            w.write(raw, 5)
            for v in part.tolist():
                w.write(int(v), raw)
            continue
        w.write(param, plen)
        for u in zz.tolist():
            q, rem = u >> param, u & ((1 << param) - 1)
            for _ in range(q):
                w.write(0, 1)
            w.write(1, 1)
            if param:
                w.write(rem, param)


def _lpc_analyze(
    sig: np.ndarray, order: int, precision: int = 12
) -> tuple[list[int], int] | None:
    """Levinson-Durbin over the block's autocorrelation, then quantize
    coefficients to ``precision`` bits with a power-of-two shift —
    decode reverses the integer predictor exactly, so losslessness
    never depends on how good the float coefficients are."""
    x = sig.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = np.array(
        [np.dot(x[: n - k], x[k:]) for k in range(order + 1)]
    )
    if ac[0] == 0:
        return None
    err = ac[0]
    a: list[float] = []
    for i in range(1, order + 1):
        acc = ac[i] - sum(a[j] * ac[i - 1 - j] for j in range(len(a)))
        if err == 0:
            return None
        k = acc / err
        a = [aj - k * ar for aj, ar in zip(a, reversed(a))] + [k]
        err *= 1 - k * k
    cmax = max(abs(c) for c in a)
    if cmax == 0:
        return None
    shift = min(precision - 1 - max(int(np.ceil(np.log2(cmax + 1e-9))), 0), 15)
    shift = max(shift, 1)
    lim = (1 << (precision - 1)) - 1
    q = [int(np.clip(round(c * (1 << shift)), -lim - 1, lim)) for c in a]
    if all(v == 0 for v in q):
        return None
    return q, shift


def _write_subframe(
    w: _BitWriter,
    sig: np.ndarray,
    bps: int,
    mode: str,
    blocksize: int,
    porder: int,
    rice2: bool,
    lpc_order: int,
) -> None:
    w.write(0, 1)  # padding
    n = len(sig)
    if np.all(sig == sig[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(sig[0]), bps)
        return
    # wasted bits: low zero bits common to every sample
    nz = sig[sig != 0]
    wasted = 0
    if nz.size:
        ors = int(np.bitwise_or.reduce(np.abs(nz)))
        wasted = (ors & -ors).bit_length() - 1
    if wasted:
        sig = sig >> wasted
        bps -= wasted
    if (n >> porder) << porder != n or (n >> porder) <= max(
        2, lpc_order
    ):
        porder = 0  # short tail frame: single partition
    if mode == "verbatim" or n <= max(2, lpc_order):
        w.write(1, 6)
        _write_wasted(w, wasted)
        for v in sig.tolist():
            w.write(int(v), bps)
        return
    if mode == "lpc":
        est = _lpc_analyze(sig, lpc_order)
        if est is not None:
            coefs, shift = est
            order = len(coefs)
            w.write(32 + order - 1, 6)
            _write_wasted(w, wasted)
            for v in sig[:order].tolist():
                w.write(int(v), bps)
            w.write(12 - 1, 4)  # precision 12
            w.write(shift, 5)
            for c in coefs:
                w.write(c, 12)
            hist = np.stack(
                [sig[order - 1 - i : n - 1 - i] for i in range(order)]
            )
            pred = (
                np.asarray(coefs, dtype=np.int64) @ hist
            ) >> shift
            resid = sig[order:] - pred
            _write_residual_rice(w, resid, n, order, porder, rice2)
            return
        mode = "fixed2"  # degenerate block: fall through
    # FIXED order 2
    w.write(8 + 2, 6)
    _write_wasted(w, wasted)
    w.write(int(sig[0]), bps)
    w.write(int(sig[1]), bps)
    resid = sig[2:] - (2 * sig[1:-1] - sig[:-2])
    _write_residual_rice(w, resid, n, 2, porder, rice2)


def _write_wasted(w: _BitWriter, wasted: int) -> None:
    if wasted == 0:
        w.write(0, 1)
        return
    w.write(1, 1)
    for _ in range(wasted - 1):
        w.write(0, 1)
    w.write(1, 1)


def encode_flac(
    samples: np.ndarray,
    rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    mode: str = "fixed2",
    channel_mode: str = "indep",
    porder: int = 0,
    rice2: bool = False,
    lpc_order: int = 8,
) -> bytes:
    """Float [-1, 1] (or integer verbatim) samples → FLAC bytes.

    ``mode``: 'verbatim' stores raw samples, 'fixed2' the order-2
    FIXED predictor, 'lpc' Levinson-Durbin LPC (quantized, order
    ``lpc_order``) — flat signals drop to CONSTANT subframes in every
    mode, and common low zero bits are stripped as wasted bits.
    ``channel_mode`` ('indep'/'left_side'/'right_side'/'mid_side')
    selects stereo decorrelation; ``porder`` partitions each residual;
    ``rice2`` uses 5-bit Rice parameters."""
    arr = np.asarray(samples)
    if arr.dtype.kind == "f":
        ints = np.round(
            np.clip(arr, -1.0, 1.0) * ((1 << (bps - 1)) - 1)
        ).astype(np.int64)
    else:
        ints = arr.astype(np.int64)
    if ints.ndim == 1:
        ints = ints[:, None]
    total, nch = ints.shape

    width = bps // 8
    inter = ints.astype("<i4")
    raw = bytearray()
    b = inter.ravel().tobytes()
    for i in range(0, len(b), 4):
        raw += b[i : i + width]
    md5 = hashlib.md5(bytes(raw)).digest()

    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    if channel_mode != "indep" and nch != 2:
        raise ValueError(f"{channel_mode!r} needs exactly 2 channels")
    ch_code = {"indep": nch - 1, "left_side": 8, "right_side": 9,
               "mid_side": 10}[channel_mode]

    frame_no = 0
    for start in range(0, total, blocksize):
        chunk = ints[start : start + blocksize]
        n = chunk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit field follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_code, 4)
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        w.write(bps_code, 3)
        w.write(0, 1)
        # UTF-8 frame number (fixed-size blocking: frame index)
        fn = frame_no
        if fn < 0x80:
            w.write(fn, 8)
        else:  # 2-byte UTF-8 is enough for fixture sizes
            w.write(0xC0 | (fn >> 6), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        w.write(n - 1, 16)
        hdr = bytes(w.out) if w.bits == 0 else None
        assert hdr is not None, "frame header must be byte-aligned here"
        w.write(_crc8(hdr), 8)
        if channel_mode == "indep":
            signals = [(chunk[:, c], bps) for c in range(nch)]
        else:
            left, right = chunk[:, 0], chunk[:, 1]
            side = left - right
            if channel_mode == "left_side":
                signals = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                signals = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                signals = [((left + right) >> 1, bps), (side, bps + 1)]
        for sig, sbps in signals:
            _write_subframe(
                w, sig, sbps, mode, n, porder, rice2, lpc_order
            )
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", _crc16(body))
        frame_no += 1
    return bytes(out)
