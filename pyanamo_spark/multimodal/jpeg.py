"""Pure-Python baseline JPEG codec: Huffman entropy coding + numpy DCT.

The container ships no image libraries, but baseline sequential JPEG
(ITU-T T.81 SOF0) needs none: markers are trivially parseable, the
Huffman tables ride in the stream, and the 8×8 DCT is a pair of
matrix multiplies. This closes the last feasible codec stub in the
multimodal pipeline (``multimodal/pipeline.py`` registers it as
``image/jpeg``); a ``NotImplementedError`` stub now remains only for
video, which has no pure-Python route.

Supported: baseline sequential (SOF0) AND progressive (SOF2) — the two
formats that cover essentially every JPEG in a real crawl corpus —
8-bit, grayscale or YCbCr with sampling factors 1 or 2 per axis
(4:4:4, 4:2:2, 4:2:0), restart markers. Progressive handles the full
scan-script state machine: interleaved DC first/refinement scans with
point transform, per-component spectral-selection AC scans, AC
successive-approximation refinement with EOB runs and correction bits
(ITU-T T.81 §G). Arithmetic coding, 12-bit and hierarchical (SOF3+)
raise with a clear message.

The encoder exists for fixture generation and round-trip tests
(mirroring ``png.py``/``wav.py``): standard Annex K quantization +
Huffman tables with libjpeg's quality scaling, optional 4:2:0
subsampling so the decoder's upsampling branch is exercised without
binary blobs in the repo.

Reference parity: the reference's model-scoring ETL decodes assets
inside task scripts (/root/reference/code/use-cases/example_docker/
classify-ancestry-trace.r:21-29); here decode is a first-class,
Arrow-batched column operation instead of a subprocess.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# constants (all from the public JPEG standard, ITU-T T.81)

#: zigzag scan order: zigzag index -> natural (row-major) index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

#: Annex K.1 luminance / chrominance quantization tables (natural order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

#: Annex K.3 standard Huffman tables: (bits-per-length[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8×8 DCT-II basis A: forward = A @ B @ Aᵀ, inverse = Aᵀ @ C @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


def _build_codes(bits: list[int], values: list[int]) -> dict[int, list[tuple[int, int]]]:
    """Canonical Huffman: {length: [(code, symbol), ...]} ascending."""
    out: dict[int, list[tuple[int, int]]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.setdefault(length, []).append((code, values[k]))
            code += 1
            k += 1
        code <<= 1
    return out


class _Decoder:
    """Bit-level reader over the entropy-coded segment (0xFF00
    unstuffed, RSTn handled by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            # past the end: pad with 1s (T.81 allows trailing garbage)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        self.acc = (self.acc << 8) | self.data[self.pos]
        self.pos += 1
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[int, list[tuple[int, int]]]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            for c, sym in table.get(length, ()):
                if c == code:
                    return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """Magnitude-category decode (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0 or progressive SOF2) → uint8 ndarray:
    (H, W) grayscale or (H, W, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    store: dict[int, np.ndarray] | None = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) and progressive (SOF2)"
            )
        if marker in (0xC0, 0xC2):  # SOF0 / SOF2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                table = _build_codes(bits, values)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 0xF] = table
                else:
                    huff_ac[tc_th & 0xF] = table
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit quantization table")
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                )
                qt[pq_tq & 0xF] = q.reshape(8, 8)
                p += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    {**comp, "dc": tdta >> 4, "ac": tdta & 0xF}
                )
            data_start = pos + 2 + seglen
            if not frame["progressive"]:
                return _decode_scan(
                    payload, data_start, frame, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if store is None:
                store = _alloc_store(frame)
            pos = _decode_progressive_scan(
                payload, data_start, frame, scan, store, huff_dc,
                huff_ac, restart_interval, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += 2 + seglen
    if frame is not None and frame["progressive"] and store is not None:
        return _reconstruct_progressive(frame, store, qt)
    raise ValueError("JPEG has no SOS scan")


def _collect_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy segment from ``start``: 0xFF00 -> 0xFF,
    split on RSTn markers. Returns (segments, position of the next
    marker's 0xFF byte)."""
    segments: list[bytes] = []
    cur = bytearray()
    p = start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF and p + 1 < len(payload):
            nxt = payload[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _decode_scan(
    payload, start, frame, scan, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    segments, _ = _collect_entropy(payload, start)

    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in scan
    }
    pred = {c["id"]: 0 for c in scan}
    seg_idx = 0
    dec = _Decoder(segments[0])
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                dec = _Decoder(segments[seg_idx])
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.float64)
                        t = dec.read_symbol(huff_dc[c["dc"]])
                        diff = _extend(dec.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        coefs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = dec.read_symbol(huff_ac[c["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[_ZIGZAG[k]] = _extend(dec.read_bits(s), s)
                            k += 1
                        block = coefs.reshape(8, 8) * qt[c["tq"]]
                        pix = _A.T @ block @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1
    return _planes_to_image(scan, planes, hmax, vmax, h, w)


def _planes_to_image(comps, planes, hmax, vmax, h, w) -> np.ndarray:
    """Upsample subsampled planes to full resolution, crop, and color
    convert (shared by the baseline and progressive paths)."""
    full = []
    for c in comps:
        pl = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            pl = np.repeat(
                np.repeat(pl, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(pl[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# progressive (SOF2) decode: scans accumulate quantized coefficients
# per component; dequantize + IDCT run once at EOI (ITU-T T.81 §G)


def _mcu_grid(frame) -> tuple[int, int, int, int]:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _alloc_store(frame) -> dict[int, np.ndarray]:
    """Per-component coefficient store at the interleave-padded block
    grid (interleaved DC scans write dummy edge blocks; non-interleaved
    AC scans cover only the component's ceil-dimension blocks)."""
    _, _, mcus_x, mcus_y = _mcu_grid(frame)
    return {
        c["id"]: np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
        )
        for c in frame["comps"]
    }


def _comp_blocks(frame, c) -> tuple[int, int]:
    """Non-interleaved block dimensions: ceil(comp size / 8) on the
    component's own sampling grid (T.81 A.2.2)."""
    hmax, vmax, _, _ = _mcu_grid(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    payload, start, frame, scan, store, huff_dc, huff_ac,
    restart_interval, ss, se, ah, al,
) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the payload position of the marker following the entropy data."""
    segments, endpos = _collect_entropy(payload, start)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        _prog_dc_scan(
            segments, frame, scan, store, huff_dc, restart_interval, ah, al
        )
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _prog_ac_scan(
            segments, frame, scan[0], store, huff_ac, restart_interval,
            ss, se, ah, al,
        )
    return endpos


def _prog_dc_scan(
    segments, frame, scan, store, huff_dc, restart_interval, ah, al
):
    """DC scans run in interleaved MCU order (all scan components).
    First scan (Ah=0): DPCM of the point-transformed DC; refinement
    (Ah>0): one correction bit per block at bit position Al."""
    _, _, mcus_x, mcus_y = _mcu_grid(frame)
    if len(scan) == 1:
        # single-component scan: non-interleaved block raster
        c = scan[0]
        by, bx = _comp_blocks(frame, c)
        blocks = [(c, y, x) for y in range(by) for x in range(bx)]
    else:
        blocks = [
            (c, my * c["v"] + yy, mx * c["h"] + xx)
            for my in range(mcus_y)
            for mx in range(mcus_x)
            for c in scan
            for yy in range(c["v"])
            for xx in range(c["h"])
        ]
    per_unit = (
        sum(c["v"] * c["h"] for c in scan) if len(scan) > 1 else 1
    )
    dec = _Decoder(segments[0])
    seg_idx = 0
    pred = {c["id"]: 0 for c in scan}
    unit = 0
    for i, (c, y, x) in enumerate(blocks):
        if (
            restart_interval
            and unit
            and i % (per_unit * restart_interval) == 0
        ):
            seg_idx += 1
            dec = _Decoder(segments[seg_idx])
            pred = {c2["id"]: 0 for c2 in scan}
        unit = 1
        coefs = store[c["id"]][y, x]
        if ah == 0:
            t = dec.read_symbol(huff_dc[c["dc"]])
            diff = _extend(dec.read_bits(t), t) if t else 0
            pred[c["id"]] += diff
            coefs[0] = pred[c["id"]] << al
        else:
            if dec.read_bit():
                coefs[0] |= 1 << al


def _prog_ac_scan(
    segments, frame, c, store, huff_ac, restart_interval, ss, se, ah, al
):
    """AC scans are non-interleaved: block raster over the component's
    own grid. First scans (Ah=0) use EOB-run coding of the
    point-transformed band; refinement scans (Ah>0) add one magnitude
    bit per already-nonzero coefficient and introduce new ±1<<Al
    coefficients (T.81 G.1.2.3)."""
    by, bx = _comp_blocks(frame, c)
    table = huff_ac[c["ac"]]
    dec = _Decoder(segments[0])
    seg_idx = 0
    eobrun = 0
    n = 0
    for y in range(by):
        for x in range(bx):
            if restart_interval and n and n % restart_interval == 0:
                seg_idx += 1
                dec = _Decoder(segments[seg_idx])
                eobrun = 0
            n += 1
            coefs = store[c["id"]][y, x]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = dec.read_symbol(table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += dec.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    coefs[_ZIGZAG[k]] = _extend(dec.read_bits(s), s) << al
                    k += 1
            else:
                eobrun = _prog_ac_refine_block(
                    dec, table, coefs, ss, se, al, eobrun
                )


def _prog_ac_refine_block(dec, table, coefs, ss, se, al, eobrun) -> int:
    """One block of an AC successive-approximation refinement scan.
    Correction bits move already-nonzero coefficients one bit closer
    to their true magnitude; (run, 1) symbols place newly-nonzero
    ±1<<Al coefficients, with the run counting only zero-history
    positions."""
    one = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = dec.read_symbol(table)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += dec.read_bits(r)
                    break  # EOB: tail handled below
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement symbol with size != 1")
                newval = one if dec.read_bit() else -one
            while k <= se:
                z = _ZIGZAG[k]
                if coefs[z] != 0:
                    if dec.read_bit() and not (coefs[z] & one):
                        coefs[z] += one if coefs[z] > 0 else -one
                else:
                    if r == 0:
                        if newval:
                            coefs[z] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            z = _ZIGZAG[k]
            if coefs[z] != 0:
                if dec.read_bit() and not (coefs[z] & one):
                    coefs[z] += one if coefs[z] > 0 else -one
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, store, qt) -> np.ndarray:
    """Dequantize + IDCT every component's coefficient store (one
    vectorized einsum per component), then shared upsample/color."""
    hmax, vmax, _, _ = _mcu_grid(frame)
    planes = {}
    for c in frame["comps"]:
        # the store holds natural-order positions (written via _ZIGZAG
        # at decode time), so blocks reshape directly
        coefs = store[c["id"]].astype(np.float64)
        by, bx, _ = coefs.shape
        blocks = coefs.reshape(by, bx, 8, 8) * qt[c["tq"]]
        # per-block 2-D matmul, NOT a batched einsum/matmul: only the
        # exact kernel the baseline path uses (``_A.T @ block @ _A``)
        # makes half-point rounding fall identically, and the tests pin
        # progressive output bit-equal to baseline. Block count is
        # image-sized/64 — the loop is noise next to entropy decode.
        pix = np.empty((by, bx, 8, 8))
        for yy in range(by):
            for xx in range(bx):
                pix[yy, xx] = _A.T @ blocks[yy, xx] @ _A
        pix += 128.0
        planes[c["id"]] = (
            pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _planes_to_image(
        frame["comps"], planes, hmax, vmax, frame["h"], frame["w"]
    )


# ---------------------------------------------------------------------
# encoder (fixture generation + round-trip tests)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81
        return bytes(self.out)


def _encode_table(bits, values) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)} from canonical (bits, values)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _value_bits(v: int, n: int) -> int:
    return v if v >= 0 else v + (1 << n) - 1


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table (public formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).reshape(8, 8)


def _encode_blocks(
    plane: np.ndarray, q: np.ndarray, dc_tab, ac_tab, writer, pred: int
) -> int:
    """DCT/quantize/Huffman-write every 8×8 block of one padded plane
    (row-major), returning the updated DC predictor."""
    hh, ww = plane.shape
    for y0 in range(0, hh, 8):
        for x0 in range(0, ww, 8):
            block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coefs = _A @ block @ _A.T
            quant = np.rint(coefs / q).astype(np.int64)
            zz = quant.ravel()[_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            n = _category(diff)
            code, length = dc_tab[n]
            writer.write(code, length)
            if n:
                writer.write(_value_bits(diff, n), n)
            run = 0
            last_nz = max(np.nonzero(zz[1:])[0], default=-1) + 1
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                s = _category(v)
                code, length = ac_tab[(run << 4) | s]
                writer.write(code, length)
                writer.write(_value_bits(v, s), s)
                run = 0
            if last_nz < 63:
                code, length = ac_tab[0x00]  # EOB
                writer.write(code, length)
    return pred


def _pad_to(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    """Edge-replicate to multiples of (my, mx)."""
    h, w = plane.shape
    ph = -(-h // my) * my
    pw = -(-w // mx) * mx
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """uint8 ndarray (H,W) or (H,W,3) → baseline JPEG bytes.

    ``subsample=True`` writes 4:2:0 chroma (box-filtered), exercising
    the decoder's upsampling branch; grayscale input writes a
    single-component scan.
    """
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"unsupported array {a.dtype}/{a.ndim}d")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)
    dc0 = _encode_table(*_HUFF_DC_LUMA)
    ac0 = _encode_table(*_HUFF_AC_LUMA)
    dc1 = _encode_table(*_HUFF_DC_CHROMA)
    ac1 = _encode_table(*_HUFF_AC_CHROMA)

    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    hv = (2, 2) if (subsample and not gray) else (1, 1)
    mcu_h, mcu_w = 8 * hv[1], 8 * hv[0]

    writer = _BitWriter()
    if gray:
        pl = _pad_to(planes[0], 8, 8)
        _encode_blocks(pl, ql, dc0, ac0, writer, 0)
    else:
        ypl = _pad_to(planes[0], mcu_h, mcu_w)
        if subsample:
            cpls = []
            for p in planes[1:]:
                p = _pad_to(p, 2, 2)
                ds = (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
                cpls.append(_pad_to(ds, 8, 8))
        else:
            cpls = [_pad_to(p, 8, 8) for p in planes[1:]]
        preds = [0, 0, 0]
        mcus_y, mcus_x = ypl.shape[0] // mcu_h, ypl.shape[1] // mcu_w
        for my in range(mcus_y):
            for mx in range(mcus_x):
                # luma blocks of this MCU, raster order
                for by in range(hv[1]):
                    for bx in range(hv[0]):
                        y0 = my * mcu_h + by * 8
                        x0 = mx * mcu_w + bx * 8
                        preds[0] = _encode_blocks(
                            ypl[y0 : y0 + 8, x0 : x0 + 8],
                            ql, dc0, ac0, writer, preds[0],
                        )
                for ci, cp in enumerate(cpls):
                    y0, x0 = my * 8, mx * 8
                    preds[1 + ci] = _encode_blocks(
                        cp[y0 : y0 + 8, x0 : x0 + 8],
                        qc, dc1, ac1, writer, preds[1 + ci],
                    )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(q.ravel()[_ZIGZAG].astype(np.uint8)))

    def dht(tc: int, th: int, table) -> bytes:
        bits, values = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    ncomp = 1 if gray else 3
    sof_comps = b""
    sos_comps = b""
    for i in range(ncomp):
        comp_hv = (hv[0] << 4) | hv[1] if i == 0 else 0x11
        sof_comps += bytes([i + 1, comp_hv, 0 if i == 0 else 1])
        sos_comps += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += dht(0, 0, _HUFF_DC_LUMA)
    out += dht(1, 0, _HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, _HUFF_DC_CHROMA)
        out += dht(1, 1, _HUFF_AC_CHROMA)
    out += seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# progressive encoder (fixture generation + round-trip tests): DC
# first/refinement scans + per-component spectral-selection AC scans
# with one successive-approximation level (Al=1 -> 0), exercising every
# branch of the progressive decoder including EOB runs and correction
# bits.

#: AC Huffman table for progressive scans: the Annex K tables carry no
#: EOBn symbols (only EOB0=0x00), so EOB runs could never exceed 1.
#: This canonical table assigns every needed symbol — EOBn for
#: n=0..14, ZRL, and all (run, size) pairs with size 1..10 — an 8-bit
#: code (176 symbols < 255, so the forbidden all-ones code never
#: occurs). Compression is worse than an optimized table; round-trip
#: fixtures only care about validity.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [r << 4 for r in range(15)]          # EOB0..EOB14
        + [0xF0]                              # ZRL
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ),
)


class _ProgState:
    """Cross-block state of one progressive AC scan: the pending EOB
    run and the correction bits buffered for it (T.81 G.1.2.3)."""

    def __init__(self, writer, ac_tab):
        self.writer = writer
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.bits: list[int] = []

    def emit_bits(self, bits: list[int]) -> None:
        for b in bits:
            self.writer.write(b, 1)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, length = self.ac_tab[n << 4]
            self.writer.write(code, length)
            if n:
                self.writer.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        self.emit_bits(self.bits)
        self.bits = []


def _prog_ac_first_block(zz, ss, se, al, st: _ProgState) -> None:
    """AC first scan, one block: EOB-run coding of the
    point-transformed band (magnitude truncated toward zero)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        vals.append(t if v >= 0 else -t)
    if not any(vals):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()
        return
    st.flush_eobrun()
    last_nz = max(i for i, v in enumerate(vals) if v)
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = st.ac_tab[0xF0]
            st.writer.write(code, length)
            r -= 16
        s = _category(v)
        code, length = st.ac_tab[(r << 4) | s]
        st.writer.write(code, length)
        st.writer.write(_value_bits(v, s), s)
        r = 0
    if last_nz < se - ss:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _prog_ac_refine_encode_block(zz, ss, se, al, st: _ProgState) -> None:
    """AC refinement scan, one block: newly-nonzero coefficients code
    as (zero-history-run, 1) + sign; already-nonzero coefficients
    contribute correction bits, buffered and flushed after the next
    emitted symbol or EOB run (mirrors the decoder exactly)."""
    absval = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    newly = [i for i, t in enumerate(absval) if t == 1]
    if not newly:
        st.eobrun += 1
        st.bits.extend(t & 1 for t in absval if t > 1)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()
        return
    st.flush_eobrun()
    last_new = newly[-1]
    r = 0
    pending: list[int] = []
    for i in range(last_new + 1):
        t = absval[i]
        if t == 0:
            r += 1
            continue
        # ZRL check runs at EVERY nonzero position (history or newly)
        # so the buffered correction bits flushed with a ZRL all lie
        # inside its 16-zero span — checking only at newly-nonzero
        # positions desyncs the decoder's interleaved bit reads
        while r > 15:
            code, length = st.ac_tab[0xF0]
            st.writer.write(code, length)
            st.emit_bits(pending)
            pending = []
            r -= 16
        if t > 1:
            pending.append(t & 1)
            continue
        code, length = st.ac_tab[(r << 4) | 1]
        st.writer.write(code, length)
        st.writer.write(1 if int(zz[ss + i]) > 0 else 0, 1)
        st.emit_bits(pending)
        pending = []
        r = 0
    # tail after the last newly-nonzero coefficient joins the EOB run
    tail_bits = [t & 1 for t in absval[last_new + 1 :] if t > 1]
    if r > 0 or pending or tail_bits or last_new < se - ss:
        st.eobrun += 1
        st.bits.extend(pending + tail_bits)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _quantized_store(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) zigzag-order quantized coefficients of one padded
    plane.

    Forward DCT runs the exact per-block kernel the baseline encoder
    uses (``_A @ block @ _A.T``) — a batched einsum accumulates in a
    different order and rounds knife-edge coefficients the other way,
    which would break the progressive==baseline pixel-equality the
    tests pin."""
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coefs = np.empty_like(blocks)
    for yy in range(by):
        for xx in range(bx):
            coefs[yy, xx] = _A @ blocks[yy, xx] @ _A.T
    quant = np.rint(coefs / q).astype(np.int64)
    return quant.reshape(by, bx, 64)[:, :, _ZIGZAG]


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False,
    dc_al: int = 1, ac_al: int = 1,
) -> bytes:
    """uint8 ndarray (H,W) or (H,W,3) → progressive (SOF2) JPEG.

    Scan script: interleaved DC first at Al=``dc_al`` + one DC
    refinement scan per remaining bit; per component, AC first scans
    at Al=``ac_al`` (luma split into two spectral bands 1-5 / 6-63 to
    exercise band tiling) + one AC refinement scan per remaining bit
    (Ah=al+1, Al=al chains — real encoders emit exactly such
    multi-level successive approximation). Decoding yields bit-identical
    coefficients to the baseline encoder at the same quality."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"unsupported array {a.dtype}/{a.ndim}d")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ql = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)
    dc_enc = [_encode_table(*_HUFF_DC_LUMA), _encode_table(*_HUFF_DC_CHROMA)]
    ac_enc = _encode_table(*_HUFF_AC_PROG)

    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    hv = (2, 2) if (subsample and not gray) else (1, 1)
    comps = []
    for i, pl in enumerate(planes):
        ch, cv = (hv if i == 0 else (1, 1))
        comps.append({"id": i + 1, "h": ch, "v": cv, "tq": 0 if i == 0 else 1})
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    stores = []
    for i, pl in enumerate(planes):
        c = comps[i]
        if i > 0 and subsample:
            pl = _pad_to(pl, 2, 2)
            pl = (
                pl.reshape(pl.shape[0] // 2, 2, pl.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        # pad to the interleave grid (dummy edge blocks are encoded in
        # the interleaved DC scans, skipped by the AC scans)
        pl = _pad_to(pl, mcus_y * c["v"] * 8 // 1, 8)[
            : mcus_y * c["v"] * 8
        ]
        pl = np.pad(
            pl,
            (
                (0, mcus_y * c["v"] * 8 - pl.shape[0]),
                (0, mcus_x * c["h"] * 8 - pl.shape[1]),
            ),
            mode="edge",
        )
        q = ql if i == 0 else qc
        stores.append(_quantized_store(pl, q))

    def comp_blocks(c):
        cw = -(-w * c["h"] // hmax)
        ch_ = -(-h * c["v"] // vmax)
        return -(-ch_ // 8), -(-cw // 8)

    scans = []
    def dc_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for i, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield i, int(
                                stores[i][
                                    my * c["v"] + by, mx * c["h"] + bx, 0
                                ]
                            )

    # 1) DC first, interleaved, point transform Al=dc_al
    wtr = _BitWriter()
    pred = [0] * len(comps)
    for i, dc in dc_blocks():
        vt = dc >> dc_al
        diff = vt - pred[i]
        pred[i] = vt
        n = _category(diff)
        code, length = dc_enc[0 if i == 0 else 1][n]
        wtr.write(code, length)
        if n:
            wtr.write(_value_bits(diff, n), n)
    scans.append((list(range(len(comps))), 0, 0, 0, dc_al, wtr.flush()))
    # 2) DC refinement: one scan per remaining bit, Ah=al+1 Al=al
    for al in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        for _i, dc in dc_blocks():
            wtr.write((dc >> al) & 1, 1)
        scans.append((list(range(len(comps))), 0, 0, al + 1, al, wtr.flush()))
    # 3) AC first scans at Al=ac_al (luma in two spectral bands)
    for i, c in enumerate(comps):
        bands = [(1, 5), (6, 63)] if i == 0 else [(1, 63)]
        for ss, se in bands:
            wtr = _BitWriter()
            st = _ProgState(wtr, ac_enc)
            by, bx = comp_blocks(c)
            for y in range(by):
                for x in range(bx):
                    _prog_ac_first_block(stores[i][y, x], ss, se, ac_al, st)
            st.flush_eobrun()
            scans.append(([i], ss, se, 0, ac_al, wtr.flush()))
    # 4) AC refinement: one scan per remaining bit, Ah=al+1 Al=al
    for al in range(ac_al - 1, -1, -1):
        for i, c in enumerate(comps):
            bands = [(1, 5), (6, 63)] if i == 0 else [(1, 63)]
            for ss, se in bands:
                wtr = _BitWriter()
                st = _ProgState(wtr, ac_enc)
                by, bx = comp_blocks(c)
                for y in range(by):
                    for x in range(bx):
                        _prog_ac_refine_encode_block(
                            stores[i][y, x], ss, se, al, st
                        )
                st.flush_eobrun()
                scans.append(([i], ss, se, al + 1, al, wtr.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql.ravel()[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([1]) + bytes(qc.ravel()[_ZIGZAG].astype(np.uint8))
        )
    sof_comps = b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    out += seg(
        0xC2, struct.pack(">BHHB", 8, h, w, len(comps)) + sof_comps
    )
    out += seg(
        0xC4, bytes([0x00]) + bytes(_HUFF_DC_LUMA[0]) + bytes(_HUFF_DC_LUMA[1])
    )
    if not gray:
        out += seg(
            0xC4,
            bytes([0x01])
            + bytes(_HUFF_DC_CHROMA[0])
            + bytes(_HUFF_DC_CHROMA[1]),
        )
    out += seg(
        0xC4, bytes([0x10]) + bytes(_HUFF_AC_PROG[0]) + bytes(_HUFF_AC_PROG[1])
    )
    if not gray:
        out += seg(
            0xC4,
            bytes([0x11]) + bytes(_HUFF_AC_PROG[0]) + bytes(_HUFF_AC_PROG[1]),
        )
    for scan_comps, ss, se, ah, al, body in scans:
        comps_b = b"".join(
            bytes(
                [
                    comps[i]["id"],
                    ((0 if i == 0 else 1) << 4) | (0 if i == 0 else 1),
                ]
            )
            for i in scan_comps
        )
        out += struct.pack(
            ">BBH", 0xFF, 0xDA, 2 + 1 + 2 * len(scan_comps) + 3
        )
        out += bytes([len(scan_comps)]) + comps_b
        out += bytes([ss, se, (ah << 4) | al])
        out += body
    out += b"\xff\xd9"
    return bytes(out)
