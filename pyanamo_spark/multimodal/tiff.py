"""Pure-Python TIFF codec (baseline TIFF 6.0).

TIFF closes out the still-image family for scanned/scientific
corpora: an IFD tag directory over strip-organized pixel data. This
module implements both byte orders ('II'/'MM'), 8-bit grayscale /
RGB(A) / palette photometrics, WhiteIsZero inversion, multi-strip
images, and the three baseline compressions — none, PackBits
(RLE), and TIFF-flavor LZW (MSB-first bit packing, 9..12-bit codes
with the spec's *early-change* width bump — one code earlier than
GIF's LZW, which is why the two don't share an implementation) plus
the horizontal-differencing predictor (tag 317 = 2).

The encoder (little-endian, gray/RGB, none/LZW/PackBits, optional
predictor) exists for fixtures and round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_CLEAR = 256
_EOI = 257


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF LZW: MSB-first, clear=256, EOI=257, early width change."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                return bytes(out[:max_out])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"TIFF: LZW code {code} out of range")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # early change: the writer bumps after assigning code
            # 2^w - 2 (NextCode == 2^w - 1); our table lags its by one
            # append, so bump one entry earlier — at sizes 510/1022/
            # 2046 — so the next code is read at the writer's width
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= max_out:
                return bytes(out[:max_out])
    return bytes(out[:max_out])


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = bits = 0

    def emit(code: int, w: int):
        nonlocal acc, bits
        acc = (acc << w) | code
        bits += w
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
        acc &= (1 << bits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    current = b""
    for b in data:
        nxt = current + bytes([b])
        if nxt in table:
            current = nxt
            continue
        emit(table[current], width)
        table[nxt] = next_code
        next_code += 1
        # early change mirrors the decoder's +1 lookahead
        if next_code + 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        current = bytes([b])
    if current:
        emit(table[current], width)
    emit(_EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:max_out])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and row[i + 1] == row[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes → uint8 ndarray: (H, W) gray, (H, W, C) otherwise."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[off : off + 8])
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = payload[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
            raw = payload[voff : voff + size]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:  # RATIONAL etc. — not needed for pixels
            continue
        tags[tag] = list(struct.unpack(bo + fmt * cnt, raw))
    width = tags[256][0]
    height = tags[257][0]
    # bounded-allocation guard (see gif.py): corrupt IFDs carry
    # garbage u32 dimensions; refuse before allocating
    if width * height > (1 << 26):
        raise ValueError(
            f"TIFF: {width}x{height} exceeds the decoder's pixel bound"
        )
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits}: 8 only")
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    predictor = tags.get(317, [1])[0]
    rows_per_strip = tags.get(278, [height])[0]
    offsets = tags[273]
    counts = tags.get(279, [len(payload) - offsets[0]])

    stride = width * spp
    pix = bytearray()
    row0 = 0
    for soff, scnt in zip(offsets, counts):
        n_rows = min(rows_per_strip, height - row0)
        want = n_rows * stride
        chunk = payload[soff : soff + scnt]
        if compression == 1:
            pix += chunk[:want]
        elif compression == 5:
            pix += _lzw_decode_tiff(chunk, want)
        elif compression == 32773:
            pix += _packbits_decode(chunk, want)
        else:
            raise NotImplementedError(
                f"TIFF compression {compression}: none/LZW/PackBits only"
            )
        row0 += n_rows
    arr = np.frombuffer(bytes(pix[: height * stride]), np.uint8).reshape(
        height, width, spp
    )
    if predictor == 2:  # horizontal differencing
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photometric == 3:  # palette: ColorMap is 16-bit per channel
        cmap = tags[320]
        n = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
        ).astype(np.uint8)
        return np.ascontiguousarray(pal[arr[:, :, 0]])
    if photometric == 0:  # WhiteIsZero
        arr = 255 - arr
    return arr[:, :, 0] if spp == 1 else np.ascontiguousarray(arr)


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """uint8 (H, W) or (H, W, 3) → little-endian TIFF bytes
    (``compression``: 'none' / 'lzw' / 'packbits')."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if gray:
        a = a[:, :, None]
    h, w, spp = a.shape
    rps = rows_per_strip or h
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    src = a
    if predictor:
        d = a.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        src = (d & 0xFF).astype(np.uint8)
    strips = []
    for r0 in range(0, h, rps):
        raw = src[r0 : r0 + rps].tobytes()
        if compression == "lzw":
            strips.append(_lzw_encode_tiff(raw))
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    entries = []  # (tag, type, count, value_or_bytes)
    entries.append((256, 3, 1, w))
    entries.append((257, 3, 1, h))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, comp_tag))
    entries.append((262, 3, 1, 1 if gray else 2))
    entries.append((277, 3, 1, spp))
    entries.append((278, 3, 1, rps))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    if predictor:
        entries.append((317, 3, 1, 2))
    # strip offsets get patched after layout
    entries.append((273, 4, len(strips), [0] * len(strips)))
    entries.sort()

    ifd_off = 8
    n = len(entries)
    data_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack("<" + fmt, v) for v in vals)

    # lay out strip data after the out-of-line values
    out_entries = []
    pending = []
    for tag, typ, cnt, val in entries:
        vals = val if isinstance(val, list) else [val]
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            out_entries.append((tag, typ, cnt, vb.ljust(4, b"\x00")))
        else:
            pending.append((len(out_entries), vb))
            out_entries.append((tag, typ, cnt, None))
    for idx, vb in pending:
        tag, typ, cnt, _ = out_entries[idx]
        out_entries[idx] = (
            tag, typ, cnt, struct.pack("<I", data_off + len(extra))
        )
        extra += vb
    strip_start = data_off + len(extra)
    offs = []
    pos = strip_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    # patch tag 273
    for i, (tag, typ, cnt, vb) in enumerate(out_entries):
        if tag == 273:
            ob = value_bytes(4, offs)
            if len(ob) <= 4:
                out_entries[i] = (tag, typ, cnt, ob.ljust(4, b"\x00"))
            else:
                # 273's slot in `extra` was reserved by the pending pass
                slot = None
                for idx, vb2 in pending:
                    if out_entries[idx][0] == 273:
                        (slot,) = struct.unpack("<I", out_entries[idx][3])
                        break
                assert slot is not None
                extra[slot - data_off : slot - data_off + len(ob)] = ob

    out = bytearray(b"II" + struct.pack("<HI", 42, ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, vb in out_entries:
        out += struct.pack("<HHI", tag, typ, cnt) + vb
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
