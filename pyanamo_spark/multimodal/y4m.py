"""Pure-Python YUV4MPEG2 (.y4m) codec: raw planar YUV frames.

Y4M is the uncompressed interchange format research video pipelines
emit (ffmpeg ``-f yuv4mpeg``, VMAF/codec test corpora): one ASCII
stream header (``YUV4MPEG2 W.. H.. F.. C..``), then per frame an ASCII
``FRAME`` line plus fixed-size planar YUV data. No entropy coding at
all, so it decodes with numpy alone — and because every frame has the
same byte length, ``probe_y4m`` computes all frame offsets FROM THE
HEADER without scanning the body: frame-sampling cost is O(k), not
O(file), the property that matters when hour-long clips are sampled at
1 frame/second (mirrors ``avi.py``'s index-driven strided decode).

Supported colorspaces: C420 / C420jpeg / C420mpeg2 / C420paldv
(treated identically — chroma siting is irrelevant to box upsampling),
C422, C444, and Cmono. Conversion uses the same full-range BT.601
matrix as ``jpeg.py``, documented as this package's fixture contract
(broadcast-range streams would need the 16..235 de-scaling first).

The encoder exists for fixture generation and round-trip tests:
C444 survives RGB→YUV→RGB within ±1 LSB; C420 exercises the chroma
upsampling branch.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

#: (chroma width divisor, chroma height divisor) per colorspace family
_SUBSAMPLING = {
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _family(cspace: str) -> str:
    if cspace == "mono":
        return "mono"
    for fam in ("420", "422", "444"):
        if cspace.startswith(fam):
            return fam
    raise NotImplementedError(f"Y4M colorspace C{cspace}")


def probe_y4m(payload: bytes) -> dict:
    """Stream metadata + frame byte-ranges without touching the body.

    Returns {width, height, fps_num, fps_den, colorspace, n_frames,
    frames: [(offset, size), ...]} where each range covers one frame's
    PLANE DATA (past its FRAME line). Assumes bare ``FRAME`` lines
    (no per-frame parameters), which is what every common writer
    emits; a parameterized frame line raises rather than desyncs."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC):
        raise ValueError("not a Y4M stream: bad magic")
    width = height = None
    fps_num, fps_den = 25, 1
    cspace = "420jpeg"  # the spec default when C is absent
    for tok in payload[len(_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif tag == "C":
            cspace = val
        # I (interlacing), A (aspect), X (extensions) don't affect size
    if not width or not height:
        raise ValueError("Y4M header missing W or H")
    fam = _family(cspace)
    ysize = width * height
    if fam == "mono":
        fsize = ysize
    else:
        cw, chh = _SUBSAMPLING[fam]
        fsize = ysize + 2 * ((width // cw) * (height // chh))
    frame_hdr = len(b"FRAME\n")
    body = len(payload) - (nl + 1)
    per = frame_hdr + fsize
    n_frames = body // per
    # verify the first FRAME line is bare — desyncing silently on
    # parameterized frames would garble every later frame
    if n_frames and payload[nl + 1 : nl + 1 + 6] != b"FRAME\n":
        raise NotImplementedError("Y4M frames with parameters")
    frames = [
        (nl + 1 + i * per + frame_hdr, fsize) for i in range(n_frames)
    ]
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": cspace,
        "n_frames": n_frames,
        "frames": frames,
    }


def _yuv_to_rgb(y, cb, cr) -> np.ndarray:
    yf, cbf, crf = (
        y.astype(np.float64),
        cb.astype(np.float64) - 128.0,
        cr.astype(np.float64) - 128.0,
    )
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def decode_y4m(
    payload: bytes, every: int = 1, max_frames: int | None = None
) -> np.ndarray:
    """Y4M bytes → uint8 ndarray (T, H, W, 3) RGB (mono streams
    expand to 3 identical channels). ``every`` samples every k-th
    frame; skipped frames are never read — offsets come from
    ``probe_y4m``'s header arithmetic."""
    meta = probe_y4m(payload)
    w, h = meta["width"], meta["height"]
    fam = _family(meta["colorspace"])
    picks = meta["frames"][::every]
    if max_frames is not None:
        picks = picks[:max_frames]
    if not picks:
        raise ValueError("Y4M contains no frames")
    out = []
    for off, size in picks:
        data = np.frombuffer(payload[off : off + size], dtype=np.uint8)
        y = data[: w * h].reshape(h, w)
        if fam == "mono":
            out.append(np.repeat(y[..., None], 3, axis=-1))
            continue
        cw, chh = _SUBSAMPLING[fam]
        cpw, cph = w // cw, h // chh
        cb = data[w * h : w * h + cpw * cph].reshape(cph, cpw)
        cr = data[w * h + cpw * cph :].reshape(cph, cpw)
        if (cw, chh) != (1, 1):
            cb = np.repeat(np.repeat(cb, chh, axis=0), cw, axis=1)[:h, :w]
            cr = np.repeat(np.repeat(cr, chh, axis=0), cw, axis=1)[:h, :w]
        out.append(_yuv_to_rgb(y, cb, cr))
    return np.stack(out)


def encode_y4m(
    frames: np.ndarray, fps: int = 25, colorspace: str = "444"
) -> bytes:
    """uint8 ndarray (T,H,W,3) or (T,H,W) → Y4M bytes.

    RGB input converts with the full-range BT.601 matrix; C420 box-
    filters chroma (dims must be even), Cmono writes the luma plane
    only. Gray (T,H,W) input forces Cmono."""
    a = np.ascontiguousarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        colorspace = "mono"
        t, h, w = a.shape
    elif a.ndim == 4 and a.shape[3] == 3:
        t, h, w, _ = a.shape
    else:
        raise ValueError(f"unsupported frame array shape {a.shape}")
    fam = _family(colorspace)
    if fam != "mono":
        cw, chh = _SUBSAMPLING[fam]
        if w % cw or h % chh:
            raise ValueError(
                f"C{colorspace} needs dimensions divisible by {cw}x{chh}"
            )
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C{colorspace}\n"
    out = bytearray(header.encode("ascii"))
    for i in range(t):
        out += b"FRAME\n"
        if fam == "mono":
            out += a[i].tobytes()
            continue
        rgb = a[i].astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        cw, chh = _SUBSAMPLING[fam]
        if (cw, chh) != (1, 1):
            cb = cb.reshape(h // chh, chh, w // cw, cw).mean(axis=(1, 3))
            cr = cr.reshape(h // chh, chh, w // cw, cw).mean(axis=(1, 3))
        for plane in (y, cb, cr):
            out += (
                np.clip(np.rint(plane), 0, 255).astype(np.uint8).tobytes()
            )
    return bytes(out)
