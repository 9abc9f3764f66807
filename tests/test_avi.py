"""MJPEG-AVI video codec: container probe, strided decode, round-trip
bounds, error paths, and the Spark featurizer integration."""

from __future__ import annotations

import numpy as np
import pytest

from pyanamo_spark.multimodal.avi import decode_avi, encode_avi, probe_avi


def _clip(t=8, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.stack(
                [(yy * 4 + f * 16) % 256, (xx * 4) % 256, ((yy + xx) * 2 + f * 8) % 256],
                axis=-1,
            )
            for f in range(t)
        ]
    ).astype(np.uint8)


def test_probe_reads_container_without_decoding():
    clip = _clip(t=10)
    enc = encode_avi(clip, fps=5, quality=90)
    meta = probe_avi(enc)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 10)
    assert meta["codec"] == "MJPG"
    assert meta["usec_per_frame"] == 200_000
    assert len(meta["frames"]) == 10
    # frame ranges really are the JPEG payloads
    off, size = meta["frames"][0]
    assert enc[off : off + 2] == b"\xff\xd8"


def test_roundtrip_bound():
    clip = _clip()
    out = decode_avi(encode_avi(clip, quality=95))
    assert out.shape == clip.shape
    assert np.abs(out.astype(int) - clip.astype(int)).max() <= 8


def test_strided_sampling_decodes_only_picked_frames():
    clip = _clip(t=9)
    enc = encode_avi(clip, quality=95)
    s = decode_avi(enc, every=3)
    assert s.shape[0] == 3
    # sampled frames are frames 0, 3, 6 — compare against full decode
    full = decode_avi(enc)
    assert np.array_equal(s, full[::3])
    capped = decode_avi(enc, every=2, max_frames=2)
    assert capped.shape[0] == 2


def test_grayscale_frames_get_channel_axis():
    t, h, w = 4, 16, 16
    yy, _ = np.mgrid[0:h, 0:w]
    g = np.stack([((yy * 3 + i * 7) % 256) for i in range(t)]).astype(np.uint8)
    out = decode_avi(encode_avi(g, quality=100))
    assert out.shape == (t, h, w, 1)


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"\x89PNG\r\n\x1a\n")


def test_non_mjpeg_codec_raises_not_implemented():
    enc = bytearray(encode_avi(_clip(t=2), quality=90))
    pos = enc.find(b"vidsMJPG")
    assert pos > 0
    enc[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi(bytes(enc))


def test_determinism():
    clip = _clip(t=3)
    assert encode_avi(clip, quality=85) == encode_avi(clip, quality=85)


def test_video_features_frame(spark):
    from pyanamo_spark.multimodal.pipeline import (
        synthetic_video_assets,
        video_features,
    )

    assets = synthetic_video_assets(spark, n=6)
    feats = {r["asset_id"]: r for r in video_features(assets).collect()}
    assert len(feats) == 6
    for i, r in feats.items():
        assert r["n_frames"] == 4 + i % 7
        assert r["sampled"] == -(-r["n_frames"] // 3)  # ceil(t/stride)
        assert 0.0 <= r["brightness"] <= 255.0
    # the gradient advances per frame, so sampled clips with >1 frame
    # must register motion
    movers = [r for r in feats.values() if r["sampled"] > 1]
    assert movers and all(r["motion"] > 0 for r in movers)


def test_codec_registered():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "video/avi" in CODECS


def test_dib_avi_roundtrip_exact():
    """Uncompressed BI_RGB frames survive encode -> decode exactly
    (bottom-up BGR rows, 4-byte stride alignment on odd widths)."""
    import numpy as np

    from pyanamo_spark.multimodal.avi import decode_avi, encode_avi

    rng = np.random.default_rng(5)
    v = rng.integers(0, 256, size=(6, 10, 15, 3), dtype=np.uint8)
    enc = encode_avi(v, codec="DIB")
    assert np.array_equal(decode_avi(enc), v)
    assert np.array_equal(decode_avi(enc, every=2), v[::2])
    gray = rng.integers(0, 256, size=(3, 9, 7), dtype=np.uint8)
    out = decode_avi(encode_avi(gray, codec="DIB"))
    assert np.array_equal(out, np.repeat(gray[..., None], 3, -1))


def _static_clip(t=6, h=24, w=32):
    """Mostly-static clip: fixed background, a square moving 4px per
    frame — the shape inter-frame delta coding exists for."""
    frames = np.full((t, h, w, 3), 40, dtype=np.uint8)
    for i in range(t):
        frames[i, 5:10, 3 + i * 4 : 8 + i * 4] = [200, 30, 90]
    return frames


def test_mrle_interframe_roundtrip_exact():
    """MS-RLE8 (the inter-frame path): delta frames only carry ops for
    changed rows, untouched pixels are retained from the previous
    frame — and the decode chain reproduces every frame exactly."""
    v = _static_clip()
    blob = encode_avi(v, codec="MRLE")
    meta = probe_avi(blob)
    assert meta["codec"].strip() == "MRLE"
    assert meta["palette"] is not None and len(meta["palette"]) <= 256
    assert np.array_equal(decode_avi(blob), v)
    # temporal prediction is real: every delta frame is smaller than
    # the keyframe (unchanged rows cost a 4-byte skip escape)
    sizes = [s for _, s in meta["frames"]]
    assert all(s < sizes[0] for s in sizes[1:]), sizes


def test_mrle_sampling_keeps_the_chain_coherent():
    """Sampling an inter-frame stream must still walk every frame's
    ops (a skipped delta frame would corrupt all later frames) while
    materializing only the picked ones."""
    v = _static_clip(t=7)
    blob = encode_avi(v, codec="MRLE")
    assert np.array_equal(decode_avi(blob, every=3), v[::3])
    assert np.array_equal(decode_avi(blob, every=2, max_frames=2), v[::2][:2])


def test_mrle_grayscale_and_color_bound():
    g = np.zeros((4, 8, 8), dtype=np.uint8)
    g[1:, 2:5, 2:5] = 77
    out = decode_avi(encode_avi(g, codec="MRLE"))
    assert np.array_equal(out, np.repeat(g[..., None], 3, -1))
    # >256 distinct colors must refuse, not mis-palettize
    many = np.zeros((1, 16, 17, 3), dtype=np.uint8)
    many[0, :, :, 0] = np.arange(16)[:, None]
    many[0, :, :, 1] = np.arange(17)[None, :]
    with pytest.raises(ValueError, match="256 distinct colors"):
        encode_avi(many, codec="MRLE")


def test_mrle_static_tail_rows_retained():
    """A frame whose ops end (end-of-bitmap) before touching upper
    rows keeps them from the previous frame — pin the retention
    semantics, not just the happy roundtrip."""
    t, h, w = 3, 10, 10
    v = np.zeros((t, h, w, 3), dtype=np.uint8)
    v[:, 0:2] = 9  # TOP rows (encoded last, bottom-up) never change
    for i in range(t):
        v[i, 8, i] = 200  # change only a BOTTOM row pixel per frame
    blob = encode_avi(v, codec="MRLE")
    assert np.array_equal(decode_avi(blob), v)


def test_probe_ignores_audio_stream_strf():
    """An audio stream's strf (WAVEFORMATEX) parsed as a
    BITMAPINFOHEADER reads garbage bpp/biClrUsed — the probe must key
    strf parsing on the preceding strh's fccType, or an audio+video
    AVI crashes/clobbers the palette for every codec."""
    import struct

    v = _static_clip(t=2)
    blob = encode_avi(v, codec="MRLE")
    pal = probe_avi(blob)["palette"]

    # splice an auds strl (strh + 40-byte strf whose byte 14 reads 8)
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    strh = b"auds" + b"\x00" * 52
    fake_wave = bytearray(40)
    struct.pack_into("<H", fake_wave, 14, 8)      # wBitsPerSample-ish
    struct.pack_into("<I", fake_wave, 32, 2**31)  # GUID garbage
    strl = chunk(
        b"LIST",
        b"strl" + chunk(b"strh", strh) + chunk(b"strf", bytes(fake_wave)),
    )
    # splice INSIDE the hdrl LIST (the spec-mandated strl location),
    # growing hdrl's and RIFF's sizes
    out = bytearray(blob)
    hdrl = out.find(b"LIST", 12)
    assert out[hdrl + 8 : hdrl + 12] == b"hdrl"
    (hdrl_size,) = struct.unpack_from("<I", out, hdrl + 4)
    insert_at = hdrl + 8 + hdrl_size  # end of hdrl's body
    out[insert_at:insert_at] = strl
    struct.pack_into("<I", out, hdrl + 4, hdrl_size + len(strl))
    struct.pack_into("<I", out, 4, len(out) - 8)  # fix RIFF size
    meta = probe_avi(bytes(out))
    assert (meta["palette"] == pal).all()  # video palette untouched
    assert np.array_equal(decode_avi(bytes(out)), v)

    # a malformed strl carrying an strf but NO strh must not inherit
    # the video stream's 'vids' type either
    orphan_strl = chunk(b"LIST", b"strl" + chunk(b"strf", bytes(fake_wave)))
    out2 = bytearray(blob)
    (hdrl_size2,) = struct.unpack_from("<I", out2, hdrl + 4)
    out2[insert_at:insert_at] = orphan_strl
    struct.pack_into("<I", out2, hdrl + 4, hdrl_size2 + len(orphan_strl))
    struct.pack_into("<I", out2, 4, len(out2) - 8)
    meta2 = probe_avi(bytes(out2))
    assert (meta2["palette"] == pal).all()
    assert np.array_equal(decode_avi(bytes(out2)), v)


def test_rle8_truncated_escapes_raise_value_error():
    from pyanamo_spark.multimodal.avi import _apply_rle8

    buf = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="delta escape truncated"):
        _apply_rle8(b"\x00\x02", buf)
    with pytest.raises(ValueError, match="absolute run truncated"):
        _apply_rle8(b"\x00\x04\x01\x02", buf)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _apply_rle8(b"\x02\x07", buf)
