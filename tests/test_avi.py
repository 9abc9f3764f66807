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
