"""Multimodal plumbing tests: schema, deterministic byte features,
frame-sample offsets, and the clearly-marked decode stub."""

from __future__ import annotations

import math

import pytest

from pyanamo_spark.multimodal.pipeline import (
    decode_image,
    extract_features,
    sample_frames,
    synthetic_assets,
)
from pyanamo_spark import semantics


def test_png_wav_always_decode_others_stay_stubbed():
    """image/png and audio/wav are always real (pure-Python / stdlib
    codec backstops); formats with no pure-Python route (JPEG) stay a
    clearly-marked stub unless their optional library imports."""
    import numpy as np

    from pyanamo_spark.multimodal.pipeline import CODECS
    from pyanamo_spark.multimodal.png import encode_png
    from pyanamo_spark.multimodal.wav import encode_wav

    assert "image/png" in CODECS  # registered at import time
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    arr = decode_image(encode_png(img), "image/png")
    assert arr.shape == (4, 4, 3)
    assert arr.ravel().tolist() == list(range(48))

    assert "audio/wav" in CODECS  # stdlib-wave backstop
    sig = decode_image(
        encode_wav(np.zeros(16), rate=8000), "audio/wav"
    )
    assert sig.shape == (16,)

    # JPEG always decodes too (pure-Python baseline codec backstop)
    from pyanamo_spark.multimodal.jpeg import encode_jpeg

    assert "image/jpeg" in CODECS
    jarr = decode_image(encode_jpeg(img, quality=100), "image/jpeg")
    assert np.asarray(jarr).shape == (4, 4, 3)

    # video is the one remaining documented stub (no pure-Python route)
    assert "video/mp4" not in CODECS
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_png_roundtrip_every_filter_and_shape():
    import numpy as np

    from pyanamo_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(42)
    for shape in [(5, 7), (4, 6, 3), (3, 5, 4), (1, 1), (2, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ftype in range(5):  # None/Sub/Up/Average/Paeth unfilters
            got = decode_png(encode_png(img, filter_type=ftype))
            assert np.array_equal(got, img), (shape, ftype)


def test_png_palette_and_errors():
    import struct
    import zlib

    import numpy as np

    from pyanamo_spark.multimodal.png import (
        _SIGNATURE,
        _chunk,
        decode_png,
    )

    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 4, size=(6, 9), dtype=np.uint8)
    lines = bytearray()
    for y in range(6):
        lines.append(0)
        lines.extend(idx[y].tobytes())
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 6, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pal[idx])

    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"GIF89a")
    bad_depth = _SIGNATURE + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad_depth)


def test_png_16bit_and_adam7_roundtrip():
    """16-bit depth and Adam7 interlace decode exactly (every filter,
    gray/RGB/RGBA, dims hitting empty interlace passes)."""
    import numpy as np

    from pyanamo_spark.multimodal.png import decode_png, encode_png

    rng = np.random.default_rng(9)
    for shape in [(5, 7), (4, 6, 3), (3, 5, 4), (1, 1), (2, 1, 3), (9, 9)]:
        for ft in range(5):
            img8 = rng.integers(0, 256, size=shape, dtype=np.uint8)
            img16 = rng.integers(0, 65536, size=shape, dtype=np.uint16)
            assert np.array_equal(
                decode_png(encode_png(img8, filter_type=ft, interlace=True)),
                img8,
            )
            out16 = decode_png(encode_png(img16, filter_type=ft))
            assert out16.dtype == np.uint16
            assert np.array_equal(out16, img16)
            assert np.array_equal(
                decode_png(
                    encode_png(img16, filter_type=ft, interlace=True)
                ),
                img16,
            )


def test_png_low_bit_depth_gray_and_palette():
    """1/2/4-bit streams built by hand: low-depth gray scales to the
    full 8-bit range; low-depth palette indices expand through PLTE."""
    import numpy as np

    from pyanamo_spark.multimodal.png import _chunk, _SIGNATURE, decode_png

    import struct
    import zlib

    def pack_rows(samples, depth, w):
        # bit-pack each row MSB-first, zero-padded to a byte boundary
        lines = bytearray()
        for row in samples:
            bits = []
            for v in row:
                bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
            while len(bits) % 8:
                bits.append(0)
            lines.append(0)  # filter type none
            lines.extend(np.packbits(np.array(bits, dtype=np.uint8)))
        return zlib.compress(bytes(lines))

    # 1-bit gray checkerboard: 0 -> 0, 1 -> 255
    g = np.indices((4, 10)).sum(axis=0) % 2
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 4, 1, 0, 0, 0, 0))
        + _chunk(b"IDAT", pack_rows(g, 1, 10))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), g.astype(np.uint8) * 255)

    # 2-bit gray ramp: 0..3 -> 0,85,170,255
    g2 = np.arange(12).reshape(3, 4) % 4
    png2 = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 2, 0, 0, 0, 0))
        + _chunk(b"IDAT", pack_rows(g2, 2, 4))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png2), (g2 * 85).astype(np.uint8))

    # 4-bit palette
    pal = np.array(
        [[i * 16, 255 - i * 16, i] for i in range(16)], dtype=np.uint8
    )
    idx = np.arange(15).reshape(3, 5) % 16
    png4 = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 4, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", pack_rows(idx, 4, 5))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png4), pal[idx])


def test_image_pipeline_end_to_end(spark):
    """Real pixels through the whole path: generated PNG assets →
    pure-Python decode → resize → features, numpy-parity-checked."""
    import numpy as np

    from pyanamo_spark.multimodal.pipeline import (
        THUMB,
        image_features,
        synthetic_png_assets,
    )
    from pyanamo_spark.multimodal.png import decode_png

    assets = synthetic_png_assets(spark, n=24)
    feats = image_features(assets)
    assert feats.schema.simpleString() == (
        "struct<asset_id:bigint,height:int,width:int,channels:int,"
        "channel_mean:array<double>,thumb:array<double>>"
    )
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 24
    payloads = {
        r.asset_id: bytes(r.payload) for r in assets.collect()
    }
    # independent recompute for a handful of assets
    for aid in (0, 3, 11, 23):
        img = decode_png(payloads[aid]).astype(np.float64)
        r = rows[aid]
        assert (r.height, r.width, r.channels) == img.shape
        assert r.channel_mean == pytest.approx(
            img.mean(axis=(0, 1)).round(6).tolist(), abs=1e-6
        )
        yi = np.arange(THUMB) * img.shape[0] // THUMB
        xi = np.arange(THUMB) * img.shape[1] // THUMB
        want = img[np.ix_(yi, xi)].mean(axis=2).round(6).ravel()
        assert len(r.thumb) == THUMB * THUMB
        assert r.thumb == pytest.approx(want.tolist(), abs=1e-6)
    # deterministic across reruns (the driver's stability contract)
    again = {r.asset_id: r for r in image_features(assets).collect()}
    assert all(
        again[k].thumb == rows[k].thumb and again[k].channel_mean == rows[k].channel_mean
        for k in rows
    )


def test_feature_extraction_real_math(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    assets = synthetic_assets(spark)
    feats = extract_features(assets)
    assert feats.schema.simpleString() == (
        "struct<asset_id:bigint,mime:string,n_bytes:bigint,"
        "byte_hist:array<double>,entropy:double>"
    )
    row = feats.filter("asset_id = 0").collect()[0]
    text = (
        spark.table("documents").filter("doc_id = 0").collect()[0].text
    )
    data = text.encode("utf-8")
    assert row.n_bytes == len(data)
    assert sum(row.byte_hist) == pytest.approx(1.0, abs=1e-4)
    # entropy recomputed independently
    freq = {}
    for b in data:
        freq[b] = freq.get(b, 0) + 1
    expected = -sum(
        (c / len(data)) * math.log2(c / len(data)) for c in freq.values()
    )
    assert row.entropy == pytest.approx(expected, abs=1e-5)


def test_frame_sampling_offsets(spark, sf_dir):
    semantics.ensure_views(spark, sf_dir)
    assets = synthetic_assets(spark).filter("asset_id = 3")
    meta = assets.select("meta.*").collect()[0]
    frames = sample_frames(assets, k=4).collect()
    assert len(frames) == 4
    stride = meta.n_bytes // meta.n_frames
    for f in frames:
        assert f.byte_offset == f.frame_idx * stride
        assert 0 <= f.frame_idx < meta.n_frames


def test_resize_preserves_schema_and_composes(spark, sf_dir):
    from pyanamo_spark.multimodal.pipeline import (
        RESIZE_BYTES,
        resize_assets,
    )

    semantics.ensure_views(spark, sf_dir)
    assets = synthetic_assets(spark)
    resized = resize_assets(assets)
    assert resized.schema.simpleString() == assets.schema.simpleString()
    rows = resized.collect()
    assert len(rows) == assets.count()
    assert all(len(bytes(r.payload)) == RESIZE_BYTES for r in rows)
    assert all(r.meta.n_bytes == RESIZE_BYTES for r in rows)
    # composes with the downstream featurizer unchanged
    feats = extract_features(resized).collect()
    assert all(f.n_bytes == RESIZE_BYTES for f in feats)
    # deterministic: same bytes on a rerun
    again = {
        r.asset_id: bytes(r.payload) for r in resize_assets(assets).collect()
    }
    assert all(again[r.asset_id] == bytes(r.payload) for r in rows)


def test_registered_codec_path_roundtrip():
    """A registered codec makes decode_image real — exercised with a
    deterministic fake so the registry path is tested even without
    Pillow in the container."""
    import numpy as np

    from pyanamo_spark.multimodal.pipeline import CODECS, decode_image

    fake_mime = "image/x-test-raw"
    CODECS[fake_mime] = lambda payload: np.frombuffer(
        payload, dtype=np.uint8
    ).reshape(2, -1)
    try:
        arr = decode_image(bytes(range(8)), fake_mime)
        assert arr.shape == (2, 4)
        assert arr.sum() == sum(range(8))
    finally:
        del CODECS[fake_mime]


def test_safe_decode_classifies_corruption():
    """Every codec rejects a 50-byte truncation (signature intact,
    body gone) via classification, never an uncaught exception."""
    import numpy as np

    from pyanamo_spark.multimodal.bmp import encode_bmp
    from pyanamo_spark.multimodal.gif import encode_gif
    from pyanamo_spark.multimodal.jpeg import encode_jpeg
    from pyanamo_spark.multimodal.png import encode_png
    from pyanamo_spark.multimodal.pipeline import safe_decode
    from pyanamo_spark.multimodal.tiff import encode_tiff

    rng = np.random.default_rng(0)
    img = rng.integers(0, 200, size=(12, 14, 3)).astype(np.uint8)
    blobs = {
        "image/png": encode_png(img),
        "image/jpeg": encode_jpeg(img, quality=90),
        "image/gif": encode_gif(img % 32 * 8),
        "image/bmp": encode_bmp(img),
        "image/tiff": encode_tiff(img, compression="lzw"),
    }
    for mime, blob in blobs.items():
        arr, status = safe_decode(blob, mime)
        assert status == "ok" and arr is not None, mime
        bad, status = safe_decode(blob[:50], mime)
        assert status == "error" and bad is None, mime
    assert safe_decode(b"xx", "video/x-h264")[1] == "no_codec"


def test_safe_decode_never_escapes_on_fuzzed_bytes():
    """Arbitrary bytes under every registered mime always classify —
    no uncaught exception, no hang. (Random payloads occasionally
    carry a valid magic; decode errors must still be contained.)"""
    import numpy as np

    from pyanamo_spark.multimodal.pipeline import CODECS, safe_decode

    rng = np.random.default_rng(123)
    magics = {
        "image/png": b"\x89PNG\r\n\x1a\n",
        "image/gif": b"GIF89a",
        "image/bmp": b"BM",
        "image/tiff": b"II*\x00",
        "image/jpeg": b"\xff\xd8\xff\xe0",
        "audio/wav": b"RIFF\x20\x00\x00\x00WAVE",
        "audio/aiff": b"FORM\x00\x00\x00\x20AIFF",
        "audio/flac": b"fLaC",
    }
    for mime in CODECS:
        for trial in range(8):
            blob = rng.integers(0, 256, size=200).astype("u1").tobytes()
            if trial % 2 == 0 and mime in magics:
                blob = magics[mime] + blob  # valid magic, garbage body
            _, status = safe_decode(blob, mime)
            assert status in ("ok", "error"), (mime, status)


def test_multimodal_audit_queries_certify_fixture(spark, sf_dir):
    """The four r09 multimodal audit conversions must certify the
    fixture — every declared flag 1 (what each oracle asserts as a
    literal), with the row inventory the generators promise."""
    from pyanamo_spark.registry import QUERIES

    feats = QUERIES["q_multimodal_features"](spark, sf_dir).collect()
    assert feats and all(
        r.hist_ok == 1 and r.entropy_ok == 1 for r in feats
    )
    dec = QUERIES["q_multimodal_decode"](spark, sf_dir).collect()
    assert len(dec) == 64
    for r in dec:
        assert r.decode_ok == 1, r
        assert (r.height, r.width, r.channels) == (
            8 + r.asset_id % 9,
            8 + (r.asset_id * 3) % 9,
            3,
        )
    aud = QUERIES["q_audio_features"](spark, sf_dir).collect()
    assert len(aud) == 64 and all(r.features_ok == 1 for r in aud)
    vid = QUERIES["q_video_frames"](spark, sf_dir).collect()
    assert len(vid) == 16 and all(r.decode_ok == 1 for r in vid)
