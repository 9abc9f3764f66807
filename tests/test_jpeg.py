"""Baseline JPEG codec: round-trip tolerance bounds across quality /
subsampling / shape, error paths, and the Spark pipeline integration."""

from __future__ import annotations

import numpy as np
import pytest

from pyanamo_spark.multimodal.jpeg import (
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2 + phase) % 256).astype(np.uint8)


def _rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_gray_q100_near_lossless():
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("quality,bound", [(90, 6), (75, 12)])
def test_gray_quality_bounds(quality, bound):
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


@pytest.mark.parametrize("subsample", [False, True])
def test_rgb_roundtrip(subsample):
    img = _rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # 4:2:0 box-downsamples chroma, so its bound is looser
    assert err.max() <= (20 if subsample else 8)
    assert err.mean() <= (3.0 if subsample else 1.5)


@pytest.mark.parametrize("h,w", [(8, 8), (9, 13), (17, 31), (1, 1), (5, 40)])
def test_odd_dimensions_crop_exactly(h, w):
    """Dimensions not multiples of the MCU must decode to the exact
    declared size (padding never leaks)."""
    img = _gradient(h, w, phase=7)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (h, w)
    rgb = _rgb(h, w)
    out3 = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert out3.shape == (h, w, 3)


def test_noise_image_bounded():
    """Worst-case content (uniform noise) still round-trips within the
    quantization error budget — no overflow/underflow wraparound."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    # noise at q95: per-pixel error stays well under a gray step of 64
    assert np.abs(out.astype(int) - img.astype(int)).max() < 64


def test_determinism():
    img = _rgb(24, 24)
    assert encode_jpeg(img, quality=85) == encode_jpeg(img, quality=85)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_progressive_matches_baseline_exactly():
    """Progressive (SOF2) decode must reproduce the SAME pixels as the
    baseline encoding at equal quality: both transmit identical
    quantized coefficients, progressive merely reorders them across
    scans (DC first/refine, banded AC first at Al=1, AC refinement).
    Exact equality pins every decoder branch — EOB runs, ZRL inside
    refinement, correction bits, point transforms."""
    from pyanamo_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for shape, sub in [
        ((24, 31, 3), False),   # color 4:4:4, non-multiple-of-8 dims
        ((64, 48, 3), True),    # color 4:2:0 (interleave dummy blocks)
        ((17, 9), False),       # grayscale, single-component DC scan
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for q in (35, 85):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsample=sub)
            )
            assert np.array_equal(base, prog), (shape, sub, q)
    # deeper successive-approximation chains: multiple DC refinement
    # bits and a 3-level AC Al=2 -> 1 -> 0 refinement cascade
    img = rng.integers(0, 256, size=(23, 29, 3), dtype=np.uint8)
    for dc_al, ac_al in [(2, 0), (0, 2), (2, 3)]:
        base = decode_jpeg(encode_jpeg(img, quality=77))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=77, dc_al=dc_al, ac_al=ac_al)
        )
        assert np.array_equal(base, prog), (dc_al, ac_al)


def test_progressive_flat_image_long_eob_runs():
    """A flat image makes every AC band empty, so the encoder folds
    whole block rows into one EOBn run — the decoder must skip the
    run without consuming bits."""
    from pyanamo_spark.multimodal.jpeg import encode_jpeg_progressive

    img = np.full((48, 64, 3), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    base = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.array_equal(out, base)
    assert np.all(np.abs(out.astype(int) - 137) <= 2)


def test_progressive_gradient_roundtrip_quality():
    """Progressive decode of a smooth gradient stays within the same
    error envelope as the baseline path."""
    from pyanamo_spark.multimodal.jpeg import encode_jpeg_progressive

    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=92))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_hierarchical_sof_still_raises():
    """Unsupported frame types (here SOF3 lossless) must fail loudly,
    not garble."""
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img, quality=90))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(enc))


def test_pipeline_registers_jpeg_codec():
    from pyanamo_spark.multimodal.pipeline import CODECS

    assert "image/jpeg" in CODECS
    img = _rgb(16, 16)
    out = CODECS["image/jpeg"](encode_jpeg(img, quality=90))
    assert np.asarray(out).shape == (16, 16, 3)


def test_mixed_asset_frame_decodes_both_codecs(spark):
    """synthetic_image_assets rotates through all four image codecs;
    every asset must survive decode → featurize with its true
    dimensions."""
    from pyanamo_spark.multimodal.pipeline import (
        image_features,
        synthetic_image_assets,
    )

    assets = synthetic_image_assets(spark, n=12)
    mimes = {
        r["meta"]["mime"]
        for r in assets.select("meta").collect()
    }
    assert mimes == {
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/bmp",
        "image/tiff",
    }
    feats = image_features(assets).collect()
    assert len(feats) == 12
    for r in feats:
        i = r["asset_id"]
        assert (r["height"], r["width"]) == (8 + i % 9, 8 + (i * 3) % 9)
        assert r["channels"] == 3
