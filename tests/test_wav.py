"""WAV codec + audio feature path: round-trip exactness, stereo
layout, silent-asset zeros, and end-to-end determinism."""

from __future__ import annotations

import numpy as np

from pyanamo_spark.multimodal.wav import decode_wav, encode_wav, wav_info


def test_roundtrip_mono_within_quantization():
    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    back = decode_wav(encode_wav(sig, rate=8000))
    assert back.shape == (800,)
    assert np.max(np.abs(back - sig)) <= 1.0 / 32768.0 + 1e-12


def test_roundtrip_stereo_interleaving():
    left = np.linspace(-1, 1, 100)
    right = -left
    back = decode_wav(encode_wav(np.stack([left, right], -1), rate=4000))
    assert back.shape == (100, 2)
    assert np.allclose(back[:, 0], -back[:, 1], atol=2 / 32768.0)
    assert wav_info(encode_wav(np.stack([left, right], -1), 4000)) == (
        2,
        4000,
        100,
    )


def test_int16_passthrough_is_exact():
    samples = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    back = decode_wav(encode_wav(samples, rate=8000))
    assert np.array_equal(back * 32768.0, samples.astype(np.float64))


def test_audio_features_end_to_end(spark):
    from pyanamo_spark.multimodal.pipeline import (
        audio_features,
        synthetic_wav_assets,
    )

    feats = audio_features(synthetic_wav_assets(spark, n=32))
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    # every 7th asset from offset 3 is silent: rms == peak == zcr == 0
    for i in (3, 10, 17, 24, 31):
        assert rows[i]["rms"] == 0.0
        assert rows[i]["peak"] == 0.0
        assert rows[i]["zcr"] == 0.0
    # a voiced tone has positive rms and a zcr near 2·freq/rate
    voiced = rows[1]
    assert voiced["rms"] > 0.05
    freq = 100.0 + (1 % 40) * 10.0
    assert abs(voiced["zcr"] - 2 * freq / 8000.0) < 0.01
    # stereo ids decoded as 2-channel
    assert rows[0]["channels"] == 2 and rows[1]["channels"] == 1
    # deterministic across runs
    again = {
        r["asset_id"]: r
        for r in audio_features(
            synthetic_wav_assets(spark, n=32)
        ).collect()
    }
    assert rows == again
