"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
Pandas stages.

Decode is REAL for every fixture format — pure-Python codecs with no
optional library: PNG (full spec incl. Adam7/16-bit, ``png.py``),
JPEG (baseline + progressive SOF2, ``jpeg.py``), GIF (LZW, interlace,
animation, ``gif.py``), BMP (``bmp.py``), TIFF (LZW/PackBits +
predictor, ``tiff.py``), WAV (PCM/float/G.711, ``wav.py``), AIFF
(``aiff.py``), FLAC (``flac.py``), MJPEG/DIB AVI (``avi.py``) and
YUV4MPEG2 (``y4m.py``).
``image_features`` runs decode → pixel resize → featurize on actual
pixels and ``audio_features`` decode → RMS/peak/zero-crossings on
actual samples. Only inter-frame video codecs (H.264 et al) remain a
clearly-marked ``decode_image`` stub (no pure-Python route); for
those, everything Spark-side is still real and tested:
  - the asset schema (payload binary + metadata struct)
  - deterministic byte-level feature extraction over mapInPandas
    (per-asset byte histogram + entropy — real math on the binary
    payload, the same batch shape any decoder slots into)
  - frame-sampling plumbing: offset computation for K evenly-spaced
    frames, returning (asset_id, frame_idx, byte_offset) rows

At 100 TB: binary payloads ride parquet byte arrays; metadata columns
let Catalyst prune/filter without touching payload bytes (select the
metadata struct → the scan never reads the binary column); the Pandas
stages see bounded Arrow batches via maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: pluggable codec registry — a deployment registers e.g.
#: {"image/png": pil_decode}; ``register_default_codecs`` fills it from
#: whatever optional libraries import (none in this container)
CODECS: dict[str, Callable[[bytes], object]] = {}


def register_default_codecs() -> list[str]:
    """Register decoders for every optional codec library present.

    Tried: Pillow (image/png, image/jpeg → HxWxC uint8 ndarray) and
    soundfile (audio/wav → float ndarray); the pure-Python codecs
    (multimodal/png.py, jpeg.py, wav.py, avi.py, y4m.py) backstop
    image/png, image/jpeg, audio/wav, video/avi (MJPEG + raw DIB) and
    video/y4m (uncompressed YUV4MPEG2) so every fixture format decodes
    with no optional library at all. Returns the mime types
    registered; only inter-frame video codecs (H.264 et al) remain a
    documented ``decode_image`` stub (no pure-Python route).
    """
    registered: list[str] = []
    try:
        import io

        from PIL import Image  # optional dependency

        def _pil_decode(payload: bytes):
            return np.asarray(Image.open(io.BytesIO(payload)))

        for mime in ("image/png", "image/jpeg"):
            CODECS.setdefault(mime, _pil_decode)
            registered.append(mime)
    except ImportError:
        pass
    try:
        import io

        import soundfile  # optional dependency

        def _wav_decode(payload: bytes):
            data, _rate = soundfile.read(io.BytesIO(payload))
            return data

        CODECS.setdefault("audio/wav", _wav_decode)
        registered.append("audio/wav")
    except ImportError:
        pass
    # dependency-free fallbacks: pure-Python PNG/JPEG (no-ops if PIL
    # won), GIF/BMP, stdlib-wave WAV (no-op if soundfile won), video
    from pyanamo_spark.multimodal.avi import decode_avi
    from pyanamo_spark.multimodal.bmp import decode_bmp
    from pyanamo_spark.multimodal.gif import decode_gif
    from pyanamo_spark.multimodal.jpeg import decode_jpeg
    from pyanamo_spark.multimodal.png import decode_png
    from pyanamo_spark.multimodal.wav import decode_wav
    from pyanamo_spark.multimodal.y4m import decode_y4m

    if "image/png" not in CODECS:
        CODECS["image/png"] = decode_png
        registered.append("image/png")
    if "image/jpeg" not in CODECS:
        CODECS["image/jpeg"] = decode_jpeg
        registered.append("image/jpeg")
    if "image/gif" not in CODECS:
        CODECS["image/gif"] = decode_gif
        registered.append("image/gif")
    if "image/bmp" not in CODECS:
        CODECS["image/bmp"] = decode_bmp
        registered.append("image/bmp")
    if "image/tiff" not in CODECS:
        from pyanamo_spark.multimodal.tiff import decode_tiff

        CODECS["image/tiff"] = decode_tiff
        registered.append("image/tiff")
    if "audio/wav" not in CODECS:
        CODECS["audio/wav"] = decode_wav
        registered.append("audio/wav")
    if "audio/aiff" not in CODECS:
        from pyanamo_spark.multimodal.aiff import decode_aiff

        CODECS["audio/aiff"] = decode_aiff
        registered.append("audio/aiff")
    if "audio/flac" not in CODECS:
        from pyanamo_spark.multimodal.flac import decode_flac

        CODECS["audio/flac"] = decode_flac
        registered.append("audio/flac")
    if "video/avi" not in CODECS:
        CODECS["video/avi"] = decode_avi
        registered.append("video/avi")
    if "video/y4m" not in CODECS:
        CODECS["video/y4m"] = decode_y4m
        registered.append("video/y4m")
    return registered


register_default_codecs()

ASSET_SCHEMA = (
    "asset_id bigint, payload binary, "
    "meta struct<mime string, n_bytes bigint, n_frames int>"
)

FEATURE_SCHEMA = (
    "asset_id bigint, mime string, n_bytes bigint, "
    "byte_hist array<double>, entropy double"
)


def decode_image(payload: bytes, mime: str):
    """Decode a binary payload with a registered codec.

    image/png, image/jpeg, audio/wav and video/avi (MJPEG) always
    decode (pure-Python codecs: multimodal/png.py, jpeg.py, wav.py,
    avi.py). Only inter-frame video codecs, whose decode has no
    pure-Python route, remain a clearly-marked stub: the Spark-side
    plumbing (schema, batching, partitioning) is real and the decoder
    slots in here.
    """
    if mime not in CODECS:
        raise NotImplementedError(
            f"no codec registered for {mime}; register one in "
            f"pyanamo_spark.multimodal.pipeline.CODECS"
        )
    return CODECS[mime](payload)


def synthetic_assets(spark: SparkSession) -> DataFrame:
    """Deterministic binary assets derived from the documents fixture:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), metadata struct alongside."""
    docs = spark.table("documents").where(F.col("text").isNotNull())
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/x-fixture").alias("mime"),
            F.octet_length(F.encode("text", "utf-8"))
            .cast("long")
            .alias("n_bytes"),
            (F.col("doc_id") % 16 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-asset byte histogram (4 buckets) + Shannon entropy —
    real byte-level math standing where a decoder+featurizer would.
    One np.bincount per asset instead of a Python loop per BYTE (the
    loop form costs ~1 µs/byte; multimodal payloads are the largest
    cells in the table, so per-byte Python is exactly the wrong
    constant)."""
    for pdf in batches:
        rows = []
        for asset_id, payload, meta in zip(
            pdf["asset_id"], pdf["payload"], pdf["meta"]
        ):
            if payload is None:  # null blob: nothing to featurize
                continue
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = len(arr) or 1
            freq = np.bincount(arr, minlength=256)
            counts = freq.reshape(4, 64).sum(axis=1)
            p = freq[freq > 0] / n
            entropy = float(-(p * np.log2(p)).sum())
            rows.append(
                {
                    "asset_id": asset_id,
                    "mime": meta["mime"],
                    "n_bytes": len(arr),
                    "byte_hist": [round(c / n, 6) for c in counts],
                    "entropy": round(entropy, 6),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["asset_id", "mime", "n_bytes", "byte_hist", "entropy"],
        )


def extract_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, k: int = 4) -> DataFrame:
    """Frame-sampling plumbing: K evenly-spaced frame indices with byte
    offsets (n_bytes div n_frames stride) — pure expressions; the
    decode of each frame is the stubbed step."""
    return assets.select(
        "asset_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {k - 1}), "
                f"j -> (j * meta.n_frames) div {k})"
            )
        ).alias("frame_pos", "frame_idx"),
        F.expr(
            f"transform(sequence(0, {k - 1}), "
            f"j -> ((j * meta.n_frames) div {k}) "
            f"     * (meta.n_bytes div meta.n_frames))"
        ).alias("_offsets"),
    ).select(
        "asset_id",
        "frame_idx",
        F.expr("_offsets[frame_pos]").alias("byte_offset"),
    )


#: resize target used by the deterministic stand-in transform
RESIZE_BYTES = 64


def _resize_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for image resize: payloads are
    down-sampled to RESIZE_BYTES by even-stride byte selection (short
    ones zero-padded) and metadata updated to match. A real deployment
    replaces the byte selection with decode → pixel resize → re-encode;
    the stage contract — binary in, binary out, metadata rewritten,
    Arrow-batched, schema-stable — is what this pins."""
    for pdf in batches:
        out_payload, out_bytes = [], []
        for payload in pdf["payload"]:
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            if len(arr) >= RESIZE_BYTES:
                idx = (
                    np.arange(RESIZE_BYTES) * len(arr) // RESIZE_BYTES
                )
                small = arr[idx]
            else:
                small = np.zeros(RESIZE_BYTES, dtype=np.uint8)
                small[: len(arr)] = arr
            out_payload.append(small.tobytes())
            out_bytes.append(RESIZE_BYTES)
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "payload": out_payload,
                "meta": [
                    {
                        "mime": m["mime"],
                        "n_bytes": b,
                        "n_frames": m["n_frames"],
                    }
                    for m, b in zip(pdf["meta"], out_bytes)
                ],
            }
        )


def resize_assets(assets: DataFrame) -> DataFrame:
    """Stubbed resize stage: same asset schema in and out, so it
    composes with extract_features / sample_frames either side."""
    return assets.mapInPandas(_resize_payloads, schema=ASSET_SCHEMA)


#: decoded images are resized to THUMB x THUMB before featurizing
THUMB = 8

IMAGE_FEATURE_SCHEMA = (
    "asset_id bigint, height int, width int, channels int, "
    "channel_mean array<double>, thumb array<double>"
)


def synthetic_png_assets(
    spark: SparkSession, n: int = 64, ids: DataFrame | None = None
) -> DataFrame:
    """Deterministic real-PNG assets: per asset_id, an RGB gradient
    image (dimensions and phase derived from the id) encoded with the
    pure-Python codec. Generated executor-side over a range DataFrame
    (or over ``ids``, a single-column id DataFrame, so asset volume
    tracks the corpus) — the driver never holds the payloads."""
    from pyanamo_spark.multimodal.png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                h = 8 + int(asset_id) % 9  # 8..16
                w = 8 + (int(asset_id) * 3) % 9
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (x * 255 // max(w - 1, 1)).astype(np.uint8),
                        (y * 255 // max(h - 1, 1)).astype(np.uint8),
                        np.full((h, w), int(asset_id) % 256, np.uint8),
                    ],
                    axis=-1,
                )
                payload = encode_png(img, filter_type=int(asset_id) % 5)
                rows.append(
                    {
                        "asset_id": int(asset_id),
                        "payload": payload,
                        "meta": {
                            "mime": "image/png",
                            "n_bytes": len(payload),
                            "n_frames": 1,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    base = (
        ids.toDF("id") if ids is not None else spark.range(n)
    )
    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def synthetic_image_assets(
    spark: SparkSession, n: int = 64, ids: DataFrame | None = None
) -> DataFrame:
    """Deterministic mixed-codec image assets: the same per-id gradient
    image as :func:`synthetic_png_assets`, rotated through all five
    real image decoders — PNG (every filter type), JPEG (4:4:4 /
    4:2:0; every second JPEG progressive SOF2), GIF (alternating
    interlace), BMP (24/32-bit, bottom-up/top-down) and TIFF
    (LZW+predictor / PackBits) — so one frame exercises every codec
    and the mime dispatch in ``_image_features``. Executor-side
    generation; the driver never holds payloads."""
    from pyanamo_spark.multimodal.bmp import encode_bmp
    from pyanamo_spark.multimodal.gif import encode_gif
    from pyanamo_spark.multimodal.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from pyanamo_spark.multimodal.png import encode_png
    from pyanamo_spark.multimodal.tiff import encode_tiff

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                i = int(asset_id)
                h = 8 + i % 9  # 8..16
                w = 8 + (i * 3) % 9
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (x * 255 // max(w - 1, 1)).astype(np.uint8),
                        (y * 255 // max(h - 1, 1)).astype(np.uint8),
                        np.full((h, w), i % 256, np.uint8),
                    ],
                    axis=-1,
                )
                if i % 3 == 2:
                    enc = (
                        encode_jpeg_progressive if i % 6 == 5 else encode_jpeg
                    )
                    payload = enc(img, quality=90, subsample=bool(i % 2))
                    mime = "image/jpeg"
                elif i % 6 == 3:
                    payload = encode_gif(img, interlace=bool(i % 2))
                    mime = "image/gif"
                elif i % 6 == 4:
                    payload = encode_bmp(
                        img, bpp=24 if i % 2 else 32, top_down=bool(i % 4)
                    )
                    mime = "image/bmp"
                elif i % 12 == 6:
                    payload = encode_tiff(
                        img,
                        compression="lzw" if i % 24 == 6 else "packbits",
                        predictor=bool(i % 24 == 6),
                    )
                    mime = "image/tiff"
                else:
                    payload = encode_png(img, filter_type=i % 5)
                    mime = "image/png"
                rows.append(
                    {
                        "asset_id": i,
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "n_bytes": len(payload),
                            "n_frames": 1,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    base = ids.toDF("id") if ids is not None else spark.range(n)
    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def _image_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode → resize → featurize: registered codec per mime,
    nearest-neighbor resize to THUMB², per-channel means + a grayscale
    thumbnail vector. Whole-image numpy ops per asset — never per-pixel
    Python."""
    for pdf in batches:
        rows = []
        for asset_id, payload, meta in zip(
            pdf["asset_id"], pdf["payload"], pdf["meta"]
        ):
            if payload is None or meta["mime"] not in CODECS:
                continue
            img = CODECS[meta["mime"]](bytes(payload))
            arr = np.asarray(img, dtype=np.float64)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            h, w, ch = arr.shape
            yi = np.arange(THUMB) * h // THUMB
            xi = np.arange(THUMB) * w // THUMB
            small = arr[np.ix_(yi, xi)]
            rows.append(
                {
                    "asset_id": asset_id,
                    "height": h,
                    "width": w,
                    "channels": ch,
                    "channel_mean": [
                        round(float(m), 6) for m in arr.mean(axis=(0, 1))
                    ],
                    "thumb": [
                        round(float(v), 6)
                        for v in small.mean(axis=2).ravel()
                    ],
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "height",
                "width",
                "channels",
                "channel_mean",
                "thumb",
            ],
        )


def image_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(_image_features, schema=IMAGE_FEATURE_SCHEMA)


QUARANTINE_SCHEMA = "asset_id bigint, mime string, status string"


def safe_decode(payload: bytes, mime: str):
    """Decode with failure classification instead of propagation.

    At 100 TB corrupt payloads are a certainty, and one bad asset must
    not kill a whole Arrow batch (losing the other ~10k rows of the
    task with it). Returns (array | None, status) where status is
    'ok', 'no_codec', or 'error'."""
    if mime not in CODECS:
        return None, "no_codec"
    try:
        return CODECS[mime](bytes(payload)), "ok"
    except Exception:  # codec-internal errors vary (struct/zlib/value)
        return None, "error"


def _quarantine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for asset_id, payload, meta in zip(
            pdf["asset_id"], pdf["payload"], pdf["meta"]
        ):
            if payload is None:
                rows.append(
                    {"asset_id": asset_id, "mime": meta["mime"],
                     "status": "error"}
                )
                continue
            _, status = safe_decode(bytes(payload), meta["mime"])
            rows.append(
                {"asset_id": asset_id, "mime": meta["mime"],
                 "status": status}
            )
        yield pd.DataFrame(rows, columns=["asset_id", "mime", "status"])


def quarantine_assets(assets: DataFrame) -> DataFrame:
    """Per-asset decode triage: route every asset to 'ok' or a
    quarantine class without letting any single corrupt payload abort
    the batch. The survivors feed ``image_features``; the quarantine
    rows are the audit trail a curation run reports."""
    return assets.mapInPandas(_quarantine, schema=QUARANTINE_SCHEMA)


@register(
    "q_decode_quarantine",
    oracle="""
SELECT
  doc_id AS asset_id,
  CASE WHEN doc_id % 3 = 2 THEN 'image/jpeg'
       WHEN doc_id % 6 = 3 THEN 'image/gif'
       WHEN doc_id % 6 = 4 THEN 'image/bmp'
       WHEN doc_id % 12 = 6 THEN 'image/tiff'
       ELSE 'image/png' END AS mime,
  CASE WHEN doc_id % 5 = 3 THEN 'error' ELSE 'ok' END AS status
FROM documents
WHERE doc_id < 64
""",
)
def q_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-asset triage, oracle-checked: generate the mixed-codec
    assets, truncate every 5th-mod-3 payload to 50 bytes (signature
    intact, body gone — a deep corruption every codec must reject),
    and classify each through :func:`safe_decode`. The oracle
    recomputes the planted mime rotation and corruption pattern
    directly, so a hash match proves (a) every intact asset still
    decodes and (b) every planted corruption is caught rather than
    crashing the stage."""
    ids = spark.table("documents").where(F.col("doc_id") < 64).select(
        F.col("doc_id")
    )
    assets = synthetic_image_assets(spark, ids=ids)
    corrupted = assets.withColumn(
        "payload",
        F.when(
            F.col("asset_id") % 5 == 3,
            F.expr("substring(payload, 1, 50)"),
        ).otherwise(F.col("payload")),
    )
    return quarantine_assets(corrupted)


AUDIO_FEATURE_SCHEMA = (
    "asset_id bigint, channels int, n_samples bigint, duration double, "
    "rms double, peak double, zcr double"
)

#: synthetic audio sample rate (Hz)
_WAV_RATE = 8000


def synthetic_wav_assets(
    spark: SparkSession, n: int = 64, ids: DataFrame | None = None
) -> DataFrame:
    """Deterministic real audio assets: per asset_id a sine tone whose
    frequency, amplitude, duration, and channel count derive from the
    id, rotated through the real encodings — PCM16 WAV, G.711 μ-law /
    A-law, IEEE-float WAV, 24-bit PCM, and big-endian AIFF — so the
    decode dispatch and every companding branch run in the pipeline,
    not just in unit tests. Executor-side generation over a range (or
    ``ids``) DataFrame — the driver never holds payloads. Every 7th
    asset is silent (rms/zcr zero-path coverage)."""
    from pyanamo_spark.multimodal.aiff import encode_aiff
    from pyanamo_spark.multimodal.flac import encode_flac
    from pyanamo_spark.multimodal.wav import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                i = int(asset_id)
                n_samp = _WAV_RATE // 20 + (i % 8) * _WAV_RATE // 50
                t = np.arange(n_samp, dtype=np.float64) / _WAV_RATE
                freq = 100.0 + (i % 40) * 10.0
                amp = 0.0 if i % 7 == 3 else 0.1 + 0.8 * (i % 5) / 4.0
                left = amp * np.sin(2 * np.pi * freq * t)
                if i % 4 == 0:  # stereo: phase-shifted right channel
                    right = amp * np.sin(2 * np.pi * freq * t + 1.0)
                    samples = np.stack([left, right], axis=-1)
                else:
                    samples = left
                slot = (
                    "pcm24", "ulaw", "alaw", "pcm16",
                    "aiff16", "float32", "pcm16", "ulaw",
                    "flac_ms", "pcm16", "aiff24", "flac_lpc",
                )[i % 12]
                if slot.startswith("aiff"):
                    payload = encode_aiff(
                        samples, rate=_WAV_RATE, bits=int(slot[4:])
                    )
                    mime = "audio/aiff"
                elif slot == "flac_ms":  # i%12==8 -> stereo (i%4==0)
                    payload = encode_flac(
                        samples, rate=_WAV_RATE, mode="fixed2",
                        blocksize=1024, channel_mode="mid_side",
                    )
                    mime = "audio/flac"
                elif slot == "flac_lpc":  # i%12==11 -> mono
                    payload = encode_flac(
                        samples, rate=_WAV_RATE, mode="lpc",
                        blocksize=1024, porder=2,
                    )
                    mime = "audio/flac"
                else:
                    payload = encode_wav(
                        samples, rate=_WAV_RATE, encoding=slot
                    )
                    mime = "audio/wav"
                rows.append(
                    {
                        "asset_id": i,
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "n_bytes": len(payload),
                            "n_frames": n_samp,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    base = ids.toDF("id") if ids is not None else spark.range(n)
    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def _audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode → featurize for audio: registered codec per mime,
    then whole-signal numpy reductions (RMS, peak, zero-crossing rate)
    — never per-sample Python. Duration comes from the container
    header (wav_info / aiff_info), keeping the rate out of the codec's
    array contract."""
    from pyanamo_spark.multimodal.aiff import aiff_info
    from pyanamo_spark.multimodal.flac import flac_info
    from pyanamo_spark.multimodal.wav import wav_info

    def _flac_info(b: bytes) -> tuple[int, int, int]:
        d = flac_info(b)
        return d["n_channels"], d["sample_rate"], d["n_frames"]

    infos = {
        "audio/wav": wav_info,
        "audio/aiff": aiff_info,
        "audio/flac": _flac_info,
    }
    for pdf in batches:
        rows = []
        for asset_id, payload, meta in zip(
            pdf["asset_id"], pdf["payload"], pdf["meta"]
        ):
            if payload is None or meta["mime"] not in CODECS:
                continue
            raw = bytes(payload)
            data = np.asarray(CODECS[meta["mime"]](raw), dtype=np.float64)
            mono = data.mean(axis=1) if data.ndim == 2 else data
            _nch, rate, n_frames = infos[meta["mime"]](raw)
            signs = np.sign(mono[np.abs(mono) > 1e-12])
            zc = int(np.count_nonzero(np.diff(signs))) if signs.size else 0
            rows.append(
                {
                    "asset_id": asset_id,
                    "channels": data.shape[1] if data.ndim == 2 else 1,
                    "n_samples": n_frames,
                    "duration": round(n_frames / rate, 6),
                    "rms": round(float(np.sqrt(np.mean(mono**2))), 6)
                    if mono.size
                    else 0.0,
                    "peak": round(float(np.max(np.abs(mono))), 6)
                    if mono.size
                    else 0.0,
                    "zcr": round(zc / max(n_frames, 1), 6),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "channels",
                "n_samples",
                "duration",
                "rms",
                "peak",
                "zcr",
            ],
        )


def audio_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(_audio_features, schema=AUDIO_FEATURE_SCHEMA)


#: the audit queries take the N lowest doc_ids (ORDER BY, not bare
#: LIMIT — the row set must be deterministic for the oracle compare)
_AUDIT_IDS_SQL = (
    "doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {n})"
)


def _audit_ids(spark: SparkSession, n: int) -> DataFrame:
    return (
        spark.table("documents").select("doc_id").orderBy("doc_id").limit(n)
    )


@register(
    "q_audio_features",
    oracle=f"""
SELECT doc_id AS asset_id,
       CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS INTEGER)
         AS channels,
       CAST(400 + (doc_id % 8) * 160 AS BIGINT) AS n_samples,
       ROUND((400 + (doc_id % 8) * 160) / 8000.0, 6) AS duration,
       CAST(1 AS INTEGER) AS features_ok
FROM documents
WHERE {_AUDIT_IDS_SQL.format(n=64)}
""",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio path on REAL samples, audited: one generated
    tone per document row, rotated across PCM16/24, G.711 μ-law/A-law,
    IEEE float and AIFF → pure-Python decode → RMS/peak/zero-crossing
    features (``audio_features``). The asset generator is a
    deterministic function of the id, so DuckDB re-derives the
    CONTAINER contract exactly — channel count, sample count, duration
    — certifying the encode → header-probe round-trip per codec; the
    sample math is certified in-engine by ``features_ok``: a silent
    asset (id % 7 == 3) must report rms = peak = zcr = 0, every other
    tone must report 0 < rms ≤ peak ≤ 1 and a positive crossing rate.
    Raw feature rows stay available as ``audio_features``; exact codec
    round-trips are pinned in tests/test_codec_properties.py and
    tests/test_audio_codecs.py."""
    feats = audio_features(
        synthetic_wav_assets(spark, ids=_audit_ids(spark, 64))
    )
    silent = F.col("asset_id") % 7 == 3
    # A-law cannot represent exact zero — silence decodes to a constant
    # ±1/4096 (~0.000244), so the silent bound is the A-law floor, and
    # the constant sign still yields zero crossings
    ok = F.when(
        silent,
        (F.col("peak") <= 1.0 / 4096 + 1e-9)
        & (F.col("rms") <= F.col("peak"))
        & (F.col("zcr") == 0),
    ).otherwise(
        (F.col("rms") > 0)
        & (F.col("rms") <= F.col("peak"))
        & (F.col("peak") <= 1.0)
        & (F.col("zcr") > 0)
    )
    return feats.select(
        "asset_id",
        "channels",
        "n_samples",
        "duration",
        ok.cast("int").alias("features_ok"),
    )


@register(
    "q_multimodal_decode",
    oracle=f"""
SELECT doc_id AS asset_id,
       CAST(8 + doc_id % 9 AS INTEGER) AS height,
       CAST(8 + (doc_id * 3) % 9 AS INTEGER) AS width,
       CAST(3 AS INTEGER) AS channels,
       CAST(1 AS INTEGER) AS decode_ok
FROM documents
WHERE {_AUDIT_IDS_SQL.format(n=64)}
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image path on REAL pixels, audited: one generated
    image per document row, rotated through all five real codecs (PNG
    every filter type, baseline+progressive JPEG in 4:4:4/4:2:0, GIF,
    BMP, TIFF) → pure-Python decode → nearest-neighbor resize →
    channel/thumbnail features (``image_features``). The generator is
    a deterministic function of the id, so DuckDB re-derives the
    DIMENSION contract exactly — height 8 + id % 9, width
    8 + 3·id % 9, 3 channels out of every codec — certifying each
    encode → decode round-trip got the geometry right; the pixel math
    is certified in-engine by ``decode_ok``: channel_mean must carry
    one in-range [0, 255] value per channel and the thumbnail exactly
    {THUMB}² in-range cells. Raw array features stay available as
    ``image_features``; bit-exact codec parity is pinned in
    tests/test_multimodal.py and tests/test_jpeg.py."""
    feats = image_features(
        synthetic_image_assets(spark, ids=_audit_ids(spark, 64))
    )
    in_range = lambda c: F.forall(  # noqa: E731
        F.col(c), lambda x: (x >= 0) & (x <= 255)
    )
    ok = (
        (F.size("channel_mean") == F.col("channels"))
        & in_range("channel_mean")
        & (F.size("thumb") == THUMB * THUMB)
        & in_range("thumb")
    )
    return feats.select(
        "asset_id",
        "height",
        "width",
        "channels",
        ok.cast("int").alias("decode_ok"),
    )


@register(
    "q_multimodal_features",
    oracle="""
SELECT doc_id AS asset_id,
       'application/x-fixture' AS mime,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(1 AS INTEGER) AS hist_ok,
       CAST(1 AS INTEGER) AS entropy_ok
FROM documents
WHERE text IS NOT NULL
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal pipeline, audited: binary assets →
    Arrow-batched byte-feature extraction (``extract_features``).
    DuckDB re-derives the asset inventory and exact payload byte
    counts (the fixture payload is the document's utf-8 bytes); the
    batch-path math is certified in-engine —

    - ``hist_ok``: the 4-bucket byte histogram is a probability
      vector: every bucket in [0, 1] and the buckets sum to 1 within
      the declared per-bucket rounding (4 × 5e-7);
    - ``entropy_ok``: Shannon entropy within its hard bounds
      [0, 8] bits for byte-valued symbols.

    Raw histogram arrays stay available as ``extract_features``;
    determinism and schema are asserted in tests/test_multimodal.py."""
    feats = extract_features(synthetic_assets(spark))
    hist_sum = F.aggregate(
        "byte_hist", F.lit(0.0), lambda acc, x: acc + x
    )
    hist_ok = (
        (F.size("byte_hist") == 4)
        & F.forall("byte_hist", lambda x: (x >= 0) & (x <= 1))
        # an empty payload legitimately histograms to all-zero buckets
        # (the n = max(len, 1) divisor guard); otherwise a probability
        # vector within the declared per-bucket rounding
        & (
            (F.col("n_bytes") == 0)
            | (F.abs(hist_sum - 1.0) <= 4 * 5e-7)
        )
    )
    entropy_ok = (F.col("entropy") >= 0) & (F.col("entropy") <= 8)
    return feats.select(
        "asset_id",
        "mime",
        "n_bytes",
        hist_ok.cast("int").alias("hist_ok"),
        entropy_ok.cast("int").alias("entropy_ok"),
    )


# ---------------------------------------------------------------------
# video: MJPEG-AVI (container parse + per-frame JPEG decode)

VIDEO_FEATURE_SCHEMA = (
    "asset_id bigint, n_frames int, sampled int, height int, width int, "
    "fps double, brightness double, motion double"
)

#: frame-sampling stride for the featurizer (decode every k-th frame)
_FRAME_STRIDE = 3


def synthetic_video_assets(
    spark: SparkSession, n: int = 16, ids: DataFrame | None = None
) -> DataFrame:
    """Deterministic real-MJPEG-AVI assets: per asset_id a short clip
    (4–10 frames) of a moving gradient whose phase advances per frame,
    encoded with the pure-Python AVI/JPEG codecs. Executor-side
    generation — the driver never holds payloads."""
    from pyanamo_spark.multimodal.avi import encode_avi

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                i = int(asset_id)
                t = 4 + i % 7
                h = 16 + (i % 3) * 8
                w = 16 + ((i * 5) % 3) * 8
                yy, xx = np.mgrid[0:h, 0:w]
                frames = np.stack(
                    [
                        np.stack(
                            [
                                (yy * 4 + f * 16 + i) % 256,
                                (xx * 4) % 256,
                                ((yy + xx) * 2 + f * 8) % 256,
                            ],
                            axis=-1,
                        )
                        for f in range(t)
                    ]
                ).astype(np.uint8)
                payload = encode_avi(frames, fps=5 + i % 10, quality=90)
                rows.append(
                    {
                        "asset_id": i,
                        "payload": payload,
                        "meta": {
                            "mime": "video/avi",
                            "n_bytes": len(payload),
                            "n_frames": t,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    base = ids.toDF("id") if ids is not None else spark.range(n)
    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def _video_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Container probe → strided frame decode → clip features.

    The probe reads frame byte-ranges from the AVI index, so only the
    sampled frames are ever JPEG-decoded — at corpus scale the stride
    is the knob that makes hour-long clips affordable. Features:
    per-clip mean brightness and mean inter-(sampled-)frame absolute
    difference (motion proxy), whole-clip numpy ops only."""
    from pyanamo_spark.multimodal.avi import decode_avi, probe_avi

    for pdf in batches:
        rows = []
        for asset_id, payload, meta in zip(
            pdf["asset_id"], pdf["payload"], pdf["meta"]
        ):
            if payload is None or meta["mime"] != "video/avi":
                continue
            raw = bytes(payload)
            info = probe_avi(raw)
            clip = decode_avi(raw, every=_FRAME_STRIDE).astype(np.float64)
            motion = (
                float(np.mean(np.abs(np.diff(clip, axis=0))))
                if clip.shape[0] > 1
                else 0.0
            )
            rows.append(
                {
                    "asset_id": asset_id,
                    "n_frames": info["n_frames"],
                    "sampled": clip.shape[0],
                    "height": info["height"],
                    "width": info["width"],
                    "fps": round(1e6 / info["usec_per_frame"], 3),
                    "brightness": round(float(clip.mean()), 6),
                    "motion": round(motion, 6),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "n_frames", "sampled", "height", "width",
                "fps", "brightness", "motion",
            ],
        )


def video_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(_video_features, schema=VIDEO_FEATURE_SCHEMA)


@register(
    "q_video_frames",
    oracle=f"""
SELECT doc_id AS asset_id,
       CAST(4 + doc_id % 7 AS INTEGER) AS n_frames,
       CAST(CEIL((4 + doc_id % 7) / {float(_FRAME_STRIDE)}) AS INTEGER)
         AS sampled,
       CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
       CAST(16 + ((doc_id * 5) % 3) * 8 AS INTEGER) AS width,
       CAST(5 + doc_id % 10 AS DOUBLE) AS fps,
       CAST(1 AS INTEGER) AS decode_ok
FROM documents
WHERE {_AUDIT_IDS_SQL.format(n=16)}
""",
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end video path on REAL frames, audited: one generated
    MJPEG-AVI clip per document row → container probe → strided frame
    decode (skipped frames never touch the JPEG decoder) →
    brightness/motion features (``video_features``). The generator is
    a deterministic function of the id, so DuckDB re-derives the
    CONTAINER contract exactly — frame count 4 + id % 7, the
    every-{_FRAME_STRIDE}rd sampling count, geometry, and the header
    fps — certifying the AVI encode → probe round-trip; the pixel
    math is certified in-engine by ``decode_ok``: brightness within
    [0, 255] and, because every clip is a MOVING gradient, strictly
    positive motion whenever ≥ 2 frames were sampled. Raw
    brightness/motion rows stay available as ``video_features``;
    frame-exact decode parity is pinned in tests/test_avi.py."""
    feats = video_features(
        synthetic_video_assets(spark, ids=_audit_ids(spark, 16))
    )
    ok = (
        (F.col("brightness") >= 0)
        & (F.col("brightness") <= 255)
        & F.when(F.col("sampled") >= 2, F.col("motion") > 0).otherwise(
            F.col("motion") == 0
        )
    )
    return feats.select(
        "asset_id",
        "n_frames",
        "sampled",
        "height",
        "width",
        "fps",
        ok.cast("int").alias("decode_ok"),
    )
