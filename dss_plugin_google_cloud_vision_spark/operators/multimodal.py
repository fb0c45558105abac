# -*- coding: utf-8 -*-
"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the in-table equivalent of the reference's folder-of-blobs model
(reference: python-lib/document_utils.py blob streams; SURVEY.md §1.1
"Files as blobs"). The Spark-side plumbing here is real and tested: Arrow
batch iteration (``mapInPandas``), schema contracts, per-batch vectorized
NumPy feature extraction, deterministic frame sampling, error-column
capture for undecodable payloads.

Codec status (the honest seam):

- **Images are decoded for REAL**: PNG and binary PPM via
  ``functions.imaging`` (stdlib zlib + numpy — full chunk/CRC walk and
  scanline unfiltering; the role PIL plays in the reference's
  document_utils.py:98-129). Features come from actual pixel values.
- **Audio is decoded for REAL**: 16-bit PCM WAV via ``functions.audio``
  (stdlib ``wave``). Features come from actual sample values.
- Video frame decode remains STUBBED — no video library in this
  environment. With ``strict=True`` a video row raises
  ``NotImplementedError`` ("plug a real decoder here"); by default video
  falls back to a *deterministic fake decode* (byte-level statistics
  standing in for frame data) so pipelines, schemas and batch shapes stay
  exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime: string, width: int, height: int, duration_ms: int>"
)

FEATURE_BINS = 16

DECODE_STUB_NOTE = (
    "video decode is stubbed in this environment: plug a real decoder "
    "(ffmpeg) into the strict path; the deterministic fake keeps schemas, "
    "batch shapes and downstream plumbing real (images decode for real via "
    "functions.imaging, audio via functions.audio)"
)


def synthetic_audio_samples(i: int, seed: int = 42, n_frames: int = 2048) -> np.ndarray:
    """Deterministic int16 mono waveform, a pure function of (seed, id):
    a quantized integer chirp-ish pattern (no float trig — bit-exact on
    any platform)."""
    t = np.arange(n_frames, dtype=np.int64)
    wave_ = ((t * (31 + (i % 13)) + seed) % 65536) - 32768
    return (wave_ // 2).astype(np.int16)


def synthetic_image_pixels(i: int, seed: int = 42) -> np.ndarray:
    """Deterministic small RGB image, a pure function of (seed, id)."""
    height, width = 16 + (i % 6) * 4, 24 + (i % 8) * 4
    y, x, c = np.ogrid[0:height, 0:width, 0:3]
    return ((seed + i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def synthetic_media_df(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: image payloads are REAL encoded PNGs
    (every third one a binary PPM) of ``synthetic_image_pixels``; audio
    payloads are REAL 16-bit PCM WAVs of ``synthetic_audio_samples``;
    video payloads are opaque deterministic byte blobs; all pure functions
    of (seed, id)."""
    from ..functions.audio import encode_wav
    from ..functions.imaging import encode_png, encode_ppm

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            pixels = synthetic_image_pixels(i, seed)
            payload = encode_ppm(pixels) if i % 9 == 0 else encode_png(pixels)
            mime = "image/x-portable-pixmap" if i % 9 == 0 else "image/png"
            meta = {"mime": mime, "width": pixels.shape[1], "height": pixels.shape[0],
                    "duration_ms": None}
        elif kind == "audio":
            samples = synthetic_audio_samples(i, seed)
            payload = encode_wav(samples, rate=16000)
            meta = {
                "mime": "audio/wav",
                "width": None,
                "height": None,
                "duration_ms": int(len(samples) * 1000 / 16000),
            }
        else:
            # deterministic pseudo-random payload, 256..4096 bytes
            size = 256 + ((i * 2654435761 + seed) % 3841)
            payload = bytes((j * 31 + i * 7 + seed) % 256 for j in range(size))
            meta = {
                "mime": "video/mp4",
                "width": 64 + (i % 8) * 16,
                "height": 48 + (i % 6) * 16,
                "duration_ms": 1000 + i * 250,
            }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_DDL)


def _fake_decode(payload: bytes, n_bins: int = FEATURE_BINS) -> np.ndarray:
    """Deterministic fake 'decode': normalized byte-value histogram.
    Stands in for pixel/sample data; pure function of the payload."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty media payload")
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
    return (hist / len(arr)).astype(np.float64)


def _pixel_histogram(pixels: np.ndarray, n_bins: int) -> np.ndarray:
    hist, _ = np.histogram(pixels.reshape(-1), bins=n_bins, range=(0, 256))
    return (hist / pixels.size).astype(np.float64)


def extract_media_features(
    df: DataFrame,
    payload_column: str = "payload",
    kind_column: str = "kind",
    n_bins: int = FEATURE_BINS,
    strict: bool = False,
) -> DataFrame:
    """payload → fixed-width feature vector (``array<double>``) + error
    columns, via ``mapInPandas`` (Arrow-batched, NumPy inside).

    Image rows are decoded for REAL (PNG/PPM, ``functions.imaging``) and
    featurized over actual pixel values; audio rows likewise (PCM WAV,
    ``functions.audio`` — 16-bit samples mapped onto the same byte-valued
    histogram bins); undecodable payloads land in ``feature_error``.
    Video rows use the deterministic byte-statistics fake by default; with
    ``strict=True`` they raise ``NotImplementedError`` — the marked seam
    where a real video decoder goes (see DECODE_STUB_NOTE).
    """
    from ..functions.audio import AudioDecodeError, decode_wav
    from ..functions.imaging import ImageDecodeError, decode_image

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, features array<double>, feature_error string"

    def process(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = []
            errors = []
            for payload, kind in zip(pdf[payload_column], pdf[kind_column]):
                try:
                    if kind == "image":
                        pixels, _codec = decode_image(bytes(payload or b""))
                        features.append(_pixel_histogram(pixels, n_bins).tolist())
                    elif kind == "audio":
                        samples, _rate = decode_wav(bytes(payload or b""))
                        # int16 → the byte-valued bin domain shared with
                        # images: (s + 32768) >> 8 is exactly 0..255
                        as_bytes = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)
                        features.append(_pixel_histogram(as_bytes, n_bins).tolist())
                    elif strict:
                        raise NotImplementedError(DECODE_STUB_NOTE)
                    else:
                        features.append(_fake_decode(payload, n_bins).tolist())
                    errors.append("")
                except (ValueError, ImageDecodeError, AudioDecodeError) as error:
                    features.append(None)
                    errors.append(str(error))
            pdf = pdf.copy()
            pdf["features"] = features
            pdf["feature_error"] = errors
            yield pdf

    return df.mapInPandas(process, schema)


def sample_video_frames(
    df: DataFrame,
    payload_column: str = "payload",
    n_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Deterministic frame sampling: emits one row per sampled frame with
    byte offsets evenly spaced through the payload (what a real sampler
    does with timestamps). 1→N fan-out inside ``mapInPandas`` — same shape
    as the PDF page explode."""
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, frame_index int, frame_offset bigint"

    def process(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(DECODE_STUB_NOTE)
        for pdf in batches:
            sizes = np.array(
                [len(p) if p is not None else 0 for p in pdf[payload_column]], dtype=np.int64
            )
            kept = pdf.loc[sizes > 0].reset_index(drop=True)
            if len(kept) == 0:
                continue
            sizes = sizes[sizes > 0]
            # vectorized 1→N fan-out: numpy repeat/tile instead of
            # row-at-a-time iterrows
            out = kept.loc[np.repeat(np.arange(len(kept)), n_frames)].reset_index(drop=True)
            frame_index = np.tile(np.arange(n_frames, dtype=np.int32), len(kept))
            out["frame_index"] = frame_index
            out["frame_offset"] = (np.repeat(sizes, n_frames) * frame_index) // n_frames
            yield out

    return df.mapInPandas(process, schema)


def resize_image_stub(
    df: DataFrame,
    payload_column: str = "payload",
    target_width: int = 224,
    target_height: int = 224,
    strict: bool = False,
) -> DataFrame:
    """Resize seam: records the target geometry and passes the payload
    through (a real implementation decodes + resamples + re-encodes).
    Kept as a column expression so the stub costs nothing at scale."""
    if strict:
        raise NotImplementedError(DECODE_STUB_NOTE)
    return df.withColumn(
        "resized_meta",
        F.struct(
            F.lit(target_width).alias("width"),
            F.lit(target_height).alias("height"),
            F.length(F.col(payload_column)).alias("source_bytes"),
        ),
    )
