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

The actual codec work (JPEG decode, audio resample, video frame decode) is
STUBBED — the image/audio libraries are not available in this environment.
Each stub is clearly marked: with ``strict=True`` it raises
``NotImplementedError`` ("plug a real decoder here"); by default it
computes a *deterministic fake decode* (byte-level statistics standing in
for pixel data) so pipelines, schemas, batch shapes and tests are
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
    "media decode is stubbed in this environment: plug a real decoder "
    "(PIL/libvips/ffmpeg) into decode_batch(); the deterministic fake keeps "
    "schemas, batch shapes and downstream plumbing real"
)


def synthetic_media_df(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    (seed, id); kind cycles image/audio/video."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        # deterministic pseudo-random payload, 256..4096 bytes
        size = 256 + ((i * 2654435761 + seed) % 3841)
        payload = bytes((j * 31 + i * 7 + seed) % 256 for j in range(size))
        meta = {
            "mime": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 48 + (i % 6) * 16 if kind != "audio" else None,
            "duration_ms": 1000 + i * 250 if kind != "image" else None,
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


def extract_media_features(
    df: DataFrame,
    payload_column: str = "payload",
    n_bins: int = FEATURE_BINS,
    strict: bool = False,
) -> DataFrame:
    """payload → fixed-width feature vector (``array<double>``) + error
    columns, via ``mapInPandas`` (Arrow-batched, vectorized NumPy inside).

    ``strict=True`` raises ``NotImplementedError`` — the marked seam where
    a real decoder goes (see DECODE_STUB_NOTE).
    """
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, features array<double>, feature_error string"

    def process(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(DECODE_STUB_NOTE)
        for pdf in batches:
            features = []
            errors = []
            for payload in pdf[payload_column]:
                try:
                    features.append(_fake_decode(payload, n_bins).tolist())
                    errors.append("")
                except ValueError as error:
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
