# -*- coding: utf-8 -*-
"""Minimal deterministic audio codec (PCM WAV), stdlib ``wave`` + numpy.

Companion to ``functions.imaging``: gives the multimodal seam a REAL
decode path for audio payloads without any third-party audio library.
16-bit PCM only — the subset the synthetic pipeline produces; a production
deployment swaps this for libsndfile/ffmpeg behind the same function.
Pure functions of the input bytes.
"""

from __future__ import annotations

import io
import wave
from typing import Tuple

import numpy as np


class AudioDecodeError(ValueError):
    """Malformed or unsupported audio payload."""


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples of shape (n_frames, channels), rate)."""
    if not data.startswith(b"RIFF"):
        raise AudioDecodeError("not a WAV payload (bad RIFF header)")
    try:
        with wave.open(io.BytesIO(data), "rb") as handle:
            if handle.getsampwidth() != 2:
                raise AudioDecodeError(
                    f"unsupported WAV sample width {handle.getsampwidth()}"
                )
            channels = handle.getnchannels()
            rate = handle.getframerate()
            frames = handle.readframes(handle.getnframes())
    except wave.Error as error:
        raise AudioDecodeError(f"malformed WAV payload: {error}") from None
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n_frames,) or (n_frames, channels) → WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buffer = io.BytesIO()
    with wave.open(buffer, "wb") as handle:
        handle.setnchannels(arr.shape[1])
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(arr.tobytes())
    return buffer.getvalue()
