"""Pure-stdlib WAV (RIFF/PCM) decoder: struct header parse + numpy sample
view — no torchaudio/ffmpeg.

Scope: canonical RIFF/WAVE files with PCM integer (8/16/32-bit) or IEEE
float32 samples, any channel count. Everything else (compressed codecs,
broken headers) raises ValueError — a 100-TB pipeline wants loud skips
routed to quarantine, not fabricated audio.

Backs the multimodal audio operators (lse.multimodal.audio_features); the
reference engine has no audio path — this exists for the training-data
pipeline dimension.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped (n_frames, channels),
    sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise ValueError("wav: zero channels")
    if rate <= 0:
        # a malformed fmt chunk must be a per-row loud skip (ValueError →
        # quarantine), not a ZeroDivisionError that kills the Spark task
        raise ValueError("wav: non-positive sample rate")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            samples = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            samples = (
                np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
            )
        else:
            raise ValueError(f"wav: unsupported PCM bit depth {bits}")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        samples = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"wav: unsupported audio format {audio_fmt}/{bits}-bit")
    n = samples.size - (samples.size % channels)
    return samples[:n].reshape(-1, channels), int(rate)


def probe_wav(data: bytes) -> Tuple[int, int, int]:
    """(sample_rate, channels, n_frames) from headers only."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE signature")
    pos = 12
    rate = channels = bits = None
    data_size = 0
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _f, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if rate is None:
        raise ValueError("wav: missing fmt chunk")
    if rate <= 0 or channels < 1:
        raise ValueError("wav: malformed fmt chunk (rate/channels)")
    frames = data_size // max(1, channels * (bits // 8))
    return int(rate), int(channels), int(frames)
