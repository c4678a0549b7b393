"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

All three modalities have REAL pure-stdlib decode lanes — no PIL, no
torchaudio, no ffmpeg:

* image: PNG via lse.png (zlib inflate + numpy unfiltering;
  golden-pixel tested);
* audio: RIFF/PCM WAV via lse.wav (struct header parse + numpy sample
  view; golden tested vs stdlib wave);
* video: YUV4MPEG2 via lse.y4m (header parse + FRAME walk + luma plane
  views; golden-frame tested).

Out-of-scope payloads (JPEG, MP3, MP4, …) raise ValueError — the loud-skip
contract: a pipeline routes those rows to a quarantine sink, never silently
fabricates media. ``backend='fake'`` keeps the deterministic seeded
stand-ins used by the pipeline-contract tests and the driver's
golden-fixture oracles.

Schemas:
  image: (id long, payload binary, meta struct<width:int, height:int,
         format:string>)
  audio: (id long, payload binary, meta struct<sample_rate:int,
         channels:int, duration_ms:long>)
  video: (id long, payload binary, meta struct<width:int, height:int,
         fps:double, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

_FEATURE_DIM = 16


def _payload_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


def _decode_image(payload: bytes, backend: str) -> np.ndarray:
    """Decode to an HxWx3 uint8 array.

    'real' decodes PNG bytes with the pure-stdlib codec (lse.png: zlib
    inflate + numpy unfiltering — no PIL needed); non-PNG payloads raise
    ValueError (loud skip — a pipeline routes those rows to a quarantine
    sink, never silently fabricates pixels). 'fake' runs the deterministic
    stand-in used by the pipeline-contract tests."""
    if backend == "real":
        from .png import decode_png

        img = decode_png(bytes(payload))
        if img.shape[2] == 1:  # grayscale → replicate
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 2:  # gray+alpha → replicate luma
            img = np.repeat(img[:, :, :1], 3, axis=2)
        elif img.shape[2] == 4:  # RGBA → drop alpha
            img = img[:, :, :3]
        return img
    rng = _payload_rng(payload)
    h, w = int(rng.integers(8, 32)), int(rng.integers(8, 32))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_features(
    df: DataFrame, backend: str = "fake", batch_col: str = "payload"
) -> DataFrame:
    """(id, feature array<double>[16], width, height) — decode + pooled
    feature extraction per Arrow batch."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for i, payload in zip(pdf["id"], pdf[batch_col]):
                img = _decode_image(bytes(payload), backend)
                h, w, _ = img.shape
                # channel-wise pooled stats → fixed 16-dim feature
                flat = img.reshape(-1, 3).astype(np.float64)
                feat = np.concatenate(
                    [
                        flat.mean(axis=0),
                        flat.std(axis=0),
                        np.percentile(flat, [25, 50, 75], axis=0).ravel(),
                        [float(h)],
                    ]
                )[:_FEATURE_DIM]
                feat = np.pad(feat, (0, max(0, _FEATURE_DIM - feat.size)))
                ids.append(i)
                feats.append(feat.tolist())
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"id": ids, "feature": feats, "width": ws, "height": hs}
            )

    return df.select("id", batch_col).mapInPandas(run, schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def _decode_audio(payload: bytes, backend: str):
    """→ (samples float64 (n, ch) in [-1,1], sample_rate). 'real' decodes
    RIFF/PCM WAV with the pure-stdlib codec (lse.wav); non-WAV payloads
    raise ValueError (loud skip). 'fake' is the deterministic stand-in."""
    if backend == "real":
        from .wav import decode_wav

        return decode_wav(bytes(payload))
    rng = _payload_rng(payload)
    n = int(rng.integers(64, 512))
    ch = int(rng.integers(1, 3))
    return rng.uniform(-1.0, 1.0, size=(n, ch)), 8000


def audio_features(
    df: DataFrame, backend: str = "fake", batch_col: str = "payload"
) -> DataFrame:
    """(id, sample_rate, channels, n_frames, duration_ms, rms, zcr) — decode
    + per-clip summary features, Arrow-batched. rms over the mono mix; zcr
    = zero-crossing fraction of the mono mix."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = {k: [] for k in
                   ("id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "rms", "zcr")}
            for i, payload in zip(pdf["id"], pdf[batch_col]):
                samples, rate = _decode_audio(bytes(payload), backend)
                mono = samples.mean(axis=1)
                n = mono.size
                out["id"].append(int(i))
                out["sample_rate"].append(int(rate))
                out["channels"].append(int(samples.shape[1]))
                out["n_frames"].append(n)
                out["duration_ms"].append(int(round(n * 1000.0 / rate)))
                out["rms"].append(float(np.sqrt((mono ** 2).mean())) if n else 0.0)
                out["zcr"].append(
                    float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
                    if n > 1
                    else 0.0
                )
            yield pd.DataFrame(out)

    return df.select("id", batch_col).mapInPandas(run, schema)


def image_resize_meta(df: DataFrame, max_side: int = 16, backend: str = "fake") -> DataFrame:
    """(id, new_width, new_height): the resize plan (aspect-preserving) —
    decode + resize stub returning target geometry."""
    schema = "id long, new_width int, new_height int"

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            ids, nw, nh = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                img = _decode_image(bytes(payload), backend)
                h, w, _ = img.shape
                scale = min(1.0, max_side / max(h, w))
                ids.append(i)
                nw.append(max(1, int(w * scale)))
                nh.append(max(1, int(h * scale)))
            yield pd.DataFrame({"id": ids, "new_width": nw, "new_height": nh})

    return df.select("id", "payload").mapInPandas(run, schema)


def video_frame_sample(
    df: DataFrame, every_n: int = 10, backend: str = "fake"
) -> DataFrame:
    """(id, frame_idx) — every_n-th frame sampling plan.

    'real' probes YUV4MPEG2 (.y4m) payloads with the pure-stdlib codec
    (lse.y4m — header parse + FRAME walk, no ffmpeg); non-Y4M payloads
    raise ValueError (loud skip → quarantine, like the PNG/WAV lanes).
    'fake' keeps the deterministic stand-in for contract tests."""
    schema = "id long, frame_idx int"

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            ids, fidx = [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if backend == "real":
                    from .y4m import probe_y4m

                    _w, _h, _fps, n_frames = probe_y4m(bytes(payload))
                else:
                    n_frames = int(_payload_rng(bytes(payload)).integers(1, 300))
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    fidx.append(f)
            yield pd.DataFrame({"id": ids, "frame_idx": pd.Series(fidx, dtype="int32")})

    return df.select("id", "payload").mapInPandas(run, schema)


def video_features(
    df: DataFrame, every_n: int = 10, backend: str = "real"
) -> DataFrame:
    """(id, width, height, fps, n_frames, sampled_frames, y_mean, y_std) —
    real Y4M decode: luma statistics over the every_n-th frames, proving
    the pixel path end-to-end (golden-frame tested). Arrow-batched; only
    sampled frames' luma planes are materialized."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("fps", T.DoubleType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("sampled_frames", T.IntegerType()),
            T.StructField("y_mean", T.DoubleType()),
            T.StructField("y_std", T.DoubleType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]):
        from .y4m import decode_y4m, probe_y4m

        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "fps", "n_frames",
                                   "sampled_frames", "y_mean", "y_std")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                if backend == "fake":
                    rng = _payload_rng(data)
                    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
                    nf = int(rng.integers(1, 300))
                    frames = [rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                              for _ in range(0, nf, every_n)]
                    fps = 25.0
                else:
                    w, h, fps, nf = probe_y4m(data)
                    want = list(range(0, nf, every_n))
                    frames = [y for _idx, y in decode_y4m(data, want)]
                luma = (
                    np.concatenate([f.ravel() for f in frames]).astype(np.float64)
                    if frames
                    else np.empty(0, dtype=np.float64)
                )  # a header-only (0-frame) stream is valid: stats are 0
                out["id"].append(int(i))
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(float(fps))
                out["n_frames"].append(nf)
                out["sampled_frames"].append(len(frames))
                out["y_mean"].append(float(luma.mean()) if luma.size else 0.0)
                out["y_std"].append(float(luma.std()) if luma.size else 0.0)
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32",
                 "n_frames": "int32", "sampled_frames": "int32"}
            )

    return df.select("id", "payload").mapInPandas(run, schema)


def make_fake_image_table(spark, n: int = 20, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8))
        rows.append((i, payload, (int(rng.integers(8, 32)), int(rng.integers(8, 32)), "png")))
    return spark.createDataFrame(rows, IMAGE_SCHEMA)
