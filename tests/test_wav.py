"""Pure-stdlib WAV decoder + the real multimodal audio backend. The stdlib
`wave` writer is the independent oracle for golden samples."""

import io
import struct
import wave

import numpy as np
import pytest

from lse.wav import decode_wav, probe_wav


def _wav_bytes(samples_i16: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


def test_golden_sine_roundtrip():
    t = np.arange(800)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int64)
    data = _wav_bytes(sine, rate=16000, channels=1)
    samples, rate = decode_wav(data)
    assert rate == 16000 and samples.shape == (800, 1)
    np.testing.assert_allclose(samples[:, 0], sine / 32768.0, atol=1e-12)
    assert probe_wav(data) == (16000, 1, 800)


def test_stereo_interleave():
    left = np.full(100, 1000, dtype=np.int64)
    right = np.full(100, -2000, dtype=np.int64)
    inter = np.empty(200, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    samples, rate = decode_wav(_wav_bytes(inter, rate=8000, channels=2))
    assert samples.shape == (100, 2)
    np.testing.assert_allclose(samples[:, 0], 1000 / 32768.0)
    np.testing.assert_allclose(samples[:, 1], -2000 / 32768.0)


def test_float32_and_8bit():
    # hand-build float32 + 8-bit PCM files
    def riff(fmt_tag, ch, rate, bits, payload):
        fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch * bits // 8,
                          ch * bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    f32 = np.array([0.5, -0.25, 1.0], dtype="<f4")
    s, r = decode_wav(riff(3, 1, 44100, 32, f32.tobytes()))
    np.testing.assert_allclose(s[:, 0], f32.astype(np.float64))
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    s, r = decode_wav(riff(1, 1, 8000, 8, u8.tobytes()))
    np.testing.assert_allclose(s[:, 0], [(0 - 128) / 128, 0.0, 127 / 128])


def test_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="unsupported audio format"):
        # fmt tag 2 (ADPCM) must be refused loudly
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
        data = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 0))
        decode_wav(data)


def test_audio_features_real_backend(spark):
    from lse.multimodal import AUDIO_SCHEMA, audio_features

    rows = []
    for i in range(4):
        n = 400 + 100 * i
        sig = (np.sin(np.arange(n) * 0.1 * (i + 1)) * 10000).astype(np.int64)
        rows.append((i, bytearray(_wav_bytes(sig, rate=8000)), (8000, 1, n * 1000 // 8000)))
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    got = audio_features(df, backend="real").toPandas().set_index("id").sort_index()
    assert len(got) == 4
    for i in range(4):
        n = 400 + 100 * i
        assert got.loc[i, "n_frames"] == n
        assert got.loc[i, "sample_rate"] == 8000
        assert got.loc[i, "duration_ms"] == round(n * 1000 / 8000)
        sig = (np.sin(np.arange(n) * 0.1 * (i + 1)) * 10000).astype(np.int64) / 32768.0
        assert got.loc[i, "rms"] == pytest.approx(float(np.sqrt((sig ** 2).mean())), abs=1e-9)


def test_audio_features_fake_deterministic(spark):
    from lse.multimodal import AUDIO_SCHEMA, audio_features

    rows = [(i, bytearray(bytes([i] * 64)), (8000, 1, 10)) for i in range(3)]
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    a = audio_features(df, backend="fake").toPandas().sort_values("id")
    b = audio_features(df, backend="fake").toPandas().sort_values("id")
    assert a.equals(b)
