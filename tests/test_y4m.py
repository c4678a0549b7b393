"""Golden-frame tests for the pure-stdlib Y4M codec (lse.y4m) and the real
video operators (multimodal.video_frame_sample / video_features)."""

import numpy as np
import pytest

from lse.y4m import decode_y4m, encode_y4m, probe_y4m


def _gradient_frames(n=7, h=12, w=16):
    frames = []
    for k in range(n):
        y, x = np.mgrid[0:h, 0:w]
        frames.append(((x * 3 + y * 5 + k * 11) % 256).astype(np.uint8))
    return frames


def test_probe_and_decode_roundtrip():
    frames = _gradient_frames()
    data = encode_y4m(frames, fps=(30, 1))
    w, h, fps, n = probe_y4m(data)
    assert (w, h, n) == (16, 12, 7)
    assert fps == pytest.approx(30.0)
    decoded = dict(decode_y4m(data))
    assert sorted(decoded) == list(range(7))
    for i, f in enumerate(frames):  # golden pixels, bit-exact
        assert np.array_equal(decoded[i], f)


def test_decode_selected_indices_only():
    frames = _gradient_frames(n=10)
    data = encode_y4m(frames)
    got = dict(decode_y4m(data, [0, 4, 8]))
    assert sorted(got) == [0, 4, 8]
    assert np.array_equal(got[4], frames[4])


@pytest.mark.parametrize("colorspace,mult", [
    ("C420jpeg", 1.5), ("C422", 2.0), ("C444", 3.0), ("Cmono", 1.0),
])
def test_colorspace_frame_sizes(colorspace, mult):
    frames = _gradient_frames(n=3, h=8, w=8)
    data = encode_y4m(frames, colorspace=colorspace)
    w, h, _fps, n = probe_y4m(data)
    assert (w, h, n) == (8, 8, 3)
    assert np.array_equal(dict(decode_y4m(data))[2], frames[2])


def test_odd_dimensions_ceil_chroma():
    frames = _gradient_frames(n=2, h=5, w=7)  # odd w/h: chroma ceils
    data = encode_y4m(frames)
    assert probe_y4m(data)[3] == 2
    assert np.array_equal(dict(decode_y4m(data))[1], frames[1])


@pytest.mark.parametrize("bad", [
    b"", b"RIFFxxxxWAVE", b"YUV4MPEG2 W0 H4 F25:1\nFRAME\n",
    b"YUV4MPEG2 W4 H4 F0:1\nFRAME\n",
    b"YUV4MPEG2 W4 H4 F25:1 Cweird\nFRAME\n",
])
def test_malformed_raises_value_error(bad):
    with pytest.raises(ValueError):
        probe_y4m(bad)


def test_truncated_frame_raises():
    data = encode_y4m(_gradient_frames(n=2))
    with pytest.raises(ValueError):
        probe_y4m(data[:-5])


def test_video_frame_sample_real(spark):
    from lse.multimodal import video_frame_sample

    rows = []
    for i, n in enumerate([25, 3, 41]):
        rows.append((i, bytearray(encode_y4m(_gradient_frames(n=n)))))
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = video_frame_sample(df, every_n=10, backend="real").toPandas()
    got = {
        i: sorted(out[out["id"] == i]["frame_idx"]) for i in range(3)
    }
    assert got == {0: [0, 10, 20], 1: [0], 2: [0, 10, 20, 30, 40]}


def test_video_features_real_golden(spark):
    from lse.multimodal import video_features

    frames = [np.full((6, 8), v, dtype=np.uint8) for v in (10, 200, 30)]
    df = spark.createDataFrame(
        [(7, bytearray(encode_y4m(frames, fps=(24, 1))))],
        "id long, payload binary",
    )
    row = video_features(df, every_n=2, backend="real").collect()[0]
    # samples frames 0 and 2 -> luma mean (10+30)/2, std 10
    assert (row["width"], row["height"], row["n_frames"]) == (8, 6, 3)
    assert row["sampled_frames"] == 2
    assert row["fps"] == pytest.approx(24.0)
    assert row["y_mean"] == pytest.approx(20.0)
    assert row["y_std"] == pytest.approx(10.0)


def test_video_non_y4m_loud_skip(spark):
    from lse.multimodal import video_frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42 not a y4m"))],
        "id long, payload binary",
    )
    with pytest.raises(Exception) as ei:
        video_frame_sample(df, backend="real").collect()
    assert "ValueError" in str(ei.value) or "y4m" in str(ei.value)


def test_video_features_zero_frame_stream(spark):
    """A header-only Y4M (zero frames) is a valid stream: stats come back
    zeroed, the task must not fail."""
    from lse.multimodal import video_features

    header_only = b"YUV4MPEG2 W8 H6 F25:1 Ip A1:1 C420jpeg\n"
    df = spark.createDataFrame(
        [(1, bytearray(header_only))], "id long, payload binary"
    )
    row = video_features(df, backend="real").collect()[0]
    assert row["n_frames"] == 0 and row["sampled_frames"] == 0
    assert row["y_mean"] == 0.0 and row["y_std"] == 0.0
