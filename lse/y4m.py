"""Pure-stdlib YUV4MPEG2 (.y4m) video codec: header parse + frame split +
numpy plane views — no ffmpeg.

Scope: canonical Y4M streams (the uncompressed interchange format ffmpeg
itself emits with ``-f yuv4mpeg``) with C420/C422/C444/Cmono colorspaces.
Anything else (compressed containers, malformed headers) raises ValueError
— a 100-TB pipeline wants loud skips routed to quarantine, not fabricated
frames. Completes the multimodal trio alongside lse.png and lse.wav; the
reference engine has no video path — this exists for the training-data
pipeline dimension.

Stream layout: ``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A1:1] [C420...]\\n``
then per frame ``FRAME[ params]\\n`` followed by the raw planes (Y then Cb
then Cr at the colorspace's subsampling).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

_MAGIC = b"YUV4MPEG2"

# colorspace tag prefix -> (chroma_x_div, chroma_y_div); mono has no chroma
_CHROMA_DIV = {
    "C420": (2, 2),  # covers C420, C420jpeg, C420paldv, C420mpeg2
    "C422": (2, 1),
    "C444": (1, 1),
}


class Y4MInfo:
    __slots__ = ("width", "height", "fps_num", "fps_den", "colorspace",
                 "frame_bytes", "data_start")

    def __init__(self, width, height, fps_num, fps_den, colorspace,
                 frame_bytes, data_start):
        self.width = width
        self.height = height
        self.fps_num = fps_num
        self.fps_den = fps_den
        self.colorspace = colorspace
        self.frame_bytes = frame_bytes
        self.data_start = data_start

    @property
    def fps(self) -> float:
        return self.fps_num / self.fps_den if self.fps_den else 0.0


def _parse_header(data: bytes) -> Y4MInfo:
    nl = data.find(b"\n", 0, 2048)
    if not data.startswith(_MAGIC) or nl < 0:
        raise ValueError("y4m: bad YUV4MPEG2 signature")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "C420"
    for tok in data[len(_MAGIC):nl].split(b" "):
        tok = tok.decode("ascii", "replace")
        if not tok:
            continue
        try:
            if tok[0] == "W":
                width = int(tok[1:])
            elif tok[0] == "H":
                height = int(tok[1:])
            elif tok[0] == "F":
                num, den = tok[1:].split(":")
                fps_num, fps_den = int(num), int(den)
            elif tok[0] == "C":
                colorspace = tok
        except ValueError as exc:
            raise ValueError(f"y4m: malformed header token {tok!r}") from exc
    if not width or not height or width <= 0 or height <= 0:
        raise ValueError("y4m: missing/invalid W or H")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("y4m: non-positive frame rate")
    y = width * height
    if colorspace.startswith("Cmono"):
        fb = y
    else:
        div = _CHROMA_DIV.get(colorspace[:4])
        if div is None:
            raise ValueError(f"y4m: unsupported colorspace {colorspace}")
        cw = -(-width // div[0])   # ceil division for odd dimensions
        ch = -(-height // div[1])
        fb = y + 2 * cw * ch
    return Y4MInfo(width, height, fps_num, fps_den, colorspace, fb, nl + 1)


def probe_y4m(data: bytes) -> Tuple[int, int, float, int]:
    """(width, height, fps, n_frames) from the headers — frames are counted
    by walking FRAME markers (their parameter tails vary per frame, so size
    arithmetic alone is not enough)."""
    info = _parse_header(data)
    n = 0
    pos = info.data_start
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"y4m: expected FRAME marker at offset {pos}")
        nl = data.find(b"\n", pos, pos + 1024)
        if nl < 0:
            raise ValueError("y4m: unterminated FRAME header")
        pos = nl + 1 + info.frame_bytes
        if pos > len(data):
            raise ValueError("y4m: truncated frame payload")
        n += 1
    return info.width, info.height, info.fps, n


def decode_y4m(
    data: bytes, indices: Optional[List[int]] = None
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_idx, Y plane uint8 array of shape (h, w)) for the
    requested frame indices (all frames when None). Only the luma plane is
    materialized — the feature/thumbnail path; chroma stays in the buffer."""
    info = _parse_header(data)
    want = set(indices) if indices is not None else None
    idx = 0
    pos = info.data_start
    y_size = info.width * info.height
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"y4m: expected FRAME marker at offset {pos}")
        nl = data.find(b"\n", pos, pos + 1024)
        if nl < 0:
            raise ValueError("y4m: unterminated FRAME header")
        start = nl + 1
        end = start + info.frame_bytes
        if end > len(data):
            raise ValueError("y4m: truncated frame payload")
        if want is None or idx in want:
            yield idx, np.frombuffer(
                data[start : start + y_size], dtype=np.uint8
            ).reshape(info.height, info.width)
        pos = end
        idx += 1


def encode_y4m(
    frames: List[np.ndarray],
    fps: Tuple[int, int] = (25, 1),
    colorspace: str = "C420jpeg",
) -> bytes:
    """Test/fixture helper: pack luma frames (h, w) uint8 into a Y4M stream
    (chroma planes filled with the neutral value 128)."""
    if not frames:
        raise ValueError("y4m encode: no frames")
    h, w = frames[0].shape
    if colorspace.startswith("Cmono"):
        chroma = b""
    else:
        div = _CHROMA_DIV[colorspace[:4]]
        cw, ch = -(-w // div[0]), -(-h // div[1])
        chroma = bytes([128]) * (2 * cw * ch)
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
           .encode("ascii")]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("y4m encode: inconsistent frame shapes")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)
