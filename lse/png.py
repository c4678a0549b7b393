"""Pure-stdlib PNG codec: zlib inflate + numpy unfiltering (no PIL).

Decoder scope — the common web/training-data cases: 8-bit samples, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced. Everything else raises ValueError with the reason (a 100-TB
pipeline wants loud skips, not silent corruption). Filters 0/1/2 decode
fully vectorized; 3 (average) and 4 (Paeth) need the reconstructed left
neighbor, so those rows run a per-pixel loop — correct first, and rare in
encoder output for synthetic corpora.

The encoder emits filter-0 RGB/RGBA/gray rows — enough to round-trip any
uint8 image array, which gives the golden-pixel tests a PIL-free oracle.

Reference parity note: the reference engine has no image path at all; this
backs the multimodal column operators (lse.multimodal), which exist for the
training-data pipeline dimension of the engine.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("png: truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C per color type; palette → 3)."""
    if not data or not data.startswith(_SIG):
        raise ValueError("png: bad signature")
    width = height = None
    color = bitdepth = interlace = None
    idat = []
    palette = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    if width is None:
        raise ValueError("png: missing IHDR")
    if bitdepth != 8:
        raise ValueError(f"png: unsupported bit depth {bitdepth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"png: unsupported color type {color}")
    if interlace != 0:
        raise ValueError("png: interlaced images unsupported")
    if not idat:
        raise ValueError("png: no IDAT data")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("png: decompressed size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = rows[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: prefix sum per byte lane (mod 256)
            rec = np.cumsum(
                line.reshape(width, ch).astype(np.uint64), axis=0
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraparound IS mod-256
        elif f in (3, 4):  # Average / Paeth — need reconstructed left
            rec = np.empty(stride, dtype=np.uint8)
            li = line.astype(np.int64)
            pv = prev.astype(np.int64)
            rc = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rc[x - ch] if x >= ch else 0
                b = pv[x]
                if f == 3:
                    rc[x] = (li[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = pv[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rc[x] = (li[x] + pred) & 0xFF
            rec = rc.astype(np.uint8)
        else:
            raise ValueError(f"png: unknown filter {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(height, width, ch)
    if color == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) | (H, W, C∈{1,2,3,4}) uint8 → PNG bytes (filter 0, one IDAT)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"png: cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [
            np.zeros((h, 1), dtype=np.uint8),  # filter byte 0 per row
            arr.reshape(h, w * ch),
        ],
        axis=1,
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def probe_png(data: bytes) -> Tuple[int, int, int]:
    """(width, height, channels) from IHDR only — no inflate."""
    if not data or not data.startswith(_SIG):
        raise ValueError("png: bad signature")
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h, _bd, color, _c, _f, _i = struct.unpack(">IIBBBBB", body)
            return int(w), int(h), _CHANNELS.get(color, 0)
    raise ValueError("png: missing IHDR")
