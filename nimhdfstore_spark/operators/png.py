"""Pure-stdlib PNG codec (zlib inflate + numpy row unfilter) — the real
image-decode leg of the multimodal surface (reference image datasets,
nimhdf5/hl/H5IMpublic.nim:26-56: 8-bit image data with width/height
metadata). No imaging library exists in this container; PNG's format is
public (W3C PNG spec, 3rd ed.) and its only compression is DEFLATE, so a
complete 8-bit decoder needs nothing beyond ``zlib`` and numpy.

Scope: 8-bit-depth, non-interlaced PNG, color types 0 (grayscale),
2 (RGB), 4 (gray+alpha) and 6 (RGBA); all five scanline filters. Palette
(3), 16-bit depth and Adam7 interlace raise cleanly. CRCs are not
verified on decode (robust-ingest stance: a corrupt CRC with intact
structure still yields pixels; IDAT inflation errors still raise).

Filter math is exact byte arithmetic mod 256 (spec §9): Sub and Up
vectorize directly (mod-256 cumulative sum / column add); Average and
Paeth carry a per-pixel dependency and run as a per-row loop — fine for
the corpus-sample sizes a quality pipeline decodes, and encode_png
defaults to filter 0 so re-encoded artifacts stay on the vector path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels)
    (channels axis kept even for grayscale, so downstream code is
    shape-stable)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("Adam7 interlace not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y > 0 else np.zeros(
            stride, dtype=np.int64
        )
        if f == 0:  # None
            line = cur
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-ch]
            line = cur.copy()
            # per-channel mod-256 cumulative sum vectorizes the recurrence
            for c in range(ch):
                line[c::ch] = np.cumsum(cur[c::ch]) % 256
        elif f == 2:  # Up
            line = cur + prior
        elif f == 3:  # Average — predictor uses RECONSTRUCTED (mod-256)
            # bytes, so reduce each element before it feeds the next
            line = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (cur[i] + (a + prior[i]) // 2) % 256
        elif f == 4:  # Paeth — same reconstructed-byte dependency
            line = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                c = int(prior[i - ch]) if i >= ch else 0
                line[i] = (cur[i] + _paeth(a, int(prior[i]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = (line % 256).astype(np.uint8)
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) → PNG bytes. ``filter_type``
    applies one filter to every scanline (0 by default — the decode path's
    vectorized fast case; 1-4 exist mainly so the decoder's unfilter logic
    is testable against real filtered streams)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    flat = a.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    lines = bytearray()
    for y in range(h):
        cur = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prior
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = cur - (left + prior) // 2
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                aa = int(cur[i - ch]) if i >= ch else 0
                cc = int(prior[i - ch]) if i >= ch else 0
                enc[i] = cur[i] - _paeth(aa, int(prior[i]), cc)
        lines.append(filter_type)
        lines += (enc % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w, c) → (height, width, c): source
    index = floor(dst_index * src / dst) — the deterministic integer
    mapping an SQL oracle can recompute."""
    h, w, _c = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]
