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


def _inflate(idat: bytes, width: int, height: int, ch: int) -> bytes:
    """Bounded IDAT inflate: the scanline stream of a (width, height, ch)
    image is EXACTLY height*(1 + width*ch) bytes (one filter byte per
    row), so cap the decompressor there — a crafted deflate bomb behind a
    small corrupted file raises instead of allocating without limit (the
    same pin the h5lite chunk reader and GIF LZW carry). Implausible
    declared dimensions are rejected before any allocation."""
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    expected = height * (1 + width * ch)
    d = zlib.decompressobj()
    out = d.decompress(idat, expected)
    if d.unconsumed_tail:
        raise ValueError(
            f"PNG pixel stream inflates past its declared size ({expected})"
        )
    return out


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
    return _unfilter(_inflate(bytes(idat), width, height, ch), width, height, ch)


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Inflated scanline stream (filter byte + filtered row, per row) →
    (height, width, ch) uint8. Shared by whole-image IDAT decode and
    per-frame APNG fdAT decode (each APNG frame region is filtered
    independently at ITS OWN width/height, APNG spec §4)."""
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


# -- APNG (animated PNG) ----------------------------------------------------
# The animation leg of the multimodal surface: frame sampling without any
# external demuxer. APNG is a short public spec (W3C PNG 3rd ed. §4,
# originally the Mozilla APNG spec): three extra chunk types over PNG —
#   acTL  num_frames(4) num_plays(4)            — animation control
#   fcTL  seq(4) w(4) h(4) x(4) y(4) delay_num(2) delay_den(2)
#         dispose_op(1) blend_op(1)             — per-frame control
#   fdAT  seq(4) + frame data                   — IDAT with a sequence prefix
# Each frame's data is an independent zlib stream of scanlines filtered at
# the FRAME's width, so decode reuses _unfilter unchanged. Frames composite
# onto a canvas per dispose/blend ops; an fcTL before IDAT makes the IDAT
# the first frame.

#: APNG dispose ops (spec §4.3)
_DISPOSE_NONE, _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS = 0, 1, 2
#: APNG blend ops
_BLEND_SOURCE, _BLEND_OVER = 0, 1


def decode_apng(data: bytes) -> list[np.ndarray]:
    """APNG bytes → list of composited full-canvas frames, each a
    (canvas_h, canvas_w, ch) uint8 array. A plain PNG (no acTL) decodes as
    a single frame. Implements the full dispose (NONE/BACKGROUND/PREVIOUS)
    and blend (SOURCE/OVER) semantics; OVER on alpha-less color types is
    SOURCE per spec (blend_op must be 0 there)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    animated = False
    idat = bytearray()
    idat_fctl = None  # fcTL covering the IDAT (default image in animation)
    frames_ctl: list[tuple] = []  # (fcTL fields, bytearray of frame data)
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("Adam7 interlace not supported")
        elif ctype == b"acTL":
            animated = True
        elif ctype == b"fcTL":
            (_seq, fw, fh, fx, fy, _dn, _dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            ctl = (fw, fh, fx, fy, dispose, blend)
            if not idat and not frames_ctl:
                idat_fctl = ctl  # precedes IDAT: IDAT is frame 0
            else:
                frames_ctl.append((ctl, bytearray()))
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"fdAT":
            if not frames_ctl:
                raise ValueError("fdAT before any fcTL")
            frames_ctl[-1][1].extend(body[4:])  # strip sequence number
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    ch = _CHANNELS[color_type]
    if not animated:
        return [_unfilter(_inflate(bytes(idat), width, height, ch), width, height, ch)]

    canvas = np.zeros((height, width, ch), dtype=np.uint8)
    out: list[np.ndarray] = []
    regions: list[tuple[tuple, np.ndarray]] = []
    if idat_fctl is not None:
        fw, fh, fx, fy, _d, _b = idat_fctl
        if (fw, fh, fx, fy) != (width, height, 0, 0):
            raise ValueError("APNG first frame (IDAT) must cover the canvas")
        regions.append(
            (idat_fctl, _unfilter(_inflate(bytes(idat), fw, fh, ch), fw, fh, ch))
        )
    for ctl, blob in frames_ctl:
        fw, fh, fx, fy, _d, _b = ctl
        if fx + fw > width or fy + fh > height:
            raise ValueError("APNG frame region exceeds canvas")
        regions.append((ctl, _unfilter(_inflate(bytes(blob), fw, fh, ch), fw, fh, ch)))

    has_alpha = color_type in (4, 6)
    for (fw, fh, fx, fy, dispose, blend), region in regions:
        prev = canvas.copy() if dispose == _DISPOSE_PREVIOUS else None
        target = canvas[fy : fy + fh, fx : fx + fw]
        if blend == _BLEND_OVER and has_alpha:
            # spec compositing: out = src + dst*(1 - src_alpha), premultiply
            # done in float then rounded — per-channel on the straight-alpha
            # formulation used by the APNG spec
            sa = region[:, :, -1:].astype(np.float64) / 255.0
            comp = np.rint(
                region.astype(np.float64) * sa
                + target.astype(np.float64) * (1.0 - sa)
            ).astype(np.uint8)
            # alpha channel composites as a_out = a_src + a_dst*(1-a_src)
            comp[:, :, -1] = np.rint(
                region[:, :, -1] + target[:, :, -1].astype(np.float64) * (1.0 - sa[:, :, 0])
            ).astype(np.uint8)
            canvas[fy : fy + fh, fx : fx + fw] = comp
        else:
            canvas[fy : fy + fh, fx : fx + fw] = region
        out.append(canvas.copy())
        if dispose == _DISPOSE_BACKGROUND:
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif dispose == _DISPOSE_PREVIOUS:
            canvas = prev
    return out


def encode_apng(frames: list, delay_num: int = 1,
                delay_den: int = 10, num_plays: int = 0) -> bytes:
    """Frames → APNG bytes. Each frame is a uint8 array (full canvas at
    (0, 0)) or a tuple ``(array, x_off, y_off[, dispose, blend])`` for a
    region frame — frame 0 must cover the canvas (spec requirement for an
    IDAT that participates in the animation). Frame 0 travels as the IDAT
    with a preceding fcTL; later frames as fcTL+fdAT, each an independent
    zlib stream filtered at the REGION's width. Defaults per frame:
    dispose NONE, blend SOURCE — the layout decode_apng round-trips
    exactly, and region frames exercise its compositing path."""
    if not frames:
        raise ValueError("encode_apng needs at least one frame")

    def norm(f):
        if isinstance(f, tuple):
            a, x, y = f[0], int(f[1]), int(f[2])
            dispose = int(f[3]) if len(f) > 3 else _DISPOSE_NONE
            blend = int(f[4]) if len(f) > 4 else _BLEND_SOURCE
        else:
            a, x, y, dispose, blend = f, 0, 0, _DISPOSE_NONE, _BLEND_SOURCE
        a = np.asarray(a, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        return a, x, y, dispose, blend

    norm_frames = [norm(f) for f in frames]
    first, fx0, fy0, d0, b0 = norm_frames[0]
    if (fx0, fy0) != (0, 0):
        raise ValueError("APNG frame 0 must sit at (0, 0)")
    h, w, ch = first.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    def scanlines(a: np.ndarray) -> bytes:
        fh, fw, _ = a.shape
        flat = a.reshape(fh, fw * ch)
        lines = bytearray()
        for y in range(fh):
            lines.append(0)  # filter 0 — the vectorized decode fast path
            lines += flat[y].tobytes()
        return zlib.compress(bytes(lines), 6)

    seq = 0

    def fctl(a, x, y, dispose, blend) -> bytes:
        nonlocal seq
        fh, fw, _ = a.shape
        if x + fw > w or y + fh > h:
            raise ValueError("APNG frame region exceeds canvas")
        body = struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x, y, delay_num, delay_den,
            dispose, blend,
        )
        seq += 1
        return _chunk(b"fcTL", body)

    out = bytearray()
    out += _SIG
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(norm_frames), num_plays))
    out += fctl(first, 0, 0, d0, b0)
    out += _chunk(b"IDAT", scanlines(first))
    for a, x, y, dispose, blend in norm_frames[1:]:
        out += fctl(a, x, y, dispose, blend)
        data = scanlines(a)
        out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w, c) → (height, width, c): source
    index = floor(dst_index * src / dst) — the deterministic integer
    mapping an SQL oracle can recompute."""
    h, w, _c = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]
