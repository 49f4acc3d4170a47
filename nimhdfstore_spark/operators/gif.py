"""GIF87a/89a codec — pure stdlib + numpy, from the public GIF89a
specification (CompuServe 1990; the W3C-archived "GRAPHICS INTERCHANGE
FORMAT Version 89a" document) — no imaging library.

Reference surface: the reference's image layer decodes stills into 8-bit
datasets (hl/H5IMpublic.nim:26-56). GIF sits beyond that surface but is
crawl-dominant and public-spec-reimplementable (round-7 verdict residual
#2): palette-indexed pixels, LZW-compressed, optional multi-frame
animation with per-frame graphic-control extensions.

Decoder hardening contract (same pin as the AVI demuxer, video.py): every
malformed input raises ``ValueError`` — bounded reads through one cursor,
LZW table capped at 4096 codes, per-frame output capped at the declared
width×height, frame count bounded by input length (every image descriptor
consumes bytes). Never hangs, never allocates unbounded memory; fuzz-pinned
in tests/test_round12.py.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODES = 4096  # 12-bit LZW ceiling (spec appendix F)


class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.i = 0

    def take(self, n: int) -> bytes:
        if n < 0 or self.i + n > len(self.b):
            raise ValueError("truncated GIF")
        out = self.b[self.i:self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]


def _color_table(cur: _Cursor, packed: int) -> np.ndarray | None:
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        return np.frombuffer(cur.take(3 * n), np.uint8).reshape(n, 3).copy()
    return None


def _subblocks(cur: _Cursor) -> bytes:
    out = bytearray()
    while True:
        n = cur.u8()
        if n == 0:
            return bytes(out)
        out += cur.take(n)


def _lzw_decode(mcs: int, data: bytes, max_pixels: int) -> bytes:
    """GIF-variant LZW: variable-width codes packed LSB-first, CLEAR resets
    the table, width grows when the table fills 2^width (capped at 12 bits).
    Output is capped at ``max_pixels`` (the image's declared area) — a
    hostile stream cannot expand beyond it."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                if len(out) >= max_pixels:  # no EOI but image complete:
                    return bytes(out[:max_pixels])  # tolerate (common)
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            if len(out) < max_pixels:
                raise ValueError("LZW EOI before image complete")
            return bytes(out[:max_pixels])
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODES:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < _MAX_CODES:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(out) >= max_pixels:
            return bytes(out[:max_pixels])
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


def decode_gif_frames(data: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode every frame: ``[(HxWx3 uint8 RGB canvas, delay_centisec)]``.
    Frames compose per the spec's disposal model (0/1 leave, 2 restore
    rect to background, 3 restore to previous); transparency index pixels
    leave the canvas unchanged."""
    cur = _Cursor(bytes(data))
    if cur.take(6) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height = cur.u16(), cur.u16()
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise ValueError(f"implausible GIF dimensions {width}x{height}")
    packed = cur.u8()
    bg_index = cur.u8()
    cur.u8()  # pixel aspect ratio: ignored
    gct = _color_table(cur, packed)
    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    bg_rgb = canvas[0, 0].copy()
    frames: list[tuple[np.ndarray, int]] = []
    transparent = -1
    delay_cs = 0
    disposal = 0
    while True:
        block = cur.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = cur.u8()
            body = _subblocks(cur)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("short graphic control extension")
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                delay_cs = body[1] | (body[2] << 8)
                transparent = body[3] if flags & 0x01 else -1
            continue  # comment/application/plain-text: skipped
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top = cur.u16(), cur.u16()
        w, h = cur.u16(), cur.u16()
        if w == 0 or h == 0 or left + w > width or top + h > height:
            raise ValueError("image descriptor outside logical screen")
        ipacked = cur.u8()
        lct = _color_table(cur, ipacked)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("no color table for image")
        mcs = cur.u8()
        idx = np.frombuffer(
            _lzw_decode(mcs, _subblocks(cur), w * h), np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        # validate only OPAQUE pixels against the palette: GIFs in the wild
        # use a transparent index >= table size (the index is never looked
        # up, only compared), and rejecting them would drop renderable
        # frames from the crawl decode path (ADVICE r8)
        opaque_max = (
            int(idx[idx != transparent].max(initial=0))
            if transparent >= 0
            else int(idx.max())
        )
        if opaque_max >= len(palette):
            raise ValueError("pixel index outside color table")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + h, left:left + w]
        if transparent >= 0:
            opaque = idx != transparent
            region[opaque] = palette[idx[opaque]]
        else:
            region[:, :] = palette[idx]
        frames.append((canvas.copy(), delay_cs))
        if disposal == 2:
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        transparent, delay_cs, disposal = -1, 0, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as an HxWx3 uint8 RGB array (still-image surface)."""
    return decode_gif_frames(data)[0][0]


# -- encoder (deterministic test fixtures; also a real GIF89a writer) -------


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODES:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blockify(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]",
    delay_cs: int = 4,
    loop: int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode HxWx3 uint8 frame(s) as a real GIF89a byte stream. The global
    palette is built from the exact colors used; >256 distinct colors raise
    (this writer does no quantization — GIF is lossless within a palette,
    which is what the round-trip oracles rely on)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    h0, w0 = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError("frames must be HxWx3 uint8")
        if f.shape[:2] != (h0, w0):
            raise ValueError("all frames must share one size")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed the GIF palette")
    # palette size = power of two >= max(2, n); min code size >= 2 per spec
    bits = max(2, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w0, h0)
    out.append(0x80 | (bits - 1))  # GCT present, size 2^bits
    out += b"\x00\x00"  # bg index, aspect
    out += palette.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    for f in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w0, h0)
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], np.uint8
        ).reshape(h0, w0)
        if interlace:
            out.append(0x40)
            rows = [idx[y] for s, st in _INTERLACE_PASSES
                    for y in range(s, h0, st)]
            idx = np.stack(rows)
        else:
            out.append(0x00)
        out.append(bits)
        out += _blockify(_lzw_encode(bits, idx.tobytes()))
    out.append(0x3B)
    return bytes(out)
