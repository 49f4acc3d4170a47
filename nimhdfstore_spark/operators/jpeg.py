"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec)
— extends the real image-decode leg of the multimodal surface (reference
image datasets, nimhdf5/hl/H5IMpublic.nim:26-56) to the dominant web-crawl
image format. No imaging library exists in this container; baseline JPEG
needs nothing beyond the published spec: segment parsing, canonical
Huffman tables (Annex C), zigzag + uniform quantization (Annex K tables),
and the 8x8 type-II DCT pair — all expressible with numpy.

Scope: baseline sequential DCT (SOF0), 8-bit, 1-component grayscale or
3-component YCbCr with sampling factors 1-2 per axis (4:4:4, 4:2:2,
4:2:0), restart markers (DRI/RSTn). Progressive (SOF2), arithmetic
coding, 12-bit depth and hierarchical modes raise cleanly.

Exactness contract used by the x197 oracle: a block-aligned uniform
region has all-zero AC terms and DC = 8·(v-128); when 8·(v-128) is a
multiple of the DC quant step the round-trip is bit-exact (the only float
steps — the DC-only IDCT's divide-by-8 and the final round — are exact
powers of two), so pixel values survive encode→decode verbatim and the
oracle can state them in closed form from doc_id.

Entropy decode walks symbols in a Python loop (sequential by nature —
same stance as png.py's Paeth rows); everything around it (dequantize,
IDCT, upsample, color transform) is vectorized numpy per block/plane.
Corpus-scale decode parallelism comes from the Arrow-batched mapInPandas
wrappers in operators/multimodal.py, not from this kernel.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index = zigzag position, value = natural (row-major) position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (the de-facto standard ones)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _idct_matrix() -> np.ndarray:
    """M[v, y] = 0.5 * a(v) * cos((2y+1) v π / 16); spatial = Mᵀ S M."""
    v = np.arange(8).reshape(8, 1).astype(np.float64)
    y = np.arange(8).reshape(1, 8).astype(np.float64)
    m = 0.5 * np.cos((2 * y + 1) * v * np.pi / 16.0)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_M = _idct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the public IJG quality formula
    (scale = 5000/q below 50 else 200-2q; entries clamped to 1..255)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lq = np.clip((QT_LUMA * scale + 50) // 100, 1, 255)
    cq = np.clip((QT_CHROMA * scale + 50) // 100, 1, 255)
    return lq, cq


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

def _canonical_codes(bits: list[int], huffval: list[int]):
    """Annex C code assignment: (code, length) per symbol, in huffval
    order — lengths ascend, codes increment then left-shift per length."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((huffval[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut_key(bits: tuple, huffval: tuple):
    """16-bit peek LUT as plain Python lists: value of the next 16 bits →
    (symbol, code length). O(1) per decoded symbol; list indexing beats
    numpy scalar access ~5× in the per-symbol loop. lru-cached — a corpus
    batch reuses the same (typically Annex K) tables across every image,
    so the 65k-entry build amortizes to once per table."""
    sym = np.zeros(1 << 16, dtype=np.int32) - 1
    ln = np.zeros(1 << 16, dtype=np.int32)
    for s, code, length in _canonical_codes(list(bits), list(huffval)):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym.tolist(), ln.tolist()


from functools import lru_cache as _lru_cache  # noqa: E402

_decode_lut_cached = _lru_cache(maxsize=64)(_decode_lut_key)


def _decode_lut(bits: list[int], huffval: list[int]):
    return _decode_lut_cached(tuple(bits), tuple(huffval))


def _win32(data: bytes) -> list[int]:
    """Rolling 32-bit big-endian window at every byte offset (padded with
    1-bits past the end — the spec's implicit padding). Built once per
    scan with vectorized numpy; consumed as a Python list so the
    per-symbol bit peek is two int ops and one list index."""
    pad = np.frombuffer(data + b"\xff\xff\xff\xff", dtype=np.uint8).astype(
        np.int64
    )
    w = (pad[:-3] << 24) | (pad[1:-2] << 16) | (pad[2:-1] << 8) | pad[3:]
    return w.tolist()


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array of shape (height, width, channels)
    (channels axis kept even for grayscale — same contract as decode_png)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> LUT pair
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside a scan
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:
            # a length below its own 2 bytes would stall the walk forever
            raise ValueError(f"corrupt segment length {seglen} at {pos}")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                qts[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _decode_lut(bits, huffval)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            if ncomp not in (1, 3):
                # 4-component SOF0 is valid baseline (Adobe CMYK/YCCK, common
                # in crawls) but out of this decoder's colour-transform scope;
                # running it through the 3-component YCbCr path would return
                # garbage pixels instead of dropping the payload upstream.
                raise ValueError(
                    f"{ncomp}-component JPEG unsupported (grayscale/YCbCr only)"
                )
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(frame["comps"]):
                # Baseline also permits multiple non-interleaved scans (one
                # component each); decoding only the first would return
                # frame-level MCU geometry with zeroed remaining planes.
                raise ValueError(
                    "non-interleaved multi-scan baseline unsupported "
                    f"(scan has {ns} of {len(frame['comps'])} components)"
                )
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"cs": cs, "dc": tdta >> 4, "ac": tdta & 15})
            # collect entropy bytes, de-stuffing 0xFF00 and dropping RSTn —
            # slicing between 0xFF positions (found vectorized) instead of
            # a per-byte loop: stuffing/restart markers are sparse, so the
            # Python loop runs per-marker, not per-byte
            ec = bytearray()
            rst_starts = [0]
            tail = data[pos:]
            ffs = np.flatnonzero(
                np.frombuffer(tail, dtype=np.uint8) == 0xFF
            ).tolist()
            prev = 0
            stopped = False
            for i in ffs:
                if i < prev:
                    continue  # consumed as part of an earlier FF-pair
                nxt = tail[i + 1] if i + 1 < len(tail) else None
                if nxt == 0x00:
                    ec += tail[prev : i + 1]  # keep the FF, drop the 00
                    prev = i + 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    ec += tail[prev:i]
                    rst_starts.append(len(ec))
                    prev = i + 2
                else:  # a real marker (or trailing FF) ends the scan
                    ec += tail[prev:i]
                    stopped = True
                    break
            if not stopped:
                ec += tail[prev:]
            return _decode_scan(
                frame, scan, qts, huff, bytes(ec), rst_starts,
                restart_interval,
            )
        # APPn / COM / others: skipped
    raise ValueError("no SOS scan found")


def _decode_scan(frame, scan, qts, huff, ec: bytes, rst_starts,
                 restart_interval: int) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    tabs = {s["cs"]: (huff[(0, s["dc"])], huff[(1, s["ac"])]) for s in scan}
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                          dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    w32 = _win32(ec)
    pos = 0  # bit cursor into the de-stuffed stream
    seg = 1  # next restart segment index into rst_starts
    # entropy loop only collects; dequantize + IDCT run batched after it
    # (one (n,8,8) einsum instead of two 8x8 matmuls per block)
    coefs: list = []
    targets: list = []  # (cid, y0, x0) per block, parallel to coefs
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            # byte-aligned restart: jump to the next RST-delimited segment
            if seg < len(rst_starts):
                pos = rst_starts[seg] * 8
                seg += 1
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in order:
            dc_lut, ac_lut = tabs[c["id"]]
            qt = qts[c["tq"]]
            cid = c["id"]
            for blk in range(c["h"] * c["v"]):
                byy, bxx = divmod(blk, c["h"])
                pos, diff, coef = _decode_block(w32, pos, dc_lut, ac_lut)
                pred[cid] += diff
                coef[0] = pred[cid]
                coefs.append(coef * qt)
                targets.append(
                    (cid, (my * c["v"] + byy) * 8, (mx * c["h"] + bxx) * 8)
                )
    if coefs:
        deq = np.zeros((len(coefs), 64), dtype=np.float64)
        deq[:, ZIGZAG] = np.asarray(coefs, dtype=np.float64)
        spatial = np.einsum(
            "vy,nvu,ux->nyx", _M, deq.reshape(-1, 8, 8), _M, optimize=True
        )
        for (cid, y0, x0), blk_px in zip(targets, spatial):
            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk_px
    # upsample each component to full MCU-grid resolution, then crop
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pix = out[0] + 128.0
        return np.clip(np.round(pix), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(w32, pos, dc_lut, ac_lut):
    """One block's entropy decode — the per-symbol hot loop. Bit peeks
    are inlined (two int ops + one list index against the precomputed
    rolling window); magnitude extension (T.81 F.12) is inlined too.
    Returns (new bit position, dc diff, 64 zigzag coefficients)."""
    coef = np.zeros(64, dtype=np.int64)
    n32 = len(w32)
    sym, ln = dc_lut
    byte, off = divmod(pos, 8)
    if byte >= n32:
        raise ValueError("truncated entropy data")
    peek = (w32[byte] >> (16 - off)) & 0xFFFF
    t = sym[peek]
    if t < 0:
        raise ValueError("invalid DC Huffman code")
    pos += ln[peek]
    if t:
        byte, off = divmod(pos, 8)
        if byte >= n32:
            raise ValueError("truncated entropy data")
        v = ((w32[byte] >> (16 - off)) & 0xFFFF) >> (16 - t)
        pos += t
        diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
    else:
        diff = 0
    sym, ln = ac_lut
    k = 1
    while k <= 63:
        byte, off = divmod(pos, 8)
        if byte >= n32:
            raise ValueError("truncated entropy data")
        peek = (w32[byte] >> (16 - off)) & 0xFFFF
        rs = sym[peek]
        if rs < 0:
            raise ValueError("invalid AC Huffman code")
        pos += ln[peek]
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        byte, off = divmod(pos, 8)
        if byte >= n32:
            raise ValueError("truncated entropy data")
        v = ((w32[byte] >> (16 - off)) & 0xFFFF) >> (16 - s)
        pos += s
        coef[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        k += 1
    return pos, diff, coef


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # 1-padding per spec

    def marker(self, byte2: int) -> None:
        """Byte-align and emit a raw (unstuffed) marker — RSTn."""
        self.align()
        self.out += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _encode_codes(bits, huffval):
    return {s: (code, length) for s, code, length in
            _canonical_codes(bits, huffval)}


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward of the _M pair: S = M s Mᵀ (exact transpose relationship)."""
    return _M @ block @ _M.T


def _mag(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w), (h, w, 1) or (h, w, 3) → baseline JFIF bytes.
    ``subsample=True`` writes 4:2:0 (chroma 2x2-mean-downsampled);
    grayscale input writes a single-component scan; ``restart_interval``
    > 0 writes a DRI segment and byte-aligned RSTn markers every N MCUs
    (the spec's parallel-decode/resync hook — T.81 §B.2.4.4/E.2.4)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[..., None]
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("need uint8 (h, w[, 1|3]) pixels")
    h, w, ch = a.shape
    lq, cq = quality_tables(quality)
    gray = ch == 1
    if gray:
        planes = [a[..., 0].astype(np.float64) - 128.0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]

    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) else \
        [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for idx, p in enumerate(planes):
        sh, sv = samp[idx]
        if idx > 0 and (sh, sv) != (hmax, vmax):
            # 2x2 mean downsample (pad odd edges by replication first)
            ph = p if h % 2 == 0 else np.vstack([p, p[-1:]])
            ph = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
            p = (ph[0::2, 0::2] + ph[1::2, 0::2]
                 + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
        th, tw = mcuy * sv * 8, mcux * sh * 8
        out = np.zeros((th, tw), dtype=np.float64)
        out[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < th:
            out[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < tw:
            out[:, p.shape[1]:] = out[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(out)

    qts = [lq] + ([cq] if not gray else [])
    dc_codes = [_encode_codes(*HUFF_DC_LUMA)] + (
        [_encode_codes(*HUFF_DC_CHROMA)] if not gray else [])
    ac_codes = [_encode_codes(*HUFF_AC_LUMA)] + (
        [_encode_codes(*HUFF_AC_CHROMA)] if not gray else [])

    writer = _BitWriter()
    pred = [0] * len(planes)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.marker(0xD0 + ((m // restart_interval - 1) % 8))
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for idx, p in enumerate(padded):
            sh, sv = samp[idx]
            ti = min(idx, 1)
            qt = qts[ti]
            for blk in range(sh * sv):
                byy, bxx = divmod(blk, sh)
                y0 = (my * sv + byy) * 8
                x0 = (mx * sh + bxx) * 8
                block = p[y0 : y0 + 8, x0 : x0 + 8]
                coefs = _fdct(block).reshape(64)
                q = np.round(coefs / qt.astype(np.float64)).astype(np.int64)
                zz = q[ZIGZAG]
                _write_block(writer, zz, pred, idx,
                             dc_codes[ti], ac_codes[ti])
    data = writer.flush()

    segs = bytearray(b"\xff\xd8")
    segs += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    segs += _seg(0xDB, bytes([0]) + bytes(lq[ZIGZAG].astype(np.uint8)))
    if not gray:
        segs += _seg(0xDB, bytes([1]) + bytes(cq[ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for idx in range(len(planes)):
        sh, sv = samp[idx]
        sof += bytes([idx + 1, (sh << 4) | sv, min(idx, 1)])
    segs += _seg(0xC0, bytes(sof))
    segs += _seg(0xC4, _dht_body(0, 0, *HUFF_DC_LUMA))
    segs += _seg(0xC4, _dht_body(1, 0, *HUFF_AC_LUMA))
    if not gray:
        segs += _seg(0xC4, _dht_body(0, 1, *HUFF_DC_CHROMA))
        segs += _seg(0xC4, _dht_body(1, 1, *HUFF_AC_CHROMA))
    if restart_interval:
        segs += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for idx in range(len(planes)):
        ti = min(idx, 1)
        sos += bytes([idx + 1, (ti << 4) | ti])
    sos += b"\x00\x3f\x00"
    segs += _seg(0xDA, bytes(sos))
    segs += data
    segs += b"\xff\xd9"
    return bytes(segs)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc: int, th: int, bits, huffval) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)


def _write_block(writer, zz, pred, idx, dc, ac) -> None:
    diff = int(zz[0]) - pred[idx]
    pred[idx] = int(zz[0])
    t = _mag(diff)
    code, length = dc[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = (int(nz[-1]) + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _mag(v)
        code, length = ac[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac[0x00]  # EOB
        writer.write(code, length)
