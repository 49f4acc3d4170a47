"""Baseline JPEG codec (operators/jpeg.py, pure-numpy ITU T.81) — the
round-10 real-decode extension to the dominant web-crawl image format.

The load-bearing pins:
- exactness contract: block-aligned uniform regions with DC on the quant
  lattice round-trip BIT-exact (what the x197 oracle rides) — hypothesis
  sweeps band patterns, sizes, restart intervals;
- independent-math pin: decoded pixels of a hand-built DC-only block
  match the closed form S00/8 + 128 without going through our encoder
  (catches symmetric encode+decode defects);
- Huffman tables are prefix-free and canonical per Annex C;
- color 4:4:4 / 4:2:0 round-trips stay within small tolerance on smooth
  fields; non-baseline/garbage inputs raise cleanly; magic-byte dispatch
  routes PNG and JPEG through one decode_images pass.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nimhdfstore_spark.operators.jpeg import (
    HUFF_AC_CHROMA, HUFF_AC_LUMA, HUFF_DC_CHROMA, HUFF_DC_LUMA, QT_LUMA,
    ZIGZAG, _canonical_codes, decode_jpeg, encode_jpeg, quality_tables,
)


def _banded(h, w, values):
    img = np.zeros((h, w, 1), dtype=np.uint8)
    for b in range(h // 8):
        img[b * 8 : (b + 1) * 8] = values[b % len(values)]
    return img


# --------------------------------------------------------------------------
# exactness contract (the x197 oracle's foundation)
# --------------------------------------------------------------------------

@given(
    vals=st.lists(st.integers(min_value=32, max_value=111), min_size=1,
                  max_size=5),
    wblocks=st.integers(min_value=1, max_value=5),
    rst=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=25, deadline=None)
def test_block_aligned_even_bands_roundtrip_exact(vals, wblocks, rst):
    # band values 2*v are even -> DC = 8*(2v-128) is a multiple of the
    # quality-50 DC step (16) -> bit-exact round-trip, any band count,
    # any block-aligned width, with or without restart markers
    values = [2 * v for v in vals]
    img = _banded(8 * len(vals), 8 * wblocks, values)
    out = decode_jpeg(encode_jpeg(img, quality=50, restart_interval=rst))
    assert np.array_equal(out, img)


def test_odd_value_uniform_is_not_required_exact_but_close():
    img = np.full((16, 16, 1), 77, dtype=np.uint8)  # odd: off-lattice
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert np.abs(out.astype(int) - 77).max() <= 1  # round(16*round(x/16)/8)/...


# --------------------------------------------------------------------------
# independent-math pin: hand-built JPEG (no encoder involved)
# --------------------------------------------------------------------------

def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_handbuilt_dc_only_block_decodes_to_closed_form():
    """A minimal 8x8 grayscale JPEG assembled byte-by-byte: quant table
    all-16s, standard DC/AC luma Huffman, one block whose entropy data
    encodes DC magnitude category 4 value 12 then EOB. Dequantized DC =
    12*16 = 192; IDCT of a DC-only block is uniform S00/8 = 24; +128 →
    every pixel must be exactly 152. Our encoder is nowhere in this
    test, so a symmetric encode+decode defect cannot hide."""
    qt = bytes([0]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(HUFF_DC_LUMA[0]) + bytes(HUFF_DC_LUMA[1])
    dht_ac = bytes([0x10]) + bytes(HUFF_AC_LUMA[0]) + bytes(HUFF_AC_LUMA[1])
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    # entropy: DC cat 4 = code '101' (Annex K table), then 4 magnitude
    # bits '1100' (=12); AC EOB = code '1010'. Bits: 101 1100 1010 + pad 1s
    # = 10111001 01011111 = 0xB9 0x5F
    data = bytes([0xB9, 0x5F])
    jpg = (b"\xff\xd8" + _seg(0xDB, qt) + _seg(0xC0, sof)
           + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac) + _seg(0xDA, sos)
           + data + b"\xff\xd9")
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8, 1)
    assert np.unique(out).tolist() == [152]


# --------------------------------------------------------------------------
# Huffman structure
# --------------------------------------------------------------------------

@pytest.mark.parametrize("table", [HUFF_DC_LUMA, HUFF_DC_CHROMA,
                                   HUFF_AC_LUMA, HUFF_AC_CHROMA])
def test_canonical_codes_prefix_free(table):
    codes = _canonical_codes(*table)
    assert len({s for s, _, _ in codes}) == len(codes)
    seen = [(c, l) for _, c, l in codes]
    for i, (c1, l1) in enumerate(seen):
        assert c1 < (1 << l1)
        for c2, l2 in seen[i + 1 :]:
            lo, hi = sorted(((c1, l1), (c2, l2)), key=lambda t: t[1])
            assert (hi[0] >> (hi[1] - lo[1])) != lo[0], "prefix collision"


def test_quality_table_scaling_monotone():
    q10, _ = quality_tables(10)
    q50, _ = quality_tables(50)
    q95, _ = quality_tables(95)
    assert (q50 == QT_LUMA).all()          # q50 = Annex K verbatim
    assert (q10 >= q50).all() and (q95 <= q50).all()
    assert q95.min() >= 1


# --------------------------------------------------------------------------
# color, subsampling, shapes, rejection
# --------------------------------------------------------------------------

def test_color_roundtrips_within_tolerance():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack([
        (120 + yy).astype(np.uint8),
        (100 + xx // 2).astype(np.uint8),
        (90 + (yy + xx) // 3).astype(np.uint8),
    ], axis=-1)
    out444 = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out444.astype(int) - img.astype(int)).max() <= 2
    out420 = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out420.shape == img.shape
    assert np.abs(out420.astype(int) - img.astype(int)).max() <= 4


def test_shapes_and_gray_2d_input():
    for shape in ((1, 1, 1), (7, 9, 1), (9, 7, 3), (17, 1, 3)):
        img = (np.arange(np.prod(shape)).reshape(shape) % 200 + 20).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == shape
    # 2-D input is accepted and comes back (h, w, 1)
    g = np.full((8, 8), 130, dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(g, quality=50)).shape == (8, 8, 1)


def test_rejects_non_baseline_and_garbage():
    img = np.full((8, 8, 1), 130, dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=50))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    # flip SOF0 -> SOF2 (progressive): must raise cleanly, not garble
    prog = bytes(good).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    with pytest.raises(Exception):
        decode_jpeg(bytes(good[: len(good) // 3]))  # truncated mid-headers


# --------------------------------------------------------------------------
# dispatch: one decode pass over a mixed PNG+JPEG corpus
# --------------------------------------------------------------------------

def test_decode_image_auto_dispatch_and_dhash_parity(spark):
    from nimhdfstore_spark.operators.multimodal import (
        decode_image_auto, image_dhash,
    )
    from nimhdfstore_spark.operators.png import encode_png

    yy, xx = np.mgrid[0:24, 0:32]
    gray = ((xx * 8) % 256).astype(np.uint8)  # horizontal ramp
    png_b = encode_png(gray)
    jpg_b = encode_jpeg(gray[..., None], quality=95)
    assert decode_image_auto(png_b).shape == (24, 32, 1)
    assert decode_image_auto(jpg_b).shape == (24, 32, 1)
    # same image via PNG and high-quality JPEG must land on the SAME dHash
    df = spark.createDataFrame(
        [(0, bytearray(png_b)), (1, bytearray(jpg_b)),
         (2, bytearray(b"garbage-not-an-image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert set(rows) == {0, 1}, "garbage dropped, both images decoded"
    assert rows[0]["dhash"] == rows[1]["dhash"]


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=80, deadline=None)
def test_decoder_never_hangs_on_garbage(data):
    # robust-ingest stance: arbitrary bytes either raise or decode —
    # never hang, never return a malformed array
    try:
        out = decode_jpeg(b"\xff\xd8" + data)
    except Exception:
        return
    assert out.dtype == np.uint8 and out.ndim == 3


def test_skipped_frames_are_never_decoded(spark):
    """The every-k laziness claim, made falsifiable: corrupt the JPEG
    payload of every ODD frame in a muxed AVI. Sampling every 2nd frame
    must still return all even frames bit-exact — if the sampler decoded
    (or even validated) skipped frames, the corruption could not be
    invisible. A corrupted frame that IS sampled drops (decode_images
    contract) without taking out its siblings."""
    from nimhdfstore_spark.operators.video import (
        demux_avi, mux_avi_mjpeg, sample_avi_frames,
    )

    frames = []
    for f in range(6):
        img = np.full((8, 8, 1), 64 + 2 * ((f * 9) % 80), dtype=np.uint8)
        frames.append(encode_jpeg(img, quality=50))
    corrupted = [f if i % 2 == 0 else b"\x00garbage\xff" * 3
                 for i, f in enumerate(frames)]
    avi = mux_avi_mjpeg(corrupted, 8, 8, fps=10)
    assert demux_avi(avi)["n_frames"] == 6
    df = spark.createDataFrame([(0, bytearray(avi))],
                               "doc_id long, payload binary")
    rows = {r["frame_no"]: r for r in sample_avi_frames(df, every_k=2).collect()}
    assert set(rows) == {0, 2, 4}
    for f in (0, 2, 4):
        v = 64 + 2 * ((f * 9) % 80)
        assert rows[f]["px_sum"] == v * 64
    # and when a corrupted frame IS sampled, it drops alone
    rows1 = {r["frame_no"] for r in sample_avi_frames(df, every_k=1).collect()}
    assert rows1 == {0, 2, 4}


def test_zero_length_segment_raises_instead_of_looping():
    # DQT marker with seglen 0 — without the guard the segment walk
    # would never advance
    evil = b"\xff\xd8\xff\xdb\x00\x00\xff\xd9"
    with pytest.raises(ValueError, match="segment length"):
        decode_jpeg(evil)
