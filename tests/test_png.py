"""PNG codec (operators/png.py): filter-exact decode, codec round-trips,
resize mapping, and the decode_images / resize_images operators."""

from __future__ import annotations

import numpy as np
import pytest

from nimhdfstore_spark.operators.png import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _gradient(h, w, c=1, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    base = (x + y * 3 + seed) % 256
    if c == 1:
        return base.astype(np.uint8)
    return np.stack([(base + k * 17) % 256 for k in range(c)], axis=-1).astype(
        np.uint8
    )


@pytest.mark.parametrize("shape", [(5, 7), (16, 16, 3), (9, 4, 4), (3, 3, 2), (1, 1)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters(shape, ft):
    rng = np.random.default_rng(hash(shape) % (2**32))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, filter_type=ft))
    want = img if img.ndim == 3 else img[:, :, None]
    assert (back == want).all()


def test_decode_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 64)
    with pytest.raises(ValueError, match="bit depth"):
        # craft a 16-bit-depth IHDR
        import struct
        import zlib

        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr)
        )
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_multi_idat_concatenation():
    """IDAT may be split across chunks at any byte boundary."""
    import struct
    import zlib

    img = _gradient(6, 5, 3)
    data = encode_png(img)
    # re-split the single IDAT into 3-byte chunks
    pos, out, idat = 8, bytearray(data[:8]), b""
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IDAT":
            idat = body
            continue
        if ctype == b"IEND":
            for i in range(0, len(idat), 3):
                piece = idat[i : i + 3]
                out += struct.pack(">I", len(piece)) + b"IDAT" + piece
                out += struct.pack(">I", zlib.crc32(b"IDAT" + piece))
        out += struct.pack(">I", length) + ctype + body
        out += struct.pack(">I", zlib.crc32(ctype + body))
    back = decode_png(bytes(out))
    assert (back == img).all()


def test_resize_nearest_mapping():
    img = _gradient(20, 30, 3)
    r = resize_nearest(img, 7, 5)
    assert r.shape == (5, 7, 3)
    for i in range(5):
        for j in range(7):
            assert (r[i, j] == img[(i * 20) // 5, (j * 30) // 7]).all()


def test_decode_images_operator(spark):
    from nimhdfstore_spark.operators.multimodal import decode_images

    rows = []
    for d in range(12):
        img = _gradient(4 + d % 5, 3 + d % 4, 1 + (d % 2) * 2, seed=d)
        rows.append((d, bytearray(encode_png(img))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_images(df).collect()}
    for d in range(12):
        img = _gradient(4 + d % 5, 3 + d % 4, 1 + (d % 2) * 2, seed=d)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        g = got[d]
        assert (g["width"], g["height"], g["channels"]) == (w, h, c)
        assert g["px_sum"] == int(img.astype(np.int64).sum())
        assert g["px_min"] == int(img.min()) and g["px_max"] == int(img.max())


def test_resize_images_operator_reencodes(spark):
    from nimhdfstore_spark.operators.multimodal import resize_images

    img = _gradient(16, 12, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "doc_id long, payload binary"
    )
    out = resize_images(df, 5, 6).collect()[0]
    assert (out["width"], out["height"]) == (5, 6)
    back = decode_png(bytes(out["payload"]))
    assert (back == resize_nearest(img, 5, 6)).all()
    assert out["px_sum"] == int(
        resize_nearest(img, 5, 6).astype(np.int64).sum()
    )


# --------------------------------------------------------------------------
# APNG: frame round-trip, region compositing, dispose/blend semantics
# --------------------------------------------------------------------------

def test_apng_full_frame_roundtrip():
    from nimhdfstore_spark.operators.png import decode_apng, encode_apng

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (5, 7, 3), dtype=np.uint8) for _ in range(4)]
    out = decode_apng(encode_apng(frames))
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_apng_plain_png_is_one_frame():
    from nimhdfstore_spark.operators.png import decode_apng, encode_png

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_apng(encode_png(img))
    assert len(out) == 1 and (out[0][:, :, 0] == img).all()


def test_apng_region_composites_and_dispose():
    from nimhdfstore_spark.operators.png import (
        _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS, decode_apng, encode_apng,
    )

    base = np.full((6, 8), 10, dtype=np.uint8)
    reg = np.full((2, 3), 200, dtype=np.uint8)
    seq = decode_apng(encode_apng([base, (reg, 2, 1)]))
    exp = np.full((6, 8), 10)
    exp[1:3, 2:5] = 200
    assert (seq[1][:, :, 0] == exp).all()

    seq = decode_apng(encode_apng([
        base, (reg, 2, 1, _DISPOSE_BACKGROUND),
        (np.full((1, 1), 7, np.uint8), 0, 0),
    ]))
    assert (seq[1][1:3, 2:5, 0] == 200).all()
    assert (seq[2][1:3, 2:5, 0] == 0).all() and seq[2][0, 0, 0] == 7

    seq = decode_apng(encode_apng([
        base, (reg, 2, 1, _DISPOSE_PREVIOUS),
        (np.full((1, 1), 7, np.uint8), 5, 5),
    ]))
    assert (seq[2][1:3, 2:5, 0] == 10).all() and seq[2][5, 5, 0] == 7


def test_apng_blend_over_rgba():
    from nimhdfstore_spark.operators.png import (
        _BLEND_OVER, decode_apng, encode_apng,
    )

    base = np.zeros((4, 4, 4), dtype=np.uint8)
    base[..., :3] = 100
    base[..., 3] = 255
    ov = np.zeros((2, 2, 4), dtype=np.uint8)
    ov[..., :3] = 200
    ov[..., 3] = 128
    seq = decode_apng(encode_apng([base, (ov, 1, 1, 0, _BLEND_OVER)]))
    px = seq[1][1, 1]
    sa = 128 / 255
    assert px[0] == round(200 * sa + 100 * (1 - sa))
    assert px[3] == round(128 + 255 * (1 - sa))
    assert seq[1][0, 0, 0] == 100  # outside the region untouched


def test_apng_region_bounds_checked():
    import pytest

    from nimhdfstore_spark.operators.png import encode_apng

    base = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="exceeds canvas"):
        encode_apng([base, (np.zeros((3, 3), np.uint8), 2, 2)])


def test_sample_frames_every_n(spark):
    from nimhdfstore_spark.operators.multimodal import sample_frames
    from nimhdfstore_spark.operators.png import decode_png, encode_apng

    rows = []
    for d in range(6):
        frames = [
            np.full((3, 4), (d * 10 + k) % 256, dtype=np.uint8)
            for k in range(1 + d)
        ]
        rows.append((d, bytearray(encode_apng(frames))))
    rows.append((99, bytearray(b"not a png")))  # dropped, not crashed
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, every_n=2).collect()
    got = {(r["doc_id"], r["frame_index"]): r for r in out}
    exp_keys = {(d, k) for d in range(6) for k in range(0, 1 + d, 2)}
    assert set(got) == exp_keys
    for (d, k), r in got.items():
        assert (r["width"], r["height"], r["channels"]) == (4, 3, 1)
        assert r["pixel_sum"] == ((d * 10 + k) % 256) * 12
        back = decode_png(bytes(r["frame_png"]))
        assert (back[:, :, 0] == (d * 10 + k) % 256).all()
