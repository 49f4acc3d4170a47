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
