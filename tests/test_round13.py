"""Round-9 regression pins: ADVICE r8 fixes (h5lite name lookup, GIF
transparent-index palettes, post-backlog sweep rotation) and the
stale-lock-break race fix in Store._commit_lock."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest


# --------------------------------------------------------------------------
# h5lite: a wrong dataset name is a lookup error, not "malformed HDF5 file"
# (ADVICE r8) — and TypeError is no longer normalized to ValueError.
# --------------------------------------------------------------------------


def test_h5lite_missing_dataset_is_lookup_error(tmp_path):
    from nimhdfstore_spark.sources import h5lite

    arr = np.zeros(5, dtype=np.dtype([("k", "<i8")]))
    path = str(tmp_path / "t.h5")
    h5lite.write(path, {"present": arr})
    with pytest.raises(KeyError, match="no such dataset 'absent'"):
        h5lite.read(path, "absent")
    with pytest.raises(KeyError, match="no such dataset"):
        h5lite.read_range(path, "absent", 0, 1)
    # the malformed-file contract is untouched
    bad = str(tmp_path / "bad.h5")
    with open(bad, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\ngarbage-after-signature")
    with pytest.raises(ValueError):
        h5lite.catalog(bad)


# --------------------------------------------------------------------------
# GIF: a transparent index >= palette size must not reject the frame — the
# index is compared, never looked up (ADVICE r8; such files exist in the
# wild). Only OPAQUE out-of-range indexes are corruption.
# --------------------------------------------------------------------------


def _gif_with_transparent_index(tidx: int, indices: bytes) -> bytes:
    """Handcrafted 2x2 GIF89a with a 2-color global table and a graphic
    control extension declaring ``tidx`` transparent."""
    from nimhdfstore_spark.operators.gif import _blockify, _lzw_encode

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # GCT present, 2 colors
    out += b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
    out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, tidx]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out += bytes([2]) + _blockify(_lzw_encode(2, indices))
    out += b"\x3b"
    return bytes(out)


def test_gif_transparent_index_beyond_palette_decodes():
    from nimhdfstore_spark.operators.gif import decode_gif

    img = decode_gif(_gif_with_transparent_index(2, bytes([0, 1, 2, 2])))
    assert img.shape == (2, 2, 3)
    # opaque pixels resolved from the palette; transparent ones keep the
    # background (gct[0] = black)
    assert tuple(img[0, 0]) == (0, 0, 0)
    assert tuple(img[0, 1]) == (255, 255, 255)
    assert tuple(img[1, 0]) == (0, 0, 0)
    assert tuple(img[1, 1]) == (0, 0, 0)


def test_gif_opaque_index_beyond_palette_still_rejected():
    from nimhdfstore_spark.operators.gif import decode_gif

    # index 3 is opaque (transparent declared as 2) and outside the table
    with pytest.raises(ValueError, match="outside color table"):
        decode_gif(_gif_with_transparent_index(2, bytes([0, 1, 3, 2])))


# --------------------------------------------------------------------------
# sweep_order: once the verified backlog drains (fresh empty), the 3*r
# rotation must keep shifting the DONE partition so re-verification spreads
# across the registry instead of pinning the same front entries (ADVICE r8).
# --------------------------------------------------------------------------


def test_sweep_order_rotates_done_partition_after_drain(monkeypatch):
    import nimhdfstore_spark.queries as Q

    Q.load_all()
    ext = [n for n in Q.QUERIES if not n.startswith("q")]
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(ext))

    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "0")
    o0 = [n for n in Q.sweep_order() if not n.startswith("q")]
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "1")
    o1 = [n for n in Q.sweep_order() if not n.startswith("q")]

    assert sorted(o0) == sorted(o1) == sorted(ext)
    assert o0 != o1, "drained backlog must still rotate re-verification"
    # it is the same cycle shifted by 3
    assert o1 == o0[3:] + o0[:3]
