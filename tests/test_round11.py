"""Round-11 pins: the round-6 ADVICE closures.

- JPEG decode scope guards: 4-component SOF0 (Adobe CMYK) and
  non-interleaved multi-scan baseline now raise instead of silently
  mis-decoding through the 3-component interleaved path.
- Truncated entropy streams raise the module's documented ValueError,
  never IndexError (direct callers get a consistent error contract).
- AVI demux survives adversarially nested LIST chunks without hitting
  Python's recursion limit (explicit-stack walk).
- sweep_rotation() snapshots the CORRECTNESS file count once per process
  so q29's import-time leg capture and sweep_order() can never disagree
  mid-round.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nimhdfstore_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _sof0(ncomp: int) -> bytes:
    body = struct.pack(">BHHB", 8, 16, 16, ncomp)
    for ci in range(ncomp):
        body += struct.pack(">BBB", ci + 1, 0x11, 0)
    return b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body


def test_four_component_sof0_raises():
    # Adobe CMYK/YCCK is valid baseline but out of decode scope — running
    # it through the YCbCr path would return garbage pixels silently.
    evil = b"\xff\xd8" + _sof0(4) + b"\xff\xd9"
    with pytest.raises(ValueError, match="4-component"):
        decode_jpeg(evil)


def test_two_component_sof0_raises():
    evil = b"\xff\xd8" + _sof0(2) + b"\xff\xd9"
    with pytest.raises(ValueError, match="2-component"):
        decode_jpeg(evil)


def test_non_interleaved_multiscan_raises():
    # a 3-component frame followed by a 1-component scan: decoding only
    # the first scan would zero-fill the other planes
    sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    evil = b"\xff\xd8" + _sof0(3) + sos
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(evil)


def test_truncated_entropy_raises_valueerror_not_indexerror():
    # a real encoded image cut inside its entropy stream must raise the
    # documented ValueError (truncated data or invalid code), never leak
    # an IndexError from the rolling-window list
    img = (np.arange(32 * 32).reshape(32, 32, 1) % 199).astype(np.uint8)
    data = encode_jpeg(img, quality=75)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + struct.unpack_from(">H", data, sos + 2)[0]
    for keep in (0, 1, 3, 7):
        cut = data[: scan_start + keep]
        with pytest.raises(ValueError):
            decode_jpeg(cut)


def test_avi_nested_lists_no_recursion_error():
    from nimhdfstore_spark.operators.video import demux_avi

    depth = 4000  # far past the default Python recursion limit
    body = b"JUNK" + struct.pack("<I", 0)
    for _ in range(depth):
        inner = b"list" + body  # list-type fourcc + previous level
        body = b"LIST" + struct.pack("<I", len(inner)) + inner
    payload = b"AVI " + body
    avi = b"RIFF" + struct.pack("<I", len(payload)) + payload
    # no avih header anywhere -> the documented ValueError, and crucially
    # no RecursionError on the way there
    with pytest.raises(ValueError, match="avih"):
        demux_avi(avi)


def test_sweep_rotation_snapshots_file_count(monkeypatch):
    import glob as g

    import nimhdfstore_spark.queries as Q

    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION", raising=False)
    monkeypatch.setattr(Q, "_ROTATION_SNAPSHOT", None)
    calls = {"n": 0}

    def fake(pat):
        calls["n"] += 1
        return ["r"] * (3 + calls["n"])  # a record lands mid-process

    monkeypatch.setattr(g, "glob", fake)
    r1 = Q.sweep_rotation()
    r2 = Q.sweep_rotation()
    assert r1 == r2 == 4  # first glob wins; the mid-round file is invisible
    assert calls["n"] == 1


def test_sweep_rotation_env_override_stays_dynamic(monkeypatch):
    import nimhdfstore_spark.queries as Q

    monkeypatch.setattr(Q, "_ROTATION_SNAPSHOT", 7)
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "11")
    assert Q.sweep_rotation() == 11
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "12")
    assert Q.sweep_rotation() == 12
