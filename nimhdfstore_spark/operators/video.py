"""AVI / MJPEG video container demux + mux (pure stdlib struct + the
operators/jpeg.py codec) — the container-format video leg of the
multimodal surface. The reference's media surface stops at still images
(nimhdf5/hl/H5IMpublic.nim); a training-data pipeline over crawled video
needs at minimum: parse the container, enumerate frames, sample every
k-th frame, decode the sampled frames. Motion-JPEG inside AVI is the one
mainstream video format whose entire stack is public-spec and
self-contained: AVI is RIFF (the same chunk grammar as WAV, Microsoft
"AVI RIFF File Reference"), and every MJPEG frame is a complete baseline
JPEG (ITU T.81) — no inter-frame prediction, so frame sampling needs no
decode of the frames it skips.

Scope: single-video-stream AVI ('vids'/'MJPG'), '00dc' frame chunks in
the 'movi' list, avih/strh/strf headers, optional idx1 (written, not
required for reading — frames are walked structurally). Audio streams
and other codecs are skipped on read; mux writes video-only files.

Scale shape: demux is a linear single-pass walk over one payload —
corpus parallelism comes from the Arrow-batched mapInPandas wrappers
(sample_video_frames), one video per row, stateless, no shuffle. Frame
SAMPLING is O(frames kept): skipped frames are never JPEG-decoded, only
their chunk headers are stepped over — the property that makes every-kth
sampling of a 100 TB crawl affordable.
"""

from __future__ import annotations

import struct

import numpy as np


def _fourcc(b: bytes) -> bytes:
    return b.ljust(4)[:4]


def mux_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> bytes:
    """JPEG frame payloads → minimal canonical AVI (one MJPG video
    stream, '00dc' chunks, idx1 index)."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    usec = 1_000_000 // max(1, fps)
    max_bytes = max(len(f) for f in frames)

    # avih: MainAVIHeader (14 dwords)
    avih = struct.pack(
        "<14I",
        usec, max_bytes * fps, 0, 0x10,  # usec/frame, max bps, pad, HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    # strh: AVIStreamHeader — 'vids' + 'MJPG', rate/scale = fps/1
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    # strf: BITMAPINFOHEADER with biCompression 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return _fourcc(cid) + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", _fourcc(ltype) + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = bytearray(b"movi")
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of '00dc' within movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for f, off in zip(frames, offsets):
        # AVIINDEXENTRY: ckid, flags (KEYFRAME), offset (within movi,
        # pointing at the ckid), length
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def demux_avi(data: bytes) -> dict:
    """AVI bytes → {'width', 'height', 'fps', 'n_frames', 'frames':
    [jpeg bytes, ...]} for the first MJPG video stream. Walks the RIFF
    chunk tree structurally (no idx1 needed); raises ValueError on
    non-AVI input or a missing video stream."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    meta: dict = {"width": None, "height": None, "fps": None}
    frames: list[bytes] = []

    # Explicit-stack pre-order walk (identical visit order to recursion):
    # adversarially nested LIST chunks must raise/parse like any other
    # malformed input, never hit Python's recursion limit. Each LIST frame
    # consumes >= 12 bytes of input, so the stack is bounded by len(data)/12.
    stack = [(12, 12 + struct.unpack_from("<I", data, 4)[0] - 4)]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            nxt = body_start + size + (size % 2)  # chunks are word-aligned
            if cid == b"LIST":
                stack.append((nxt, end))  # resume after this list
                pos, end = body_start + 4, body_end  # skip list type fourcc
                continue
            if cid == b"avih":
                vals = struct.unpack_from("<14I", data, body_start)
                meta["fps"] = (1_000_000 // vals[0]) if vals[0] else 0
                meta["width"], meta["height"] = vals[8], vals[9]
            elif cid == b"strh":
                fcc_type = data[body_start : body_start + 4]
                handler = data[body_start + 4 : body_start + 8]
                if fcc_type == b"vids" and handler not in (b"MJPG", b"mjpg"):
                    raise ValueError(
                        f"unsupported video codec {handler!r} (MJPG only)"
                    )
            elif cid[2:4] == b"dc" and cid[:2].isdigit():
                frames.append(bytes(data[body_start:body_end]))
            pos = nxt
    if meta["width"] is None:
        raise ValueError("no avih header found")
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


def sample_avi_frames(
    df,
    every_k: int = 1,
    id_col: str = "doc_id",
    payload_col: str = "payload",
):
    """Demux an AVI binary column and decode every k-th MJPEG frame —
    the video analog of multimodal.sample_frames (APNG). Arrow-batched
    ``mapInPandas``; one output row per SAMPLED frame with exact integer
    pixel stats; skipped frames are stepped over at chunk granularity
    and never JPEG-decoded. Undecodable payloads/frames are dropped
    (decode_images contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    from nimhdfstore_spark.operators.jpeg import decode_jpeg

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("px_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ])

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    m = demux_avi(bytes(payload))
                except Exception:
                    continue
                for fno in range(0, m["n_frames"], every_k):
                    try:
                        img = decode_jpeg(m["frames"][fno])
                    except Exception:
                        continue
                    flat = img.astype(np.int64)
                    rows.append((
                        int(did), fno, m["n_frames"], m["fps"],
                        img.shape[1], img.shape[0],
                        int(flat.sum()), int(img.min()), int(img.max()),
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=schema)
