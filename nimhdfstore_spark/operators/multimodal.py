"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the pattern that scales: bytes stay in Arrow buffers end-to-end, decode
happens executor-side in batched Pandas UDFs (``mapInPandas``), and Spark
never interprets the payload. Image decode is REAL for PNG
(``decode_images`` / ``resize_images`` via the pure zlib+numpy codec in
operators/png.py), for animated frame sequences (``sample_frames`` via the
APNG leg of the same codec — acTL/fcTL/fdAT with full dispose/blend
compositing), and for PCM16 audio (``pcm16_features``).
``decode_meta`` keeps its deterministic byte-derived fake for
format-agnostic pipelines whose oracle must not depend on any codec.

Reference tie-in: HDF5's image API (S13, hl/H5IMpublic.nim:26-56) and opaque
type class (wrapper/H5Tpublic.nim:44) are this surface's ancestors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

try:  # decode stack is optional; absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_IMAGE_LIBS = True
except ImportError:
    HAVE_IMAGE_LIBS = False

#: metadata carried alongside every media payload
MEDIA_META = StructType([
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

DECODED_META = StructType([
    StructField("doc_id", LongType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("first_byte", IntegerType()),
])


def pack_binary(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a source column as (id, payload binary, meta struct) — the
    canonical multimodal row shape. Test data has no real media, so the
    payload is the UTF-8 encoding of a text column; with real images this is
    `spark.read.format("binaryFile")` output instead."""
    payload = F.encode(F.col(text_col), "utf-8").cast(BinaryType())
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_meta(df: DataFrame) -> DataFrame:
    """Executor-side batched "decode": extract per-payload metadata via
    ``mapInPandas`` (Arrow batches of binary). With real imaging libs this
    would open the image header; the deterministic fake derives
    width/height from the byte length (width = n % 64, height = (n//64) % 64)
    and exposes the first byte — all pure functions of the payload so the
    DuckDB oracle can verify the full pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = payloads.map(lambda b: 0 if b is None else len(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": pdf["meta"].map(lambda m: m["mime"]),
                "n_bytes": n.astype("int64"),
                "width": (n % 64).astype("int32"),
                "height": ((n // 64) % 64).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: int(b[0]) if b else -1
                ).astype("int32"),
            })

    return df.mapInPandas(batches, schema=DECODED_META)


#: schema of a real pixel decode: per-image dimensions + exact pixel stats
DECODED_PIXELS = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_pixels", LongType()),
    StructField("px_sum", LongType()),
    StructField("px_min", IntegerType()),
    StructField("px_max", IntegerType()),
])


def decode_image_auto(data: bytes):
    """Magic-byte image decode dispatch: PNG (operators/png.py), baseline
    JPEG (operators/jpeg.py — ITU T.81), or GIF87a/89a (operators/gif.py —
    palette + LZW), all pure numpy. Raises ValueError on anything else —
    callers in batch kernels drop, never crash."""
    if data[:2] == b"\xff\xd8":
        from nimhdfstore_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from nimhdfstore_spark.operators.gif import decode_gif

        return decode_gif(data)
    from nimhdfstore_spark.operators.png import decode_png

    return decode_png(data)


def decode_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over a binary column — PNG via the pure
    zlib+numpy codec (operators/png.py) and baseline JPEG via the pure
    numpy T.81 codec (operators/jpeg.py); reference image surface
    hl/H5IMpublic.nim:26-56. Arrow-batched ``mapInPandas``: each task
    decodes its payloads and emits exact integer pixel stats
    (sum/min/max over all samples) — stateless per-row work, no
    shuffle, parallelism = input partitions. Payloads that are not
    decodable images are dropped (route with ``sniff_mime`` upstream;
    real corpora carry mislabeled bytes and a decoder that throws on
    them takes down the stage)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    img = decode_image_auto(bytes(payload))
                except Exception:
                    continue  # not a decodable image: dropped by contract
                h, w, c = img.shape
                flat = img.astype(np.int64)
                rows.append((
                    int(did), w, h, c, 8, h * w * c,
                    int(flat.sum()), int(img.min()), int(img.max()),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_PIXELS.fields]
            )

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=DECODED_PIXELS)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("px_sum", LongType()),
    StructField("payload", BinaryType()),
])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL batched image resize: decode PNG → nearest-neighbor resample
    (source index = floor(dst·src/dst), integer-exact so an oracle can
    recompute the picked pixels) → re-encode PNG (filter 0). Emits the
    resized payload plus its exact pixel sum; undecodable payloads are
    dropped (same contract as ``decode_images``)."""
    from nimhdfstore_spark.operators.png import (
        decode_png, encode_png, resize_nearest,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    img = decode_png(bytes(payload))
                except Exception:
                    continue
                small = resize_nearest(img, width, height)
                rows.append((
                    int(did), width, height, small.shape[2],
                    int(small.astype(np.int64).sum()),
                    bytearray(encode_png(small)),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=RESIZED_SCHEMA)


#: one row per sampled frame
FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("pixel_sum", LongType()),
    StructField("frame_png", BinaryType()),
])


def decode_frames_auto(data: bytes) -> list:
    """Magic-byte animated-decode dispatch: APNG (operators/png.py) or
    GIF87a/89a (operators/gif.py), each returning the list of composited
    full-canvas frames. Raises ValueError on anything else."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from nimhdfstore_spark.operators.gif import decode_gif_frames

        return [frame for frame, _delay in decode_gif_frames(data)]
    from nimhdfstore_spark.operators.png import decode_apng

    return decode_apng(data)


def sample_frames(
    df: DataFrame, every_n: int, id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL animated-frame sampling via the from-scratch codecs — APNG
    (operators/png.py decode_apng — W3C PNG 3rd ed. §4: acTL/fcTL/fdAT,
    full dispose/blend compositing) or GIF (operators/gif.py — LZW +
    disposal compositing), magic-byte dispatched: decode every payload's
    frame sequence executor-side, keep frames 0, N, 2N, …, and emit one
    row per kept frame with its composited pixels re-encoded as a
    standalone PNG.

    This is the animation analog of the reference's image surface
    (hl/H5IMpublic.nim:26-56) and closes the last NotImplementedError in
    the package: no external demuxer exists in this container, but APNG
    and GIF are short public specs, so the existing zlib+numpy codecs do
    all the work. Arrow-batched ``mapInPandas``, drop-don't-crash on
    undecodable payloads — the same shape as ``resize_images``; at 100 TB
    frame extraction is embarrassingly parallel (map-only, no shuffle,
    no state)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    from nimhdfstore_spark.operators.png import encode_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    frames = decode_frames_auto(bytes(payload))
                except Exception:
                    continue  # drop-don't-crash: undecodable payloads skip
                for k in range(0, len(frames), every_n):
                    fr = frames[k]
                    h, w, ch = fr.shape
                    rows.append((
                        int(did), int(k), int(w), int(h), int(ch),
                        int(fr.astype(np.int64).sum()),
                        bytearray(encode_png(fr)),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=FRAME_SCHEMA)


def byte_stats(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Byte-histogram feature extraction over a binary column — entirely
    JVM-side (hex → 2-char pair explode → hash aggregation): even
    "multimodal" feature work stays in whole-stage codegen when it is
    byte-level, no Python decode needed.

    Output per payload: (id, n_bytes, n_distinct_bytes, modal_byte — hex
    pair, ties to the numerically smallest —, modal_count, collision_prob =
    sum(c_i^2)/n^2). Collision probability replaces Shannon entropy on
    purpose: it is a single exact integer ratio (log2 is not
    correctly-rounded and therefore not engine-reproducible). Empty
    payloads are omitted."""
    pairs = df.where(F.octet_length(payload_col) > 0).select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.hex(F.col(payload_col)), F.lit(".."), 0)
        ).alias("byte"),
    )
    per_byte = pairs.groupBy(id_col, "byte").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("byte").asc())
    ranked = per_byte.withColumn("r", F.row_number().over(w))
    agg = per_byte.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bytes"),
        F.count(F.lit(1)).cast("int").alias("n_distinct_bytes"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
    )
    modal = ranked.where(F.col("r") == 1).select(
        F.col(id_col), F.col("byte").alias("modal_byte"),
        F.col("cnt").cast("int").alias("modal_count"),
    )
    return agg.join(modal, id_col).select(
        F.col(id_col),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "n_distinct_bytes",
        "modal_byte",
        "modal_count",
        F.round(
            F.col("sum_sq").cast("double") / (F.col("n_bytes") * F.col("n_bytes")), 6
        ).alias("collision_prob"),
    )


#: magic-byte prefixes for format sniffing (hex, uppercase)
MAGIC_PREFIXES = [
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("52494646", "audio/wav"),      # 'RIFF'
    ("494433", "audio/mpeg"),       # 'ID3'
    ("1A45DFA3", "video/webm"),     # EBML
    ("474946", "image/gif"),        # 'GIF' (87a/89a)
]


def chunk_binary(
    df: DataFrame,
    chunk_bytes: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Split binary payloads into fixed-size byte windows — the audio/video
    segmentation shape (fixed-duration PCM windows, GOP-aligned video
    spans): ``(id, chunk_idx, byte_offset, chunk_len, chunk hex)``.

    Entirely JVM-side: ``sequence`` + ``explode`` generates the window
    index, ``substring`` slices the bytes (Spark substring operates on
    BinaryType natively). No Python, no decode — at 100 TB the chunker must
    not be the bottleneck in front of the (expensive, stubbed here) decode
    UDF. The chunk travels hex-encoded in the RESULT only because the
    correctness harness compares strings; pipeline consumers take the
    binary ``substring`` column directly."""
    n = F.octet_length(payload_col)
    with_idx = df.where(n > 0).select(
        F.col(id_col),
        F.col(payload_col),
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(octet_length({payload_col}) - 1) div {chunk_bytes}"))
        ).alias("chunk_idx"),
    )
    off = F.col("chunk_idx") * chunk_bytes
    chunk = F.expr(f"substring({payload_col}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})")
    return with_idx.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        off.cast("long").alias("byte_offset"),
        F.octet_length(chunk).cast("long").alias("chunk_len"),
        F.hex(chunk).alias("chunk_hex"),
    )


def sniff_mime(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Magic-byte format detection over a binary column, JVM-only: hex the
    first 8 bytes once, then a prefix CASE over the known signatures.
    This is the dispatch step in front of per-format decode UDFs — route by
    sniffed (not declared) type so a mislabeled payload can't crash the
    wrong decoder."""
    head = F.hex(F.expr(f"substring({payload_col}, 1, 12)"))
    expr = F.lit("application/octet-stream")
    for prefix, mime in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix), mime).otherwise(expr)
    # RIFF is a container grammar, not a format: bytes 9-12 name the form
    # ('WAVE' audio vs 'AVI ' video) — disambiguate before the prefix CASE
    expr = F.when(
        head.startswith("52494646") & (F.substring(head, 17, 8) == "41564920"),
        "video/avi",
    ).otherwise(expr)
    return df.select(
        F.col(id_col),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        expr.alias("sniffed_mime"),
    )


def parse_media_headers(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata extraction from real container headers — PNG IHDR
    (big-endian width/height) and WAV RIFF/fmt (little-endian channel
    count, sample rate, bit depth) — entirely JVM-side: hex the payload
    once, then fixed-offset substrings + base-16 conversion. This is the
    step after ``sniff_mime`` routing and before any (expensive) pixel/PCM
    decode: at 100 TB you want resolution/sample-rate filters and
    per-format partitioning to run at scan speed with zero Python, reading
    only the first ~40 bytes of each payload.

    Columns not applicable to the sniffed format come back -1 (not NULL,
    keeping the frame join/filter-friendly). Payloads that are neither a
    structurally valid PNG (signature + IHDR tag) nor WAV (RIFF + WAVE +
    fmt tags) parse as 'application/octet-stream' with all fields -1 —
    a truncated or mislabeled file can't produce garbage dimensions.

    Format layouts are public: PNG signature + IHDR chunk (W3C PNG spec
    §5.2/§11.2.2 — width bytes 17-20 BE, height 21-24 BE), WAV canonical
    RIFF (channels bytes 23-24 LE, sample rate 25-28 LE, bits 35-36 LE)."""
    hx = F.hex(F.col(payload_col))

    def be(pos_bytes: int, nbytes: int) -> Column:
        return F.conv(
            F.substring(hx, (pos_bytes - 1) * 2 + 1, nbytes * 2), 16, 10
        ).cast("long")

    def le(pos_bytes: int, nbytes: int) -> Column:
        total = F.lit(0).cast("long")
        for i in range(nbytes):
            byte = F.conv(
                F.substring(hx, (pos_bytes - 1 + i) * 2 + 1, 2), 16, 10
            ).cast("long")
            total = total + byte * F.lit(256 ** i)
        return total

    is_png = hx.startswith("89504E470D0A1A0A") & (
        F.substring(hx, 25, 8) == "49484452"  # "IHDR"
    )
    is_wav = (
        hx.startswith("52494646")             # "RIFF"
        & (F.substring(hx, 17, 8) == "57415645")   # "WAVE"
        & (F.substring(hx, 25, 8) == "666D7420")   # "fmt "
    )
    neg = F.lit(-1).cast("long")
    return df.select(
        F.col(id_col),
        F.when(is_png, "image/png")
        .when(is_wav, "audio/wav")
        .otherwise("application/octet-stream")
        .alias("parsed_mime"),
        F.when(is_png, be(17, 4)).otherwise(neg).alias("width"),
        F.when(is_png, be(21, 4)).otherwise(neg).alias("height"),
        F.when(is_wav, le(23, 2)).otherwise(neg).alias("n_channels"),
        F.when(is_wav, le(25, 4)).otherwise(neg).alias("sample_rate"),
        F.when(is_wav, le(35, 2)).otherwise(neg).alias("bits_per_sample"),
    )


def pcm16_features(
    df: DataFrame,
    id_col: str = "doc_id",
    pcm_col: str = "pcm",
    window: int = 64,
) -> DataFrame:
    """Per-window features over raw PCM16-LE audio payloads: energy (exact
    int64 sum of squares), zero crossings, and sample count — the
    frame-level feature-extraction member of the multimodal family that
    actually DECODES sample data (x50's image decode is lib-gated; PCM16
    needs only byte order). Arrow-batched ``mapInPandas``: each batch's
    payloads go through ``np.frombuffer`` (zero-copy) and a vectorized
    reshape-square-sum — no per-sample Python. Scale shape: stateless
    per-row work, no shuffle; parallelism = input partitions."""
    from pyspark.sql.types import (
        LongType, StructField as SF_, StructType as ST_,
    )

    out_schema = ST_(
        [
            SF_(id_col, LongType()),
            SF_("window_id", LongType()),
            SF_("n_samples", LongType()),
            SF_("energy", LongType()),
            SF_("zero_crossings", LongType()),
        ]
    )

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, wids, ns, es, zs = [], [], [], [], []
            for did, buf in zip(pdf[id_col], pdf[pcm_col]):
                s = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                for w in range(0, len(s), window):
                    seg = s[w : w + window]
                    ids.append(int(did))
                    wids.append(w // window)
                    ns.append(len(seg))
                    es.append(int((seg * seg).sum()))
                    zs.append(int(((seg[:-1] * seg[1:]) < 0).sum()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "window_id": wids,
                    "n_samples": ns,
                    "energy": es,
                    "zero_crossings": zs,
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


#: one row per hashed image
DHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("dhash", LongType()),
])


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over an image binary column —
    the image analog of SimHash: decode (PNG or baseline JPEG, magic-byte
    dispatched), nearest-neighbor resample the first channel to
    ``(grid+1) x grid``, then bit ``i`` of the hash is 1 iff the right
    neighbor is strictly brighter (``px[y,x+1] > px[y,x]``). Comparisons
    make the hash invariant to any constant brightness shift that stays
    in gamut — the property near-duplicate image dedup relies on; the
    same image encoded as PNG and as high-quality JPEG lands on the same
    or near-identical hash (dHash tolerates small lossy error).

    Emitted as a SIGNED int64 (bit 63 lands in the sign), so downstream
    grouping/joining uses Spark's native long. Stateless Arrow-batched
    ``mapInPandas``, no shuffle here: pair generation downstream is a
    groupBy/equi-join on the hash (Hamming-0) or on SimHash-style bands of
    it (Hamming<=t, ``dedup.simhash_bands``) — never all-pairs.
    Undecodable payloads are dropped (``decode_images`` contract)."""
    from nimhdfstore_spark.operators.png import resize_nearest

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    img = decode_image_auto(bytes(payload))
                except Exception:
                    continue
                h, w, _c = img.shape
                small = resize_nearest(img, grid + 1, grid)[:, :, 0]
                small = small.astype(np.int64)
                bits = (small[:, 1:] > small[:, :-1]).flatten()
                hv = 0
                for i, b in enumerate(bits):
                    if b:
                        hv |= 1 << i
                if hv >= 1 << 63:
                    hv -= 1 << 64
                rows.append((int(did), w, h, hv))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=DHASH_SCHEMA)
