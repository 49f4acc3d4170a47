"""Multimodal declared query: binary-column plumbing through a real
``mapInPandas`` decode pass, oracle-checked end-to-end (the fake decode is a
pure function of the payload bytes, so DuckDB can recompute it from the
source text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import multimodal as M
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_X_MM_SQL = """
SELECT doc_id,
  'application/octet-stream' AS mime,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(octet_length(encode(text)) % 64 AS INT) AS width,
  CAST((octet_length(encode(text)) // 64) % 64 AS INT) AS height,
  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
            ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte
FROM documents ORDER BY doc_id
"""


@query("x50_multimodal_decode", _X_MM_SQL)
def x_mm_decode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    packed = M.pack_binary(docs, "doc_id", "text")
    return M.decode_meta(packed).orderBy("doc_id")


# --------------------------------------------------------------------------
# x51 — byte-histogram features over the binary payload, zero Python:
# hex-pair explode + hash aggregation. Collision probability stands in for
# entropy (exact integer ratio — log2 is not engine-reproducible).
# --------------------------------------------------------------------------

_X51_SQL = """
WITH pairs AS (
  SELECT doc_id, unnest(regexp_extract_all(hex(encode(text)), '..')) AS byte
  FROM documents WHERE octet_length(encode(text)) > 0
),
pb AS (SELECT doc_id, byte, count(*) AS cnt FROM pairs GROUP BY 1, 2),
ag AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bytes,
         CAST(count(*) AS INT) AS n_distinct_bytes,
         CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq
  FROM pb GROUP BY 1
),
modal AS (
  SELECT doc_id, byte AS modal_byte, CAST(cnt AS INT) AS modal_count FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, byte ASC) AS r FROM pb
  ) WHERE r = 1
)
SELECT a.doc_id, a.n_bytes, a.n_distinct_bytes, m.modal_byte, m.modal_count,
  ROUND(CAST(a.sum_sq AS DOUBLE) / (a.n_bytes * a.n_bytes), 6) AS collision_prob
FROM ag a JOIN modal m USING (doc_id) ORDER BY a.doc_id
"""


@query("x51_multimodal_byte_stats", _X51_SQL)
def x_mm_byte_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    packed = M.pack_binary(docs, "doc_id", "text")
    return M.byte_stats(packed, "doc_id", "payload").orderBy("doc_id")


# --------------------------------------------------------------------------
# x117 — fixed-window binary chunking (audio/video segmentation plumbing):
# sequence+explode+substring, all JVM-side, chunk returned hex-encoded for
# the string-compare harness.
# --------------------------------------------------------------------------

_CHUNK_BYTES = 256

_X117_SQL = f"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
  WHERE octet_length(encode(text)) > 0
),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         CAST(i * {_CHUNK_BYTES} AS BIGINT) AS byte_offset,
         substring(hx, CAST(i * {_CHUNK_BYTES} * 2 + 1 AS INT),
                   {_CHUNK_BYTES} * 2) AS chunk_hex
  FROM p, unnest(range(0, (length(hx) // 2 - 1) // {_CHUNK_BYTES} + 1)) AS t(i)
)
SELECT doc_id, chunk_idx, byte_offset,
       CAST(length(chunk_hex) // 2 AS BIGINT) AS chunk_len,
       chunk_hex
FROM c ORDER BY doc_id, chunk_idx
"""


@query("x117_multimodal_chunking", _X117_SQL)
def x117(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    packed = M.pack_binary(docs, "doc_id", "text")
    return M.chunk_binary(packed, _CHUNK_BYTES).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# x118 — magic-byte MIME sniffing: deterministic fake headers (doc_id % 6
# picks a signature) prepended to the payload, then detected back — the
# dispatch step in front of per-format decode UDFs.
# --------------------------------------------------------------------------

def _x118_sql() -> str:
    whens_pref = " ".join(
        f"WHEN doc_id % 6 = {i} THEN from_hex('{pfx}')"
        for i, (pfx, _) in enumerate(M.MAGIC_PREFIXES)
    )
    whens_mime = " ".join(
        f"WHEN starts_with(hd, '{pfx}') THEN '{mime}'"
        for pfx, mime in M.MAGIC_PREFIXES
    )
    return f"""
WITH p AS (
  SELECT doc_id,
         (CASE {whens_pref} ELSE ''::BLOB END) || encode(text) AS payload
  FROM documents
),
h AS (SELECT doc_id, octet_length(payload) AS n_bytes,
             substring(hex(payload), 1, 16) AS hd FROM p)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       CASE {whens_mime} ELSE 'application/octet-stream' END AS sniffed_mime
FROM h ORDER BY doc_id
"""


@query("x118_multimodal_sniff", _x118_sql())
def x118(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    packed = M.pack_binary(docs, "doc_id", "text")
    prefix = F.lit(None).cast("binary")
    for i, (pfx, _) in enumerate(M.MAGIC_PREFIXES):
        cond = F.col("doc_id") % 6 == i
        prefix = F.when(cond, F.unhex(F.lit(pfx))).otherwise(prefix)
    with_hdr = packed.select(
        "doc_id",
        F.concat(
            F.coalesce(prefix, F.lit(b"")), F.col("payload")
        ).alias("payload"),
    )
    return M.sniff_mime(with_hdr).orderBy("doc_id")
