"""Multimodal declared query: binary-column plumbing through a real
``mapInPandas`` decode pass, oracle-checked end-to-end (the fake decode is a
pure function of the payload bytes, so DuckDB can recompute it from the
source text)."""

from __future__ import annotations

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
