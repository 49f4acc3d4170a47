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
