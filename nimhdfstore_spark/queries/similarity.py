"""Similarity-search declared queries (north-star QX3): brute-force top-k
cosine (oracle-checked) and the IVF scale path (rows-only; recall pinned in
tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import similarity as S
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_K = 10
_PROBES = (0, 1, 2, 3, 4)

_SQL_DOT = (
    "list_reduce(list_transform(range(64), i -> "
    "CAST({a}.embedding[i+1] AS DOUBLE) * CAST({b}.embedding[i+1] AS DOUBLE)), "
    "(x, y) -> x + y)"
)

_X_ANN_SQL = f"""
WITH sims AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    ROUND({_SQL_DOT.format(a='p', b='c')} /
      (sqrt({_SQL_DOT.format(a='p', b='p')}) *
       sqrt({_SQL_DOT.format(a='c', b='c')})), 6) AS cosine
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id IN {_PROBES}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {_K} ORDER BY probe_id, rank
"""


@query("x40_ann_bruteforce_topk", _X_ANN_SQL)
def x_ann_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.brute_force_topk(emb, probes, k=_K).orderBy("probe_id", "rank")


@query("x41_ann_ivf_topk")
def x_ann_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.ivf_topk(emb, probes, k=_K, every=50, nprobe=2).orderBy(
        "probe_id", "rank"
    )
