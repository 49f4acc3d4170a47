"""Similarity-search declared queries (north-star QX3): brute-force top-k
cosine and the fixed-k IVF scale path — both oracle-checked (the centroid
pick and all ranking math are engine-independent); IVF recall vs brute force
additionally pinned in tests/test_extensions.py."""

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


# IVF with FIXED-k centroids (k independent of corpus size, so the centroid
# broadcast is O(k) at any scale). Oracle-checked since round 2: the centroid
# pick is an engine-independent multiplicative-hash top-k, and assignment /
# probe routing / final ranking are plain SQL windows over the same fold math.

_IVF_K, _IVF_NPROBE = 64, 2
_CENT_HASH = "(vec_id % 4294967296) * 40503 % 4294967296"

_DOTC = (  # dot between an embeddings row alias and a centroid alias
    "list_reduce(list_transform(range(64), i -> "
    "CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), (x, y) -> x + y)"
)


def _ivf_sql() -> str:
    cos = lambda a, b: (  # noqa: E731
        f"{_DOTC.format(a=a, b=b)} / "
        f"(sqrt({_DOTC.format(a=a, b=a)}) * sqrt({_DOTC.format(a=b, b=b)}))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cluster_id, embedding AS centv FROM embeddings
  ORDER BY {_CENT_HASH}, vec_id LIMIT {_IVF_K}
),
assigned AS (
  SELECT id, vec, vn, cluster_id FROM (
    SELECT e.vec_id AS id, e.embedding AS vec,
           sqrt({_DOTC.format(a='e.embedding', b='e.embedding')}) AS vn,
           c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.centv')} DESC, c.cluster_id) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
),
pc AS (
  SELECT probe_id, pv, pn, cluster_id FROM (
    SELECT p.vec_id AS probe_id, p.embedding AS pv,
           sqrt({_DOTC.format(a='p.embedding', b='p.embedding')}) AS pn,
           c.cluster_id,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY {cos('p.embedding', 'c.centv')} DESC, c.cluster_id) AS r
    FROM embeddings p CROSS JOIN cents c WHERE p.vec_id IN {_PROBES}
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT pc.probe_id, a.id AS neighbor_id,
         ROUND({_DOTC.format(a='pc.pv', b='a.vec')} / (pc.pn * a.vn), 6) AS cosine
  FROM pc JOIN assigned a USING (cluster_id) WHERE pc.probe_id != a.id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM cand
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {_K} ORDER BY probe_id, rank
"""


@query("x41_ann_ivf_topk", _ivf_sql())
def x_ann_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.ivf_topk(
        emb, probes, k=_K, num_centroids=_IVF_K, nprobe=_IVF_NPROBE
    ).orderBy("probe_id", "rank")
