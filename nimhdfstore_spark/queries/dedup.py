"""Deduplication declared queries (north-star QX1/QX2 + extensions).

Oracle-checked: exact dedup, n-gram Jaccard, embedding-cosine near-dup
(hash-free, engine-independent math). Rows-only: MinHash-LSH and SimHash
(xxhash64-dependent); their correctness is pinned in
tests/test_extensions.py by recall against the exact-Jaccard oracle path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

# --------------------------------------------------------------------------
# QX1 — exact dedup (hash groupBy): representative + group size per p_name
# --------------------------------------------------------------------------

_X_EXACT_SQL = """
SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS p_partkey,
       CAST(count(*) AS BIGINT) AS group_size
FROM part GROUP BY p_name ORDER BY p_name
"""


@query("x30_dedup_exact", _X_EXACT_SQL)
def x_exact(spark, sf_dir):
    return (
        D.exact_dedup(load(spark, sf_dir, "part"), ["p_name"], "p_partkey")
        .select("p_name", "p_partkey", "group_size")
        .orderBy("p_name")
    )


# --------------------------------------------------------------------------
# QX2 (exact form) — char-3-gram Jaccard near-dup pairs over documents.
# The SQL twin IS the LSH verifier: hash-free set arithmetic.
# --------------------------------------------------------------------------

_JACCARD_TAU = 0.65
_DOC_LIMIT = 200  # bound the pair space deterministically at every sf

_X_NGRAM_SQL = f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
e AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_grams AS na, b.n_grams AS nb,
         CAST(count(*) AS BIGINT) AS inter
  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, ROUND(inter / (na + nb - inter), 6) AS jaccard
FROM p WHERE ROUND(inter / (na + nb - inter), 6) >= {_JACCARD_TAU}
ORDER BY id_a, id_b
"""


@query("x31_dedup_ngram_jaccard", _X_NGRAM_SQL)
def x_ngram(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=_JACCARD_TAU
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# MinHash + LSH banding (xxhash64 — rows-only check; recall pinned in tests)
# --------------------------------------------------------------------------

@query("x32_dedup_minhash_lsh")
def x_minhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=_JACCARD_TAU
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SimHash near-dup (xxhash64 — rows-only check)
# --------------------------------------------------------------------------

@query("x33_dedup_simhash")
def x_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup — exact fold math, oracle-checked
# --------------------------------------------------------------------------

_COS_TAU = 0.4
_PROBE_LIMIT = 200

_SQL_DOT = (
    "list_reduce(list_transform(range(64), i -> "
    "CAST({a}.embedding[i+1] AS DOUBLE) * CAST({b}.embedding[i+1] AS DOUBLE)), "
    "(x, y) -> x + y)"
)
_X_EMB_SQL = f"""
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND({_SQL_DOT.format(a='a', b='b')} /
      (sqrt({_SQL_DOT.format(a='a', b='a')}) *
       sqrt({_SQL_DOT.format(a='b', b='b')})), 6) AS cosine
  FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id AND a.vec_id < {_PROBE_LIMIT}
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= {_COS_TAU}
ORDER BY id_a, id_b
"""


@query("x34_dedup_embedding_cosine", _X_EMB_SQL)
def x_embedding(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_TAU,
        probe_filter=F.col("id_a") < _PROBE_LIMIT,
    ).orderBy("id_a", "id_b")
