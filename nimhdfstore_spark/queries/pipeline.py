"""End-to-end training-data pipeline query (x90): the composition a corpus
team actually runs — deterministic sample → MinHash-LSH near-dup pairs →
connected components → canonical representative per cluster → quality
filter → per-language token budget.

Every stage is one of this repo's operators, and every stage's arithmetic
is engine-independent, so the ENTIRE pipeline has a single composed DuckDB
oracle (sampling hash + minhash CTEs + recursive components + quality
expression + BPE token count) that hash-matches end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.operators import sampling as SA
from nimhdfstore_spark.operators import text as T
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.queries.dedup import minhash_pair_ctes
from nimhdfstore_spark.queries.sampling import _h
from nimhdfstore_spark.queries.text import _SQL_STOPS, _SQL_TOKENS
from nimhdfstore_spark.tables import load

_FRACTION, _SALT = 0.10, 7
_QUALITY_TAU = 0.5

_SAMPLE_COND = f"{_h('doc_id', _SALT)} < {int(_FRACTION * SA.MOD32)}"

_QUALITY_EXPR = f"""ROUND(0.4 * least(len({_SQL_TOKENS}) / 20.0, 1.0)
  + 0.3 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
           / greatest(length(text), 1))
  + 0.3 * (len(list_filter({_SQL_TOKENS}, x -> list_contains({_SQL_STOPS}, x)))
           / greatest(len({_SQL_TOKENS}), 1)), 6)"""

_BPE_COUNT = (
    f"len(list_filter(regexp_extract_all(text, '{T.BPE_PATTERN}'), "
    "x -> regexp_matches(x, '[^\\s]')))"
)

_X90_SQL = f"""
WITH RECURSIVE {minhash_pair_ctes(_SAMPLE_COND, prefix="m")},
ed AS (
  SELECT id_a AS src, id_b AS dst FROM mp
  UNION ALL SELECT id_b, id_a FROM mp
),
nn AS (SELECT doc_id AS nid FROM documents WHERE {_SAMPLE_COND}),
reach(nid, r) AS (
  SELECT nid, nid FROM nn
  UNION
  SELECT ed.src, reach.r FROM ed JOIN reach ON ed.dst = reach.nid
),
lbl AS (SELECT nid, min(r) AS comp FROM reach GROUP BY nid),
reps AS (SELECT nid AS doc_id FROM lbl WHERE nid = comp),
clean AS (
  SELECT d.* FROM documents d JOIN reps USING (doc_id)
  WHERE {_QUALITY_EXPR} >= {_QUALITY_TAU}
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({_BPE_COUNT}) AS BIGINT) AS total_bpe_tokens
FROM clean GROUP BY lang ORDER BY lang
"""


@query("x90_pipeline_clean_corpus", _X90_SQL)
def x_pipeline(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    samp = SA.hash_sample(docs, "doc_id", _FRACTION, salt=_SALT)
    pairs = D.minhash_lsh_pairs(
        samp, "doc_id", "text", num_hashes=64, bands=16, threshold=0.65
    ).select("id_a", "id_b")
    comp = D.connected_components(pairs, samp, id_col="doc_id")
    reps = comp.where(F.col("id") == F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    clean = samp.join(reps, "doc_id").where(
        T.quality_score("text") >= _QUALITY_TAU
    )
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.bpe_token_count("text")).cast("long").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )
