"""X27-X29 — information-retrieval queries over ``documents``: BM25 search,
TF-IDF term weighting, inverted index. Extension surface (the reference is
storage-only); every query has an exact-value DuckDB oracle built from the
same tokenizer regex as queries/text.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import ir as IR
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

_BM25_TERMS = ["join", "stream", "vector"]
_BM25_K1 = 1.2
_BM25_B = 0.75

_X27_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ('join', 'stream', 'vector')
  GROUP BY doc_id, token
),
idf AS (
  SELECT token, ln(1 + (n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM tf, stats GROUP BY token, n_docs
)
SELECT tf.doc_id,
       ROUND(SUM(idf.idf * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))),
             4) AS score
FROM tf
JOIN dl ON tf.doc_id = dl.doc_id
JOIN idf ON tf.token = idf.token, stats
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id LIMIT 15
"""


@query("x27_bm25_search", _X27_SQL)
def x27(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    scored = IR.bm25(docs, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B)
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(15)
    )


_X28_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
),
per_doc AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
stats AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM per_doc)
SELECT token,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(count(*) AS BIGINT) AS df,
       ROUND(SUM(tf) * ln(n_docs / count(*)), 4) AS tfidf
FROM per_doc, stats
GROUP BY token, n_docs
HAVING count(*) >= 5
ORDER BY tfidf DESC, token LIMIT 20
"""


@query("x28_tfidf_terms", _X28_SQL)
def x28(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        IR.tfidf_terms(docs, min_df=5)
        .select("token", "total_tf", "df", F.round("tfidf", 4).alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), "token")
        .limit(20)
    )


_X29_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, token
  FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id ORDER BY doc_id))[1:15], ',') AS postings
FROM pairs
GROUP BY token
HAVING count(*) >= 2
ORDER BY df DESC, token LIMIT 30
"""


@query("x29_inverted_index", _X29_SQL)
def x29(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    idx = IR.inverted_index(docs, min_df=2, max_postings=15)
    return (
        idx.select(
            "token",
            "df",
            F.array_join(F.col("postings").cast("array<string>"), ",").alias("postings"),
        )
        .orderBy(F.col("df").desc(), "token")
        .limit(30)
    )


# --------------------------------------------------------------------------
# x182 — trigram-indexed substring search (the pg_trgm discipline for
# accelerating LIKE '%needle%'): candidate docs come from intersecting the
# posting lists of the needle's distinct trigrams (docs containing EVERY
# needle trigram — a groupBy-count over the trigram equi-join, never a
# full-corpus contains() scan), then an exact contains() verifies the
# survivors (trigram containment is necessary, not sufficient: the grams
# can appear scattered). At 100 TB the posting lists are the persisted
# index and the probe touches |needle|-2 postings; the final result is
# EXACT, so the oracle is the plain substring scan.
# --------------------------------------------------------------------------

_X182_NEEDLE = "fast merge"

_X182_SQL = f"""
SELECT doc_id, lang
FROM documents
WHERE position('{_X182_NEEDLE}' IN lower(text)) > 0
ORDER BY doc_id
"""


@query("x182_trigram_substring_search", _X182_SQL)
def x182(spark, sf_dir):
    from nimhdfstore_spark.operators.dedup import char_ngrams

    needle = _X182_NEEDLE.lower()
    grams = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    docs = load(spark, sf_dir, "documents")
    # explicit pre-explode repartition: char_ngrams is an interpreted HOF
    # and a single-split corpus would run the whole trigram extraction on
    # one task (12.7 s cold / 4.5 s warm -> 5.3 s cold / 0.8 s warm at
    # sf0.1); explicit N survives AQE (the pre-explode input looks tiny)
    par = spark.sparkContext.defaultParallelism
    postings = (
        docs.repartition(par, F.col("doc_id"))
        .select("doc_id", F.explode(char_ngrams("text", 3)).alias("gram"))
        .where(F.col("gram").isin(grams))
    )
    cand = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("hits"))
        .where(F.col("hits") == len(grams))
        .select("doc_id")
    )
    return (
        docs.join(cand, "doc_id", "left_semi")
        .where(F.instr(F.lower(F.col("text")), needle) > 0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )
