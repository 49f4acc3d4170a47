"""Benchmark decontamination — flag training documents that overlap an
evaluation set by shared word n-grams (the standard 13-gram-style contamination
check from public LLM training reports, parameterized to smaller n for short
documents).

Scale shape: the benchmark side (an eval suite) is tiny relative to a 100 TB
corpus, so its distinct shingle set is broadcast; the corpus side is one
explode + an equi-join on the shingle string + a groupBy(doc_id) count — both
map-side combinable and keyed by document, no all-pairs work anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nimhdfstore_spark.operators.text import tokens, word_ngram_array

#: flag a document when at least this fraction of its shingles appear in the
#: benchmark set
DECONTAM_THRESHOLD = 0.08


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, grams) — DISTINCT word n-grams per document; documents shorter
    than ``n`` tokens are dropped (they have no n-grams)."""
    tok = tokens(text_col)
    return df.where(F.size(tok) >= n).select(
        F.col(id_col),
        F.array_distinct(word_ngram_array(tok, n)).alias("grams"),
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = DECONTAM_THRESHOLD,
) -> DataFrame:
    """Per corpus document: how much of it appears verbatim (n-gram-wise) in
    the benchmark set.

    Output: (id, n_shingles, n_hits, hit_frac, contaminated). ``n_hits``
    counts DISTINCT shingles of the document that any benchmark document
    contains."""
    corp = doc_shingles(corpus, id_col, text_col, n)
    bench_grams = (
        doc_shingles(benchmark, id_col, text_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corp_grams = corp.select(id_col, F.explode("grams").alias("gram"))
    hits = (
        corp_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    tot = corp.select(id_col, F.size("grams").cast("int").alias("n_shingles"))
    joined = tot.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_shingles",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
    )
    frac = F.round(F.col("n_hits") * 1.0 / F.col("n_shingles"), 6)
    return joined.withColumn("hit_frac", frac).withColumn(
        "contaminated", F.col("hit_frac") >= threshold
    )
