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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: flag a document when at least this fraction of its shingles appear in the
#: benchmark set
DECONTAM_THRESHOLD = 0.08


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, gram) — DISTINCT word n-grams per document, exploded form;
    documents shorter than ``n`` tokens produce no rows.

    Shape: explode(split) + WHERE + window ``lead`` — everything stays in
    whole-stage codegen, and the window's shuffle on the id redistributes
    the gram-building across the cluster even when the source collapses to
    few scan splits. (The first cut built per-doc gram ARRAYS with
    ``transform``/``slice`` lambdas: higher-order functions evaluate
    interpreted, and on a single-split scan the whole corpus's shingling ran
    in ONE task — 17 s at sf0.1 where this shape takes ~2 s.)"""
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
            "p", "token"
        ),
    ).where(F.col("token") != "")
    w = Window.partitionBy(id_col).orderBy("p")
    lead_cols = [F.lead("token", j).over(w).alias(f"t{j}") for j in range(1, n)]
    leads = tok.select(F.col(id_col), F.col("token"), *lead_cols)
    gram = F.concat_ws(" ", F.col("token"), *[F.col(f"t{j}") for j in range(1, n)])
    return (
        leads.where(F.col(f"t{n - 1}").isNotNull())
        .select(F.col(id_col), gram.alias("gram"))
        .dropDuplicates([id_col, "gram"])
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
    corp_grams = doc_shingles(corpus, id_col, text_col, n)
    bench_grams = (
        doc_shingles(benchmark, id_col, text_col, n).select("gram").distinct()
    )
    hits = (
        corp_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    tot = corp_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles")
    )
    joined = tot.join(hits, id_col, "left").select(
        F.col(id_col),
        "n_shingles",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
    )
    frac = F.round(F.col("n_hits") * 1.0 / F.col("n_shingles"), 6)
    return joined.withColumn("hit_frac", frac).withColumn(
        "contaminated", F.col("hit_frac") >= threshold
    )
