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


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
) -> DataFrame:
    """Span-level decontamination with TEXT TRIMMING — the GPT-3-report
    variant of ``ngram_decontaminate``: instead of flagging/dropping whole
    documents, cut the contaminated windows OUT and keep the rest (public
    LLM training reports remove the overlapping n-gram windows and retain
    the split document; parameterized here to char k-grams so short
    documents participate).

    Pipeline (all per-document after one broadcast):

    1. the benchmark's distinct k-grams are collected and **broadcast**
       (an eval suite is tiny vs a 100 TB corpus — the standard asymmetry
       this operator exploits; no shuffle of the corpus on the gram key);
    2. every corpus position whose k-gram appears in the benchmark set is
       a hit (stride-1 scan, left-semi against the broadcast — exact, no
       sampling: trimming must not miss windows);
    3. hits closer than ``k`` merge into spans (gaps-and-islands window,
       per-document state), guaranteeing merged spans are disjoint with
       at least one kept char between them;
    4. the cleaned text is rebuilt JVM-side with an ``aggregate`` fold
       over the sorted span array — no Python in the hot path.

    Returns every corpus document (contaminated or not):
    ``(id_col, n_hits, n_spans, removed_chars, clean_text, clean_len)``;
    untouched documents pass through with zeros and their original text.
    """
    t = F.col(text_col)
    par = corpus.sparkSession.sparkContext.defaultParallelism

    def grams(df: DataFrame) -> DataFrame:
        # explicit partition count: the pre-explode frame is small, an
        # unpinned repartition would be AQE-coalesced to one task and the
        # O(chars*k) gram pass would serialize (see dedup.duplicate_spans)
        base = df.where(F.length(t) >= k).repartition(par, F.col(id_col))
        arr = F.transform(
            F.sequence(F.lit(1), F.length(t) - k + 1),
            lambda i: F.struct(i.alias("pos"), t.substr(i, F.lit(k)).alias("gram")),
        )
        return base.select(id_col, F.explode(arr).alias("s")).select(
            id_col, F.col("s.pos").alias("pos"), F.col("s.gram").alias("gram")
        )

    bset = grams(benchmark).select("gram").distinct()
    hits = grams(corpus).join(F.broadcast(bset), "gram", "left_semi")

    w = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        hits.withColumn(
            "brk",
            F.when(
                F.lag("pos").over(w).isNull()
                | ((F.col("pos") - F.lag("pos").over(w)) > k),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    spans = isl.groupBy(id_col, "island").agg(
        F.min("pos").cast("int").alias("start"),
        (F.max("pos") + k - 1).cast("int").alias("end"),
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("end") - F.col("start") + 1).alias("removed_chars"),
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("_spans"),
    )
    n_hits = hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))

    base = corpus.select(id_col, t.alias(text_col))
    joined = base.join(per_doc, id_col, "left").join(n_hits, id_col, "left")
    # fold the disjoint sorted spans into the kept text: accumulator =
    # (cursor, acc); each span appends text[cursor, span.start) and moves
    # the cursor past the span; finish appends the tail.
    clean = F.when(F.col("_spans").isNull(), t).otherwise(
        F.aggregate(
            F.col("_spans"),
            F.struct(
                F.lit(1).cast("int").alias("cur"), F.lit("").alias("acc")
            ),
            lambda st, sp: F.struct(
                (sp.getField("end") + 1).cast("int").alias("cur"),
                F.concat(
                    st.getField("acc"),
                    t.substr(
                        st.getField("cur"),
                        sp.getField("start") - st.getField("cur"),
                    ),
                ).alias("acc"),
            ),
            lambda st: F.concat(
                st.getField("acc"), t.substr(st.getField("cur"), F.length(t))
            ),
        )
    )
    return joined.select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("removed_chars"), F.lit(0)).cast("long").alias("removed_chars"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_len"),
    )
