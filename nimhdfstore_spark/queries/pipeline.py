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

from nimhdfstore_spark.operators import decontam as DC
from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.operators import packing as PK
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
    # persist: the sample feeds the pair leg, the component node list and
    # the final quality join — without it the scan+filter re-runs 4×.
    # The explicit hash-repartition on "text" pins the partitioning every
    # downstream consumer needs anyway — the dedup groupBy("text") and the
    # membership join on "text" reuse it with NO further exchange — at a
    # width AQE cannot coalesce away: the one-row-group source scans as a
    # single task and the sampled bytes are tiny, so AQE's byte-targeted
    # coalescing collapsed the whole signing + quality pipeline onto one
    # core (guide §2.5, unsplittable input). Width from the session: at
    # real scale the same single exchange happens, just planner- vs
    # user-sized.
    par = spark.sparkContext.defaultParallelism
    samp = (
        SA.hash_sample(docs, "doc_id", _FRACTION, salt=_SALT)
        .repartition(par, "text")
        .persist()
    )
    # Exact-dedup FIRST (the 100 TB recipe): identical texts always agree
    # on every minhash band and estimate Jaccard 1.0 ≥ τ, so an exact-dup
    # group is always one clique inside one component, and the group's
    # min doc_id participates in component labeling exactly like any other
    # node. Signing/bucketing one representative per DISTINCT text is
    # therefore result-identical while collapsing the Σm² bucket blowup a
    # dup-heavy corpus creates (measured at 100× replication: one bucket
    # of 12 793 copies → 2.0e9 candidate pairs → a single 25-min task;
    # collapsed: pairs over ~5k distinct texts, seconds). Texts too short
    # to shingle (< 3 chars) never produce signatures or pairs, so they
    # stay per-doc singletons — matching the uncollapsed semantics.
    eligible = samp.where(F.length("text") >= 3)
    grp = eligible.groupBy("text").agg(F.min("doc_id").alias("gid"))
    reps_docs = grp.select(F.col("gid").alias("doc_id"), "text")
    pairs = D.minhash_lsh_pairs(
        reps_docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.65
    ).select("id_a", "id_b")
    memb = samp.join(grp, "text", "left").select(
        "doc_id", F.coalesce("gid", F.col("doc_id")).alias("gid")
    )
    gid_nodes = memb.select(F.col("gid").alias("doc_id")).distinct()
    comp_g = D.connected_components(pairs, gid_nodes, id_col="doc_id")
    # member comp = its group's comp; the component's min doc_id is always
    # a gid (each group's min member IS its gid), so rep selection below
    # (doc_id == comp) picks exactly the uncollapsed representative.
    comp = memb.join(
        comp_g.withColumnRenamed("id", "gid"), "gid"
    ).select(F.col("doc_id").alias("id"), "comp")
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


# --------------------------------------------------------------------------
# x91 — benchmark decontamination: flag corpus docs whose word-3-gram
# shingles overlap the "eval set" (doc_id % 23 == 0) beyond a threshold.
# The oracle recomputes the identical shingling and distinct-hit counting.
# --------------------------------------------------------------------------

_DC_N = 3
_DC_JOIN = " || ' ' || ".join(f"toks[i+{j}]" for j in range(1, _DC_N + 1))

_X91_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(list_transform(range(len(toks) - {_DC_N - 1}),
                                 i -> {_DC_JOIN})) AS grams
  FROM t WHERE len(toks) >= {_DC_N}
),
bench AS MATERIALIZED (
  SELECT DISTINCT unnest(grams) AS gram FROM sh WHERE doc_id % 23 = 0
),
corp AS (SELECT doc_id, unnest(grams) AS gram FROM sh WHERE doc_id % 23 != 0),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits FROM corp c JOIN bench USING (gram)
  GROUP BY 1
),
tot AS (
  SELECT doc_id, CAST(len(grams) AS INT) AS n_shingles FROM sh
  WHERE doc_id % 23 != 0
)
SELECT t.doc_id, t.n_shingles,
  CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
  ROUND(COALESCE(h.n_hits, 0) * 1.0 / t.n_shingles, 6) AS hit_frac,
  ROUND(COALESCE(h.n_hits, 0) * 1.0 / t.n_shingles, 6)
    >= {DC.DECONTAM_THRESHOLD} AS contaminated
FROM tot t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id
"""


@query("x91_pipeline_decontaminate", _X91_SQL)
def x_decontaminate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0)
    corpus = docs.where(F.col("doc_id") % 23 != 0)
    return DC.ngram_decontaminate(corpus, bench, n=_DC_N).orderBy("doc_id")


# --------------------------------------------------------------------------
# x92 — token-block packing: concat-and-chunk block assignment for every
# document. The Spark side is a two-phase distributed prefix sum; the
# oracle is the semantically identical single global window cumsum (exact
# integer arithmetic, so the decomposition is invisible in the values).
# --------------------------------------------------------------------------

_X92_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST({_BPE_COUNT} AS BIGINT) AS ntok FROM documents
),
c AS (
  SELECT doc_id, ntok,
    SUM(ntok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - ntok AS start_token
  FROM t
)
SELECT doc_id,
  CAST(ntok AS INT) AS n_tokens,
  CAST(start_token AS BIGINT) AS start_token,
  CAST(CASE WHEN ntok > 0 THEN start_token // {PK.BLOCK_SIZE}
       ELSE -1 END AS BIGINT) AS first_block,
  CAST(CASE WHEN ntok > 0 THEN (start_token + ntok - 1) // {PK.BLOCK_SIZE}
       ELSE -1 END AS BIGINT) AS last_block,
  CAST(CASE WHEN ntok > 0
       THEN (start_token + ntok - 1) // {PK.BLOCK_SIZE}
            - start_token // {PK.BLOCK_SIZE} + 1
       ELSE 0 END AS INT) AS n_blocks
FROM c ORDER BY doc_id
"""


@query("x92_pipeline_pack_blocks", _X92_SQL)
def x_pack_blocks(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return PK.pack_blocks(
        docs, "doc_id", T.bpe_token_count("text")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x193 — SPAN-level decontamination with text trimming (the GPT-3-report
# move: remove the contaminated windows, keep the document): benchmark =
# doc_id % 23 == 0 (same split as x91), char-24-gram hits against the
# broadcast benchmark gram set, gaps-and-islands span merge, and the
# cleaned text rebuilt by both engines — the hash check pins the actual
# string surgery, not just the counts.
# --------------------------------------------------------------------------

_X193_K = 24

_X193_SQL = f"""
WITH bg AS (
  SELECT DISTINCT substr(text, i, {_X193_K}) AS gram
  FROM documents, LATERAL unnest(range(1, length(text) - {_X193_K} + 2)) t(i)
  WHERE doc_id % 23 = 0 AND length(text) >= {_X193_K}
),
cg AS (
  SELECT doc_id, i AS pos, substr(text, i, {_X193_K}) AS gram
  FROM documents, LATERAL unnest(range(1, length(text) - {_X193_K} + 2)) t(i)
  WHERE doc_id % 23 != 0 AND length(text) >= {_X193_K}
),
h AS (SELECT doc_id, pos FROM cg JOIN bg USING (gram)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {_X193_K}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM h
  )
),
sp AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {_X193_K} - 1 AS e
  FROM isl GROUP BY doc_id, island
),
pieces AS (
  SELECT doc_id, s, e,
         lag(e) OVER (PARTITION BY doc_id ORDER BY s) AS pe
  FROM sp
),
agg AS (
  SELECT p.doc_id,
         string_agg(substr(d.text, coalesce(p.pe, 0) + 1,
                           p.s - coalesce(p.pe, 0) - 1), '' ORDER BY p.s)
           AS head,
         max(p.e) AS last_e,
         count(*) AS n_spans,
         sum(p.e - p.s + 1) AS removed
  FROM pieces p JOIN documents d USING (doc_id) GROUP BY p.doc_id
),
nh AS (SELECT doc_id, count(*) AS n_hits FROM h GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.removed, 0) AS BIGINT) AS removed_chars,
       coalesce(a.head || substr(d.text, a.last_e + 1), d.text) AS clean_text,
       CAST(length(coalesce(a.head || substr(d.text, a.last_e + 1), d.text))
         AS BIGINT) AS clean_len
FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN nh USING (doc_id)
WHERE d.doc_id % 23 != 0
ORDER BY d.doc_id
"""


@query("x193_span_decontaminate", _X193_SQL)
def x_span_decontaminate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0)
    corpus = docs.where(F.col("doc_id") % 23 != 0)
    return DC.decontaminate_spans(corpus, bench, k=_X193_K).orderBy("doc_id")
