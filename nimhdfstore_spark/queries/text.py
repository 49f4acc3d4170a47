"""Text-analysis declared queries (north-star QX4 + extensions) over the
``documents`` table, each with an exact-value DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import text as T
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

# shared SQL fragments (DuckDB) — must mirror operators/text.py exactly
_SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
_SQL_STOPS = "['the','a','and','of','to','in','is','it']"


# --------------------------------------------------------------------------
# QX4 — token counting: top-20 tokens by frequency
# --------------------------------------------------------------------------

_X_TOKENS_SQL = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


@query("x20_text_top_tokens", _X_TOKENS_SQL)
def x_top_tokens(spark, sf_dir):
    # explode(split) + WHERE instead of a filter() HOF: same result, but the
    # whole pipeline stays in whole-stage codegen (HOF lambdas are
    # interpreted and pay a large first-use JIT cost).
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# quality scoring: length/punct/stopword heuristics per document
# --------------------------------------------------------------------------

_X_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  ROUND(length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
        / greatest(length(text), 1), 6) AS alpha_ratio,
  ROUND(len(list_filter(toks, x -> list_contains({_SQL_STOPS}, x)))
        / greatest(len(toks), 1), 6) AS stop_ratio,
  ROUND(0.4 * least(len(toks) / 20.0, 1.0)
      + 0.3 * (length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
               / greatest(length(text), 1))
      + 0.3 * (len(list_filter(toks, x -> list_contains({_SQL_STOPS}, x)))
               / greatest(len(toks), 1)), 6) AS quality
FROM t ORDER BY doc_id
"""


@query("x21_text_quality", _X_QUALITY_SQL)
def x_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.round(T.alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(T.stopword_ratio("text"), 6).alias("stop_ratio"),
        T.quality_score("text").alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# language-ID heuristic (marker-set argmax + CJK detection)
# --------------------------------------------------------------------------

def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    return (
        f"len(list_filter(list_distinct({_SQL_TOKENS}), "
        f"x -> list_contains([{lst}], x)))"
    )


_X_LANGID_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
    {_marker_sql('de')} AS sde, {_marker_sql('en')} AS sen,
    {_marker_sql('es')} AS ses, {_marker_sql('fr')} AS sfr
  FROM documents
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
       WHEN greatest(sde, sen, ses, sfr) = 0 THEN 'und'
       WHEN sde = greatest(sde, sen, ses, sfr) THEN 'de'
       WHEN sen = greatest(sde, sen, ses, sfr) THEN 'en'
       WHEN ses = greatest(sde, sen, ses, sfr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM s ORDER BY doc_id
"""


@query("x22_text_langid", _X_LANGID_SQL)
def x_langid(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return T.lang_id_table(docs, "doc_id", "text").orderBy("doc_id")


# --------------------------------------------------------------------------
# document fingerprint (polynomial rolling hash — engine-independent)
# --------------------------------------------------------------------------

_X_FP_SQL = f"""
WITH t AS (
  SELECT doc_id,
    list_transform(
      list_filter(string_split(array_to_string({_SQL_TOKENS}, ' '), ''), c -> c != ''),
      c -> CAST(ascii(c) AS BIGINT)) AS codes
  FROM documents
)
SELECT doc_id,
  CASE WHEN len(codes) = 0 THEN 0
       ELSE list_reduce(codes, (acc, x) -> (acc * {T.FP_MUL} + x) % {T.FP_MOD})
  END AS fingerprint
FROM t ORDER BY doc_id
"""


@query("x23_text_fingerprint", _X_FP_SQL)
def x_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.fingerprint("text").alias("fingerprint")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# BPE-ish token counting (GPT-2-style pre-tokenizer chunks) — the unit a
# token-budget estimate counts. The pattern uses only constructs with
# identical Java-regex / DuckDB-regex semantics, so the oracle recomputes
# the same chunking.
# --------------------------------------------------------------------------

_X_BPE_SQL = f"""
SELECT doc_id,
  CAST(len(list_filter(
    regexp_extract_all(text, '{T.BPE_PATTERN}'),
    x -> regexp_matches(x, '[^\\s]')
  )) AS INT) AS n_bpe_tokens,
  CAST(len(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''
  )) AS INT) AS n_word_tokens
FROM documents ORDER BY doc_id
"""


@query("x24_text_bpe_tokens", _X_BPE_SQL)
def x_bpe_tokens(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        T.token_count("text").alias("n_word_tokens"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Gopher-style repetition / quality rules — word-count and mean-word-length
# bounds, duplicate- and modal-2-gram fractions, distinct-stopword floor.
# The modal-gram statistic is recomputed by the oracle with the identical
# unnest + two-level GROUP BY, so every fraction hash-matches.
# --------------------------------------------------------------------------

_X_GOPHER_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
base AS (
  SELECT doc_id,
    CAST(len(toks) AS INT) AS n_words,
    ROUND(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0
          / greatest(len(toks), 1), 6) AS mean_word_len,
    CAST(len(list_distinct(list_filter(toks, x -> list_contains({_SQL_STOPS}, x))))
         AS INT) AS n_stopwords
  FROM t
),
grams AS (
  SELECT doc_id,
    unnest(list_transform(range(len(toks) - 1),
                          i -> toks[i + 1] || ' ' || toks[i + 2])) AS gram
  FROM t WHERE len(toks) >= 2
),
pg AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
ag AS (
  SELECT doc_id, max(cnt) AS modal_cnt, sum(cnt) AS total_grams,
         count(*) AS distinct_grams
  FROM pg GROUP BY 1
),
rep AS (
  SELECT b.doc_id, b.n_words, b.mean_word_len,
    CASE WHEN COALESCE(a.total_grams, 0) > 0
         THEN ROUND((a.total_grams - a.distinct_grams) * 1.0 / a.total_grams, 6)
         ELSE 0.0 END AS dup_ngram_frac,
    CASE WHEN COALESCE(a.total_grams, 0) > 0
         THEN ROUND(a.modal_cnt * 1.0 / a.total_grams, 6)
         ELSE 0.0 END AS top_ngram_frac,
    b.n_stopwords
  FROM base b LEFT JOIN ag a USING (doc_id)
)
SELECT *,
  (n_words BETWEEN {T.GOPHER_MIN_WORDS} AND {T.GOPHER_MAX_WORDS}
   AND mean_word_len BETWEEN {T.GOPHER_MIN_MEAN_WL} AND {T.GOPHER_MAX_MEAN_WL}
   AND dup_ngram_frac <= {T.GOPHER_MAX_DUP_2GRAM}
   AND top_ngram_frac <= {T.GOPHER_MAX_TOP_2GRAM}
   AND n_stopwords >= {T.GOPHER_MIN_STOPWORDS}) AS gopher_pass
FROM rep ORDER BY doc_id
"""


@query("x25_text_gopher_rules", _X_GOPHER_SQL)
def x_gopher_rules(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return T.gopher_quality(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# PII redaction. The synthetic corpus contains no PII, so both engines
# first append a deterministic synthetic PII suffix (keyed on doc_id), then
# count and redact it — the oracle validates the regex semantics match
# byte-for-byte, not just the plumbing.
# --------------------------------------------------------------------------

_PII_AUG_SQL = """
text || CASE doc_id % 5
  WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
  WHEN 1 THEN ' call +1 415 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
  WHEN 2 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
              || CAST(doc_id * 7 % 200 AS VARCHAR) || '.42 logged'
  ELSE '' END
"""

_X_PII_SQL = f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{T.PII_EMAIL}')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(t, '{T.PII_PHONE}')) AS INT) AS n_phone,
  CAST(len(regexp_extract_all(t, '{T.PII_IPV4}')) AS INT) AS n_ip,
  regexp_replace(
    regexp_replace(
      regexp_replace(t, '{T.PII_EMAIL}', '<EMAIL>', 'g'),
      '{T.PII_IPV4}', '<IP>', 'g'),
    '{T.PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM aug ORDER BY doc_id
"""


def _pii_augmented(docs):
    d = F.col("doc_id")
    suffix = (
        F.when(d % 5 == 0,
               F.concat(F.lit(" contact user"), d.cast("string"),
                        F.lit("@example.com now")))
        .when(d % 5 == 1,
              F.concat(F.lit(" call +1 415 555 "),
                       F.lpad((d % 10000).cast("string"), 4, "0")))
        .when(d % 5 == 2,
              F.concat(F.lit(" from 10."), (d % 200).cast("string"),
                       F.lit("."), (d * 7 % 200).cast("string"),
                       F.lit(".42 logged")))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", "lang", F.concat(F.col("text"), suffix).alias("t"))


@query("x26_text_pii_redaction", _X_PII_SQL)
def x_pii_redaction(spark, sf_dir):
    aug = _pii_augmented(load(spark, sf_dir, "documents"))
    c = T.pii_counts("t")
    return aug.select(
        "doc_id",
        c["n_email"].cast("int").alias("n_email"),
        c["n_phone"].cast("int").alias("n_phone"),
        c["n_ip"].cast("int").alias("n_ip"),
        T.redact_pii("t").alias("redacted"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x86 — grouped top-k: top-5 tokens PER LANGUAGE (window rank over a
# grouped count — the partial-top-k-per-group pattern; the groupBy is
# map-side combined and the rank only sees one (lang, token) row per key).
# --------------------------------------------------------------------------

_X86_K = 5

_X86_SQL = f"""
WITH tk AS (
  SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
),
cnt AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY lang ORDER BY n DESC, token) AS INT) AS rank
  FROM cnt
)
SELECT lang, token, n, rank FROM ranked
WHERE rank <= {_X86_K} ORDER BY lang, rank
"""


@query("x86_group_topk_tokens", _X86_SQL)
def x_group_topk(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tk = docs.select(
        "lang",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"),
    ).where(F.col("token") != "")
    cnt = tk.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _X86_K)
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# x115 — corpus-statistics quality scoring: type-token ratio + commonness
# --------------------------------------------------------------------------

_X115_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
),
vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(COUNT(DISTINCT t.token) / COUNT(*), 4) AS ttr,
       ROUND(SUM(v.cnt) / (COUNT(*) * (SELECT n_total FROM total)), 6)
           AS mean_rel_freq
FROM toks t JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id ORDER BY t.doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x115(spark, sf_dir):
    """Two-pass corpus-statistics scoring — the shape every corpus-level
    quality signal needs at 100 TB: pass 1 builds global token counts (one
    token-keyed shuffle, map-side combined), pass 2 joins them back to the
    token stream and reduces per document. Type-token ratio is the Gopher
    repetition signal; mean relative frequency is a unigram-LM "commonness"
    proxy. All ratios are integer/integer single divisions — deterministic
    on both engines (no libm, unlike a log-prob perplexity)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).where(F.col("token") != "")
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
            F.sum("cnt").alias("sum_cnt"),
        )
    )
    return (
        per_doc.join(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("ttr"),
            F.round(
                F.col("sum_cnt") / (F.col("n_tokens") * F.col("n_total")), 6
            ).alias("mean_rel_freq"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x138 — RAG token-window chunking (overlapping fixed-size windows)
# --------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_OVERLAP = 50, 10
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP

_X138_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks, len({_SQL_TOKENS}) AS n
  FROM documents
),
s AS (
  SELECT doc_id, toks, unnest(range(0, n, {_CHUNK_STRIDE})) AS s
  FROM t WHERE n > 0
)
SELECT doc_id,
       CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(toks[s + 1 : s + {_CHUNK_SIZE}]) AS BIGINT) AS n_tokens,
       array_to_string(toks[s + 1 : s + {_CHUNK_SIZE}], ' ') AS chunk_text
FROM s
ORDER BY doc_id, chunk_id
"""


@query("x138_rag_token_chunking", _X138_SQL)
def x138(spark, sf_dir):
    """Overlapping token-window chunking of every document (50-token
    windows, 10-token overlap) — the retrieval/pre-training preprocessing
    unit. All built-in JVM expressions (split/sequence/explode/slice), no
    shuffle: at 100 TB this runs at scan throughput and the explode
    parallelizes per-chunk downstream work (embedding, indexing) across
    the cluster."""
    docs = load(spark, sf_dir, "documents")
    return (
        T.chunk_tokens(docs, "doc_id", "text", _CHUNK_SIZE, _CHUNK_OVERLAP)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id")
    )


# --------------------------------------------------------------------------
# x151 — sentence segmentation as a Python UDTF (the §2.13 table-function
# member of the UDF surface: one input row -> many output rows through a
# LATERAL join). Splitting is the RE2-compatible pattern
# '[^.!?]+[.!?]?' + space-trim, recomputed identically by Python re (the
# UDTF), and DuckDB (the oracle's zipped unnest).
# --------------------------------------------------------------------------

_SENT_PATTERN = r"[^.!?]+[.!?]?"

_X151_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_extract_all(text, '{_SENT_PATTERN}'), x -> trim(x, ' ')),
           x -> x != '') AS sents
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       CAST(unnest(range(len(sents))) AS INT) AS sentence_idx,
       unnest(sents) AS sentence,
       CAST(length(unnest(sents)) AS BIGINT) AS n_chars
FROM s
ORDER BY doc_id, sentence_idx
"""


@query("x151_udtf_sentences", _X151_SQL)
def x151(spark, sf_dir):
    """Sentence segmentation through the Spark 4 Python UDTF API: the
    class-based table function runs Arrow-batched on executors and the
    LATERAL join fans each doc into its sentences — the row-to-rows
    member of the UDF surface (scalar pandas_udf, mapInPandas,
    applyInPandas[WithState], cogroup are covered elsewhere). Regex
    splitting like this belongs in built-ins when possible (x138 does);
    the UDTF form is for when per-row expansion logic outgrows SQL —
    this query pins that the plumbing produces byte-identical results
    to the pure-SQL twin."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_chars long")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for frag in _re.findall(_SENT_PATTERN, text):
                frag = frag.strip(" ")
                if frag:
                    yield idx, frag, len(frag)
                    idx += 1

    spark.udtf.register("split_sentences", SplitSentences)
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    docs.createOrReplaceTempView("x151_docs")
    return spark.sql(
        """SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars
           FROM x151_docs d, LATERAL split_sentences(d.text) s
           ORDER BY d.doc_id, s.sentence_idx"""
    )


# --------------------------------------------------------------------------
# x154 — BPE merge-candidate statistics: counts of ADJACENT pre-token
# pairs across the corpus — the frequency table a byte-pair-encoding
# trainer consumes each merge round. Explode + per-doc window-lead +
# one map-side-combined groupBy (the codegen-friendly shape; the zipped
# array-slice form the oracle uses is semantically identical).
# --------------------------------------------------------------------------

_X154_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(text, '{T.BPE_PATTERN}'),
                     x -> regexp_matches(x, '[^\\s]')) AS toks
  FROM documents
),
p AS (
  SELECT unnest(toks[1 : len(toks) - 1]) AS tok,
         unnest(toks[2 : len(toks)]) AS nxt
  FROM t WHERE len(toks) >= 2
)
SELECT tok, nxt, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY tok, nxt
ORDER BY n_pairs DESC, tok, nxt LIMIT 20
"""


@query("x154_bpe_pair_stats", _X154_SQL)
def x154(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(T.bpe_tokens("text")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("nxt", F.lead("tok").over(w)).where(
        F.col("nxt").isNotNull()
    )
    return (
        pairs.groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "tok", "nxt")
        .limit(20)
    )


# --------------------------------------------------------------------------
# x159 — bigram language-model fluency scoring (the KenLM-perplexity-filter
# shape from CCNet: train an n-gram LM on the corpus, score every document
# against it, keep the fluent tail). Probabilities stay integer ppm so the
# score is exact — a log-space perplexity would not oracle (libm log and
# float summation order differ across engines); ranking by mean conditional
# probability selects the same fluent/disfluent tails.
# --------------------------------------------------------------------------

_X159_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(toks[1 : len(toks) - 1]) AS w1,
         unnest(toks[2 : len(toks)]) AS w2
  FROM t WHERE len(toks) >= 2
),
model AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
),
prefix AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM model GROUP BY w1
),
scored AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(m.c2 * 1000000 // p.c1) AS BIGINT) AS sum_ppm
  FROM bg b
  JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
  JOIN prefix p ON b.w1 = p.w1
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams,
       CAST(sum_ppm // n_bigrams AS BIGINT) AS fluency_ppm
FROM scored ORDER BY fluency_ppm DESC, doc_id LIMIT 25
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x159(spark, sf_dir):
    """Top-25 most LM-fluent documents. Train: bigram counts via explode +
    per-doc window-lead + map-side-combined groupBy (same shape as x154);
    the conditional probability P(w2|w1) is c2·1e6 div c1 in integer ppm.
    Score: equi-join each document's bigram stream back onto the model on
    (w1, w2) — one shuffle; per-doc mean is an integer division. At web
    scale the model is vocab-bounded (and prunable below a min count)
    while the scoring join stays an equi-join — never all-pairs."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("pos", "w1")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .where(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    prefix = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    modelp = model.join(prefix, "w1").select(
        "w1", "w2", F.expr("c2 * 1000000 div c1").alias("ppm")
    )
    scored = (
        bg.join(modelp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("ppm").alias("sum_ppm"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_bigrams",
            F.expr("sum_ppm div n_bigrams").alias("fluency_ppm"),
        )
        .orderBy(F.desc("fluency_ppm"), "doc_id")
        .limit(25)
    )


# --------------------------------------------------------------------------
# x171 — n-gram novelty scoring: what fraction of a document's distinct
# trigrams appears in NO other document. The curation metric that finds
# boilerplate-heavy corpora (low novelty everywhere) and near-duplicate
# clusters (novelty collapses for the copies) without any pairwise work —
# one corpus-wide groupBy on the trigram, integer-ppm fraction.
# --------------------------------------------------------------------------

_X171_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
                i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))
           AS gram
  FROM t WHERE len(toks) >= 3
),
freq AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs FROM grams GROUP BY gram
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM grams g JOIN freq f ON g.gram = f.gram
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x171(spark, sf_dir):
    """Per-document trigram novelty. Distinct trigrams per doc (explode of
    a transform over the token array — no window needed), one map-side-
    combined groupBy for corpus document-frequency, one equi-join back.
    The trigram vocabulary is what shuffles — corpus-bounded, never
    pairwise."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("toks")).where(
        F.size("toks") >= 3
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 3), "
                    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
                )
            )
        ).alias("gram"),
    )
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    uniq = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
    return (
        grams.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            uniq.cast("long").alias("n_unique"),
            F.expr(
                "sum(case when n_docs = 1 then 1 else 0 end) * 1000000"
                " div count(*)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x187 — REAL BPE: learn merges from the corpus word histogram (Sennrich
# et al. 2016 — x154 is one round's frequency table), encode every
# document with the broadcast merge table. The full iterative encode has
# no SQL analog — it stays pinned by an independent reimplementation +
# hypothesis equivalence (tests/test_round7.py) and by loud IN-QUERY
# assertions here (Python-regex pretokenization must equal the JVM
# count per doc; n_pretokens <= n_tokens <= n_init_syms) — but the row
# the driver hashes is now engine-independently checkable (round-5
# verdict ask #6): per-doc pretoken/initial-symbol counts plus the FIRST
# learned merge pair, which DuckDB recomputes from scratch — the capped
# word histogram (identical binary-lex tie-breaks), per-word symbol
# pairs weighted by count, argmax by (count desc, pair lex). A wrong
# histogram, tie-break, EOW convention, or pair weighting flips the hash.
# --------------------------------------------------------------------------

_X187_MERGES, _X187_TOPW = 24, 2000
_X187_ROUNDS = 4  # merge rounds the oracle recomputes from scratch


def _x187_sql() -> str:
    """Unroll ``_X187_ROUNDS`` BPE merge rounds in DuckDB SQL.

    The trick that makes the ITERATIVE merge loop SQL-expressible: after
    round r, every symbol is again ONE character in a sentinel alphabet —
    round r's merged pair is rewritten to ``chr(r)`` with ``replace()``
    (left-to-right non-overlapping, exactly ``_merge_word``'s splice
    semantics when every symbol is one char, which the sentinel encoding
    guarantees inductively). Pair counting per round is then adjacent-
    char pairs weighted by word count, and the argmax tie-break compares
    pairs by their EXPANDED original strings (CASE over the sentinels) —
    matching the Python trainer's (count desc, pair lex) rule exactly.
    Sentinels chr(1..3) cannot collide: the corpus carries no control
    chars (checked across all sf fixtures) and EOW is chr(10).
    ``AS MATERIALIZED`` pins each round's vocab (the x146 lesson: DuckDB
    CTE inlining would re-expand the chain exponentially)."""
    exp = {}  # sentinel char SQL -> expansion SQL (fully original-space)
    sql = [f"""
WITH pret AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(text, '{T.BPE_PATTERN}'),
                     x -> regexp_matches(x, '[^\\s]')) AS toks
  FROM documents
),
hist AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(toks) AS w FROM pret)
  GROUP BY w ORDER BY cnt DESC, w LIMIT {_X187_TOPW}
),
w1 AS MATERIALIZED (SELECT w || chr(10) AS s, cnt FROM hist)"""]

    def case(col: str) -> str:
        if not exp:
            return col
        whens = " ".join(
            f"WHEN {sent} THEN {e}" for sent, e in exp.items()
        )
        return f"CASE {col} {whens} ELSE {col} END"

    for r in range(1, _X187_ROUNDS + 1):
        sql.append(f""",
l{r} AS (SELECT list_filter(string_split(s, ''), c -> c != '') AS l, cnt
         FROM w{r}),
p{r} AS (
  SELECT l[i] AS a, l[i + 1] AS b, SUM(cnt) AS pc
  FROM l{r}, LATERAL unnest(range(1, len(l))) t(i)
  GROUP BY a, b
),
m{r} AS MATERIALIZED (
  SELECT a, b, {case('a')} AS ea, {case('b')} AS eb
  FROM p{r} ORDER BY pc DESC, ea, eb LIMIT 1
)""")
        exp[f"chr({r})"] = f"(SELECT ea || eb FROM m{r})"
        if r < _X187_ROUNDS:
            sql.append(f""",
w{r + 1} AS MATERIALIZED (
  SELECT replace(s, (SELECT a || b FROM m{r}), chr({r})) AS s, cnt
  FROM w{r}
)""")
    merge_cols = ",\n       ".join(
        f"(SELECT ea FROM m{r}) AS m{r}_a, (SELECT eb FROM m{r}) AS m{r}_b"
        for r in range(1, _X187_ROUNDS + 1)
    )
    sql.append(f"""
SELECT p.doc_id,
       CAST(len(p.toks) AS BIGINT) AS n_pretokens,
       CAST(COALESCE(list_sum(list_transform(p.toks, x -> length(x) + 1)), 0)
            AS BIGINT) AS n_init_syms,
       {merge_cols}
FROM pret p
ORDER BY p.doc_id
""")
    return "".join(sql)


_X187_SQL = _x187_sql()


@query("x187_bpe_encode", _X187_SQL)
def x187(spark, sf_dir):
    from nimhdfstore_spark.operators.text import bpe_apply, bpe_learn

    docs = load(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", num_merges=_X187_MERGES,
                       top_words=_X187_TOPW)
    enc = bpe_apply(docs, "doc_id", "text", merges)
    toks = T.bpe_tokens("text")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_pretokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x) + 1,
        ).alias("n_init_syms"),
    )
    # force the full encode and pin it loudly: the Python-regex pretoken
    # count must equal the JVM-regex count doc-by-doc, and every token
    # count must sit in [n_pretokens, n_init_syms] (merging only shrinks)
    bad = (
        base.join(
            enc.select(
                "doc_id", F.col("n_pretokens").alias("np_py"), "n_tokens"
            ),
            "doc_id",
        )
        .where(
            (F.col("np_py") != F.col("n_pretokens"))
            | (F.col("n_tokens") < F.col("n_pretokens"))
            | (F.col("n_tokens") > F.col("n_init_syms"))
        )
        .count()
    )
    if bad:
        raise AssertionError(f"BPE encode invariant violated on {bad} docs")
    if len(merges) < _X187_ROUNDS:
        raise AssertionError(
            f"corpus learned only {len(merges)} merges; oracle unrolls "
            f"{_X187_ROUNDS}"
        )
    merge_cols = []
    for r in range(_X187_ROUNDS):
        merge_cols.append(F.lit(merges[r][0]).alias(f"m{r + 1}_a"))
        merge_cols.append(F.lit(merges[r][1]).alias(f"m{r + 1}_b"))
    return base.select(
        "doc_id", "n_pretokens", "n_init_syms", *merge_cols
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x194 — WITHIN-document repetition trim (Gopher/RefinedWeb repetition
# scrub as surgery, not a filter): each document is augmented with a
# planted repeat of its first 10-token chunk (so every doc carries real,
# chunk-aligned repetition both engines construct identically), then
# operators/text.repetition_trim keeps only first occurrences and
# rebuilds the text. The oracle recomputes chunking, first-occurrence
# marking and the ordered rebuild in SQL — the hash pins the surgery.
# --------------------------------------------------------------------------

_X194_N = 10  # chunk size in tokens

_X194_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
aug AS (
  SELECT doc_id,
         list_slice(toks, 1, {_X194_N})
           || list_slice(toks, 1, {_X194_N})
           || list_slice(toks, {_X194_N} + 1, len(toks)) AS toks
  FROM t
),
c AS (
  SELECT doc_id, j AS idx,
         array_to_string(
           list_slice(toks, j * {_X194_N} + 1, (j + 1) * {_X194_N}), ' '
         ) AS chunk
  FROM aug,
       LATERAL unnest(range(0, greatest((len(toks) + {_X194_N} - 1)
                                        // {_X194_N}, 1))) s(j)
),
k AS (
  SELECT doc_id, idx, chunk,
         min(idx) OVER (PARTITION BY doc_id, chunk) AS first_idx
  FROM c
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN idx != first_idx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeated,
       coalesce(string_agg(CASE WHEN idx = first_idx THEN chunk END,
                           ' ' ORDER BY idx), '') AS clean_text,
       CAST(length(coalesce(string_agg(CASE WHEN idx = first_idx THEN chunk
                                       END, ' ' ORDER BY idx), ''))
         AS BIGINT) AS clean_len
FROM k GROUP BY doc_id ORDER BY doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x194(spark, sf_dir):
    from nimhdfstore_spark.operators.text import repetition_trim

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    aug = docs.select(
        "doc_id",
        F.array_join(
            F.concat(
                F.slice(toks, 1, _X194_N),
                F.slice(toks, 1, _X194_N),
                F.slice(toks, _X194_N + 1, F.greatest(F.size(toks) - _X194_N, F.lit(0))),
            ),
            " ",
        ).alias("text"),
    )
    return repetition_trim(aug, chunk_tokens_n=_X194_N).orderBy("doc_id")


# --------------------------------------------------------------------------
# x200 — Unicode normalization (UAX #15 NFC): the encoding-hygiene pass
# before any content hashing — NFC and NFD byte forms of the same visible
# text hash differently and defeat exact dedup. Both engines append the
# same per-doc suffix (a decomposed e+COMBINING ACUTE, an NFC-stable
# ligature, or a decomposed A+COMBINING RING keyed by doc_id % 3 — so the
# compose, no-op, and compose-other paths all execute), then normalize:
# Spark via Python's unicodedata (the reference implementation) in an
# Arrow batch, the oracle via DuckDB's nfc_normalize — two independent
# implementations of the same public algorithm, compared on the actual
# normalized strings.
# --------------------------------------------------------------------------

_X200_SQL = """
WITH t AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INT)
                   WHEN 0 THEN ' e' || chr(769)
                   WHEN 1 THEN ' ﬁx'
                   ELSE ' A' || chr(778)
                 END AS t2
  FROM documents
)
SELECT doc_id, nfc_normalize(t2) AS norm_text,
       CAST(nfc_normalize(t2) != t2 AS BIGINT) AS changed,
       CAST(length(t2) AS BIGINT) AS len_before,
       CAST(length(nfc_normalize(t2)) AS BIGINT) AS len_after
FROM t ORDER BY doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x200(spark, sf_dir):
    from nimhdfstore_spark.operators.text import unicode_normalize

    docs = load(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" é"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" ﬁx"))
        .otherwise(F.lit(" Å"))
    )
    staged = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return unicode_normalize(staged).orderBy("doc_id")


# --------------------------------------------------------------------------
# x201 — HTML → text extraction, the first transform a crawled corpus
# applies: both engines wrap each document in the same deterministic
# markup (head with style+script blocks, a comment, a heading carrying
# entities, the body text, a trailing div with escaped angle brackets),
# then strip it — script/style/comment content must never surface, tags
# go to whitespace, core entities unescape AFTER tag-stripping (so
# &lt;script&gt; can't become an active tag; &amp; unescapes LAST so
# double-escapes stay literal), whitespace collapses. Entirely JVM-side
# regexp_replace chains in Spark; the oracle recomputes the identical
# chain in DuckDB's RE2 (the x24 regex-parity precedent). The hash
# compares the actual extracted strings.
# --------------------------------------------------------------------------

_X201_HTML_SQL = (
    "'<html><head><style>p { color: red }</style>"
    "<script>var id=' || doc_id || ';</script></head>"
    "<body><!-- crawl ' || doc_id || ' --><h1>Doc &amp; ' || doc_id || "
    "'</h1><p class=\"b\">' || text || '</p><br/><div>tail &lt;x&gt;</div>"
    "</body></html>'"
)

_X201_SQL = f"""
WITH h AS (SELECT doc_id, {_X201_HTML_SQL} AS html FROM documents),
s AS (
  SELECT doc_id, html,
    regexp_replace(
      regexp_replace(
        regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<!--.*?-->', ' ', 'g') AS noblocks
  FROM h
),
t AS (
  SELECT doc_id, html,
    replace(replace(replace(replace(replace(replace(
      regexp_replace(noblocks, '<[^>]+>', ' ', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      '&nbsp;', ' '), '&amp;', '&') AS unescaped
  FROM s
)
SELECT doc_id,
       trim(regexp_replace(unescaped, '\\s+', ' ', 'g')) AS clean_text,
       CAST(len(regexp_extract_all(html, '<[^>]+>')) AS INT) AS n_tags
FROM t ORDER BY doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x201(spark, sf_dir):
    from nimhdfstore_spark.operators.text import html_tag_count, strip_html

    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>p { color: red }</style><script>var id='),
        F.col("doc_id").cast("string"),
        F.lit(";</script></head><body><!-- crawl "),
        F.col("doc_id").cast("string"),
        F.lit(" --><h1>Doc &amp; "),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p class="b">'),
        F.col("text"),
        F.lit("</p><br/><div>tail &lt;x&gt;</div></body></html>"),
    )
    staged = docs.select("doc_id", html.alias("html"))
    return staged.select(
        "doc_id",
        strip_html("html").alias("clean_text"),
        html_tag_count("html").alias("n_tags"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x204 — readability scoring (Flesch reading-ease / Flesch-Kincaid grade):
# the classic document-quality feature a curation pipeline thresholds on.
# Words = the x20 tokenizer; sentences = non-empty [.!?]+ splits (floored
# at 1); syllables = vowel-group count per the standard estimator
# ([aeiouy]+ runs over the lowercased text — identical Java-regex / RE2
# semantics). Scores ship as EXACT 1e4-scaled integers (round-6 verdict
# nit #1 / the x146 lesson: ROUND on a double diverges between engines
# near .00005 boundaries — Spark rounds the shortest-decimal string,
# DuckDB the exact binary value). With w=words, s=sents, y=syllables,
# W=max(w,1), D=s·W > 0:
#   flesch·1e4 = (2068350·D − 10150·w·W − 846000·y·s) / D
#   fk·1e4     = (3900·w·W + 118000·y·s − 155900·D) / D
# and half-up(N/D) = floor((2N+D)/(2D)), computed as an exact BIGINT
# floor-division (a − posmod(a,b)) div b on both engines — no floats
# anywhere, so the hash pins the full formula bit-exactly.
# --------------------------------------------------------------------------

_X204_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS w,
         CAST(greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x) != '')), 1) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS y
  FROM documents
),
r AS (
  SELECT doc_id, w, s, y, s * greatest(w, 1) AS d,
         2*(2068350*s*greatest(w, 1) - 10150*w*greatest(w, 1)
            - 846000*y*s) + s*greatest(w, 1) AS fn,
         2*(3900*w*greatest(w, 1) + 118000*y*s
            - 155900*s*greatest(w, 1)) + s*greatest(w, 1) AS kn
  FROM t
)
SELECT doc_id, w AS n_words, s AS n_sents, y AS n_syllables,
       (fn - ((fn % (2*d)) + 2*d) % (2*d)) // (2*d) AS flesch_ease_e4,
       (kn - ((kn % (2*d)) + 2*d) % (2*d)) // (2*d) AS fk_grade_e4
FROM r ORDER BY doc_id
"""


# merged into x212 fused suite (round-11): leg body kept, registration moved
def x204(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_words = T.token_count("text").cast("long")
    n_sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda x: F.trim(x) != "",
            )
        ),
        F.lit(1),
    ).cast("long")
    n_syll = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    staged = docs.select(
        "doc_id",
        n_words.alias("w"),
        n_sents.alias("s"),
        n_syll.alias("y"),
    ).selectExpr(
        "doc_id", "w", "s", "y",
        "s * greatest(w, 1L) AS d",
        "2*(2068350*s*greatest(w, 1L) - 10150*w*greatest(w, 1L)"
        " - 846000*y*s) + s*greatest(w, 1L) AS fn",
        "2*(3900*w*greatest(w, 1L) + 118000*y*s"
        " - 155900*s*greatest(w, 1L)) + s*greatest(w, 1L) AS kn",
    )
    return staged.selectExpr(
        "doc_id",
        "w AS n_words",
        "s AS n_sents",
        "y AS n_syllables",
        "(fn - pmod(fn, 2*d)) div (2*d) AS flesch_ease_e4",
        "(kn - pmod(kn, 2*d)) div (2*d) AS fk_grade_e4",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x205 — URL extraction + per-domain corpus statistics: the crawl-mix
# report a curation pipeline uses to cap/balance domains. Both engines
# append the same deterministic URLs to each document (one per doc
# across 7 sites, plus a mirror link on every third doc), then extract
# with the same regex, parse the host, and aggregate urls/docs per
# domain. Everything is JVM-side regex + one groupBy; the oracle
# recomputes the identical pipeline.
# --------------------------------------------------------------------------

_X205_SQL = """
WITH staged AS (
  SELECT doc_id,
         text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com/p/' || CAST(doc_id AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0
                      THEN ' and http://mirror.example.org/x'
                      ELSE '' END AS t2
  FROM documents
),
u AS (
  SELECT doc_id, unnest(regexp_extract_all(t2, 'https?://[^\\s]+')) AS url
  FROM staged
)
SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u GROUP BY domain ORDER BY domain
"""


@query("x205_url_domain_stats", _X205_SQL)
def x205(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    t2 = F.concat(
        F.col("text"),
        F.lit(" see https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(" and http://mirror.example.org/x")).otherwise(F.lit("")),
    )
    urls = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(t2, F.lit(r"https?://[^\s]+"), 0)
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("domain")
    )


# --------------------------------------------------------------------------
# x212 — the seven single-scan text-quality rows merged into ONE driver row
# (round-11 extension-side slot economics; rationale in queries/_fused.py).
# ALL legs execute every run in one fused checksum action — a broken plan,
# a lost column, or a regex/codegen failure in any leg fails the row — and
# the returned leg + its DuckDB oracle rotate on the persisted sweep
# counter, so each leg is engine-independently verified within 7 rounds.
# The legs are pure JVM-side transforms of the documents table with
# DuckDB-dialect oracles (unnest/string_agg/regexp_extract_all), so there
# is no cheap second in-process rendering — rotation is the value check,
# execution-every-run is what the fusion preserves.
# --------------------------------------------------------------------------

#: 0=type_token, 1=bigram_lm, 2=ngram_novelty, 3=repetition_trim,
#: 4=nfc_normalize, 5=html_to_text, 6=readability
_X212_LEGS = (
    ("type_token", "x115", "_X115_SQL"),
    ("bigram_lm", "x159", "_X159_SQL"),
    ("ngram_novelty", "x171", "_X171_SQL"),
    ("repetition_trim", "x194", "_X194_SQL"),
    ("nfc_normalize", "x200", "_X200_SQL"),
    ("html_to_text", "x201", "_X201_SQL"),
    ("readability", "x204", "_X204_SQL"),
)

from nimhdfstore_spark.queries import leg_choice as _leg_choice  # noqa: E402

_X212_LEG = _leg_choice("x212_text_quality_suite", len(_X212_LEGS))


@query("x212_text_quality_suite", globals()[_X212_LEGS[_X212_LEG][2]])
def x212(spark, sf_dir):
    from nimhdfstore_spark.queries._fused import run_fused

    from concurrent.futures import ThreadPoolExecutor

    # independent driver-side plan builds — concurrent (the x210 pattern)
    with ThreadPoolExecutor(max_workers=len(_X212_LEGS)) as ex:
        legs = list(ex.map(
            lambda d: (d[0], globals()[d[1]](spark, sf_dir)), _X212_LEGS
        ))
    return run_fused(spark, legs, _X212_LEG)
