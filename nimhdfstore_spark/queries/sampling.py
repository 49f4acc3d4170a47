"""Deterministic-sampling declared queries: the DuckDB oracle recomputes the
same multiplicative id-hash, so every sampled row set matches exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import sampling as SA
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

def _h(id_expr: str, salt: int = 0) -> str:
    """SQL twin of operators.sampling.sample_hash (keep in lockstep)."""
    m = 4294967296
    pm = f"(({id_expr} % {m}) + {m}) % {m}"
    h0 = f"xor({pm}, {(salt * 40503 + 17) % m})"
    h1 = f"(({h0}) * 40503 % {m})"
    return f"xor({h1}, ({h1}) // 65536) * 65599 % {m}"


# -- x76: 10% Bernoulli sample of documents ---------------------------------

_FRACTION = 0.10

_X_BERNOULLI_SQL = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_h('doc_id')} < {int(_FRACTION * SA.MOD32)}
ORDER BY doc_id
"""


@query("x76_sample_bernoulli", _X_BERNOULLI_SQL)
def x_bernoulli(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        SA.hash_sample(docs, "doc_id", _FRACTION)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


# -- x77: stratified rates by event_type (source-mixing ratios) -------------

_RATES = {"click": 0.05, "view": 0.02, "purchase": 1.0}

_X_STRATIFIED_SQL = f"""
SELECT event_id, event_type, user_id
FROM events
WHERE {_h('event_id')} < CASE event_type
  WHEN 'click' THEN {int(0.05 * SA.MOD32)}
  WHEN 'purchase' THEN {int(1.0 * SA.MOD32)}
  WHEN 'view' THEN {int(0.02 * SA.MOD32)}
  ELSE 0 END
ORDER BY event_id
"""


@query("x77_sample_stratified", _X_STRATIFIED_SQL)
def x_stratified(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        SA.stratified_hash_sample(ev, "event_id", "event_type", _RATES)
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    )


# -- x78: exactly-k uniform sample (deterministic reservoir) ----------------

_K = 100

_X_FIXEDK_SQL = f"""
SELECT doc_id, source
FROM documents
ORDER BY {_h('doc_id')}, doc_id LIMIT {_K}
"""


@query("x78_sample_fixed_k", _X_FIXEDK_SQL)
def x_fixed_k(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return SA.fixed_size_hash_sample(docs, "doc_id", _K).select("doc_id", "source")


# --------------------------------------------------------------------------
# x93 — temperature-balanced mixing (sqrt weights): rebalance the corpus
# across languages, upweighting small ones. Output: per-language allocation
# (count, sqrt-weight target, exact deterministic sampled count).
# --------------------------------------------------------------------------

_TEMP_DEN, _TEMP_SALT = 2, 3

_X93_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_g FROM documents GROUP BY lang
),
wts AS (
  SELECT lang, n_g,
         CAST(floor(sqrt(CAST(n_g AS DOUBLE))) AS BIGINT) AS r_g
  FROM counts
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
         CAST(SUM(r_g) AS BIGINT) AS r_total FROM wts
),
th AS (
  SELECT lang, n_g,
         least(n_g, (n_total // {_TEMP_DEN}) * r_g // r_total) AS s_g
  FROM wts, tot
),
th2 AS (
  SELECT lang, n_g, s_g,
         CAST(floor(CAST(s_g AS DOUBLE) / n_g * 4294967296) AS BIGINT) AS t_g
  FROM th
),
kept AS (
  SELECT d.lang FROM documents d JOIN th2 USING (lang)
  WHERE {_h('doc_id', _TEMP_SALT)} < t_g
)
SELECT t.lang,
  CAST(t.n_g AS INT) AS n_docs,
  CAST(t.s_g AS INT) AS n_target,
  CAST(COALESCE(k.c, 0) AS INT) AS n_sampled
FROM th2 t LEFT JOIN (SELECT lang, count(*) AS c FROM kept GROUP BY lang) k
  USING (lang)
ORDER BY t.lang
"""


@query("x93_sample_temperature_mix", _X93_SQL)
def x_temperature_mix(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    th = SA.temperature_thresholds(docs, "lang", _TEMP_DEN)
    samp = SA.temperature_sample(docs, "lang", "doc_id", _TEMP_DEN, _TEMP_SALT)
    k = samp.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    return (
        th.join(k, "lang", "left")
        .select(
            "lang",
            F.col("n_g").cast("int").alias("n_docs"),
            F.col("s_g").cast("int").alias("n_target"),
            F.coalesce(F.col("c"), F.lit(0)).cast("int").alias("n_sampled"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# x95 — coherent multi-table sampling: hash the JOIN KEY, not the row id,
# and every table filtered by the same cutoff keeps exactly the same
# entities — a 20% customer sample carries ALL of each sampled customer's
# orders, with zero cross-table coordination (each scan filters
# independently; no join, no shuffle). The referential-integrity column
# (orders whose customer survived) is definitionally equal to the sampled
# order count — both engines must agree on all three numbers.
# --------------------------------------------------------------------------

_COH_FRAC, _COH_SALT = 0.2, 9
_COH_CUT = int(_COH_FRAC * SA.MOD32)

_X95_SQL = f"""
WITH sc AS (SELECT c_custkey FROM customer
            WHERE {_h('c_custkey', _COH_SALT)} < {_COH_CUT}),
so AS (SELECT o_orderkey, o_custkey FROM orders
       WHERE {_h('o_custkey', _COH_SALT)} < {_COH_CUT})
SELECT
  CAST((SELECT count(*) FROM sc) AS BIGINT) AS n_customers,
  CAST((SELECT count(*) FROM so) AS BIGINT) AS n_orders,
  CAST((SELECT count(*) FROM so JOIN sc ON so.o_custkey = sc.c_custkey)
       AS BIGINT) AS n_orders_with_sampled_customer
"""


@query("x95_sample_coherent_multitable", _X95_SQL)
def x_coherent_sample(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    sc = SA.hash_sample(cust, "c_custkey", _COH_FRAC, salt=_COH_SALT)
    so = SA.hash_sample(orders, "o_custkey", _COH_FRAC, salt=_COH_SALT)
    joined = so.join(
        F.broadcast(sc.select("c_custkey")),
        so["o_custkey"] == F.col("c_custkey"),
    )
    return (
        sc.agg(F.count(F.lit(1)).alias("n_customers"))
        .crossJoin(so.agg(F.count(F.lit(1)).alias("n_orders")))
        .crossJoin(
            joined.agg(F.count(F.lit(1)).alias("n_orders_with_sampled_customer"))
        )
    )


# -- x144: exactly-k-per-group deterministic sample --------------------------

_GK = 25

_X_GROUPK_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
                            ORDER BY ({_h('doc_id', salt=7)}) ASC, doc_id ASC)
           AS rk
  FROM documents
)
SELECT doc_id, lang, source FROM ranked WHERE rk <= {_GK}
ORDER BY doc_id
"""


@query("x144_sample_group_fixed_k", _X_GROUPK_SQL)
def x_group_fixed_k(spark, sf_dir):
    """Exactly-{k}-per-language holdout: per-group window over the id-hash
    order — deterministic on any partitioning (no RNG), one shuffle on the
    group key, no global sort. The per-stratum counterpart of x78's global
    TakeOrdered sample."""
    from nimhdfstore_spark.operators.sampling import grouped_fixed_size_hash_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return grouped_fixed_size_hash_sample(
        docs, "doc_id", "lang", _GK, salt=7
    ).orderBy("doc_id")


# -- x152: leakage-free train/val/test split ---------------------------------

_SPLIT_SALT = 42
_VAL_PCT, _TEST_PCT = 10, 10  # of the 32-bit hash space, in percent


@query("x152_dataset_split", f"""
WITH h AS (
  SELECT doc_id, lang, ({_h('doc_id', salt=_SPLIT_SALT)}) AS hv FROM documents
),
labeled AS (
  SELECT doc_id, lang,
         CASE WHEN hv < {(1 << 32) * _TEST_PCT // 100} THEN 'test'
              WHEN hv < {(1 << 32) * (_TEST_PCT + _VAL_PCT) // 100} THEN 'val'
              ELSE 'train' END AS split
  FROM h
)
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
FROM labeled GROUP BY lang, split ORDER BY lang, split
""")
def x_dataset_split(spark, sf_dir):
    """The canonical corpus split: one deterministic hash of the document
    id cuts the 32-bit hash space into train/val/test (80/10/10) — the
    same doc lands in the same split on any cluster, any partitioning,
    any engine, and membership is a WHERE clause (no shuffle, no RNG
    state, no split-assignment table to join). n = n_distinct per cell
    certifies disjointness-by-construction. Salted independently from
    every sampling query so ablation samples don't correlate with the
    eval holdout."""
    from nimhdfstore_spark.operators.sampling import MOD32, sample_hash

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    hv = sample_hash("doc_id", salt=_SPLIT_SALT)
    test_cut = MOD32 * _TEST_PCT // 100
    val_cut = MOD32 * (_TEST_PCT + _VAL_PCT) // 100
    labeled = docs.select(
        "doc_id",
        "lang",
        F.when(hv < test_cut, "test")
        .when(hv < val_cut, "val")
        .otherwise("train")
        .alias("split"),
    )
    return (
        labeled.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_distinct"),
        )
        .orderBy("lang", "split")
    )


# -- x157: curriculum ordering — difficulty bins, deterministic in-bin
# -- shuffle, global training positions ------------------------------------

_SQL_TOKENS_157 = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
)

_X157_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_SQL_TOKENS_157}) AS BIGINT) AS n_tok
  FROM documents
),
b AS (
  SELECT doc_id, n_tok,
         CAST(least(n_tok // 16, 9) AS BIGINT) AS bin,
         {_h('doc_id', 7)} AS h
  FROM d
),
cnt AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin
),
off AS (
  SELECT bin,
         CAST(COALESCE(SUM(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS base
  FROM cnt
),
w AS (
  SELECT doc_id, n_tok, bin,
         CAST(row_number() OVER (PARTITION BY bin ORDER BY h, doc_id)
           AS BIGINT) AS wpos
  FROM b
)
SELECT CAST(o.base + w.wpos AS BIGINT) AS pos, w.doc_id, w.bin, w.n_tok
FROM w JOIN off o ON w.bin = o.bin
ORDER BY pos
"""


@query("x157_curriculum_order", _X157_SQL)
def x157(spark, sf_dir):
    """Curriculum data ordering: easy (short) documents first, hard ones
    last, deterministically shuffled WITHIN each difficulty bin (Bengio et
    al. 2009 shape). Difficulty = token count into fixed-width bins — a
    shuffle-free map, unlike an NTILE which needs a global sort; the in-bin
    shuffle ranks by the same multiplicative id-hash every sampler here
    uses; global positions come from in-bin row_numbers plus cumulative
    bin offsets (a |bins|-row window). At 100 TB the bin count rises so
    each row_number partition stays executor-sized — positions stay exact
    because offsets absorb the bin sizes."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    from nimhdfstore_spark.operators.text import token_count

    b = docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tok"),
    ).select(
        "doc_id",
        "n_tok",
        F.least(F.expr("n_tok div 16"), F.lit(9)).cast("long").alias("bin"),
        SA.sample_hash("doc_id", salt=7).alias("h"),
    )
    cnt = b.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    woff = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select(
        "bin", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("base")
    )
    wbin = Window.partitionBy("bin").orderBy("h", "doc_id")
    w = b.select(
        "doc_id", "n_tok", "bin", F.row_number().over(wbin).cast("long").alias("wpos")
    )
    return (
        w.join(F.broadcast(off), "bin")
        .select(
            (F.col("base") + F.col("wpos")).alias("pos"),
            "doc_id",
            "bin",
            "n_tok",
        )
        .orderBy("pos")
    )
