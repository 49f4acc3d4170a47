"""X143 — data-quality constraint audit (Deequ-style; extension surface —
the reference's only validation is structural schema compatibility,
nimtables.nim:133-138). One audit = row-level rules in a single scan +
uniqueness groupBys + referential anti-joins, unioned into a tiny
(rule, n_violations) report.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import quality as QA
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_X143_SQL = """
WITH report AS (
  SELECT 'dup_orders_custkey' AS rule,
         (SELECT COALESCE(CAST(SUM(n - 1) AS BIGINT), 0) FROM
            (SELECT o_custkey, COUNT(*) AS n FROM orders
             GROUP BY o_custkey HAVING COUNT(*) > 1)) AS n_violations
  UNION ALL
  SELECT 'fk_events_user_customer',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
          WHERE e.user_id IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = e.user_id))
  UNION ALL
  SELECT 'fk_lineitem_orders',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE l.l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'negative_l_extendedprice',
         (SELECT CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) FROM lineitem)
  UNION ALL
  SELECT 'not_null_l_orderkey',
         (SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) FROM lineitem)
  UNION ALL
  SELECT 'pk_lineitem_orderkey_linenumber',
         (SELECT COALESCE(CAST(SUM(n - 1) AS BIGINT), 0) FROM
            (SELECT l_orderkey, l_linenumber, COUNT(*) AS n FROM lineitem
             GROUP BY 1, 2 HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'range_l_quantity_1_30',
         (SELECT CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 30
                               THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
)
SELECT rule, n_violations FROM report ORDER BY rule
"""


@query("x143_data_quality_audit", _X143_SQL)
def x143(spark, sf_dir):
    """Declarative constraint audit over the warehouse: 4 row-level rules
    in ONE lineitem scan (conditional sums, map-side combined), 2
    uniqueness groupBys, 2 referential LEFT ANTI joins (parent side
    distinct-projected; broadcast when small). The report is 7 rows at any
    corpus size — the audit never materializes violating rows, only
    counts them."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    events = load(spark, sf_dir, "events")
    parts = [
        QA.row_rule_violations(
            li,
            {
                "negative_l_extendedprice": F.col("l_extendedprice") <= 0,
                "not_null_l_orderkey": F.col("l_orderkey").isNull(),
                "range_l_quantity_1_30": (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 30),
            },
        ),
        QA.uniqueness_violations(orders, ["o_custkey"], "dup_orders_custkey"),
        QA.uniqueness_violations(
            li, ["l_orderkey", "l_linenumber"], "pk_lineitem_orderkey_linenumber"
        ),
        QA.referential_violations(
            li, "l_orderkey", orders, "o_orderkey", "fk_lineitem_orders"
        ),
        QA.referential_violations(
            events, "user_id", customer, "c_custkey", "fk_events_user_customer"
        ),
    ]
    return QA.audit(parts).orderBy("rule")


# --------------------------------------------------------------------------
# x161 — join-key skew profile (the diagnosis step behind x89's salted join)
# --------------------------------------------------------------------------

_X161_SQL = """
WITH counts AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT key, c,
         CAST(row_number() OVER (ORDER BY c, key) AS BIGINT) AS r
  FROM counts
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS total_rows,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(SUM(r * c) AS BIGINT) AS src
  FROM ranked
),
top1 AS (
  SELECT key AS top_key FROM ranked ORDER BY c DESC, key LIMIT 1
)
SELECT a.n_keys, a.total_rows, a.max_key_rows, t.top_key,
       CAST((2 * a.src - (a.n_keys + 1) * a.total_rows) * 1000000
            // (a.n_keys * a.total_rows) AS BIGINT) AS gini_ppm,
       CAST(a.max_key_rows * a.n_keys * 1000000 // a.total_rows AS BIGINT)
         AS skew_ratio_ppm
FROM agg a, top1 t
"""


@query("x161_key_skew_profile", _X161_SQL)
def x161(spark, sf_dir):
    """Distribution profile of a join key before the shuffle: key count,
    hottest key, Gini concentration, and max/mean skew ratio — the numbers
    that decide between a plain shuffle join, AQE skew splitting, and an
    explicit salt (x89). Gini comes from the rank formula
    ``(2·Σ r·c − (n+1)·Σc) / (n·Σc)`` over counts ranked ascending —
    all-integer, so the oracle matches bit-for-bit (a float Σ p·ln p
    entropy would not: libm and summation order differ across engines).

    Scale shape: one map-side-combined groupBy on the key, then the rank
    over the per-key count table via ``with_rowid`` — at test scale the
    auto strategy keeps the cheap single-task window, but when the key
    table itself is big (a billion distinct keys: exactly the corpus that
    NEEDS a skew profile) it switches to the range-partition + prefix-sum
    path instead of moving every count through one task (the round-12
    registry-wide plan audit's find) — then a single global aggregate: the
    profile is one row at any corpus size."""
    from nimhdfstore_spark.rowid import ROWID, with_rowid

    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    ranked = with_rowid(counts, ["c", "key"]).select(
        "key", "c", (F.col(ROWID) + 1).cast("long").alias("r")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_key_rows"),
        F.sum(F.col("r") * F.col("c")).alias("src"),
    )
    top1 = ranked.orderBy(F.desc("c"), "key").limit(1).select(
        F.col("key").alias("top_key")
    )
    return agg.crossJoin(F.broadcast(top1)).select(
        "n_keys",
        "total_rows",
        "max_key_rows",
        "top_key",
        F.expr(
            "(2 * src - (n_keys + 1) * total_rows) * 1000000"
            " div (n_keys * total_rows)"
        ).alias("gini_ppm"),
        F.expr("max_key_rows * n_keys * 1000000 div total_rows").alias(
            "skew_ratio_ppm"
        ),
    )


# --------------------------------------------------------------------------
# x176 — k-anonymity / l-diversity audit: the privacy sweep a training-data
# release runs over quasi-identifier combinations (here: lang × length
# bucket, with `source` as the sensitive attribute). Classes smaller than k
# re-identify members; classes with fewer than l distinct sensitive values
# leak the attribute even at k. One map-side-combined groupBy — the same
# shape at 100 TB (distinct-count is the only shuffle-wide aggregate).
# Public basis: Sweeney 2002 (k-anonymity), Machanavajjhala 2007
# (l-diversity). Extension surface — the reference has no audit layer.
# --------------------------------------------------------------------------

_K_ANON, _L_DIV = 5, 2

_X176_SQL = f"""
SELECT lang,
       n_chars // 200 AS len_bucket,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(count(DISTINCT source) AS INT) AS n_sources,
       count(*) < {_K_ANON} AS k_at_risk,
       count(DISTINCT source) < {_L_DIV} AS l_at_risk
FROM documents
GROUP BY lang, len_bucket
ORDER BY lang, len_bucket
"""


@query("x176_k_anonymity", _X176_SQL)
def x176(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang", F.expr("n_chars div 200").alias("len_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.count_distinct("source").cast("int").alias("n_sources"),
        )
        .withColumn("k_at_risk", F.col("class_size") < _K_ANON)
        .withColumn("l_at_risk", F.col("n_sources") < _L_DIV)
        .orderBy("lang", "len_bucket")
    )


# --------------------------------------------------------------------------
# x180 — distribution drift between two periods (train/serve skew, the
# data-quality check a production pipeline runs before retraining): per
# event_type, total-variation distance between the first- and second-half
# `value` distributions over fixed-width buckets. TV = ½·Σ|p_i − q_i| in
# SCALED INTEGERS: d_i = a_i·N_B − b_i·N_A is exact in int64, and the ppm
# result uses staged integer division (floor on positive ints — identical
# in both engines; beyond ~10⁹ rows/period the products need
# DECIMAL(38,0), the x165 pattern). One scan: conditional-sum groupBy per
# (type, bucket), then a tiny per-type rollup.
# --------------------------------------------------------------------------

_X180_SPLIT = "2024-01-16"
_X180_BUCKET = 50  # value in [0, 490] -> 10 buckets

_X180_SQL = f"""
WITH b AS (
  SELECT event_type, CAST(floor(value / {_X180_BUCKET}) AS BIGINT) AS bucket,
         CAST(sum(CASE WHEN ts <  TIMESTAMP '{_X180_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_X180_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS b_n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(sum(a_n) AS BIGINT) AS na, CAST(sum(b_n) AS BIGINT) AS nb
  FROM b GROUP BY 1
)
SELECT b.event_type, t.na AS n_first, t.nb AS n_second,
       CAST(count(*) AS INT) AS n_buckets,
       CAST((sum(abs(b.a_n * t.nb - b.b_n * t.na)) * 500000) // t.na // t.nb
            AS BIGINT) AS tv_ppm
FROM b JOIN tot t ON b.event_type = t.event_type
GROUP BY b.event_type, t.na, t.nb
ORDER BY b.event_type
"""


@query("x180_drift_tv", _X180_SQL)
def x180(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    first = F.col("ts") < F.lit(_X180_SPLIT).cast("timestamp")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / _X180_BUCKET).cast("long").alias("bucket"),
    ).agg(
        F.sum(F.when(first, 1).otherwise(0)).cast("long").alias("a_n"),
        F.sum(F.when(~first, 1).otherwise(0)).cast("long").alias("b_n"),
    )
    tot = b.groupBy("event_type").agg(
        F.sum("a_n").cast("long").alias("na"),
        F.sum("b_n").cast("long").alias("nb"),
    )
    j = b.join(F.broadcast(tot), "event_type")
    return (
        j.groupBy("event_type", "na", "nb")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_buckets"),
            F.sum(F.abs(F.col("a_n") * F.col("nb") - F.col("b_n") * F.col("na")))
            .alias("s"),
        )
        .select(
            "event_type",
            F.col("na").alias("n_first"),
            F.col("nb").alias("n_second"),
            "n_buckets",
            F.expr("CAST(((s * 500000) div na) div nb AS BIGINT)").alias("tv_ppm"),
        )
        .orderBy("event_type")
    )
