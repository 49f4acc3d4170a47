"""X113/X114 — probabilistic-sketch queries (Bloom filter pre-join filter,
Count-Min heavy hitters). Extension surface: the reference has no
approximate structures (SURVEY §2.4). Both sketches are built from the
engine-portable ``sample_hash`` arithmetic, so the DuckDB oracle recomputes
bit-identical bitmaps/cells — these are hash-checked, not rows-only.

The SQL twins materialize the k per-key positions as a UNION ALL over the
k salted hashes (lockstep with ``operators.sketches._positions``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import sketches as SK
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.queries.sampling import _h
from nimhdfstore_spark.tables import load


def _sql_positions(src: str, key: str, k: int, m: int, salt0: int) -> str:
    """UNION ALL of the k salted hash positions: (key, row, pos) rows."""
    parts = [
        f"SELECT {key} AS key, {i} AS rw, ({_h(key, salt=salt0 + i)}) % {m} AS pos FROM {src}"
        for i in range(k)
    ]
    return " UNION ALL ".join(parts)


def _x113_sql() -> str:
    m, k, s0 = SK.BLOOM_M_BITS, SK.BLOOM_K, SK.BLOOM_SALT0
    return f"""
WITH build AS (SELECT DISTINCT o_custkey FROM orders),
bpos AS ({_sql_positions('build', 'o_custkey', k, m, s0)}),
bitmap AS (
    SELECT pos // 63 AS word, bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
    FROM bpos GROUP BY 1
),
ppos AS ({_sql_positions('customer', 'c_custkey', k, m, s0)}),
hits AS (
    SELECT p.key,
           MIN((COALESCE(b.bits, 0) >> CAST(p.pos % 63 AS INT)) & 1) AS bloom_hit
    FROM ppos p LEFT JOIN bitmap b ON p.pos // 63 = b.word
    GROUP BY p.key
),
actual AS (SELECT DISTINCT o_custkey AS key FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(h.bloom_hit) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN a.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_present,
       CAST(SUM(CASE WHEN h.bloom_hit = 1 AND a.key IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN h.bloom_hit = 0 AND a.key IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg
FROM hits h LEFT JOIN actual a ON h.key = a.key
"""


@query("x113_bloom_filter_probe", _x113_sql())
def x113(spark, sf_dir):
    """Bloom-filter membership: build over the distinct order custkeys,
    probe every customer. ``n_false_neg`` must be 0 by construction (the
    whole point of a Bloom filter); ``n_false_pos`` is the price of the
    8 KB bitmap. At 100 TB the bitmap replaces shuffling the build side:
    probe-side pre-filter, then the real join touches only survivors."""
    orders = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    bitmap = SK.bloom_bitmap(orders, "o_custkey")
    flags = SK.bloom_probe(cust, "c_custkey", bitmap)
    actual = orders.withColumnRenamed("o_custkey", "c_custkey").withColumn(
        "__present", F.lit(1)
    )
    joined = flags.join(F.broadcast(actual), "c_custkey", "left")
    present = F.coalesce(F.col("__present"), F.lit(0))
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("bloom_hit").alias("n_flagged"),
        F.sum(present).cast("long").alias("n_present"),
        F.sum(F.when((F.col("bloom_hit") == 1) & (present == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when((F.col("bloom_hit") == 0) & (present == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
    )


def _x114_sql() -> str:
    d, w, s0 = SK.CM_DEPTH, SK.CM_WIDTH, SK.CM_SALT0
    return f"""
WITH cpos AS ({_sql_positions('lineitem', 'l_suppkey', d, w, s0)}),
sketch AS (
    SELECT rw, pos, CAST(COUNT(*) AS BIGINT) AS cnt FROM cpos GROUP BY rw, pos
),
probe AS (SELECT DISTINCT l_suppkey FROM lineitem),
ppos AS ({_sql_positions('probe', 'l_suppkey', d, w, s0)}),
est AS (
    SELECT p.key AS l_suppkey, MIN(COALESCE(s.cnt, 0)) AS cm_estimate
    FROM ppos p LEFT JOIN sketch s ON p.rw = s.rw AND p.pos = s.pos
    GROUP BY p.key
),
exact AS (
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS true_count
    FROM lineitem GROUP BY l_suppkey
)
SELECT e.l_suppkey, e.cm_estimate, x.true_count,
       e.cm_estimate - x.true_count AS overcount
FROM est e JOIN exact x ON e.l_suppkey = x.l_suppkey
ORDER BY e.cm_estimate DESC, e.l_suppkey LIMIT 20
"""


def _x139_sql() -> str:
    p, m, salt = SK.HLL_P, SK.HLL_M, SK.HLL_SALT
    wbits, rmax = SK.HLL_WBITS, SK.HLL_RMAX
    return f"""
WITH hashed AS (
    SELECT CAST(({_h('l_orderkey', salt=salt)}) % {m} AS INT) AS idx,
           ({_h('l_orderkey', salt=salt)}) // {m} AS w
    FROM lineitem
),
regs AS (
    SELECT idx,
           MAX(CASE WHEN w = 0 THEN {wbits + 1}
                    ELSE {wbits + 1} - length(bin(w)) END) AS m_j
    FROM hashed GROUP BY idx
),
agg AS (
    SELECT CAST(SUM(1::BIGINT << ({rmax} - m_j)) AS BIGINT)
               + ({m} - COUNT(*)) * (1::BIGINT << {rmax}) AS sum_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_registers_used
    FROM regs
)
SELECT sum_scaled, n_registers_used,
       ROUND({SK.HLL_NUMER!r} / sum_scaled, 4) AS hll_estimate,
       (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
           AS n_exact
FROM agg
"""


# merged into x214 fused suite (round-11): leg body kept, registration moved
def x139(spark, sf_dir):
    """HyperLogLog distinct-order estimate over lineitem: 256 registers of
    bounded, map-side-combined state regardless of input size — the
    streaming/mergeable alternative to x98's KMV (KMV keeps the k smallest
    hashes; HLL keeps max leading-zero ranks). All-integer register build +
    one shared-literal IEEE division make the estimate itself hash-checked
    against DuckDB, not just "approximately right"."""
    li = load(spark, sf_dir, "lineitem")
    regs = SK.hll_registers(li, "l_orderkey")
    est = SK.hll_estimate(regs)
    exact = li.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    return est.crossJoin(exact)


@query("x114_countmin_heavy_hitters", _x114_sql())
def x114(spark, sf_dir):
    """Count-Min heavy hitters over lineitem supplier keys: the sketch is
    depth×width cells of bounded state (map-side combined groupBy) at any
    stream size; estimates are the classic min-over-rows upper bound
    (overcount >= 0 always, 0 unless cells collide)."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    sketch = SK.countmin_sketch(li, "l_suppkey")
    probe = li.distinct()
    est = SK.countmin_estimate(probe, "l_suppkey", sketch)
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(exact, "l_suppkey")
        .select(
            "l_suppkey",
            "cm_estimate",
            "true_count",
            (F.col("cm_estimate") - F.col("true_count")).alias("overcount"),
        )
        .orderBy(F.desc("cm_estimate"), "l_suppkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# x145 — histogram-sketch quantiles: the mergeable bounded-state
# alternative to x80's exact percentiles (whose global sort/grouping an
# incremental 100 TB pipeline can't afford per refresh).
# --------------------------------------------------------------------------

_HQ_WIDTH = 128.0
_HQ_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _x145_sql() -> str:
    qs = ", ".join(str(q) for q in _HQ_QS)
    return f"""
WITH bins AS (
  SELECT CAST(floor(l_extendedprice / {_HQ_WIDTH}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT b, cnt,
         SUM(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) - cnt
             AS cum_before
  FROM bins
),
tot AS (SELECT SUM(cnt) AS n FROM bins),
qs AS (SELECT unnest([{qs}]) AS q)
SELECT q AS quantile,
       ROUND(b * {_HQ_WIDTH}
             + {_HQ_WIDTH} * (CAST(ceil(q * n) AS BIGINT) - cum_before) / cnt,
             4) AS est_value
FROM cum, tot, qs
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
  AND cum_before < CAST(ceil(q * n) AS BIGINT)
ORDER BY quantile
"""


# merged into x214 fused suite (round-11): leg body kept, registration moved
def x145(spark, sf_dir):
    """Approximate quantiles of l_extendedprice from a fixed-width
    histogram sketch: per-partition histograms merge by adding counts
    (map-side combined groupBy on <= #bins cells), the quantile walk runs
    over the driver-scale bin table, and the interpolation arithmetic is
    exact-int + two IEEE ops — hash-checked, not just "close"."""
    li = load(spark, sf_dir, "lineitem")
    bins = SK.histogram_bins(li, "l_extendedprice", _HQ_WIDTH)
    return SK.histogram_quantiles(bins, _HQ_WIDTH, _HQ_QS).orderBy("quantile")


# --------------------------------------------------------------------------
# x173 — sliding-window distinct users via HLL register MERGE: per-hour
# register tables merge into trailing 3-hour estimates by MAX over aligned
# registers — the mergeability that makes HLL the OLAP pre-aggregation
# sketch (Druid/Pinot style: store per-bucket sketches, answer any window
# by merging, never re-scan raw events). Register build and merge are
# all-integer; the one IEEE division is the x139-proven estimate step.
# --------------------------------------------------------------------------

def _x173_sql() -> str:
    p, m, salt = SK.HLL_P, SK.HLL_M, SK.HLL_SALT
    wbits, rmax = SK.HLL_WBITS, SK.HLL_RMAX
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, user_id FROM events
),
hashed AS (
  SELECT hr, CAST(({_h('user_id', salt=salt)}) % {m} AS INT) AS idx,
         ({_h('user_id', salt=salt)}) // {m} AS w
  FROM e
),
regs AS (
  SELECT hr, idx,
         MAX(CASE WHEN w = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(w)) END) AS m_j
  FROM hashed GROUP BY hr, idx
),
contrib AS (
  SELECT r.hr + s.sh AS th, r.idx, r.m_j
  FROM regs r, (SELECT unnest([0, 1, 2]) AS sh) s
),
hours AS (SELECT DISTINCT hr FROM e),
merged AS (
  SELECT c.th, c.idx, MAX(c.m_j) AS m_j
  FROM contrib c JOIN hours h ON c.th = h.hr
  GROUP BY c.th, c.idx
),
agg AS (
  SELECT th,
         CAST(SUM(1::BIGINT << ({rmax} - m_j)) AS BIGINT)
           + ({m} - COUNT(*)) * (1::BIGINT << {rmax}) AS sum_scaled,
         CAST(COUNT(*) AS BIGINT) AS n_registers_used
  FROM merged GROUP BY th
)
SELECT CAST(th AS BIGINT) AS hour_bucket, sum_scaled, n_registers_used,
       ROUND({SK.HLL_NUMER!r} / sum_scaled, 4) AS users_estimate
FROM agg ORDER BY hour_bucket
"""


# merged into x214 fused suite (round-11): leg body kept, registration moved
def x173(spark, sf_dir):
    """Trailing-3h distinct-user estimates for every active hour. Scale
    shape: raw events collapse to ≤ 256 registers per hour (map-side
    combined), the window merge runs over REGISTERS (hours × 256 rows), and
    the raw table is scanned once — the pre-aggregated-sketch pattern.
    Each register row contributes to 3 target hours via a 3-element
    explode, never a range self-join."""
    from nimhdfstore_spark.operators.sampling import sample_hash

    p, m = SK.HLL_P, SK.HLL_M
    wbits, rmax = SK.HLL_WBITS, SK.HLL_RMAX
    ev = load(spark, sf_dir, "events")
    h = sample_hash("user_id", salt=SK.HLL_SALT)
    hashed = ev.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("hr"),
        h.alias("h"),
    ).select(
        "hr",
        (F.col("h") % m).cast("int").alias("idx"),
        F.expr(f"h div {m}").cast("long").alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
    )
    regs = hashed.select("hr", "idx", rank.alias("rank")).groupBy(
        "hr", "idx"
    ).agg(F.max("rank").alias("m_j"))
    contrib = regs.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("sh"),
        "hr",
        "idx",
        "m_j",
    ).select((F.col("hr") + F.col("sh")).alias("th"), "idx", "m_j")
    hours = ev.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("th")
    ).distinct()
    merged = contrib.join(F.broadcast(hours), "th").groupBy("th", "idx").agg(
        F.max("m_j").alias("m_j")
    )
    agg = merged.groupBy("th").agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {rmax} - m_j)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << rmax)
        ).alias("sum_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_registers_used"),
    )
    return agg.select(
        F.col("th").cast("long").alias("hour_bucket"),
        "sum_scaled",
        "n_registers_used",
        F.round(F.lit(SK.HLL_NUMER) / F.col("sum_scaled"), 4).alias(
            "users_estimate"
        ),
    ).orderBy("hour_bucket")


# --------------------------------------------------------------------------
# x214 — the three bounded-state sketch rows merged into ONE driver row
# (round-11 extension-side slot economics; rationale in queries/_fused.py).
# ALL legs execute every run in one fused action; the returned leg + its
# DuckDB oracle rotate on the persisted sweep counter (each leg
# engine-verified within 3 rounds). The sketch estimates themselves are
# engine-exact by construction (hash-deterministic register arithmetic),
# which is what makes the rotating DuckDB hash-match meaningful.
# --------------------------------------------------------------------------

_X214_LEGS = (
    ("hll_distinct", "x139", _x139_sql()),
    ("hist_quantiles", "x145", _x145_sql()),
    ("sliding_hll", "x173", _x173_sql()),
)

from nimhdfstore_spark.queries import leg_choice as _leg_choice  # noqa: E402

_X214_LEG = _leg_choice("x214_sketch_suite", len(_X214_LEGS))


@query("x214_sketch_suite", _X214_LEGS[_X214_LEG][2])
def x214(spark, sf_dir):
    from nimhdfstore_spark.queries._fused import run_fused

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_X214_LEGS)) as ex:
        legs = list(ex.map(
            lambda d: (d[0], globals()[d[1]](spark, sf_dir)), _X214_LEGS
        ))
    return run_fused(spark, legs, _X214_LEG)
