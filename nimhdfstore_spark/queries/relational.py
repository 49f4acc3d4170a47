"""X70-X72 — relational extension queries (SURVEY §2.3/§2.4 stance: joins and
aggregations are extension surface the reference lacks entirely; Catalyst
provides them, and these queries pin the *plans* a 100 TB cluster needs).

- x70: dim join → the small side MUST broadcast (no shuffle of the fact
  table); asserted in tests/test_plans.py.
- x71: fact-fact join → shuffle(sort-merge or AQE-chosen) on the join key,
  with partial aggregation pushed below the shuffle.
- x72: TPC-H Q1-shaped rollup over lineitem — the canonical scan-heavy
  aggregate; whole-stage codegen end-to-end, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_X70_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


@query("x70_broadcast_dim_join", _X70_SQL)
def x70(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_X71_SQL = """
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
"""


@query("x71_fact_fact_join", _X71_SQL)
def x71(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


_X73_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY c_custkey
"""


@query("x73_set_operations", _X73_SQL)
def x73(spark, sf_dir):
    """§2.7 set operations (absent in the reference; closest is J1 concat).
    INTERSECT/EXCEPT hash-shuffle on the full row — fine here (key-only
    projections); at scale prefer semi/anti joins on explicit keys."""
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    with_orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    final = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_custkey").alias("c_custkey"))
    return cust.intersect(with_orders).subtract(final).orderBy("c_custkey")


_X74_SQL = """
SELECT l_orderkey, l_linenumber,
       upper(l_returnflag) AS flag_u,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       ROUND(l_extendedprice * (1 + l_tax), 2) AS gross,
       CAST(length(l_linestatus) AS BIGINT) AS status_len,
       substr(l_linestatus, 1, 1) AS status_1
FROM lineitem
WHERE l_orderkey % 100 = 0
ORDER BY l_orderkey, l_linenumber
"""


@query("x74_scalar_functions", _X74_SQL)
def x74(spark, sf_dir):
    """§2.8 scalar functions (reference has only numeric casts, P9): string /
    date / math expressions, all JVM-side in one codegen stage."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.upper("l_returnflag").alias("flag_u"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.round(F.col("l_extendedprice") * (1 + F.col("l_tax")), 2).alias("gross"),
        F.length("l_linestatus").cast("long").alias("status_len"),
        F.substring("l_linestatus", 1, 1).alias("status_1"),
    ).orderBy("l_orderkey", "l_linenumber")


_X75_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, MAX(value) AS value FROM events
      WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS pts,
       ROUND(v.value, 6) AS asof_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


@query("x75_asof_join", _X75_SQL)
def x75(spark, sf_dir):
    """Point-in-time (as-of) join: each purchase gets the value of the same
    user's most recent view at or before it. Custom operator (operators/
    asof.py, union-tag + single window pass); DuckDB's native ASOF JOIN is
    the oracle. Right side deduped per (user, ts) so ties are deterministic
    in both engines."""
    from nimhdfstore_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    res = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return res.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("pts"),
        F.round("asof_value", 6).alias("asof_value"),
    ).orderBy("event_id")


_X72_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


@query("x72_tpch_q1_rollup", _X72_SQL)
def x72(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
