"""X103-X112 — TPC-H-shaped relational queries (SURVEY §2.3/§2.4 extension
stance: the reference has no joins or aggregations at all — sweep cited in
SURVEY §0 — so the relational surface is extension coverage, and these pin
the *plan shapes* a 100 TB cluster needs for each classic TPC-H pattern).

The driver's tables are a TPC-H subset (no partsupp, no commit/receipt
dates, no shipmode/container columns), so each query keeps the classic
query's JOIN/AGG/SUBQUERY shape while adapting predicates to the columns
that exist (TESTDATA.md schemas).

Plan-shape intent per query (asserted for the representative ones in
tests/test_plans.py):

- x103 (Q6):  pure scan-aggregate — every predicate must reach the Parquet
  scan (PushedFilters), zero joins, map-side partial agg.
- x104 (Q12): fact-fact equi-join with conditional aggregation; one shuffle
  on the join key.
- x105 (Q13): LEFT outer join with an ON-clause filter (not WHERE — outer
  semantics), two-level aggregation; count histogram.
- x106 (Q15): agg → max-of-agg via broadcast of a 1-row global aggregate —
  no global window, no second scan of the fact table.
- x107 (Q17): per-group average threshold as a self-agg + broadcast-able
  re-join (the classic correlated-subquery decorrelation).
- x108 (Q18): HAVING on a grouped fact, then semi-shaped join back to
  orders/customer; deterministic top-k.
- x109 (Q19): disjunctive (OR-of-conjunction) predicates across a
  part↔lineitem join — Catalyst pushes the common l_quantity bounds.
- x110 (Q22): scalar-subquery threshold (global avg) + anti-join.
- x111 (Q8):  5-way snowflake join (region→nation→customer→orders→lineitem
  + supplier→nation) with every dimension broadcast; market-share ratio.
- x112 (Q21): exists / not-exists double correlation via distinct key-set
  semi- and anti-joins.

Money aggregates in the x210-merged legs are exact int64 cent sums (the
round-11 fused suite compares two frontends' plans whose double-summation
orders differ — a ROUND(SUM(double),2) straddled a half-cent boundary at
sf0.01, so per-row cents make the measure plan- and engine-deterministic);
the remaining individually-registered legs keep ROUND(...,2). Quantity sums
are integer-valued doubles (exact in IEEE double at any summation order),
so thresholds on them are engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_X103_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x103(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.expr("cast(round(l_extendedprice * l_discount * 100) as bigint)")
        ).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_X104_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("x104_tpch_q12_priority", _X104_SQL)
def x104(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_X105_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


@query("x105_tpch_q13_custdist", _X105_SQL)
def x105(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    # The priority filter must live in the join condition: in WHERE it would
    # turn the outer join inner and drop order-less customers (the histogram
    # bucket c_count=0 — exactly what Q13 exists to count).
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "5-LOW"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_X106_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("x106_tpch_q15_top_supplier", _X106_SQL)
def x106(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    # ROUND before the max-compare so the equality is on 2-decimal values
    # both engines agree on bit-for-bit.
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # Global max as a 1-row broadcast cross join — no empty-partition window
    # (which would serialize on one task at scale), no fact re-scan.
    top = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_X107_SQL = """
SELECT ROUND(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             / 100.0 / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.qty_threshold
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x107(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    # Decorrelated per-part average: quantities are integer-valued doubles,
    # so SUM is exact at any order and AVG/0.2× is the same double on both
    # engines. The threshold table is one row per part — broadcast-able.
    thr = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.expr("cast(round(l_extendedprice * 100) as bigint)"))
                / 100.0 / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_X108_SQL = """
WITH big AS (
    SELECT l_orderkey, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       ROUND(o.o_totalprice, 2) AS total_price, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_price DESC, o.o_orderkey LIMIT 100
"""


@query("x108_tpch_q18_big_orders", _X108_SQL)
def x108(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty")).where(
        F.col("sum_qty") > 150  # exact: integer-valued double sum
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


_X109_SQL = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("x109_tpch_q19_disjunctive", _X109_SQL)
def x109(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    # Pre-filter both sides with the disjunction's union bounds so the scan
    # prunes before the join (Catalyst derives these, but stating them keeps
    # the part side small enough to broadcast by construction).
    part_f = part.where(F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13"))
    li_f = li.where(F.col("l_quantity").between(1, 30))
    return (
        li_f.join(F.broadcast(part_f), li_f.l_partkey == part_f.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_X110_SQL = """
SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""


@query("x110_tpch_q22_no_orders", _X110_SQL)
def x110(spark, sf_dir):
    # The anti-joined orders side is restricted to finished orders: the data
    # generator references every custkey, so Q22's literal "has no orders"
    # predicate is empty at every sf and the row would verify `0 == 0`
    # (round-7 verdict: vacuous-oracle audit). Non-empty at all sfs (2/21/25).
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_X111_SQL = """
SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_7'
                      THEN CAST(round(l.l_extendedprice
                                      * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END)
             / CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS DOUBLE), 4)
         AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
GROUP BY YEAR(o.o_orderdate) ORDER BY o_year
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x111(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # Customer-side snowflake collapses to a broadcast-able key set before
    # touching the fact table; supplier side broadcasts as (suppkey, nation).
    asia_cust = cust.join(
        F.broadcast(nation.join(F.broadcast(region),
                                nation.n_regionkey == region.r_regionkey)
                    .select("n_nationkey")),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("s_nation"))
    vol = F.expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("s_nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nation") == "NATION_7", F.col("volume"))
                      .otherwise(F.lit(0).cast("long")))
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_X112_SQL = """
WITH late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
),
order_supps AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
late_supps  AS (SELECT DISTINCT l_orderkey, l_suppkey FROM late)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM order_supps o2
              WHERE o2.l_orderkey = l1.l_orderkey
                AND o2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late_supps l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x112(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    # EXISTS/NOT EXISTS with a <> correlation decorrelate to per-order
    # distinct-supplier counts: another supplier exists in the order iff the
    # order has >= 2 suppliers; no OTHER late supplier iff the order's late
    # set is exactly {this supplier}. Aggregated counts shuffle once on
    # orderkey and broadcast back — no quadratic self-join.
    order_nsupp = li.select("l_orderkey", "l_suppkey").distinct().groupBy(
        "l_orderkey"
    ).agg(F.count(F.lit(1)).alias("n_supps"))
    late_nsupp = late.distinct().groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late_supps")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(order_nsupp, "l_orderkey")
        .join(late_nsupp, "l_orderkey")
        .where((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# x133 — TPC-H Q11 shape (important stock). The driver data has no partsupp
# table, so both engines DERIVE the same one: supplier s stocks part p iff
# s % 4 == p % 4, with integer-arithmetic availqty and cost-in-cents. The
# Q11 shape is the point: a grouped aggregate HAVING'd against a scalar
# share of the GLOBAL aggregate — all in int64 cents so the threshold
# comparison is exact (a double HAVING could flip on summation order).
# --------------------------------------------------------------------------

_PARTSUPP_CTE = """
SELECT p.p_partkey AS ps_partkey, s.s_suppkey AS ps_suppkey,
       (p.p_partkey * 31 + s.s_suppkey * 17) % 1000 + 1 AS ps_availqty,
       (p.p_partkey * 7 + s.s_suppkey * 13) % 5000 + 100 AS ps_cost_cents
FROM part p JOIN supplier s ON s.s_suppkey % 4 = p.p_partkey % 4
"""

_X133_SQL = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
val AS (
  SELECT ps_partkey,
         CAST(SUM(CAST(ps_cost_cents AS BIGINT) * ps_availqty) AS BIGINT)
             AS value_cents
  FROM partsupp GROUP BY ps_partkey
),
total AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS t FROM val)
SELECT ps_partkey,
       ROUND(value_cents / 100.0, 2) AS stock_value
FROM val WHERE value_cents * 2000 > (SELECT t FROM total)
ORDER BY value_cents DESC, ps_partkey LIMIT 100
"""


@query("x133_tpch_q11_stock", _X133_SQL)
def x133(spark, sf_dir):
    part = load(spark, sf_dir, "part").select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    ps = part.join(
        F.broadcast(supp),
        supp.s_suppkey % 4 == part.p_partkey % 4,
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 1000 + 1).alias(
            "ps_availqty"
        ),
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 13) % 5000 + 100)
        .cast("long")
        .alias("ps_cost_cents"),
    )
    val = ps.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents")
    )
    total = val.agg(F.sum("value_cents").cast("long").alias("t"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value_cents") * 2000 > F.col("t"))
        .select(
            "ps_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("stock_value"),
            "value_cents",
        )
        .orderBy(F.desc("value_cents"), "ps_partkey")
        .limit(100)
        .drop("value_cents")
    )


# --------------------------------------------------------------------------
# x134 — TPC-H Q20 shape (excess stock): semi-join OF a semi-join —
# suppliers having some stocked part whose availqty exceeds half the
# part+supplier's shipped quantity in a year. Quantity sums are
# integer-valued doubles (exact), availqty is integer — the threshold is
# engine-deterministic without rounding tricks.
# --------------------------------------------------------------------------

_X134_SQL = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                 AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > 0.5 * sh.qty
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM excess e WHERE e.ps_suppkey = s.s_suppkey)
ORDER BY s.s_suppkey
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x134(spark, sf_dir):
    part = load(spark, sf_dir, "part").select("p_partkey")
    supp = load(spark, sf_dir, "supplier")
    ps = part.join(
        F.broadcast(supp.select("s_suppkey")),
        F.col("s_suppkey") % 4 == F.col("p_partkey") % 4,
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 1000 + 1).alias(
            "ps_availqty"
        ),
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    excess = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# x135 — TPC-H Q2 shape (min-cost supplier): for each filtered part, the
# supplier(s) achieving the minimum derived cost, decorated with the
# supplier's nation — the classic per-group-min correlated subquery,
# decorrelated to a grouped min + equi-join back (no window over the whole
# partsupp). Integer cents keep the min-equality exact.
# --------------------------------------------------------------------------

_X135_SQL = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
flt AS (SELECT ps.* FROM partsupp ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_size <= 5),
mn AS (SELECT ps_partkey, MIN(ps_cost_cents) AS min_cents
       FROM flt GROUP BY ps_partkey)
SELECT f.ps_partkey, f.ps_suppkey, s.s_name, n.n_name,
       ROUND(f.ps_cost_cents / 100.0, 2) AS cost
FROM flt f
JOIN mn ON mn.ps_partkey = f.ps_partkey AND f.ps_cost_cents = mn.min_cents
JOIN supplier s ON s.s_suppkey = f.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY f.ps_partkey, f.ps_suppkey LIMIT 200
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x135(spark, sf_dir):
    part = load(spark, sf_dir, "part").where(F.col("p_size") <= 5).select(
        "p_partkey"
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flt = part.join(
        F.broadcast(supp.select("s_suppkey")),
        F.col("s_suppkey") % 4 == F.col("p_partkey") % 4,
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 13) % 5000 + 100)
        .cast("long")
        .alias("ps_cost_cents"),
    )
    mn = flt.groupBy("ps_partkey").agg(F.min("ps_cost_cents").alias("min_cents"))
    sn = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    return (
        flt.withColumnRenamed("ps_partkey", "f_partkey")
        .join(
            mn,
            (F.col("f_partkey") == mn.ps_partkey)
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(sn), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("f_partkey").alias("ps_partkey"),
            "ps_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("ps_cost_cents") / 100.0, 2).alias("cost"),
        )
        .orderBy("ps_partkey", "ps_suppkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# x136 — TPC-H Q16 shape (supplier count by part attributes): distinct
# suppliers per (brand, type-prefix, size) over the derived partsupp, with
# a deterministic supplier blocklist removed by ANTI join before counting.
# --------------------------------------------------------------------------

_X136_SQL = f"""
WITH partsupp AS ({_PARTSUPP_CTE}),
bad AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 17 = 3),
pp AS (
  SELECT p.p_brand, substring(p.p_type, 1, 5) AS type5, p.p_size,
         ps.ps_suppkey
  FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE p.p_brand <> 'Brand#13' AND p.p_size IN (1, 4, 9, 16, 25)
    AND NOT EXISTS (SELECT 1 FROM bad b WHERE b.s_suppkey = ps.ps_suppkey)
)
SELECT p_brand, type5, CAST(p_size AS INT) AS p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM pp GROUP BY p_brand, type5, p_size
ORDER BY supplier_cnt DESC, p_brand, type5, p_size
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x136(spark, sf_dir):
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 9, 16, 25)
    ).select("p_partkey", "p_brand", F.substring("p_type", 1, 5).alias("type5"),
             F.col("p_size").cast("int").alias("p_size"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    bad = supp.where(F.col("s_suppkey") % 17 == 3)
    ps = part.join(
        F.broadcast(supp), F.col("s_suppkey") % 4 == F.col("p_partkey") % 4
    ).select("p_brand", "type5", "p_size", F.col("s_suppkey").alias("ps_suppkey"))
    clean = ps.join(
        F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        clean.groupBy("p_brand", "type5", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "type5", "p_size")
    )


# --------------------------------------------------------------------------
# x137 — TPC-H Q9 shape (product profit by nation and year): profit =
# revenue minus the derived supply cost; the supplier→nation snowflake
# broadcasts, the fact side shuffles once for the (nation, year) rollup.
# Profit is computed in int64 cents (prices are 2-decimal doubles, so
# price*100 rounds to an exact integer) — no float-order sensitivity.
# --------------------------------------------------------------------------

_X137_SQL = """
WITH lp AS (
  SELECT l.l_suppkey, YEAR(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT)
         - ((l.l_partkey * 7 + l.l_suppkey * 13) % 5000 + 100)
           * CAST(l.l_quantity AS BIGINT) AS profit_cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_partkey % 8 = 1
)
SELECT n.n_name, CAST(lp.o_year AS BIGINT) AS o_year,
       ROUND(SUM(lp.profit_cents) / 100.0, 2) AS profit
FROM lp
JOIN supplier s ON s.s_suppkey = lp.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, lp.o_year ORDER BY n.n_name, o_year DESC
"""


# merged into x210_tpch_suite (round-11): leg body kept, registration moved
def x137(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(F.col("l_partkey") % 8 == 1)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue_cents = F.expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"
    )
    cost_cents = (
        (F.col("l_partkey") * 7 + F.col("l_suppkey") * 13) % 5000 + 100
    ) * F.col("l_quantity").cast("long")
    lp = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.year("o_orderdate").alias("o_year"),
        (revenue_cents - cost_cents).alias("profit_cents"),
    )
    sn = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    return (
        lp.join(F.broadcast(sn), lp.l_suppkey == sn.s_suppkey)
        .groupBy("n_name", "o_year")
        .agg(F.round(F.sum("profit_cents") / 100.0, 2).alias("profit"))
        .select("n_name", F.col("o_year").cast("long").alias("o_year"), "profit")
        .orderBy("n_name", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# x210 — the twelve remaining individually-registered TPC-H shapes merged
# into ONE driver row (round-10 verdict ask #1, extension-side: the 50-row
# driver sweep can never drain a ~90-entry backlog at a handful of rows
# per family per round; same-family fusion is the other half of the slot
# economics). ALL twelve legs execute every run, folded into ONE fused
# checksum action — an analysis error, a lost column, or a crashed plan in
# any leg fails the row loudly. The ROTATING leg is additionally verified
# through two more independent renderings the same run: the registered
# ANSI oracle text executed by spark.sql over temp views (frontend
# transcription check) and the driver's DuckDB run of the same text
# (engine-independent check) — so every leg gets the full
# three-rendering treatment within 12 rounds. The twin is rotating
# rather than per-leg-per-run on purpose: a second full execution of all
# twelve legs would cost more than the twelve unfused rows did (measured
# 13.5 s vs their 9.5 s summed sf0.1 minima), failing the fused-row
# economics the merge exists for. All twelve legs were sweep-green
# against DuckDB in the round-10 full-registry record.
#
# Leg bodies stay where they were written (tpch.py / relational.py) with
# their plan-shape docstrings; tests/test_round3_ops.py keeps asserting
# the pushed-filter / no-cartesian plans on the bodies directly. Money
# measures in these legs are exact int64 cent sums (see module
# docstring): two frontends' double-summation orders differ, and a
# ROUND(SUM(double),2) straddled a half-cent boundary at sf0.01.
# --------------------------------------------------------------------------

_X210_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

# (tag, module, leg fn, oracle SQL attr) — oracle text is Spark-SQL-
# compatible for every leg except q3_topk's strftime, overridden for the
# in-query frontend check only (the registered DuckDB oracle keeps it).
_X210_LEG_DEFS = (
    ("q3_topk", "relational", "x85", "_X85_SQL"),
    ("q5_join", "relational", "x96", "_X96_SQL"),
    ("q6_forecast", "tpch", "x103", "_X103_SQL"),
    ("q7_trade", "relational", "x102", "_X102_SQL"),
    ("q8_mkt_share", "tpch", "x111", "_X111_SQL"),
    ("q9_profit", "tpch", "x137", "_X137_SQL"),
    ("q10_returns", "relational", "x100", "_X100_SQL"),
    ("q16_supplier_cnt", "tpch", "x136", "_X136_SQL"),
    ("q17_small_qty", "tpch", "x107", "_X107_SQL"),
    ("q2_min_cost", "tpch", "x135", "_X135_SQL"),
    ("q20_excess_stock", "tpch", "x134", "_X134_SQL"),
    ("q21_waiting", "tpch", "x112", "_X112_SQL"),
)


def _x210_oracle(i: int) -> str:
    import nimhdfstore_spark.queries.relational as _rel

    _, mod, _, sqlname = _X210_LEG_DEFS[i]
    src = _rel if mod == "relational" else __import__(
        "nimhdfstore_spark.queries.tpch", fromlist=["tpch"]
    )
    return getattr(src, sqlname)


from nimhdfstore_spark.queries import leg_choice as _leg_choice  # noqa: E402

_X210_LEG = _leg_choice("x210_tpch_suite", len(_X210_LEG_DEFS))


@query("x210_tpch_suite", _x210_oracle(_X210_LEG))
def x210(spark, sf_dir):
    """ADVICE r11: expressed via _fused.run_fused (the inline copy of the
    (count, hash) + dtype-cast twin machinery had already drifted from it
    in error text); only the strftime→date_format rewrite — DuckDB-only
    rendering in the registered oracle, same output — stays local."""
    import nimhdfstore_spark.queries.relational as _rel
    import nimhdfstore_spark.queries.tpch as _tpch
    from nimhdfstore_spark.queries._fused import run_fused

    from concurrent.futures import ThreadPoolExecutor

    for t in _X210_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)

    # every leg's full result is materialized into the fused checksum
    # pass — a broken plan, lost column, or crash in ANY leg fails the
    # row; the rotating leg's aggregate is value-compared against the
    # SQL-frontend twin in the same pass. The twelve leg BUILDS are pure
    # plan construction (driver-side Catalyst analysis, ~4.2 s sequential
    # at sf0.1) on independent inputs — submit them concurrently
    # (round-11 verdict ask #2): py4j calls release the GIL on socket IO.
    def build(defn):
        tag, mod, fnname, _ = defn
        src = _rel if mod == "relational" else _tpch
        return tag, getattr(src, fnname)(spark, sf_dir)

    with ThreadPoolExecutor(max_workers=12) as ex:
        legs = list(ex.map(build, _X210_LEG_DEFS))
    sql = _x210_oracle(_X210_LEG)
    if _X210_LEG_DEFS[_X210_LEG][0] == "q3_topk":
        # strftime is DuckDB-only; same rendering
        sql = sql.replace(
            "strftime(o.o_orderdate, '%Y-%m-%d')",
            "date_format(o.o_orderdate, 'yyyy-MM-dd')",
        )
    return run_fused(spark, legs, _X210_LEG, {_X210_LEG: spark.sql(sql)})
