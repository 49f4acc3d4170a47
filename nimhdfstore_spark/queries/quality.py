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
