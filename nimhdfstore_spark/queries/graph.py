"""X116 — weighted PageRank over the nation-level trade graph.

Extension surface (SURVEY §1.1: the reference has no graph notion). The
graph: one edge per (customer nation → supplier nation) pair, weighted by
the number of lineitems traded between them — the bilateral-trade graph
x102 aggregates, here given the canonical iterative-rank treatment in int64
fixed point so the DuckDB oracle (unrolled CTEs) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import graph as G
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_EDGES_CTE = """
SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       CAST(s.s_nationkey AS BIGINT) AS dst,
       CAST(COUNT(*) AS BIGINT) AS w
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""

_X116_SQL = G.pagerank_sql(_EDGES_CTE, iterations=3) + "\nORDER BY rank_fp DESC, node"


@query("x116_pagerank_trade", _X116_SQL)
def x116(spark, sf_dir):
    """3-iteration weighted PageRank. Edge build: two broadcast dim joins
    collapse the fact table to (src, dst) pairs, one shuffle aggregates the
    weights; each rank iteration shuffles the (tiny here, huge at web
    scale) edge list once on dst. All integer fixed-point — see
    operators/graph.py for the overflow bound."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = G.pagerank_fixed_point(edges, n_nodes, iterations=3)
    return ranks.orderBy(F.desc("rank_fp"), "node")
