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
        # lineage cut (same pattern as x148): the 4-table edge build is
        # referenced by nodes (twice), outw, and every rank iteration —
        # without the cut the subtree repeats 44x (176 parquet scans,
        # 3,397-line plan) and the fact-table join re-executes per
        # reference. The aggregated edge list is bounded by |nations|^2,
        # so the checkpointed blocks are tiny at any scale. Lazy: no job
        # until the first action.
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = G.pagerank_fixed_point(edges, n_nodes, iterations=3)
    return ranks.orderBy(F.desc("rank_fp"), "node")


# --------------------------------------------------------------------------
# x148 — triangle counting over the user co-occurrence graph (users who
# acted in the same (event_type, 5-minute) bucket), with degree-ordered
# orientation so each triangle is found exactly once and high-degree hubs
# never fan out (operators/graph.py:triangle_count).
# --------------------------------------------------------------------------

_X148_SQL = """
WITH und AS (
  SELECT DISTINCT least(a.user_id, b.user_id) AS a,
                  greatest(a.user_id, b.user_id) AS b
  FROM events a JOIN events b
    ON a.event_type = b.event_type
   AND epoch_us(a.ts) // 300000000 = epoch_us(b.ts) // 300000000
   AND a.user_id != b.user_id
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS src,
         CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS dst
  FROM und u
  JOIN deg da ON da.node = u.a
  JOIN deg db ON db.node = u.b
),
tri AS (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
  FROM oriented e1
  JOIN oriented e2 ON e1.dst = e2.src
  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL
  SELECT z FROM tri
),
counts AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY node
),
tot AS (SELECT CAST(COALESCE(SUM(n_triangles), 0) / 3 AS BIGINT)
            AS total_triangles FROM counts)
SELECT c.node, c.n_triangles, t.total_triangles
FROM counts c, tot t
ORDER BY c.n_triangles DESC, c.node LIMIT 20
"""


@query("x148_triangle_count", _X148_SQL)
def x148(spark, sf_dir):
    """Top-20 users by triangle participation in the co-occurrence graph.
    The bucket self-join bounds pair generation by per-bucket membership
    (never all-pairs across the table); the triangle join runs on the
    degree-oriented DAG so each triangle materializes once and wedge
    fan-out is capped by the smaller endpoint's degree — the shape that
    survives power-law graphs at 100 TB."""
    from nimhdfstore_spark.operators.graph import triangle_count
    from nimhdfstore_spark.tables import load

    # 5-minute buckets as plain integers (epoch_us div 3e8) — a finer
    # grain than x147's hours ON PURPOSE: hourly co-occurrence at this
    # fixture's density yields a near-complete graph (every pair of the
    # 1500 sf0.1 users collides somewhere), and a dense graph has O(n^3)
    # triangles no algorithm can dodge. Sparsity is a modeling decision;
    # the orientation trick then keeps the join cost near-linear in edges.
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 300000000").alias("h"),
    )
    # Pin the co-occurrence join's partitioning on its bucket key (guide
    # §2.5): the one-row-group events scan is a single task and the
    # planner broadcasts the tiny build side, leaving 232k pair
    # evaluations on one core; a user repartition is exempt from AQE's
    # byte-targeted coalescing, and both aliases share the exchange, so
    # the join itself adds none. Width from the session's parallelism.
    ev = ev.repartition(
        spark.sparkContext.defaultParallelism, "event_type", "h"
    )
    a, b = ev.alias("a"), ev.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
    )
    counts = triangle_count(edges)
    tot = counts.agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3)
        .cast("long")
        .alias("total_triangles")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


# --------------------------------------------------------------------------
# x156 — BFS hop distance from a source node over the directed trade graph
# --------------------------------------------------------------------------

_X156_SQL = f"""
WITH RECURSIVE edges AS ({_EDGES_CTE}),
walk(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3
)
SELECT node, MIN(dist) AS dist
FROM walk GROUP BY node
ORDER BY dist, node
"""


@query("x156_bfs_hops", _X156_SQL)
def x156(spark, sf_dir):
    """Hop distance from nation 0 in the customer-nation → supplier-nation
    trade graph (≤ 3 hops) — the iterative-frontier-expansion member of the
    graph family (PageRank x116 is iterative aggregation, components x35 is
    fixpoint min-label). The edge build is the same two-broadcast-join
    collapse as x116; each BFS round joins the |V|-row distance table
    against the edge list on src and re-minimizes (operators/graph.py:
    bfs_hops). The oracle walks the same graph with a depth-bounded
    recursive CTE and min-aggregates path lengths."""
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
        .select("src", "dst")
    )
    return G.bfs_hops(edges, source=0, max_hops=3).orderBy("dist", "node")
