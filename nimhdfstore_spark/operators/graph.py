"""Iterative graph analytics — weighted PageRank in int64 fixed point.

Extension surface: the reference has no graph notion at all (SURVEY §1.1:
"no graphs"); near-dup clustering already ships a fixpoint connected-
components operator (operators/dedup.py:connected_components). PageRank adds
the other canonical iterative-aggregation shape — rank mass flowing along
weighted edges — which a training-data pipeline uses for link-based source
quality (the original web-scale use case).

Scale shape per iteration: one shuffle of the edge table keyed by dst for
the contribution aggregation, plus a broadcast-able join of the current rank
vector onto the edge sources (ranks live one row per node — at web scale
this is the classic rank-vector join, an equi-join on src). The iteration
count is fixed and small; each round is a pure DataFrame transform, so
Catalyst sees one linear plan (no driver-side data, no collect).

Determinism: ranks are int64 micro-units (SCALE = 1e12). Every step is
integer multiply / integer ``div`` — exact and order-independent on both
engines, so the DuckDB oracle (unrolled iteration CTEs) reproduces the
result bit-for-bit. Double-precision PageRank would NOT oracle: float sums
depend on aggregation order.

Overflow bound: rank < SCALE·N_total ≤ 1e12·N; contribution multiplies by an
edge weight w then divides — ``rank * w`` must stay < 2^63, i.e.
``N · w_max < 9.2e6`` at SCALE 1e12. Callers with heavier graphs lower SCALE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000_000  # 1e12 fixed-point units per 1.0 of rank


def pagerank_fixed_point(
    edges: DataFrame,
    n_nodes_df: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)``; returns
    ``(node, rank_fp)`` with rank in SCALE fixed-point units.

    ``n_nodes_df`` is a 1-row frame ``(n_nodes long)`` — kept as a plan node
    (crossJoin broadcast) rather than a collected scalar so the whole
    computation stays lazy/distributed.

    Nodes are every src or dst in the edge set. A node with no out-edges
    leaks its damped mass (standard simplification; identical in the SQL
    twin). ``damping_pct`` is an integer percentage so the damping arithmetic
    is exact: ``r' = (SCALE - d%·SCALE) div N + d%·Σcontrib div 100``.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    # teleport term: (1-d) * SCALE / N, all integer
    base = n_nodes_df.select(
        F.expr(
            f"(cast({SCALE} as bigint) - cast({damping_pct} as bigint) * {SCALE} div 100) div n_nodes"
        ).alias("__base")
    )
    ranks = nodes.crossJoin(F.broadcast(n_nodes_df)).select(
        "node", F.expr(f"cast({SCALE} as bigint) div n_nodes").alias("rank_fp")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp * w div outw").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(base))
            .select(
                "node",
                (
                    F.col("__base")
                    + F.expr(
                        f"cast({damping_pct} as bigint) * coalesce(contrib, 0L) div 100"
                    )
                ).alias("rank_fp"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str,
    iterations: int = 3,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin of :func:`pagerank_fixed_point` — unrolled iteration CTEs
    over an ``edges(src, dst, w)`` CTE body, same integer arithmetic."""
    d = damping_pct
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)",
        f"base AS (SELECT (CAST({SCALE} AS BIGINT) - CAST({d} AS BIGINT) * {SCALE} // 100) // n_nodes AS b FROM nn)",
        f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) // (SELECT n_nodes FROM nn) AS rank_fp FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
    SELECT e.dst AS node,
           CAST(SUM(r.rank_fp * e.w // o.outw) AS BIGINT) AS contrib
    FROM edges e JOIN outw o ON e.src = o.src JOIN {prev} r ON e.src = r.node
    GROUP BY e.dst
),
r{i} AS (
    SELECT n.node,
           CAST((SELECT b FROM base)
                + CAST({d} AS BIGINT) * COALESCE(c.contrib, 0) // 100
                AS BIGINT) AS rank_fp
    FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)"""
        )
        prev = f"r{i}"
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank_fp FROM {prev}"


def triangle_count(edges: DataFrame) -> DataFrame:
    """Distributed triangle counting with degree-ordered orientation —
    the standard MPC trick (public; Suri & Vassilvitskii 2011): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one, making the graph a DAG in which each triangle appears
    EXACTLY once as wedge a→b, b→c closed by a→c. Orientation bounds the
    join's intermediate size by sum(min-degree per edge) — on skewed
    (power-law) graphs that is orders of magnitude below the naive
    wedge count, because high-degree hubs never fan out.

    ``edges``: undirected ``(u, v)`` pairs; duplicates/self-loops are
    dropped here. Two self-equi-joins on node keys — no cartesian at any
    scale. Returns per-node participation counts ``(node, n_triangles)``
    (each triangle credits its 3 corners)."""
    und = (
        edges.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"),
            "b",
        )
    )
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    # Materialize the oriented DAG ONCE: e1/e2/e3 below reference it under
    # three different join keys, so exchange reuse never fires and the
    # whole pair-generation + distinct + degree-join pipeline would
    # re-execute three times (guide §5: localCheckpoint to cut lineage of
    # a reused intermediate whose fault tolerance is non-critical — an
    # executor loss fails the query, which simply retries). The stored set
    # is the edge list itself, orders of magnitude below the pair
    # intermediate the joins bound. eager=False (r13 ADVICE): the operator
    # stays LAZY — no job fires at plan-construction time (explain-only
    # callers see no execution); the RDD's blocks materialize on the first
    # action and the later join branches read them. Batch-only either way
    # (checkpointing has no streaming form); blocks are freed by the
    # ContextCleaner once the returned frame is garbage-collected.
    oriented = oriented.localCheckpoint(eager=False)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src"))
            & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("x"),
            F.col("e1.dst").alias("y"),
            F.col("e2.dst").alias("z"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def bfs_hops(edges: DataFrame, source: int, max_hops: int) -> DataFrame:
    """Breadth-first hop distance from ``source`` over ``edges(src, dst)``:
    returns ``(node, dist)`` for every node reachable in ≤ ``max_hops``.

    Each round unions the newly reached frontier into the distance table
    and re-minimizes — a fixed, small number of joins that Catalyst sees as
    one linear plan (no driver-side state, no collect). Scale shape per
    round: one equi-join of the (node-sized) distance table against the
    edge list on src — the same rank-vector-join shape as PageRank; the
    distance table never exceeds |V| rows. All-integer, so the DuckDB
    recursive-CTE oracle reproduces it exactly.
    """
    spark = edges.sparkSession
    dist = spark.range(1).select(
        F.lit(source).cast("long").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    )
    for k in range(1, max_hops + 1):
        reached = (
            dist.where(F.col("dist") == k - 1)
            .join(edges, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), F.lit(k).cast("long").alias("dist"))
        )
        dist = (
            dist.union(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist
