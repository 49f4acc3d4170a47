"""Approximate-nearest-neighbor search over an embedding column.

Two strategies over ``array<float>``:

- ``brute_force_topk`` — broadcast the (small) probe set against the corpus,
  cosine in codegen, per-probe top-k via a partitioned window. The baseline
  and the recall oracle.
- ``ivf_topk`` — IVF-style: pick deterministic centroids, assign every
  corpus vector to its nearest centroid (broadcast centroid join — one
  narrow pass), then search only each probe's ``nprobe`` nearest clusters.
  At 100 TB the corpus pass is a single broadcast-join scan and the search
  touches ``nprobe/num_centroids`` of the data; cluster assignment is
  write-once (store it partitioned by cluster id for pruning).

No Python UDFs anywhere — cosine is zip_with/aggregate (functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nimhdfstore_spark.functions.vector import cosine


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors per probe. Output: (probe_id, neighbor_id,
    cosine, rank) with deterministic (cosine desc, neighbor_id) ranking."""
    from nimhdfstore_spark.functions.vector import dot, l2_norm

    # norms once per side (O(n)), not per pair: dot/(np*nc) is bit-identical
    # to dot/(sqrt(pp)*sqrt(cc)).
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        l2_norm(vec_col).alias("pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
    )
    joined = F.broadcast(p).crossJoin(c)
    if not include_self:
        joined = joined.where(F.col("probe_id") != F.col("neighbor_id"))
    sim = joined.withColumn(
        "cosine",
        F.round(
            F.when(
                (F.col("pn") > 0) & (F.col("cn") > 0),
                dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")),
            ),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table, rank by
    cosine, keep rank 1. Output: (id, vec, vn, cluster_id) — ``vn`` is the
    precomputed L2 norm, carried so downstream search never recomputes it."""
    from nimhdfstore_spark.functions.vector import dot, l2_norm

    cent = centroids.select(
        F.col(id_col).alias("cluster_id"), F.col(vec_col).alias("centv"),
        l2_norm(vec_col).alias("centn"),
    )
    joined = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        l2_norm(vec_col).alias("vn"),
    ).crossJoin(F.broadcast(cent))
    sim = joined.withColumn(
        "csim",
        F.when(
            (F.col("vn") > 0) & (F.col("centn") > 0),
            dot(F.col("vec"), F.col("centv")) / (F.col("vn") * F.col("centn")),
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cluster_id"))
    return (
        sim.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("id", "vec", F.col("vn"), "cluster_id")
    )


def deterministic_centroids(
    corpus: DataFrame,
    num_centroids: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """FIXED-``num_centroids`` deterministic centroid pick: the k vectors
    whose multiplicatively-hashed id is smallest — a pseudo-random sample of
    constant size, so the centroid broadcast stays O(k) no matter the corpus
    (an every-Nth pick would grow O(n/N) and blow the broadcast at 100 TB).
    Spark plans the orderBy+limit as TakeOrdered (no global sort). The hash
    is engine-independent int arithmetic (id mod 2^32 times 40503, products
    < 2^48), so a SQL oracle selects the identical set. A seedless stand-in
    for k-means, which would iteratively refine this same assignment join."""
    h = (F.col(id_col) % F.lit(1 << 32)) * F.lit(40503) % F.lit(1 << 32)
    return (
        corpus.orderBy(h.asc(), F.col(id_col).asc()).limit(num_centroids)
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_centroids: int = 64,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: search only each probe's ``nprobe`` nearest clusters."""
    from nimhdfstore_spark.functions.vector import dot, l2_norm

    cents = deterministic_centroids(corpus, num_centroids, id_col)
    assigned = assign_clusters(corpus, cents, id_col, vec_col)

    cent = cents.select(F.col(id_col).alias("cluster_id"), F.col(vec_col).alias("centv"))
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv"),
        l2_norm(vec_col).alias("pn"),
    )
    psim = F.broadcast(p).crossJoin(F.broadcast(cent)).withColumn(
        "csim", cosine(F.col("pv"), F.col("centv"))
    )
    wp = Window.partitionBy("probe_id").orderBy(F.col("csim").desc(), F.col("cluster_id"))
    probe_clusters = (
        psim.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") <= nprobe)
        .select("probe_id", "pv", "pn", "cluster_id")
    )
    cand = probe_clusters.join(assigned, "cluster_id").where(
        F.col("probe_id") != F.col("id")
    )
    sim = cand.withColumn(
        "cosine",
        F.round(
            F.when(
                (F.col("pn") > 0) & (F.col("vn") > 0),
                dot(F.col("pv"), F.col("vec")) / (F.col("pn") * F.col("vn")),
            ),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", F.col("id").alias("neighbor_id"), "cosine", "rank")
    )
