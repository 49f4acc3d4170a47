"""Similarity-search declared queries (north-star QX3): brute-force top-k
cosine and the fixed-k IVF scale path — both oracle-checked (the centroid
pick and all ranking math are engine-independent); IVF recall vs brute force
additionally pinned in tests/test_extensions.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import similarity as S
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

_K = 10
_PROBES = (0, 1, 2, 3, 4)

_SQL_DOT = (
    "list_reduce(list_transform(range(64), i -> "
    "CAST({a}.embedding[i+1] AS DOUBLE) * CAST({b}.embedding[i+1] AS DOUBLE)), "
    "(x, y) -> x + y)"
)

_X_ANN_SQL = f"""
WITH sims AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    ROUND({_SQL_DOT.format(a='p', b='c')} /
      (sqrt({_SQL_DOT.format(a='p', b='p')}) *
       sqrt({_SQL_DOT.format(a='c', b='c')})), 6) AS cosine
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id IN {_PROBES}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {_K} ORDER BY probe_id, rank
"""


@query("x40_ann_bruteforce_topk", _X_ANN_SQL)
def x_ann_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.brute_force_topk(emb, probes, k=_K).orderBy("probe_id", "rank")


# IVF with FIXED-k centroids (k independent of corpus size, so the centroid
# broadcast is O(k) at any scale). Oracle-checked since round 2: the centroid
# pick is an engine-independent multiplicative-hash top-k, and assignment /
# probe routing / final ranking are plain SQL windows over the same fold math.

_IVF_K, _IVF_NPROBE = 64, 2
_CENT_HASH = "(vec_id % 4294967296) * 40503 % 4294967296"

_DOTC = (  # dot between an embeddings row alias and a centroid alias
    "list_reduce(list_transform(range(64), i -> "
    "CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), (x, y) -> x + y)"
)


def _ivf_sql() -> str:
    cos = lambda a, b: (  # noqa: E731
        f"{_DOTC.format(a=a, b=b)} / "
        f"(sqrt({_DOTC.format(a=a, b=a)}) * sqrt({_DOTC.format(a=b, b=b)}))"
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS cluster_id, embedding AS centv FROM embeddings
  ORDER BY {_CENT_HASH}, vec_id LIMIT {_IVF_K}
),
assigned AS (
  SELECT id, vec, vn, cluster_id FROM (
    SELECT e.vec_id AS id, e.embedding AS vec,
           sqrt({_DOTC.format(a='e.embedding', b='e.embedding')}) AS vn,
           c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.centv')} DESC, c.cluster_id) AS r
    FROM embeddings e CROSS JOIN cents c
  ) WHERE r = 1
),
pc AS (
  SELECT probe_id, pv, pn, cluster_id FROM (
    SELECT p.vec_id AS probe_id, p.embedding AS pv,
           sqrt({_DOTC.format(a='p.embedding', b='p.embedding')}) AS pn,
           c.cluster_id,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY {cos('p.embedding', 'c.centv')} DESC, c.cluster_id) AS r
    FROM embeddings p CROSS JOIN cents c WHERE p.vec_id IN {_PROBES}
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT pc.probe_id, a.id AS neighbor_id,
         ROUND({_DOTC.format(a='pc.pv', b='a.vec')} / (pc.pn * a.vn), 6) AS cosine
  FROM pc JOIN assigned a USING (cluster_id) WHERE pc.probe_id != a.id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM cand
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {_K} ORDER BY probe_id, rank
"""


@query("x41_ann_ivf_topk", _ivf_sql())
def x_ann_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.ivf_topk(
        emb, probes, k=_K, num_centroids=_IVF_K, nprobe=_IVF_NPROBE
    ).orderBy("probe_id", "rank")


# --------------------------------------------------------------------------
# x42 — SemDeDup semantic dedup: fixed-point Lloyd k-means (deterministic
# seeds, fixed iterations), then drop in-cluster near-duplicates by cosine.
# The oracle unrolls the identical iterations as materialized CTEs; every
# arithmetic step (int64 quantization, exact integer sums, IEEE
# double-division centroids, left-fold distances) is bit-reproducible in
# DuckDB, so assignments AND the kept/dropped verdicts hash-match.
# --------------------------------------------------------------------------

_KM_K, _KM_ITERS, _KM_TAU = 8, 2, 0.3
_KM_SCALE = S.KMEANS_SCALE


def _km_d2(s: str, c: str) -> str:
    t = f"(CAST({s}[i+1] AS DOUBLE) - {c}[i+1]) * (CAST({s}[i+1] AS DOUBLE) - {c}[i+1])"
    return f"list_reduce(list_transform(range(64), i -> {t}), (x, y) -> x + y)"


def _km_assign_cte(name: str, cents: str) -> str:
    return f"""{name} AS MATERIALIZED (
  SELECT id, cluster_id FROM (
    SELECT s.vec_id AS id, c.cluster_id,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY {_km_d2('s.sv', 'c.cv')}, c.cluster_id) AS r
    FROM sv s CROSS JOIN {cents} c) WHERE r = 1
)"""


def _semantic_dedup_sql() -> str:
    parts = [
        f"""sv AS MATERIALIZED (
  SELECT vec_id,
    list_transform(embedding,
                   v -> CAST(round(CAST(v AS DOUBLE) * {_KM_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
)""",
        f"""c0 AS MATERIALIZED (
  SELECT vec_id AS cluster_id, list_transform(sv, v -> CAST(v AS DOUBLE)) AS cv
  FROM sv ORDER BY {_CENT_HASH}, vec_id LIMIT {_KM_K}
)""",
    ]
    prev = "c0"
    for it in range(_KM_ITERS):
        parts.append(_km_assign_cte(f"a{it}", prev))
        parts.append(f"""c{it + 1} AS MATERIALIZED (
  SELECT cluster_id, list(m ORDER BY pos) AS cv FROM (
    SELECT a.cluster_id, i AS pos,
           CAST(SUM(s.sv[i + 1]) AS DOUBLE) / COUNT(*) AS m
    FROM a{it} a JOIN sv s ON a.id = s.vec_id CROSS JOIN range(64) t(i)
    GROUP BY a.cluster_id, i) GROUP BY cluster_id
)""")
        prev = f"c{it + 1}"
    parts.append(_km_assign_cte("af", prev))
    # Quantized cosine (the x34 recipe): the KMEANS_SCALE fixed-point
    # vectors are already materialized as sv — int products ≤ 2^46 sum
    # exactly in double, so list_dot_product is order-insensitive and
    # bit-identical to the Spark side's int64 Gram matmul.
    parts.append("""emb AS MATERIALIZED (
  SELECT s.vec_id AS id,
         list_transform(s.sv, v -> CAST(v AS DOUBLE)) AS q,
         sqrt(list_dot_product(list_transform(s.sv, v -> CAST(v AS DOUBLE)),
                               list_transform(s.sv, v -> CAST(v AS DOUBLE)))) AS vn,
         a.cluster_id
  FROM sv s JOIN af a ON s.vec_id = a.id
)""")
    parts.append(f"""dropped AS (
  SELECT DISTINCT b.id FROM emb a JOIN emb b
    ON a.cluster_id = b.cluster_id AND a.id < b.id
  WHERE a.vn > 0 AND b.vn > 0
    AND list_dot_product(a.q, b.q) / (a.vn * b.vn) >= {_KM_TAU}
)""")
    return (
        "WITH " + ",\n".join(parts) + """
SELECT a.id AS vec_id, a.cluster_id, d.id IS NULL AS kept
FROM af a LEFT JOIN dropped d ON a.id = d.id ORDER BY a.id
"""
    )


@query("x42_semantic_dedup_kmeans", _semantic_dedup_sql())
def x_semantic_dedup(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(
        emb, "vec_id", "embedding", k=_KM_K, iters=_KM_ITERS, tau=_KM_TAU
    )
    return out.withColumnRenamed("id", "vec_id").orderBy("vec_id")


# --------------------------------------------------------------------------
# x94 — feature-hashed bag-of-words embeddings + top-k cosine neighbors:
# the text→vector bridge. Token buckets come from the engine-independent
# polynomial hash, the vector is 64 conditional SUMs (SimHash shape), and
# the ranking math is exactly x40's — so the whole path hash-matches.
# --------------------------------------------------------------------------

_BOW_DIMS, _BOW_K = 64, 5
_BOW_PROBES = (0, 1, 2, 3, 4)

_SQL_TOKENS_X94 = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
)
_TOKEN_HASH = (
    "list_reduce(list_transform(list_filter(string_split(token, ''), "
    "c -> c != ''), c -> CAST(ascii(c) AS BIGINT)), "
    "(acc, x) -> (acc * 31 + x) % 1000000007)"
)


def _bow_sql() -> str:
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN b = {p} THEN 1 ELSE 0 END) AS DOUBLE)"
        for p in range(_BOW_DIMS)
    )
    dot = (
        "list_reduce(list_transform(range(64), i -> "
        "{a}.vec[i+1] * {b}.vec[i+1]), (x, y) -> x + y)"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS_X94}) AS token FROM documents
),
bk AS (SELECT doc_id, {_TOKEN_HASH} % {_BOW_DIMS} AS b FROM tok),
bow AS MATERIALIZED (
  SELECT doc_id, list_value({sums}) AS vec FROM bk GROUP BY doc_id
),
sims AS (
  SELECT p.doc_id AS probe_id, c.doc_id AS neighbor_id,
    ROUND({dot.format(a='p', b='c')} /
      (sqrt({dot.format(a='p', b='p')}) * sqrt({dot.format(a='c', b='c')})), 6)
      AS cosine
  FROM bow p JOIN bow c ON p.doc_id != c.doc_id
  WHERE p.doc_id IN {_BOW_PROBES}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT probe_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {_BOW_K} ORDER BY probe_id, rank
"""


@query("x94_hashed_bow_topk", _bow_sql())
def x_hashed_bow_topk(spark, sf_dir):
    from nimhdfstore_spark.operators import text as T

    docs = load(spark, sf_dir, "documents")
    bow = T.hashed_bow_table(docs, "doc_id", "text", _BOW_DIMS)
    probes = bow.where(F.col("doc_id").isin(list(_BOW_PROBES)))
    return S.brute_force_topk(
        bow, probes, id_col="doc_id", vec_col="vec", k=_BOW_K
    ).orderBy("probe_id", "rank")


# --------------------------------------------------------------------------
# x43 — per-label embedding centroids (class prototypes): quantize → exact
# int sums → IEEE double division, the same bit-reproducible recipe as x42,
# so DuckDB recomputes the identical 640 centroid components.
# --------------------------------------------------------------------------

_X43_SQL = f"""
SELECT label, CAST(i AS INT) AS dim,
       CAST(SUM(CAST(round(CAST(embedding[i+1] AS DOUBLE) * {S.KMEANS_SCALE})
                     AS BIGINT)) AS DOUBLE) / COUNT(*) / {S.KMEANS_SCALE}.0
         AS centroid
FROM embeddings CROSS JOIN range(64) t(i)
GROUP BY label, i
ORDER BY label, dim
"""


@query("x43_embedding_group_centroid", _X43_SQL)
def x43(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return S.group_centroids(emb, "label", "embedding", dims=64).orderBy(
        "label", "dim"
    )


# --------------------------------------------------------------------------
# x44 — kNN classification: majority label among the 10 nearest neighbors
# of each probe (ties broken by smaller label). Built on the same
# deterministic brute-force ranking as x40, so votes — and therefore the
# prediction — are engine-identical.
# --------------------------------------------------------------------------

_X44_SQL = f"""
WITH sims AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
    ROUND({_SQL_DOT.format(a='p', b='c')} /
      (sqrt({_SQL_DOT.format(a='p', b='p')}) *
       sqrt({_SQL_DOT.format(a='c', b='c')})), 6) AS cosine
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id IN {_PROBES}
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sims
),
votes AS (
  SELECT probe_id, label, CAST(COUNT(*) AS BIGINT) AS votes
  FROM ranked WHERE rank <= {_K}
  GROUP BY probe_id, label
)
SELECT probe_id, label AS pred_label, votes FROM (
  SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY votes DESC, label) AS vr
  FROM votes
) WHERE vr = 1 ORDER BY probe_id
"""


@query("x44_knn_classify", _X44_SQL)
def x44(spark, sf_dir):
    from pyspark.sql.window import Window

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    nb = S.brute_force_topk(emb, probes, k=_K)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        nb.join(lab, "neighbor_id")
        .groupBy("probe_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .where(F.col("vr") == 1)
        .select("probe_id", F.col("label").alias("pred_label"), "votes")
        .orderBy("probe_id")
    )


# --------------------------------------------------------------------------
# x45 — int8 embedding quantization with reconstruction-error audit
# --------------------------------------------------------------------------
# Per-vector symmetric quantization (scale = 127 / max|v|): the standard
# 4x shrink before ANN serving. Everything is elementwise higher-order
# functions on the array column — JVM-side, no Python — and the per-label
# error rollup is an ordinary map-side-combined aggregate. Oracle: the same
# math via DuckDB list_transform/list_max. round() on half-integers agrees
# (both round away from zero); the 1e-30 floor guards all-zero vectors.

_X45_SQL = """
WITH q AS (
  SELECT label,
    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)
      AS mx,
    embedding
  FROM embeddings
),
err AS (
  SELECT label,
    list_max(list_transform(embedding, x ->
      abs(CAST(x AS DOUBLE)
          - round(CAST(x AS DOUBLE) * 127.0 / mx) * mx / 127.0))) AS max_err
  FROM q
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       ROUND(avg(max_err), 6) AS avg_max_err,
       ROUND(max(max_err), 6) AS worst_err
FROM err GROUP BY label ORDER BY label
"""


@query("x45_embedding_quantize_int8", _X45_SQL)
def x45(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    mx = F.greatest(F.array_max(v), F.lit(1e-30))
    q = emb.select("label", mx.alias("mx"), "embedding")
    recon_err = F.array_max(
        F.transform(
            "embedding",
            lambda x: F.abs(
                x.cast("double")
                - F.round(x.cast("double") * 127.0 / F.col("mx"))
                * F.col("mx") / 127.0
            ),
        )
    )
    return (
        q.select("label", recon_err.alias("max_err"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("max_err"), 6).alias("avg_max_err"),
            F.round(F.max("max_err"), 6).alias("worst_err"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# x119 — product quantization + ADC top-k: the memory-compressed ANN scale
# path (codes ≈ 2 bytes/vector instead of 256 bytes of float32; query-time
# distances come from a per-probe lookup table, never the raw vectors).
# Pure int64 arithmetic end-to-end — bit-identical oracle.
# --------------------------------------------------------------------------

_PQ_SUB = S.PQ_DIMS // S.PQ_M   # dims per sub-space


def _pq_sql() -> str:
    m, ks, sub, scale = S.PQ_M, S.PQ_KS, _PQ_SUB, S.KMEANS_SCALE
    int_d2 = (
        f"list_reduce(list_transform(range({sub}), i -> "
        "({a}[i + 1] - {b}[i + 1]) * ({a}[i + 1] - {b}[i + 1])), "
        "(x, y) -> x + y)"
    )
    return f"""
WITH sv AS MATERIALIZED (
  SELECT vec_id,
    list_transform(embedding,
                   v -> CAST(round(CAST(v AS DOUBLE) * {scale}) AS BIGINT)) AS fv
  FROM embeddings
),
picked AS (
  SELECT vec_id, fv,
         CAST(row_number() OVER (ORDER BY {_CENT_HASH}, vec_id) - 1 AS INT) AS code
  FROM sv ORDER BY {_CENT_HASH}, vec_id LIMIT {ks}
),
cb AS MATERIALIZED (
  SELECT j, code, list_transform(range({sub}), i -> fv[j * {sub} + i + 1]) AS cw
  FROM picked, unnest(range({m})) t(j)
),
subs AS MATERIALIZED (
  SELECT vec_id AS id, j,
         list_transform(range({sub}), i -> fv[j * {sub} + i + 1]) AS svv
  FROM sv, unnest(range({m})) t(j)
),
codes AS MATERIALIZED (
  SELECT id, j, code FROM (
    SELECT s.id, s.j, c.code,
           row_number() OVER (PARTITION BY s.id, s.j
               ORDER BY {int_d2.format(a='s.svv', b='c.cw')}, c.code) AS r
    FROM subs s JOIN cb c ON s.j = c.j) WHERE r = 1
),
dtab AS (
  SELECT s.id AS probe_id, s.j, c.code,
         {int_d2.format(a='s.svv', b='c.cw')} AS pd2
  FROM subs s JOIN cb c ON s.j = c.j
  WHERE s.id IN {_PROBES}
),
total AS (
  SELECT d.probe_id, co.id, CAST(SUM(d.pd2) AS BIGINT) AS approx_d2
  FROM codes co JOIN dtab d ON co.j = d.j AND co.code = d.code
  WHERE co.id != d.probe_id
  GROUP BY d.probe_id, co.id
)
SELECT probe_id, id AS neighbor_id, approx_d2, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY approx_d2, id) AS INT) AS rank
  FROM total) WHERE rank <= {_K}
ORDER BY probe_id, rank
"""


@query("x119_pq_adc_topk", _pq_sql())
def x119(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    cb = S.pq_codebooks(emb)
    codes = S.pq_encode(emb, cb)
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    return S.pq_adc_topk(codes, cb, probes, k=_K).orderBy("probe_id", "rank")


# --------------------------------------------------------------------------
# x146 — maximal-marginal-relevance (MMR) diverse top-k: the greedy
# diversity-aware re-rank between retrieval and context packing. The
# oracle unrolls the k greedy steps into CTEs (the x42/x116 technique for
# iterative algorithms) over the same pre-rounded similarity tables.
# --------------------------------------------------------------------------

_MMR_PROBES = (0, 1, 2)
_MMR_POOL = 16
_MMR_K = 6


def _x146_sql() -> str:
    from nimhdfstore_spark.operators.similarity import MMR_LAM as LAM
    from nimhdfstore_spark.operators.similarity import MMR_MU as MU

    cos = lambda a, b: (  # noqa: E731
        f"ROUND({_SQL_DOT.format(a=a, b=b)} / "
        f"(sqrt({_SQL_DOT.format(a=a, b=a)}) * sqrt({_SQL_DOT.format(a=b, b=b)})), 6)"
    )
    ctes = [
        f"""sims AS MATERIALIZED (
  SELECT p.vec_id AS probe_id, c.vec_id AS id, {cos('p', 'c')} AS qsim
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id IN {_MMR_PROBES}
),
pool AS MATERIALIZED (
  SELECT probe_id, id, qsim FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
        ORDER BY qsim DESC, id) AS rank FROM sims
  ) WHERE rank <= {_MMR_POOL}
),
poolv AS MATERIALIZED (
  SELECT p.probe_id, p.id, e.embedding FROM pool p
  JOIN embeddings e ON e.vec_id = p.id
),
pairs AS MATERIALIZED (
  SELECT a.probe_id, a.id AS id_a, b.id AS id_b,
         {cos('a', 'b')} AS sim
  FROM poolv a JOIN poolv b
    ON a.probe_id = b.probe_id AND a.id != b.id
),
sel1 AS MATERIALIZED (
  SELECT probe_id,
         (list(id ORDER BY {LAM}*qsim - {MU}*0.0 DESC, id))[1] AS s1,
         (list({LAM}*qsim - {MU}*0.0
               ORDER BY {LAM}*qsim - {MU}*0.0 DESC, id))[1] AS c1
  FROM pool GROUP BY probe_id
)"""
    ]
    for n in range(2, _MMR_K + 1):
        prev = ", ".join(f"s.s{i}" for i in range(1, n))
        carry = ", ".join(f"s.s{i}, s.c{i}" for i in range(1, n))
        joins = "\n    ".join(
            f"LEFT JOIN pairs p{i} ON p{i}.probe_id = c.probe_id "
            f"AND p{i}.id_a = c.id AND p{i}.id_b = s.s{i}"
            for i in range(1, n)
        )
        greatest = ", ".join(f"COALESCE(p{i}.sim, 0.0)" for i in range(1, n))
        ctes.append(f"""score{n} AS MATERIALIZED (
  SELECT c.probe_id, c.id,
         {LAM}*c.qsim - {MU}*GREATEST({greatest}) AS score
  FROM pool c
    JOIN sel{n - 1} s ON s.probe_id = c.probe_id
    {joins}
  WHERE c.id NOT IN ({prev})
),
sel{n} AS MATERIALIZED (
  SELECT s.probe_id, {carry},
         (list(sc.id ORDER BY sc.score DESC, sc.id))[1] AS s{n},
         (list(sc.score ORDER BY sc.score DESC, sc.id))[1] AS c{n}
  FROM sel{n - 1} s JOIN score{n} sc ON s.probe_id = sc.probe_id
  GROUP BY s.probe_id, {carry}
)""")
    steps = "\nUNION ALL\n".join(
        f"SELECT probe_id, CAST({n} AS INT) AS position, s{n} AS vec_id, "
        f"CAST(floor(c{n} * 1000000.0) AS BIGINT) AS mmr_score_u FROM sel{_MMR_K}"
        for n in range(1, _MMR_K + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\n{steps}\nORDER BY probe_id, position"
    )


@query("x146_mmr_diverse_topk", _x146_sql())
def x146(spark, sf_dir):
    """MMR diverse selection: 16-candidate pools per probe (brute-force
    cosine), then the greedy lam*relevance - mu*redundancy walk inside a
    cogrouped applyInPandas — one shuffle on probe_id, per-probe O(k*N)
    state, so millions of probes parallelize while the sequential part
    stays tiny. All similarities pre-rounded to 6dp so the score
    arithmetic (two multiplies, one subtract) is engine-exact."""
    from nimhdfstore_spark.functions.vector import cosine
    from nimhdfstore_spark.operators.similarity import brute_force_topk, mmr_select

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_MMR_PROBES)))
    pool = brute_force_topk(emb, probes, k=_MMR_POOL).select(
        "probe_id", "neighbor_id", F.col("cosine").alias("qsim")
    )
    ev = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    poolv = pool.join(ev, "neighbor_id").select(
        "probe_id", F.col("neighbor_id").alias("id"), "embedding"
    )
    a, b = poolv.alias("a"), poolv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.probe_id") == F.col("b.probe_id"))
        & (F.col("a.id") != F.col("b.id")),
    ).select(
        F.col("a.probe_id").alias("probe_id"),
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("sim"),
    )
    out = mmr_select(pool, pairs, _MMR_K)
    # floor(score * 1e6) as int64, NOT round(score, 6): the raw scores are
    # identical IEEE doubles on both engines, but Spark's ROUND goes through
    # the double's shortest decimal string while DuckDB rounds the exact
    # binary value — products landing a hair under a .5 boundary round
    # differently. Truncation of the identical product is engine-exact.
    return out.select(
        "probe_id",
        "position",
        "vec_id",
        F.floor(F.col("mmr_score") * 1000000.0).cast("long").alias("mmr_score_u"),
    ).orderBy("probe_id", "position")


# --------------------------------------------------------------------------
# x158 — hard-negative mining for contrastive training: per probe, the
# most-similar corpus vectors whose label DIFFERS (the near-miss negatives
# a contrastive loss learns most from). Brute-force scoring is the
# oracle-able baseline exactly as in x40; the 100 TB path routes the same
# label-filtered ranking through the x41 IVF buckets (probe the nprobe
# nearest lists, drop same-label candidates before ranking).
# --------------------------------------------------------------------------

_X158_K = 3
_X158_PROBES = (0, 1, 2, 3, 4, 5, 6, 7)

_X158_SQL = f"""
WITH sims AS (
  SELECT p.vec_id AS probe_id, CAST(p.label AS BIGINT) AS probe_label,
         c.vec_id AS negative_id, CAST(c.label AS BIGINT) AS negative_label,
         ROUND({_SQL_DOT.format(a='p', b='c')} /
           (sqrt({_SQL_DOT.format(a='p', b='p')}) *
            sqrt({_SQL_DOT.format(a='c', b='c')})), 6) AS cosine
  FROM embeddings p JOIN embeddings c ON p.label != c.label
  WHERE p.vec_id IN {_X158_PROBES}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY probe_id ORDER BY cosine DESC, negative_id) AS INT) AS rank
  FROM sims
)
SELECT probe_id, probe_label, negative_id, negative_label, cosine, rank
FROM ranked WHERE rank <= {_X158_K} ORDER BY probe_id, rank
"""


@query("x158_hard_negative_mining", _X158_SQL)
def x158(spark, sf_dir):
    """Top-3 hard negatives per probe: broadcast the (tiny) probe side,
    scan the corpus once, keep only cross-label pairs, rank per probe.
    Norms are computed once per side, never per pair."""
    from nimhdfstore_spark.functions.vector import dot, l2_norm
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    p = emb.where(F.col("vec_id").isin(list(_X158_PROBES))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").cast("long").alias("probe_label"),
        F.col("embedding").alias("pv"),
        l2_norm("embedding").alias("pn"),
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").cast("long").alias("negative_label"),
        F.col("embedding").alias("cv"),
        l2_norm("embedding").alias("cn"),
    )
    sim = (
        F.broadcast(p)
        .crossJoin(c)
        .where(F.col("probe_label") != F.col("negative_label"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("pv"), F.col("cv")) / (F.col("pn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _X158_K)
        .select(
            "probe_id", "probe_label", "negative_id", "negative_label",
            "cosine", "rank",
        )
        .orderBy("probe_id", "rank")
    )


# --------------------------------------------------------------------------
# x174 — Johnson-Lindenstrauss random projection (64 → 16 dims) with
# deterministic Rademacher signs: the dimensionality-reduction step a
# scale ANN pipeline runs before indexing (4× fewer bytes per vector, ~2×
# distance error bounded by JL). Signs come from an integer hash of
# (in_dim, out_dim) — engine-independent — and every fold runs in a fixed
# sequential order, so projected vectors and both distance columns
# hash-match the oracle exactly.
# --------------------------------------------------------------------------

_X174_N = 40     # corpus prefix: 780 pairs at any sf
_X174_OUT = 16

def _x174_sign(i: str, j: str) -> str:
    # ((i*97 + j*61 + 7) * 40503 % 65536) >= 32768  ->  +1 else -1
    return f"(CASE WHEN (({i} * 97 + {j} * 61 + 7) * 40503 % 65536) >= 32768 THEN 1 ELSE -1 END)"


def _x174_sql() -> str:
    # projected component j of a row alias e: fold over the 64 input dims
    proj = (
        "list_transform(range({out}), j -> "
        "list_reduce(list_transform(range(64), i -> "
        f"{_x174_sign('i', 'j')} * CAST({{a}}.embedding[i + 1] AS DOUBLE)), "
        "(x, y) -> x + y))"
    ).format(out=_X174_OUT, a="{a}")
    d2 = (
        "list_reduce(list_transform(range({n}), i -> "
        "({x}[i + 1] - {y}[i + 1]) * ({x}[i + 1] - {y}[i + 1])), "
        "(x, y) -> x + y)"
    )
    full = d2.format(n=64, x="ca", y="cb")
    prj = d2.format(n=_X174_OUT, x="pa", y="pb")
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb,
         {proj.format(a="embeddings")} AS p
  FROM embeddings WHERE vec_id < {_X174_N}
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.emb AS ca, b.emb AS cb, a.p AS pa, b.p AS pb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND({full}, 4) AS d2_full,
       ROUND({prj} / {_X174_OUT} * 4, 4) AS d2_proj_scaled
FROM pairs ORDER BY id_a, id_b
"""


@query("x174_jl_projection", _x174_sql())
def x174(spark, sf_dir):
    """Pairwise squared L2 in full space vs the JL-projected space
    (scaled by out_dims/in_ratio so magnitudes are comparable). The
    projection is a per-row transform (no shuffle); the pair join here is
    the VERIFICATION harness over a 40-vector prefix, not the production
    path — at scale the projected vectors feed the x41 IVF index."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < _X174_N)
    sign = (
        "(case when ((i * 97 + j * 61 + 7) * 40503 % 65536) >= 32768 "
        "then 1 else -1 end)"
    )
    e = emb.select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(v as double))").alias("emb"),
        F.expr(
            f"transform(sequence(0, {_X174_OUT - 1}), j -> "
            f"aggregate(sequence(0, 63), cast(0.0 as double), "
            f"(acc, i) -> acc + {sign} * cast(embedding[i] as double)))"
        ).alias("p"),
    )
    a, b = e.alias("a"), e.alias("b")
    d2 = (
        lambda n, x, y: F.expr(
            f"aggregate(sequence(0, {n - 1}), cast(0.0 as double), "
            f"(acc, i) -> acc + ({x}[i] - {y}[i]) * ({x}[i] - {y}[i]))"
        )
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(d2(64, "a.emb", "b.emb"), 4).alias("d2_full"),
            F.round(
                d2(_X174_OUT, "a.p", "b.p") / _X174_OUT * 4, 4
            ).alias("d2_proj_scaled"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# x177 — exact k-nearest-neighbor GRAPH: top-k cosine neighbors of EVERY
# vector (the pre-step of graph dedup / mutual-kNN pruning), via the
# broadcast + blocked int64 matmul in operators/similarity.knn_graph.
# Oracle: DuckDB recomputes the identical fixed-point cosine (exact int
# sums -> bit-identical doubles) and ranks by the unrounded value with the
# same id tie-break.
# --------------------------------------------------------------------------

_KNN_K = 5

_X177_SQL = f"""
WITH ev AS (
  SELECT vec_id, d,
         CAST(round(CAST(embedding[d+1] AS DOUBLE) * 1048576) AS BIGINT) AS iv
  FROM embeddings, range(64) t(d)
),
qv AS MATERIALIZED (
  SELECT vec_id, list(CAST(iv AS DOUBLE) ORDER BY d) AS q,
         CAST(sum(iv * iv) AS DOUBLE) AS n2
  FROM ev GROUP BY vec_id
),
sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)) AS cosine_raw
  FROM qv a JOIN qv b ON a.vec_id != b.vec_id
  WHERE a.n2 > 0 AND b.n2 > 0
),
ranked AS (
  SELECT vec_id, neighbor_id, cosine_raw,
         CAST(row_number() OVER (
           PARTITION BY vec_id ORDER BY cosine_raw DESC, neighbor_id
         ) AS INT) AS rank
  FROM sims
)
SELECT vec_id, neighbor_id, ROUND(cosine_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= {_KNN_K} ORDER BY vec_id, rank
"""


@query("x177_knn_graph", _X177_SQL)
def x177(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return S.knn_graph(emb, "vec_id", "embedding", k=_KNN_K).orderBy(
        "vec_id", "rank"
    )


# --------------------------------------------------------------------------
# x178 — mutual-kNN clustering: keep an edge only when BOTH endpoints rank
# each other in their top-k (the standard false-neighbor filter over a kNN
# graph), then label connected components. The semantic-dedup shape that
# needs no distance threshold: mutuality itself is the cutoff. Composes
# x177's exact graph with the dedup components operator; the oracle replays
# the identical fixed-point ranking, mutual join, and a recursive
# min-reachable-id CTE.
# --------------------------------------------------------------------------

_X178_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT vec_id, d,
         CAST(round(CAST(embedding[d+1] AS DOUBLE) * 1048576) AS BIGINT) AS iv
  FROM embeddings, range(64) t(d)
),
qv AS MATERIALIZED (
  SELECT vec_id, list(CAST(iv AS DOUBLE) ORDER BY d) AS q,
         CAST(sum(iv * iv) AS DOUBLE) AS n2
  FROM ev GROUP BY vec_id
),
sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)) AS cosine_raw
  FROM qv a JOIN qv b ON a.vec_id != b.vec_id
  WHERE a.n2 > 0 AND b.n2 > 0
),
knn AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine_raw DESC, neighbor_id) AS rank
    FROM sims
  ) WHERE rank <= {_KNN_K}
),
mu AS (
  SELECT a.vec_id AS id_a, a.neighbor_id AS id_b
  FROM knn a JOIN knn b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
  WHERE a.vec_id < a.neighbor_id
),
ed AS (SELECT id_a AS src, id_b AS dst FROM mu
       UNION ALL SELECT id_b, id_a FROM mu),
nn AS (SELECT vec_id AS nid FROM embeddings),
reach(nid, r) AS (
  SELECT nid, nid FROM nn
  UNION
  SELECT ed.src, reach.r FROM ed JOIN reach ON ed.dst = reach.nid
)
SELECT nid AS vec_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY nid ORDER BY vec_id
"""


@query("x178_mutual_knn_clusters", _X178_SQL)
def x178(spark, sf_dir):
    from nimhdfstore_spark.operators import dedup as D

    emb = load(spark, sf_dir, "embeddings")
    # project to the two id columns the mutual join needs, then cut the
    # lineage: the self-join's two sides hash on OPPOSITE key orders, so
    # without the cut the mapInPandas matmul kernel executes twice (no
    # exchange reuse across different keys). Checkpointed blocks hold the
    # skinny (vec_id, neighbor_id) edge list — k·n rows — never vectors.
    g = (
        S.knn_graph(emb, "vec_id", "embedding", k=_KNN_K)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    a, b = g.alias("a"), g.alias("b")
    mutual = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.neighbor_id"))
            & (F.col("a.neighbor_id") == F.col("b.vec_id")),
        )
        .where(F.col("a.vec_id") < F.col("a.neighbor_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("a.neighbor_id").alias("id_b"),
        )
    )
    comp = D.connected_components(mutual, emb, id_col="vec_id")
    return comp.select(
        F.col("id").alias("vec_id"), F.col("comp").alias("cluster")
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# x189 — PERSISTED IVF index probed from disk: the index (routing
# centroids + inverted lists) is built once and stored as store TABLES —
# assignments ordered by (cluster_id, id), so each cluster's rows land in
# contiguous, zone-map-prunable files — then a FRESH read-only store
# handle probes it: route each probe to nprobe clusters via the broadcast
# centroid table, scan ONLY those clusters' files (pruning asserted
# in-query through the cluster_id zone map), exact-cosine verify, top-k.
# This is x140's persisted-index shape for vector search: per-batch probe
# cost tracks batch size + cluster width, never corpus size, and index
# build cost amortizes across every future batch. Same math as x41, so
# the same oracle pins the values.
# --------------------------------------------------------------------------


@query("x189_ann_ivf_persisted", _ivf_sql())
def x189(spark, sf_dir):
    import os as _os

    from nimhdfstore_spark.queries.core import scratch_store
    from nimhdfstore_spark.store import Store

    emb = load(spark, sf_dir, "embeddings")
    store = scratch_store(spark, f"x189-{_os.path.basename(sf_dir)}")

    # build phase: persist routing table + inverted lists
    cents = S.deterministic_centroids(emb, _IVF_K, "vec_id")
    cent = cents.select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("centv")
    )
    assigned = S.assign_clusters(emb, cents, "vec_id", "embedding")
    from nimhdfstore_spark.tables import table_nrows

    # ~12 files at any sf: zone-map selectivity check stays meaningful
    # without drowning larger scales in tiny-file write overhead
    store.rows_per_file = max(48, table_nrows(sf_dir, "embeddings") // 12)
    # pin the single-task window rowid: the assignment frame is SKINNY
    # (one row per vector) but its plan is a crossJoin + window, whose
    # product-of-sides sizeInBytes estimate pushes with_rowid's auto
    # strategy onto the prefix-sum path — which re-executes the join per
    # pass (the q45 failure mode, 37 s in-bench at sf0.1; window: ~2 s)
    from nimhdfstore_spark.rowid import with_rowid

    # one row per vector bounds both tables (footer count, no scan job)
    n_vec = table_nrows(sf_dir, "embeddings")
    store.put(
        "ivf/centroids",
        with_rowid(cent, ["cluster_id"], strategy="window"),
        overwrite=True,
        local_max_rows=n_vec,
    )
    store.put(
        "ivf/assignments",
        with_rowid(assigned, ["cluster_id", "id"], strategy="window"),
        overwrite=True,
        local_max_rows=n_vec,
    )

    # probe phase: fresh read-only handles — everything comes off disk
    ro = Store(spark, store.root, mode="r")
    cent_t = ro.table("ivf/centroids")
    asg_t = ro.table("ivf/assignments")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    out = S.ivf_probe(
        asg_t.df().drop("_rowid"),
        cent_t.df().drop("_rowid"),
        probes, k=_K, nprobe=_IVF_NPROBE,
    )

    # the layout must actually prune: with the inverted lists ordered by
    # cluster_id, per-file cluster spans are narrow and disjoint-ish, so a
    # probe touching nprobe clusters skips files whose span misses them.
    # Assert the zone map is selective (identical spans everywhere would
    # mean the layout degenerated and nothing can ever prune).
    zm = asg_t.zone_map("cluster_id")
    if len(zm) > 2:
        spans = [(e["lo"], e["hi"]) for e in zm]
        if all(sp == spans[0] for sp in spans):
            raise AssertionError(
                f"assignments layout is not cluster-selective: {spans[:4]}"
            )
    return out.orderBy("probe_id", "rank")


# --------------------------------------------------------------------------
# x195 — ANN quality self-evaluation: recall@k of the fixed-k IVF path
# against the brute-force exact top-k, per probe. The eval harness every
# production ANN deployment carries (and the declared form of the recall
# pin in tests/test_extensions.py): both legs are the already-oracle-exact
# x40/x41 computations, composed, so the oracle is their SQL composed as
# CTEs — the hash pins the recall numbers themselves.
# --------------------------------------------------------------------------

_X195_SQL = f"""
WITH bf AS ({_X_ANN_SQL}),
iv AS ({_ivf_sql()}),
hits AS (
  SELECT iv.probe_id, count(*) AS n_hits
  FROM iv JOIN bf USING (probe_id, neighbor_id)
  GROUP BY iv.probe_id
)
SELECT p.probe_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(coalesce(h.n_hits, 0) / {_K}.0, 6) AS recall_at_k
FROM (SELECT DISTINCT probe_id FROM bf) p
LEFT JOIN hits h USING (probe_id)
ORDER BY p.probe_id
"""


@query("x195_ann_recall_eval", _X195_SQL)
def x195(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin(list(_PROBES)))
    bf = S.brute_force_topk(emb, probes, k=_K).select("probe_id", "neighbor_id")
    iv = S.ivf_topk(
        emb, probes, k=_K, num_centroids=_IVF_K, nprobe=_IVF_NPROBE
    ).select("probe_id", "neighbor_id")
    hits = (
        iv.join(bf, ["probe_id", "neighbor_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        bf.select("probe_id")
        .distinct()
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / float(_K), 6
            ).alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )
