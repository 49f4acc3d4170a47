"""Deduplication declared queries (north-star QX1/QX2 + extensions).

ALL five are oracle-checked: since round 2 the MinHash, SimHash and
embedding-LSH paths use engine-independent arithmetic hashing (polynomial
rolling hashes + affine families + Rademacher hyperplanes, operators/
dedup.py), so the DuckDB oracle recomputes the identical signatures — the
SQL strings below are generated from the same Python constants the Spark
operators use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.queries.text import _SQL_TOKENS
from nimhdfstore_spark.tables import load


def _poly_fold_sql(items: list[str], mod: int) -> str:
    """Nested ((acc*31 + v) % mod) fold — textual twin of D._poly_combine."""
    acc = "0"
    for e in items:
        acc = f"(({acc}) * {D.HASH_MUL} + ({e})) % {mod}"
    return acc


#: per-gram polynomial hash (twin of D.poly_hash applied to a list of grams)
_SQL_GRAM_HASHES = (
    "list_transform(grams, g -> list_reduce("
    "list_transform(list_filter(string_split(g, ''), c -> c != ''), "
    "c -> CAST(ascii(c) AS BIGINT)), "
    f"(acc, x) -> (acc * {D.HASH_MUL} + x) % {D.HASH_MOD}))"
)

# --------------------------------------------------------------------------
# QX1 — exact dedup (hash groupBy): representative + group size per p_name
# --------------------------------------------------------------------------

_X_EXACT_SQL = """
SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS p_partkey,
       CAST(count(*) AS BIGINT) AS group_size
FROM part GROUP BY p_name ORDER BY p_name
"""


@query("x30_dedup_exact", _X_EXACT_SQL)
def x_exact(spark, sf_dir):
    return (
        D.exact_dedup(load(spark, sf_dir, "part"), ["p_name"], "p_partkey")
        .select("p_name", "p_partkey", "group_size")
        .orderBy("p_name")
    )


# --------------------------------------------------------------------------
# QX2 (exact form) — char-3-gram Jaccard near-dup pairs over documents.
# The SQL twin IS the LSH verifier: hash-free set arithmetic.
# --------------------------------------------------------------------------

_JACCARD_TAU = 0.65
_DOC_LIMIT = 200  # bound the pair space deterministically at every sf

_X_NGRAM_SQL = f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
e AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM g),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_grams AS na, b.n_grams AS nb,
         CAST(count(*) AS BIGINT) AS inter
  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, ROUND(inter / (na + nb - inter), 6) AS jaccard
FROM p WHERE ROUND(inter / (na + nb - inter), 6) >= {_JACCARD_TAU}
ORDER BY id_a, id_b
"""


@query("x31_dedup_ngram_jaccard", _X_NGRAM_SQL)
def x_ngram(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=_JACCARD_TAU
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# MinHash + LSH banding — oracle-checked: DuckDB recomputes the identical
# polynomial/affine signatures and the identical band-bucket collisions.
# --------------------------------------------------------------------------

_MH_NUM, _MH_BANDS = 64, 16
_MH_R = _MH_NUM // _MH_BANDS


def minhash_pair_ctes(where: str, prefix: str = "") -> str:
    """CTE chain (no leading WITH) producing ``{prefix}p(id_a, id_b,
    est_jaccard)`` — MinHash-LSH candidate pairs at ``_JACCARD_TAU`` over
    ``documents WHERE {where}``. Parameterized so the end-to-end pipeline
    oracle (x90) embeds the same math over its sampled subset under
    collision-free CTE names."""
    q = prefix
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(pgs, p -> (p * {a} + {b}) % {D.HASH_MOD}))"
        for a, b in D.minhash_coeffs(_MH_NUM)
    )
    bucket = lambda side: _poly_fold_sql(  # noqa: E731
        [f"{side}.sig[{_MH_R}*k + {j + 1}]" for j in range(_MH_R)], D.HASH_MOD
    )
    est = (
        f"ROUND(len(list_filter(range({_MH_NUM}), i -> sa[i+1] = sb[i+1]))"
        f" / {_MH_NUM}.0, 6)"
    )
    return f"""{q}g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE {where}
),
{q}h AS (
  SELECT doc_id, {_SQL_GRAM_HASHES} AS pgs FROM {q}g WHERE len(grams) > 0
),
{q}s AS MATERIALIZED (SELECT doc_id, list_value(
    {sig_exprs}) AS sig FROM {q}h),
{q}p AS (
  SELECT id_a, id_b, est_jaccard FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb,
           {est} AS est_jaccard
    FROM {q}s a JOIN {q}s b ON a.doc_id < b.doc_id
    WHERE len(list_filter(range({_MH_BANDS}),
              k -> ({bucket('a')}) = ({bucket('b')}))) > 0
  ) WHERE est_jaccard >= {_JACCARD_TAU}
)"""


def _minhash_sql() -> str:
    return f"""
WITH {minhash_pair_ctes(f'doc_id < {_DOC_LIMIT}')}
SELECT id_a, id_b, est_jaccard FROM p ORDER BY id_a, id_b
"""


@query("x32_dedup_minhash_lsh", _minhash_sql())
def x_minhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=_MH_NUM, bands=_MH_BANDS,
        threshold=_JACCARD_TAU,
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# SimHash near-dup — oracle-checked: banded search is EXACT for
# max_hamming < bands, so the oracle is a plain all-pairs hamming join over
# identical 32-bit polynomial fingerprints.
# --------------------------------------------------------------------------

_SH_BITS, _SH_HAM = 32, 3


def _simhash_sql() -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_SH_BITS)
    )
    sh = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SH_BITS)
    )
    return f"""
WITH tk AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS tok
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
th AS (
  SELECT doc_id, list_reduce(
    list_transform(list_filter(string_split(tok, ''), c -> c != ''),
                   c -> CAST(ascii(c) AS BIGINT)),
    (acc, x) -> (acc * {D.HASH_MUL} + x) % {D.MOD32}) AS h
  FROM tk
),
v AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
f AS (SELECT doc_id AS id, CAST({sh} AS BIGINT) AS sh FROM v),
ff AS (
  SELECT d.doc_id AS id, COALESCE(f.sh, 0) AS sh
  FROM documents d LEFT JOIN f ON d.doc_id = f.id
  WHERE d.doc_id < {_DOC_LIMIT}
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM ff a JOIN ff b ON a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= {_SH_HAM}
ORDER BY id_a, id_b
"""


@query("x33_dedup_simhash", _simhash_sql())
def x_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    return (
        D.simhash_pairs(docs, "doc_id", "text", max_hamming=_SH_HAM)
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# embedding near-dup — hyperplane-LSH bucketed primary (the 100 TB path:
# the only pair-producing step is an equi-join on (band, bucket)), exact
# cosine verification in-bucket. Oracle-checked: DuckDB rebuilds the same
# Rademacher bit codes and the same band-collision predicate.
# --------------------------------------------------------------------------

_COS_TAU = 0.4
_EMB_PLANES, _EMB_BANDS, _EMB_DIMS = 64, 16, 64
_EMB_W = _EMB_PLANES // _EMB_BANDS

def _emb_lsh_sql() -> str:
    # fixed-point projections (round(v*2^20) — integer sums commute, see
    # operators/dedup.FXP): each plane is a plain SUM aggregate over the
    # unnested (vec_id, d, iv) rows with a literal sign-array lookup —
    # the same relational shape the Spark side runs, and ~10× faster in
    # DuckDB than per-row list_reduce folds.
    def plane_bit(h: int) -> str:
        signs = ",".join(
            "1" if D.rademacher_sign(h, d) > 0 else "-1"
            for d in range(_EMB_DIMS)
        )
        return (
            f"CASE WHEN SUM(iv * ([{signs}])[d+1]) >= 0 THEN 1 ELSE 0 END"
        )

    bits = ",\n    ".join(plane_bit(h) for h in range(_EMB_PLANES))
    bucket = " + ".join(
        f"bits[{_EMB_W}*k + {j + 1}] * {2 ** (_EMB_W - 1 - j)}"
        for j in range(_EMB_W)
    )
    # The oracle mirrors the Spark plan shape — (band, bucket) rows joined
    # equi — instead of an all-pairs join with a per-pair band predicate:
    # same candidate set, but DuckDB evaluates O(n·bands) bucket rows
    # rather than O(n²) list_filter folds (measured ~20× faster at sf0.01,
    # which keeps the driver's correctness pass cheap).
    return f"""
WITH ev AS (
  SELECT vec_id, d,
         CAST(round(CAST(embedding[d+1] AS DOUBLE) * {D.FXP}) AS BIGINT) AS iv
  FROM embeddings, range({_EMB_DIMS}) t(d)
),
c AS MATERIALIZED (
  SELECT vec_id, list_value(
    {bits}) AS bits
  FROM ev GROUP BY vec_id
),
cb AS (
  SELECT vec_id, k, {bucket} AS bucket
  FROM c, (SELECT unnest(range({_EMB_BANDS})) AS k)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cb a JOIN cb b ON a.k = b.k AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
),
qv AS MATERIALIZED (
  -- fixed-point vector + exact squared norm: int sums <= 2^46 are exactly
  -- representable in DOUBLE, so list_dot_product's float fold is exact and
  -- order-insensitive — bit-identical to the Spark side's int64 einsum
  SELECT vec_id,
         list(CAST(iv AS DOUBLE) ORDER BY d) AS q,
         CAST(sum(iv * iv) AS DOUBLE) AS n2
  FROM ev GROUP BY vec_id
),
scored AS (
  SELECT id_a, id_b,
    CASE WHEN x.n2 > 0 AND y.n2 > 0 THEN
      ROUND(list_dot_product(x.q, y.q) / (sqrt(x.n2) * sqrt(y.n2)), 6)
    END AS cosine
  FROM cand
  JOIN qv x ON x.vec_id = cand.id_a
  JOIN qv y ON y.vec_id = cand.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {_COS_TAU}
ORDER BY id_a, id_b
"""


@query("x34_dedup_embedding_cosine", _emb_lsh_sql())
def x_embedding(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    # hot_bucket_split: 4-bit bands on a clustered corpus concentrate rows
    # in few buckets; above the bound the pair space fans out over id-hash
    # sub-bucket tasks (sf1 sweep: 234 → 40 s wall, identical pair set).
    # The detection pass costs one persisted bucketize + a key-count agg.
    return D.embedding_lsh_pairs(
        emb, "vec_id", "embedding",
        threshold=_COS_TAU,
        num_planes=_EMB_PLANES, bands=_EMB_BANDS, dims=_EMB_DIMS,
        hot_bucket_split=4096,
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# x183 — multi-probe LSH (Lv et al., VLDB 2007): few WIDE bands (4 × 16
# bits), recall recovered by also probing every band bucket at Hamming
# distance 1 — the published cost/recall axis complementary to x34's
# many-narrow-bands scheme. The oracle rebuilds the identical probe
# expansion with xor(bucket, 1<<j).
# --------------------------------------------------------------------------

# tau sits just under the corpus's observed max candidate cosine (0.479 at
# sf0.001) so the row is NON-VACUOUS at every sf (6/10/108 pairs at
# sf0.001/0.01/0.1) — the round-7 verdict found the old 0.95 returned zero
# rows everywhere, making the driver row verify `0 == 0`.
_MP_TAU, _MP_BANDS = 0.45, 4
_MP_W = _EMB_PLANES // _MP_BANDS


def _emb_multiprobe_sql() -> str:
    def plane_bit(h: int) -> str:
        signs = ",".join(
            "1" if D.rademacher_sign(h, d) > 0 else "-1"
            for d in range(_EMB_DIMS)
        )
        return f"CASE WHEN SUM(iv * ([{signs}])[d+1]) >= 0 THEN 1 ELSE 0 END"

    bits = ",\n    ".join(plane_bit(h) for h in range(_EMB_PLANES))
    bucket = " + ".join(
        f"bits[{_MP_W}*k + {j + 1}] * {2 ** (_MP_W - 1 - j)}"
        for j in range(_MP_W)
    )
    return f"""
WITH ev AS (
  SELECT vec_id, d,
         CAST(round(CAST(embedding[d+1] AS DOUBLE) * {D.FXP}) AS BIGINT) AS iv
  FROM embeddings, range({_EMB_DIMS}) t(d)
),
c AS MATERIALIZED (
  SELECT vec_id, list_value(
    {bits}) AS bits
  FROM ev GROUP BY vec_id
),
cb AS (
  SELECT vec_id, k, CAST({bucket} AS BIGINT) AS bucket
  FROM c, (SELECT unnest(range({_MP_BANDS})) AS k)
),
probes AS (
  SELECT vec_id, k,
         unnest(list_prepend(bucket,
           list_transform(range({_MP_W}), j -> xor(bucket, 1::BIGINT << j)))) AS pbucket
  FROM cb
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probes a JOIN cb b ON a.k = b.k AND a.pbucket = b.bucket
                         AND a.vec_id < b.vec_id
),
qv AS MATERIALIZED (
  SELECT vec_id,
         list(CAST(iv AS DOUBLE) ORDER BY d) AS q,
         CAST(sum(iv * iv) AS DOUBLE) AS n2
  FROM ev GROUP BY vec_id
),
scored AS (
  SELECT id_a, id_b,
    CASE WHEN x.n2 > 0 AND y.n2 > 0 THEN
      ROUND(list_dot_product(x.q, y.q) / (sqrt(x.n2) * sqrt(y.n2)), 6)
    END AS cosine
  FROM cand
  JOIN qv x ON x.vec_id = cand.id_a
  JOIN qv y ON y.vec_id = cand.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {_MP_TAU}
ORDER BY id_a, id_b
"""


@query("x183_dedup_multiprobe_lsh", _emb_multiprobe_sql())
def x_multiprobe(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return D.embedding_multiprobe_pairs(
        emb, "vec_id", "embedding",
        threshold=_MP_TAU,
        num_planes=_EMB_PLANES, bands=_MP_BANDS, dims=_EMB_DIMS,
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# near-dup clusters — connected components over the exact-Jaccard pairs:
# the canonical-representative step of a dedup pipeline (pairs → clusters →
# keep min doc_id per cluster). Oracle: DuckDB recursive CTE computing the
# same min-reachable-id labeling over the same pair list.
# --------------------------------------------------------------------------

# pair CTEs duplicated from _X_NGRAM_SQL under collision-free names (cg/ce/cp
# — the recursive WITH makes every CTE name visible in nested scopes, so the
# textual-reuse form shadowed ambiguously)
_X_COMPONENTS_SQL = f"""
WITH RECURSIVE cg AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
ce AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM cg),
cp AS (
  SELECT id_a, id_b FROM (
    SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_grams AS na,
           y.n_grams AS nb, CAST(count(*) AS BIGINT) AS inter
    FROM ce x JOIN ce y ON x.gram = y.gram AND x.doc_id < y.doc_id
    GROUP BY 1, 2, 3, 4
  ) WHERE ROUND(inter / (na + nb - inter), 6) >= {_JACCARD_TAU}
),
ced AS (
  SELECT id_a AS src, id_b AS dst FROM cp
  UNION ALL SELECT id_b, id_a FROM cp
),
cn AS (SELECT doc_id AS nid FROM documents WHERE doc_id < {_DOC_LIMIT}),
reach(nid, r) AS (
  SELECT nid, nid FROM cn
  UNION
  SELECT ced.src, reach.r FROM ced JOIN reach ON ced.dst = reach.nid
)
SELECT nid AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY nid ORDER BY doc_id
"""


@query("x35_dedup_components", _X_COMPONENTS_SQL)
def x_components(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=_JACCARD_TAU)
    return (
        D.connected_components(pairs, docs, id_col="doc_id")
        .select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x36 — chunk-level boilerplate dedup (RefinedWeb-style repeated-passage
# removal): consecutive 10-token chunks shared by >= 2 documents are
# boilerplate; per-document chunk/boilerplate counts. The oracle assembles
# the identical chunks by list-slicing the token array (DuckDB's 1-based
# inclusive slice truncates the tail chunk exactly like concat_ws over
# NULL window leads).
# --------------------------------------------------------------------------

_CHUNK_T = 10

_X36_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ch AS (
  SELECT doc_id,
         unnest(list_transform(
           range(CAST(ceil(len(toks) / {_CHUNK_T}.0) AS BIGINT)),
           i -> array_to_string(toks[i*{_CHUNK_T}+1 : i*{_CHUNK_T}+{_CHUNK_T}], ' ')
         )) AS chunk
  FROM t
),
boiler AS (
  SELECT chunk FROM ch GROUP BY chunk
  HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(b.chunk) AS BIGINT) AS n_boiler
FROM ch c LEFT JOIN boiler b ON c.chunk = b.chunk
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


@query("x36_dedup_chunk_boilerplate", _X36_SQL)
def x36(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        D.chunk_boilerplate(docs, "doc_id", "text", chunk_tokens=_CHUNK_T)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x140 — incremental batch-vs-corpus dedup: sign the incoming batch only,
# probe the persisted corpus signature index. The ingest-time shape of
# MinHash-LSH (x32 is the backfill shape).
# --------------------------------------------------------------------------

def _incremental_sql() -> str:
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(pgs, p -> (p * {a} + {b}) % {D.HASH_MOD}))"
        for a, b in D.minhash_coeffs(_MH_NUM)
    )
    bucket = lambda side: _poly_fold_sql(  # noqa: E731
        [f"{side}.sig[{_MH_R}*k + {j + 1}]" for j in range(_MH_R)], D.HASH_MOD
    )
    est = (
        f"ROUND(len(list_filter(range({_MH_NUM}), i -> sa[i+1] = sb[i+1]))"
        f" / {_MH_NUM}.0, 6)"
    )
    return f"""
WITH g AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3 THEN
      list_distinct(list_transform(range(length(lower(text)) - 2),
                                   i -> substr(lower(text), i + 1, 3)))
    ELSE [] END AS grams
  FROM documents WHERE doc_id < {_DOC_LIMIT}
),
h AS (
  SELECT doc_id, {_SQL_GRAM_HASHES} AS pgs FROM g WHERE len(grams) > 0
),
s AS MATERIALIZED (SELECT doc_id, list_value(
    {sig_exprs}) AS sig FROM h),
scored AS (
  SELECT id, match_id, est_jaccard FROM (
    SELECT a.doc_id AS id, b.doc_id AS match_id, a.sig AS sa, b.sig AS sb,
           {est} AS est_jaccard
    FROM s a JOIN s b
      ON a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
    WHERE len(list_filter(range({_MH_BANDS}),
              k -> ({bucket('a')}) = ({bucket('b')}))) > 0
  ) WHERE est_jaccard >= {_JACCARD_TAU}
),
per_doc AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_candidates,
         (list(match_id ORDER BY est_jaccard DESC, match_id ASC))[1]
             AS best_match_id,
         MAX(est_jaccard) AS best_est
  FROM scored GROUP BY id
)
SELECT d.doc_id AS id,
       CAST(CASE WHEN p.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
       COALESCE(p.n_dup_candidates, 0) AS n_dup_candidates,
       CAST(COALESCE(p.best_match_id, -1) AS BIGINT) AS best_match_id,
       COALESCE(p.best_est, 0.0) AS best_est
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
WHERE d.doc_id < {_DOC_LIMIT} AND d.doc_id % 10 = 0
ORDER BY id
"""


@query("x140_dedup_incremental", _incremental_sql())
def x140(spark, sf_dir):
    """Incremental ingest dedup: docs with ``doc_id % 10 == 0`` play the
    incoming batch; the rest are the already-indexed corpus. Only the
    batch is shingled/signed; the corpus side is the persisted
    ``minhash_buckets`` index (here recomputed since the test corpus is
    read-only — in production it is a stored table maintained by append).
    The only pair-producing step is the equi-join on (band, bucket), so
    per-batch cost never scales with corpus size."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < _DOC_LIMIT)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index = D.minhash_buckets(
        corpus, "doc_id", "text", num_hashes=_MH_NUM, bands=_MH_BANDS
    )
    return D.minhash_lsh_incremental(
        batch, index, "doc_id", "text",
        num_hashes=_MH_NUM, bands=_MH_BANDS, threshold=_JACCARD_TAU,
    ).orderBy("id")


# --------------------------------------------------------------------------
# x153 — end-to-end entity resolution: corrupted duplicate records →
# blocked Levenshtein pair scoring (never all-pairs; x123's discipline) →
# connected components → canonical entity per cluster. The composite the
# record-linkage literature calls blocking/matching/clustering, as one
# oracle-checked query.
# --------------------------------------------------------------------------

_ER_MOD = 11          # every 11th part gains a dirty duplicate record
_ER_OFFSET = 10_000_000


def _x153_sql() -> str:
    last = "list_extract(string_split(nm, ' '), len(string_split(nm, ' ')))"
    return f"""
WITH RECURSIVE base AS (
  SELECT p_partkey, p_name || ' ' || p_brand || ' Z' || CAST(p_partkey % 500 AS VARCHAR) AS nm
  FROM part
),
recs AS (
  SELECT p_partkey AS rid, nm FROM base
  UNION ALL
  SELECT p_partkey + {_ER_OFFSET},
         substring(nm, 1, 1) || substring(nm, 3)
  FROM base WHERE p_partkey % {_ER_MOD} = 0
),
blocked AS (SELECT rid, nm, {last} AS blk FROM recs),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b
  FROM blocked a JOIN blocked b
    ON a.blk = b.blk AND a.rid < b.rid
  WHERE levenshtein(a.nm, b.nm) <= 2
),
ed AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(nid, r) AS (
  SELECT rid, rid FROM recs
  UNION
  SELECT ed.src, reach.r FROM ed JOIN reach ON ed.dst = reach.nid
),
comp AS (
  SELECT nid AS rid, CAST(min(r) AS BIGINT) AS entity
  FROM reach GROUP BY nid
)
SELECT entity,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(CASE WHEN rid >= {_ER_OFFSET} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dirty
FROM comp GROUP BY entity HAVING COUNT(*) >= 2
ORDER BY entity
"""


@query("x153_entity_resolution", _x153_sql())
def x153(spark, sf_dir):
    """Blocking bounds the match space (equi-join on the uncorrupted last
    name token), Levenshtein scores only within blocks, min-label
    propagation merges matches transitively, and each cluster's canonical
    entity is its min record id — one composed pipeline whose per-stage
    plans are the ones that survive scale (no all-pairs edit distance, no
    global collect in the fixpoint)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    # a composite record string whose LAST token is a discriminative
    # blocking key (zip-code analog): p_name's own last words draw from a
    # ~8-word vocabulary, so blocking on them alone packs thousands of
    # records per block and the match stage degenerates to near-all-pairs
    # (measured: 6.5M surviving lev<=2 pairs at sf0.1, 48 s) — realistic
    # blocking ALWAYS combines a high-cardinality field
    base = part.select(
        "p_partkey",
        F.concat_ws(
            " ", "p_name", "p_brand",
            F.concat(F.lit("Z"), (F.col("p_partkey") % 500).cast("string")),
        ).alias("nm"),
    )
    dirty = base.where(F.col("p_partkey") % _ER_MOD == 0).select(
        (F.col("p_partkey") + _ER_OFFSET).alias("rid"),
        F.concat(
            F.substring("nm", 1, 1), F.expr("substring(nm, 3)")
        ).alias("nm"),
    )
    recs = base.select(
        F.col("p_partkey").alias("rid"), F.col("nm")
    ).unionByName(dirty)
    # Explicit hash-repartition on the blocking key BEFORE the self-join
    # (guide §2.5, unsplittable input): the source is one parquet row group,
    # so the scan is one task and the planner's broadcast join keeps the
    # whole in-block Levenshtein pass (~465k pair evaluations at sf0.1 —
    # measured 5.4 s single-task) on one core; AQE would coalesce a plain
    # shuffle back to one partition because the BYTES are tiny, but a
    # user repartition is exempt from coalescing. Both join sides share
    # the partitioning, so the join itself adds no further exchange. The
    # count comes from the session (scales with the cluster); at real
    # scale the blocked table is far above the broadcast threshold and a
    # key-partitioned shuffle is what the planner picks anyway.
    par = spark.sparkContext.defaultParallelism
    blocked = recs.withColumn(
        "blk", F.element_at(F.split("nm", " "), -1)
    ).repartition(par, "blk")
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.rid") < F.col("b.rid")))
        # necessary condition for lev<=2 — 10x cheaper than the DP, prunes
        # ~55% of candidate pairs before it (guide §1.2 per-task work)
        .where(
            F.abs(F.length(F.col("a.nm")) - F.length(F.col("b.nm"))) <= 2
        )
        .where(F.levenshtein(F.col("a.nm"), F.col("b.nm")) <= 2)
        .select(F.col("a.rid").alias("id_a"), F.col("b.rid").alias("id_b"))
    )
    comps = D.connected_components(pairs, recs.select("rid"), id_col="rid")
    return (
        comps.groupBy(F.col("comp").alias("entity"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.when(F.col("id") >= _ER_OFFSET, 1).otherwise(0))
            .cast("long")
            .alias("n_dirty"),
        )
        .where(F.col("n_records") >= 2)
        .orderBy("entity")
    )


# --------------------------------------------------------------------------
# x191 — cross-document duplicated SPANS (seed-and-merge exact-substring
# dedup, the distributed form of Lee et al. 2022's suffix-array pass):
# content-defined seed sampling (poly_hash(gram) % mod == 0 — winnowing/CDC
# family, phase-invariant by construction) -> one groupBy marks cross-doc
# repeats -> gaps-and-islands merges dup seeds closer than k into spans.
# The oracle recomputes the identical hash, sampling, mark and island
# arithmetic in SQL (the hash twin is _SQL_GRAM_HASHES' list_reduce fold).
# --------------------------------------------------------------------------

_X191_K, _X191_MOD = 24, 8

_X191_SQL = f"""
WITH g AS (
  SELECT doc_id, i AS pos, substr(text, i, {_X191_K}) AS gram
  FROM documents,
       LATERAL unnest(range(1, length(text) - {_X191_K} + 2)) t(i)
  WHERE length(text) >= {_X191_K}
),
s AS (
  SELECT doc_id, pos, gram FROM g
  WHERE list_reduce(
          list_transform(list_filter(string_split(gram, ''), c -> c != ''),
                         c -> CAST(ascii(c) AS BIGINT)),
          (acc, x) -> (acc * {D.HASH_MUL} + x) % {D.HASH_MOD}
        ) % {_X191_MOD} = 0
),
d AS (SELECT gram FROM s GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
m AS (
  SELECT s.doc_id, s.pos, (d.gram IS NOT NULL) AS is_dup
  FROM s LEFT JOIN d USING (gram)
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {_X191_K}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM m WHERE is_dup
  )
),
runs AS (
  SELECT doc_id, island, max(pos) - min(pos) + {_X191_K} AS chars
  FROM isl GROUP BY doc_id, island
),
spd AS (
  SELECT doc_id, count(*) AS n_spans, sum(chars) AS span_chars
  FROM runs GROUP BY doc_id
),
per_doc AS (
  SELECT doc_id, count(*) AS n_seeds,
         sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS dup_seeds
  FROM m GROUP BY doc_id
),
-- one row per length>=k document even when ZERO k-grams sample a seed
base AS (
  SELECT doc_id FROM documents WHERE length(text) >= {_X191_K}
)
SELECT b.doc_id, CAST(coalesce(p.n_seeds, 0) AS BIGINT) AS n_seeds,
       CAST(coalesce(p.dup_seeds, 0) AS BIGINT) AS dup_seeds,
       CAST(coalesce(s2.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(s2.span_chars, 0) AS BIGINT) AS span_chars
FROM base b LEFT JOIN per_doc p USING (doc_id) LEFT JOIN spd s2 USING (doc_id)
ORDER BY b.doc_id
"""


@query("x191_substring_span_dedup", _X191_SQL)
def x191(spark, sf_dir):
    # rolling=True: the Rabin-Karp Arrow kernel (O(1)/char) measures
    # FASTER than the JVM HOF path even at sf0.1 (2.4 vs 4.8 s) and the
    # seed sets are property-pinned identical — same oracle either way.
    return D.duplicate_spans(
        load(spark, sf_dir, "documents"),
        k=_X191_K,
        sample_mod=_X191_MOD,
        rolling=True,
    ).orderBy("doc_id")
