"""Deduplication operators for training-data pipelines (SURVEY §2.14 QX1/QX2
and the north-star extensions): exact, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Scale design:
- Everything is expressed as DataFrame ops (explode → hash-partitioned
  groupBy/join), so Catalyst/AQE handles shuffle planning and skew.
- The LSH family (MinHash bands, SimHash bands) turns the O(n²) pair space
  into an equi-join on (band, signature) buckets — the only join key that
  scales to 100 TB. Exact-Jaccard verification then runs only on bucket
  candidates.
- All hashing is xxhash64 (JVM built-in, seed-stable inside Spark). The
  exact n-gram Jaccard path is hash-free and therefore oracle-checkable in
  DuckDB; the LSH paths are engine-specific and are validated in tests
  against the exact path (recall on the declared threshold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nimhdfstore_spark.functions.vector import cosine
from nimhdfstore_spark.operators.text import tokens


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id representative per exact key group (hash groupBy —
    one shuffle on the content key, map-side combined)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("group_size"),
    )


# --------------------------------------------------------------------------
# character n-gram shingles + exact Jaccard (oracle-checkable)
# --------------------------------------------------------------------------

def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct lowercase character n-grams (shingles)."""
    t = F.lower(text if isinstance(text, Column) else F.col(text))
    # a string of length L has L-n+1 n-grams: start offsets 0..L-n
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0))),
        lambda i: t.substr(i + 1, F.lit(n)),
    )
    return F.when(F.length(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= τ).

    Plan: explode distinct shingles → self-equi-join on the shingle (the
    candidate generator) → count shared shingles per pair → Jaccard from
    |A∩B| / (|A| + |B| - |A∩B|). At 100 TB you'd LSH-prefilter first
    (``minhash_lsh_pairs``); this exact form doubles as its verifier and as
    the DuckDB oracle target.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        char_ngrams(text_col, n).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    exploded = base.select("id", "n_grams", F.explode("grams").alias("gram"))
    a, b = exploded.alias("a"), exploded.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        shared.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

def minhash_signature(grams: Column, num_hashes: int = 64) -> Column:
    """num_hashes min-hashes of a shingle set; hash_i(s) =
    xxhash64(i, s) — one JVM hash per (perm, shingle), no Python."""
    sigs = [
        F.array_min(F.transform(grams, lambda s, i=i: F.xxhash64(F.lit(i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding, filtered by the
    signature-estimated Jaccard.

    shingle → minhash(num_hashes) → band into ``bands`` groups of
    ``num_hashes/bands`` rows → bucket-join on (band, band_signature) →
    estimate Jaccard as the fraction of agreeing minhashes → filter ≥ τ.
    The bucket join is the only pair-producing step, so cost tracks true
    collision density, not n².
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    base = (
        df.select(F.col(id_col).alias("id"), char_ngrams(text_col, n).alias("grams"))
        .where(F.size("grams") > 0)
        .withColumn("sig", minhash_signature(F.col("grams"), num_hashes))
    )
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)]).alias("bucket"),
        )
        for b in range(bands)
    ])
    buckets = base.select(
        "id", "sig", F.explode(band_cols).alias("bb")
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    est = agree / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_table(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, sh): 64-bit SimHash over tokens — bit b of the fingerprint is
    the sign of Σ_tokens (±1 depending on bit b of xxhash64(token)).

    Shape: explode tokens → one JVM hash per token → single hash-partitioned
    groupBy with 64 map-side-combined SUM aggregates → recompose the long.
    One shuffle of (id, 64×long partials); no Python, no O(bits) passes.
    Token-less documents get fingerprint 0 via the left join.
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    hashed = tok.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("id").agg(*votes)
    sh = F.lit(0).cast("long")
    for b in range(bits):
        bit_val = F.lit(-(2 ** 63)).cast("long") if b == 63 else F.lit(2 ** b).cast("long")
        sh = sh + F.when(F.col(f"v{b}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
    with_sh = agg.select("id", sh.alias("sh"))
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(with_sh, "id", "left").select(
        "id", F.coalesce("sh", F.lit(0).cast("long")).alias("sh")
    )


def simhash_bands(sh: Column, bands: int = 4, bits: int = 64) -> Column:
    """Split a simhash into band values for hamming-LSH bucketing."""
    width = bits // bands
    mask = (1 << width) - 1
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(sh, b * width).bitwiseAND(F.lit(mask)).alias("bucket"),
        )
        for b in range(bands)
    ])


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found via band
    bucketing (a pair within distance d < bands must agree on ≥1 band)."""
    base = simhash_table(df, id_col, text_col).withColumn(
        "bb", F.explode(simhash_bands(F.col("sh"), bands))
    )
    flat = base.select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    probe_filter: Column | None = None,
) -> DataFrame:
    """Pairs with cosine(vec_a, vec_b) >= τ. Brute-force pair join with the
    dot product in codegen (zip_with/aggregate). ``probe_filter`` bounds the
    left side; at scale, LSH-bucket or IVF-cluster first (similarity.py) and
    reuse this as the verifier within buckets."""
    from nimhdfstore_spark.functions.vector import dot, l2_norm

    # precompute each vector's norm once (O(n)) instead of per pair (O(n²));
    # dot/(na*nb) is bit-identical to dot/(sqrt(aa)*sqrt(bb)).
    left = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        l2_norm(vec_col).alias("na"),
    )
    if probe_filter is not None:
        left = left.where(probe_filter)
    right = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        l2_norm(vec_col).alias("nb"),
    )
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    sim = F.round(
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        ),
        6,
    )
    return (
        pairs.withColumn("cosine", sim)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
