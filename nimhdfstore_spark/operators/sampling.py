"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled constantly — ablation subsets, eval holdouts,
per-source mixing ratios. ``df.sample()`` is seed-and-partitioning dependent
(Bernoulli over a partition-seeded RNG), so two runs over different file
splits disagree; these operators key every decision off a multiplicative
hash of a stable id instead. Properties that matter at scale:

- **Reproducible anywhere**: pure int64 arithmetic on the id — the same row
  is kept no matter the cluster, partitioning, or engine (a DuckDB oracle
  recomputes the identical sample, which is how the x76/x77/x78 queries are
  hash-checked).
- **No shuffle**: Bernoulli and stratified sampling are a WHERE clause —
  evaluated inside the scan stage's codegen (an arithmetic predicate is not
  a Parquet row-group filter, but it costs zero data movement and composes
  with column pruning). Fixed-size sampling is a TakeOrdered (per-partition
  heap + driver merge), not a global sort.
- **Consistent across tables**: sampling users (not rows) by hashing the
  join key keeps every row of a sampled user across all tables — the
  standard trick for coherent multi-table subsets.

The hash is the same engine-independent multiplicative family used by
``similarity.deterministic_centroids`` (Knuth's 2654435761 / 40503
constants); ``salt`` yields independent samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MOD32 = 1 << 32


def sample_hash(id_col: Column | str, salt: int = 0) -> Column:
    """Uniform-ish 32-bit hash of an integer id: XOR the salt in (XOR is
    nonlinear over addition — an ADDED salt makes h(salt) a constant shift
    of h(0) mod 2^32, so two "independent" samples would overlap ~100%;
    property-tested), then two multiply-mod rounds with an XOR-shift
    avalanche between them. SMALL multipliers (40503, 65599) keep every
    intermediate product < 2^48 — int64-safe at ANY id magnitude (a
    2654435761 multiplier overflows int64 once the 32-bit state passes
    ~3.4e9; Spark 4's ANSI mode turned that into a runtime error at sf0.1)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # positive mod: both engines' % keeps the dividend's sign, so a plain
    # (id % M) would leave negative ids negative — always below the keep
    # threshold (never sampled out). (a % M + M) % M is branch-free.
    h = ((c % MOD32) + MOD32) % MOD32
    h = h.bitwiseXOR(F.lit((salt * 40503 + 17) % MOD32))
    h = h * 40503 % MOD32
    # h < 2^32 so h/65536 is exact in double; cast truncates = floor (h >= 0)
    h = h.bitwiseXOR((h / 65536).cast("long")) * 65599 % MOD32
    return h


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose id-hash falls below
    ``fraction`` of the hash space. A pure filter — no shuffle, no RNG
    state, pushes down to the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(sample_hash(id_col, salt) < int(fraction * MOD32))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum rates (source-mixing ratios): each stratum value gets its
    own keep-fraction; unlisted strata get ``default``. Still a pure filter."""
    thr: Column = F.lit(int(default * MOD32))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thr = F.when(F.col(strata_col) == value, F.lit(int(frac * MOD32))).otherwise(thr)
    return df.where(sample_hash(id_col, salt) < thr)


def fixed_size_hash_sample(
    df: DataFrame, id_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Exactly-k uniform sample: the k rows with the smallest id-hash — the
    deterministic replacement for reservoir sampling. Spark plans the
    orderBy+limit as TakeOrdered (per-partition top-k heaps merged on the
    driver), so no global sort at any scale."""
    return df.orderBy(
        sample_hash(id_col, salt).asc(), F.col(id_col).asc()
    ).limit(k)


# --------------------------------------------------------------------------
# Temperature-balanced group mixing (the multilingual-LLM practice of
# upweighting small languages/sources: sample group g with probability
# ∝ n_g^(1/T); here T = 2, i.e. sqrt weights, because IEEE sqrt is
# correctly-rounded and therefore engine-exact, while pow(x, 1/T) is not).
#
# Exactness contract: group counts are exact integers; r_g = floor(sqrt(n_g))
# is exact (sqrt correctly rounded, floor exact); the total budget and per-
# group targets use int64 `div`; the keep threshold is
# floor((s_g / n_g) * 2^32) where s_g/n_g is one correctly-rounded double
# division of exact ints and *2^32 is a power-of-two scale (exact) — so the
# kept set is bit-identical on any engine/partitioning, which is how the
# x93 oracle hash-matches.
# --------------------------------------------------------------------------

def temperature_thresholds(
    df: DataFrame, group_col: str, budget_den: int = 2
) -> DataFrame:
    """Per-group keep thresholds: (group, n_g, s_g, t_g).

    The token/doc budget is ``total div budget_den``; group g's target is
    ``s_g = min(n_g, budget * floor(sqrt(n_g)) div sum_r)`` — sqrt-weight
    allocation capped at the group's size; ``t_g`` is the 32-bit hash-space
    cutoff implementing keep-probability s_g/n_g. Two tiny aggregations
    (group count + one global sum) — the result is a broadcast-sized table
    with one row per group."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    counts = counts.withColumn(
        "r_g", F.floor(F.sqrt(F.col("n_g").cast("double"))).cast("long")
    )
    tot = counts.agg(
        F.sum("n_g").alias("n_total"), F.sum("r_g").alias("r_total")
    )
    j = counts.crossJoin(F.broadcast(tot))
    s_g = F.least(F.col("n_g"), F.expr(f"(n_total div {budget_den}) * r_g div r_total"))
    j = j.withColumn("s_g", s_g)
    t_g = F.floor(
        (F.col("s_g").cast("double") / F.col("n_g")) * float(MOD32)
    ).cast("long")
    return j.select(group_col, "n_g", "s_g", t_g.alias("t_g"))


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    budget_den: int = 2,
    salt: int = 0,
) -> DataFrame:
    """Deterministic temperature-balanced sample: broadcast-join the
    per-group thresholds, keep rows whose id-hash clears the group's
    cutoff. One scan + one broadcast join — no shuffle of the corpus."""
    th = temperature_thresholds(df, group_col, budget_den)
    return (
        df.join(F.broadcast(th), group_col)
        .where(sample_hash(id_col, salt) < F.col("t_g"))
        .drop("n_g", "s_g", "t_g")
    )


def grouped_fixed_size_hash_sample(
    df: DataFrame, id_col: str, group_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Exactly-k-per-group deterministic sample: within each group keep the
    k rows with the smallest id-hash (ties by id) — the per-stratum
    reservoir replacement (eval holdouts per language/source, per-class
    training caps). One shuffle on the group key; the rank is a per-group
    window over the hash order, so no global sort and no RNG — the same
    rows survive on any cluster/partitioning, and a SQL oracle recomputes
    the identical selection. Groups smaller than k keep everything."""
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
