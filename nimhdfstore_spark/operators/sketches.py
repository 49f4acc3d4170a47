"""Probabilistic sketches over integer keys — Bloom filter and Count-Min.

The reference has no approximate structures of any kind (SURVEY §2.4: the
only aggregate-adjacent surface is row-count metadata, nimtables.nim:235-236),
so these are extension operators for the 100 TB pipeline: a Bloom filter is
the standard way to pre-filter a huge probe side before an expensive join
(ship a few KB instead of shuffling the build side), and Count-Min answers
heavy-hitter frequency queries with bounded state.

Scale shape:

- ``bloom_bitmap`` reduces the build side to ``m_bits/64`` int64 words via a
  single map-side-combinable ``bit_or`` aggregation — the result is a
  broadcast-able table of at most a few thousand rows regardless of build
  cardinality.
- ``bloom_probe`` joins the probe side's k positions against the broadcast
  bitmap — no shuffle of the probe table beyond its own k-way explode.
- ``countmin_sketch`` is one groupBy over (depth × width) cells — bounded
  state (d·w rows) at any stream size, map-side combined.

Everything is integer arithmetic on the engine-portable ``sample_hash``
(operators/sampling.py), so DuckDB recomputes identical sketches — the
queries are hash-checked, not just rows-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nimhdfstore_spark.operators.sampling import sample_hash

BLOOM_M_BITS = 1 << 16  # 65,536 bits = 1,024 int64 words = 8 KB
BLOOM_K = 4
BLOOM_SALT0 = 100

CM_DEPTH = 4
CM_WIDTH = 1024
CM_SALT0 = 200

HLL_P = 8                      # 2^8 = 256 registers (~6.5% std error)
HLL_M = 1 << HLL_P
HLL_SALT = 300
HLL_WBITS = 32 - HLL_P         # bits feeding the rank
HLL_RMAX = HLL_WBITS + 1       # rank range is [1, HLL_RMAX]; 0 = empty
#: alpha_m * m^2 * 2^RMAX — single double literal shared with the SQL twin
#: so both engines perform exactly one IEEE division
HLL_NUMER = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << HLL_RMAX)


def _positions(key: Column | str, k: int, m: int, salt0: int) -> Column:
    """Array of the k hash positions of ``key`` in [0, m)."""
    return F.array(*[sample_hash(key, salt=salt0 + i) % m for i in range(k)])


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    salt0: int = BLOOM_SALT0,
) -> DataFrame:
    """Build a Bloom bitmap over ``df[key_col]`` as ``(word long, bits long)``
    rows — word ``w`` holds bits ``[63w, 63w+62]``: 63 bits per int64 word,
    never the sign bit, because DuckDB raises on ``1::BIGINT << 63`` (signed
    overflow check) while Spark wraps — 63 keeps the arithmetic identical on
    both engines. At most ``m_bits/63 + 1`` rows; the ``bit_or`` aggregate
    combines map-side, so the shuffle moves one word-row per (partition,
    word), not per key."""
    pos = (
        df.select(F.explode(_positions(key_col, k, m_bits, salt0)).alias("pos"))
        .select(
            F.expr("pos div 63").cast("long").alias("word"),
            (F.col("pos") % 63).cast("int").alias("bit"),
        )
    )
    return pos.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits")
    )


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    salt0: int = BLOOM_SALT0,
) -> DataFrame:
    """Return ``probe`` keys with a ``bloom_hit`` flag: 1 iff every one of
    the key's k bits is set. The bitmap is broadcast (≤ 8 KB of words);
    the probe side only explodes k ways and re-groups on its own key — at
    100 TB this is the cheap pre-filter in front of a real join."""
    pos = probe.select(
        F.col(key_col),
        F.posexplode(_positions(key_col, k, m_bits, salt0)).alias("__i", "pos"),
    ).select(
        key_col,
        F.expr("pos div 63").cast("long").alias("word"),
        (F.col("pos") % 63).cast("int").alias("bit"),
    )
    joined = pos.join(F.broadcast(bitmap), "word", "left")
    # (v >> b) & 1 reads bit b; with 63 bits/word the word value stays
    # non-negative, so sign-extension and the engines' signed % semantics
    # never enter the picture.
    bit_set = F.expr("shiftright(coalesce(bits, 0L), bit) & 1")
    return joined.groupBy(key_col).agg(
        F.min(bit_set).cast("long").alias("bloom_hit")
    )


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    salt0: int = CM_SALT0,
) -> DataFrame:
    """Count-Min sketch of the key frequencies: ``(rw, pos, cnt)`` with
    ``depth × width`` cells max — bounded state at any input size."""
    cells = df.select(
        F.posexplode(_positions(key_col, depth, width, salt0)).alias("rw", "pos")
    )
    return cells.groupBy("rw", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = HLL_P,
    salt: int = HLL_SALT,
) -> DataFrame:
    """HyperLogLog register table over ``df[key_col]``: ``(idx int, m_j int)``
    with at most ``2^p`` rows — bounded state at any input size, map-side
    combined (the MAX aggregate).

    The 32-bit ``sample_hash`` splits into the low ``p`` bits (register
    index) and the high ``32-p`` bits ``w``; the rank is the 1-based
    position of w's leftmost set bit counted from the top of the
    ``32-p``-bit window — computed as ``(32-p+1) - length(bin(w))``, pure
    integer/string arithmetic that DuckDB evaluates identically (both
    engines' ``bin`` strips leading zeros; ``w = 0`` maps to the max rank
    ``32-p+1``). No floating point anywhere in the register build, so the
    sketch itself is bit-exact across engines."""
    m = 1 << p
    wbits = 32 - p
    h = sample_hash(key_col, salt=salt)
    hashed = df.select(h.alias("h")).select(
        (F.col("h") % m).cast("int").alias("idx"),
        F.expr(f"h div {m}").cast("long").alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
    )
    return hashed.select("idx", rank.alias("rank")).groupBy("idx").agg(
        F.max("rank").alias("m_j")
    )


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row cardinality estimate from an HLL register table: the raw
    HyperLogLog formula ``alpha_m * m^2 / sum_j 2^(-M_j)``, evaluated in
    scaled int64 — ``sum_scaled = sum_j 2^(RMAX - M_j)`` (empty registers
    contribute ``2^RMAX``) stays < 2^33, so the only floating-point step is
    the single final division by the shared double literal ``HLL_NUMER``.
    IEEE division of exact operands is deterministic, so the estimate is
    hash-checkable across engines. The small-range (linear counting) and
    large-range corrections are deliberately omitted: they need ``ln``,
    whose last-ulp behavior is libm-dependent — callers should size p so
    n >> 2.5m (the raw regime), which at 100 TB is every interesting
    cardinality."""
    m = 1 << p
    rmax = (32 - p) + 1
    return registers.agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {rmax} - m_j)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << rmax)
        ).alias("sum_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_registers_used"),
    ).select(
        "sum_scaled",
        "n_registers_used",
        F.round(F.lit(HLL_NUMER) / F.col("sum_scaled"), 4).alias("hll_estimate"),
    )


def countmin_estimate(
    probe: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    salt0: int = CM_SALT0,
) -> DataFrame:
    """Point-frequency estimates for ``probe`` keys: min over the sketch's
    depth rows of the addressed cell — the classic CM upper bound
    (est ≥ true count always; equality unless collisions). Sketch is
    broadcast (≤ depth·width rows)."""
    pos = probe.select(
        F.col(key_col),
        F.posexplode(_positions(key_col, depth, width, salt0)).alias("rw", "pos"),
    )
    joined = pos.join(F.broadcast(sketch), ["rw", "pos"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cm_estimate")
    )


def histogram_bins(df: DataFrame, value_col: str, width: float) -> DataFrame:
    """Fixed-width histogram of a value column: ``(b, cnt)`` with
    ``b = floor(value / width)`` — the mergeable bounded-state quantile
    sketch (an equi-width t-digest stand-in whose arithmetic is
    engine-exact: one IEEE division + floor per row, integer counts).
    groupBy combines map-side, so shuffled state is #bins per partition
    at any input size, and two histograms merge by adding counts —
    the property that lets 1000 executors sketch 100 TB independently."""
    b = F.floor(F.col(value_col) / F.lit(width)).cast("long")
    return df.where(F.col(value_col).isNotNull()).select(b.alias("b")).groupBy(
        "b"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(
    bins: DataFrame, width: float, quantiles: list[float]
) -> DataFrame:
    """Quantile estimates from a histogram sketch by linear interpolation
    inside the target bin: rank ``need = ceil(q*n)``; the estimate is
    ``b*width + width * (need - cum_before) / cnt`` — exact-int inputs and
    two IEEE ops, so the estimate hash-matches across engines. The window
    runs over <= #bins rows (driver-scale), never over the data."""
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    total = bins.agg(F.sum("cnt").alias("n"))
    qrows = bins.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    )
    qdf = cum.crossJoin(F.broadcast(total)).crossJoin(F.broadcast(qrows))
    need = F.ceil(F.col("q") * F.col("n"))
    hit = qdf.where((F.col("cum") >= need) & (F.col("cum_before") < need))
    est = (
        F.col("b") * F.lit(width)
        + F.lit(width) * (need - F.col("cum_before")) / F.col("cnt")
    )
    return hit.select(
        F.col("q").alias("quantile"), F.round(est, 4).alias("est_value")
    )
