"""Z-order (Morton) clustering: multi-key pruning for the snapshot layout.

A snapshot sorted by one key gives tight per-file min/max stats for that
key only — predicates on a second key prune nothing. Writing in Morton
order (bit-interleave of both keys) clusters the file layout in BOTH
dimensions at once: each file covers a small square of the (k1, k2) space,
so row-group min/max stats stay narrow for either key and Parquet pruning
works for filters on either — the standard multi-dimensional clustering
technique for 100 TB tables (Z-ordering in lakehouse table formats).

Usage: ``store.put(name, df.withColumn("zk", morton_code("a", "b")),
order_by=["zk", ...tiebreak])`` — the z-key is an ordinary column, so the
whole rowid/pruning machinery applies unchanged. The code is pure integer
arithmetic (div/mod/multiply, every term < 2^34), identical in any SQL
engine — ``morton_sql`` emits the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # bits kept per key: 2 keys * 16 bits = 32-bit z-code


def morton_code(a: Column | str, b: Column | str, bits: int = BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer keys:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i. Keys wider
    than ``bits`` bits wrap (mod 2^bits) — callers bucket or scale real
    keys into range first."""
    m = 1 << bits
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    # wrap into [0, 2^bits) FIRST (positive mod), so every later division
    # runs on small values — exact, sign-safe, overflow-free
    ca = ((ca % m) + m) % m
    cb = ((cb % m) + m) % m
    terms = []
    for i in range(bits):
        bit_a = (ca / F.lit(1 << i)).cast("long") % 2
        bit_b = (cb / F.lit(1 << i)).cast("long") % 2
        terms.append(bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i)))
    return sum(terms[1:], terms[0]).cast("long")


def morton_sql(a: str, b: str, bits: int = BITS) -> str:
    """DuckDB twin of :func:`morton_code` (same arithmetic, term order)."""
    m = 1 << bits
    pa, pb = f"((({a}) % {m}) + {m}) % {m}", f"((({b}) % {m}) + {m}) % {m}"
    terms = [
        f"((({pa}) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + ((({pb}) // {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
