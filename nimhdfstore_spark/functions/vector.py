"""Vector math over ``array<float|double>`` columns — JVM-side only.

Built from ``zip_with`` + ``aggregate`` higher-order functions so the hot
path stays inside whole-stage codegen (no Python UDF). The fold is strictly
left-to-right with a 0.0 init, which makes the IEEE result bit-identical to a
sequential sum — and hence reproducible against a DuckDB ``list_reduce``
oracle (0.0 + x1 == x1 exactly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
