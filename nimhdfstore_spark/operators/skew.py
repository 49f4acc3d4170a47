"""Skew-salted joins — the standard fix when one join key holds a large
share of the rows (a hot user, a null-ish default, a viral document): a
plain hash join puts the whole hot key in ONE task.

``salted_join`` splits every fact row's key into ``(key, salt)`` with
``salt = id mod S``, replicates each dim row S times (one per salt value),
and equi-joins on the pair — the hot key now spreads across S tasks. The
replication multiplies only the SMALL side (S × dim rows), which is the
right trade at any scale; results are exactly the plain join's (each fact
row still meets each matching dim row exactly once, at its own salt).

AQE's skew-join split (`spark.sql.adaptive.skewJoin`) does this adaptively
for sort-merge joins at runtime; explicit salting remains the tool when the
hot side feeds an aggregation or the engine can't see the skew (e.g.
pre-shuffle aggregates keyed by the hot key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_col: Column,
    num_salts: int = 8,
) -> DataFrame:
    """Inner-join ``fact`` with ``dim`` on key equality, salted ``num_salts``
    ways. ``salt_col`` must be a deterministic integer expression over fact
    columns (e.g. a row id); its value mod ``num_salts`` picks the salt, so
    the result is partition-order independent. Dim columns are replicated via
    one explode of a literal salt range — no extra shuffle of the fact side
    beyond the join's own."""
    f = fact.withColumn(
        "_salt", ((salt_col % num_salts) + num_salts) % num_salts
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return f.join(d, (F.col(fact_key) == F.col(dim_key)) & (f["_salt"] == d["_salt"])).drop(
        "_salt"
    )
