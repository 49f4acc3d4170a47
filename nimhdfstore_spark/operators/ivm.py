"""Incremental view maintenance (IVM) for join views — the delta-algebra
identity (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, so a
materialized join view absorbs new rows by computing only the three
delta terms and appending them — the base-times-base term, the one that
dominates at 100 TB, is never recomputed.

Extension surface: the reference has no views at all (SURVEY §1.1); the
streaming side already maintains aggregation views incrementally
(q34 continuous aggregate, x127 merge-upsert) — this is the batch JOIN
counterpart, the identity behind Materialize/Delta Live incremental joins.

Scale shape: deltas are ingest-batch-sized, so both mixed terms plan as
broadcast joins of the delta against the (huge) base relation — one scan
of each base, zero shuffles of base-sized data; the delta-delta term is
broadcast-tiny squared. The caller appends the returned rows to the
stored view (hardlinked reuse: none of the existing view files rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    a_key: str,
    b_key: str,
) -> DataFrame:
    """Rows to append to the materialized view of ``A ⋈_{a_key=b_key} B``
    after ``delta_a`` joins A and ``delta_b`` joins B. Disjointness of the
    three terms holds because each term pairs at least one delta row and
    (ΔA⋈B) ∪ (A⋈ΔB) ∪ (ΔA⋈ΔB) partitions the new pairs by which side is
    new."""
    if a_key == b_key:
        # same-named key: USING-join so the key appears once (matches the
        # schema of the base view built the same way)
        return (
            F.broadcast(delta_a).join(base_b, a_key)
            .unionByName(base_a.join(F.broadcast(delta_b), a_key))
            .unionByName(F.broadcast(delta_a).join(delta_b, a_key))
        )
    return (
        F.broadcast(delta_a).join(base_b, delta_a[a_key] == base_b[b_key])
        .unionByName(base_a.join(F.broadcast(delta_b), base_a[a_key] == delta_b[b_key]))
        .unionByName(F.broadcast(delta_a).join(delta_b, delta_a[a_key] == delta_b[b_key]))
    )
