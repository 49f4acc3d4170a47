"""Interval (range) join: points → containing intervals, at scale.

Open-source Spark has no range-join optimization: a raw
``point BETWEEN start AND end`` join between two large relations plans as
BroadcastNestedLoopJoin — O(|points|·|intervals|). The scalable shape
bucketizes the domain: every interval is exploded to the fixed-width
buckets it covers, every point carries its own bucket, and the ONLY
pair-producing step is an equi-join on (keys…, bucket); the exact BETWEEN
predicate then filters within the bucket. A point meets an interval in
exactly one bucket (its own), so the join emits no duplicates and needs no
post-dedup.

Bucket width trades explode factor against bucket occupancy — pick it near
the median interval length (each interval then lands in ~2 buckets). Long-
tail intervals (one interval spanning thousands of buckets) are the skew
case; ``max_buckets_per_interval`` makes a pathological interval fail
loudly instead of silently exploding the shuffle. All bucket arithmetic is
integer ``div`` (never float division, which loses exactness past 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (``start <= point <= end``, inclusive like the reference's slice
    semantics), optionally equi-keyed on ``on`` columns first.

    ``point_col``/``start_col``/``end_col`` must cast to long (seconds,
    ids, positions…); ``bucket`` is the bucket width in those units.
    Output: all point columns + all interval columns (minus the duplicated
    ``on`` keys).
    """
    if bucket <= 0:
        raise ValueError("bucket width must be positive")
    on = list(on or [])

    iv = intervals.withColumn("__s", F.col(start_col).cast("long")).withColumn(
        "__e", F.col(end_col).cast("long")
    )
    # the explode bound doubles as the skew guard: fused into the sequence
    # end (a used expression) so the optimizer cannot prune the check away
    end_bucket = F.when(
        F.expr(f"__e div {bucket}") - F.expr(f"__s div {bucket}")
        < max_buckets_per_interval,
        F.expr(f"__e div {bucket}"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"interval spans >= {max_buckets_per_interval} buckets of "
                f"width {bucket}; raise `bucket`"
            )
        )
    )
    iv = iv.withColumn(
        "__bucket", F.explode(F.sequence(F.expr(f"__s div {bucket}"), end_bucket))
    )
    pt = points.withColumn("__p", F.col(point_col).cast("long")).withColumn(
        "__bucket", F.expr(f"__p div {bucket}")
    )
    cond = [pt[k] == iv[k] for k in on] + [
        pt["__bucket"] == iv["__bucket"],
        pt["__p"] >= iv["__s"],
        pt["__p"] <= iv["__e"],
    ]
    joined = pt.join(iv, cond)
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)
