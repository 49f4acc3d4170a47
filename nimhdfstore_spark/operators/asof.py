"""As-of (most-recent-prior) join — a custom operator Spark lacks natively.

Semantics: for every left row, attach the latest right row with the same key
whose timestamp is <= the left timestamp (the time-series point-in-time
lookup; DuckDB spells it ``ASOF JOIN``). The reference has no joins at all
(SURVEY §2.3), so this is extension surface — included because point-in-time
joins are a staple of event/feature pipelines at scale.

Scale design: the naive form is an inequality join (O(n·m) per key — a
non-starter). This implementation is the union-tag pattern: tag both sides,
union them, and run ONE window pass per key ordered by (ts, side) taking the
last-seen right value. Cost = one hash shuffle on the key + a per-key sort —
the same shape as a sort-merge join, no cross product anywhere. Skewed keys
behave like any skewed aggregation (AQE/salting applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: all ``left`` columns + ``value_cols`` from the most
    recent ``right`` row at or before ``left_ts`` (NULL when none).

    ``tolerance_seconds`` bounds staleness like pandas ``merge_asof``'s
    ``tolerance``: matches older than the bound become NULL.
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union: left gets NULL value slots, right NULL
    # left-only slots
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(dict(r.dtypes)[c]))
    r2 = r
    for c in lcols:
        if c == on:
            continue
        r2 = r2.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r2 = r2.select(
        *[F.col(c) for c in lcols],
        F.col("__side"), F.col("__ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l = l.select(
        *[F.col(c) for c in lcols],
        F.col("__side"), F.col("__ts"),
        *[F.col(f"__v_{c}") for c in value_cols],
    )
    u = r2.unionByName(l)
    # one window per key: right rows (side 0) sort before left rows at equal
    # ts, so "last non-null before current" implements <= correctly
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in value_cols:
        out = out.withColumn(f"__last_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    out = out.withColumn(
        "__last_ts",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w),
    )
    out = out.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("long") - F.col("__last_ts").cast("long")
            <= tolerance_seconds
        )
        for c in value_cols:
            out = out.withColumn(
                f"__last_{c}", F.when(fresh, F.col(f"__last_{c}"))
            )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__last_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Same semantics as :func:`asof_join`, implemented on the cogroup
    member of the UDF surface (SURVEY §2.13):
    ``left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas``. Both
    sides shuffle ONCE on the key; each (key, left-rows, right-rows) pair
    arrives as one Arrow batch and the per-key merge is pandas
    ``merge_asof`` (C-implemented two-pointer sweep).

    When to prefer which: the window-tag implementation (asof_join) stays
    fully JVM-side and wins when keys are few and rows per key are huge;
    the cogrouped form wins when per-key logic outgrows what a window can
    express (true custom merge logic) — this query pins that the two agree
    bit-for-bit. Skewed keys hit one task either way: pre-split hot keys
    upstream (operators/skew.py) before either form."""
    import pandas as pd

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    out_fields += [f"asof_{c} double" for c in value_cols]
    schema = ", ".join(out_fields)
    lcols = [f.name for f in left.schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + [f"asof_{c}" for c in value_cols])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            for c in value_cols:
                lpdf[f"asof_{c}"] = float("nan")
            return lpdf
        rsel = rpdf[[right_ts] + value_cols].sort_values(
            right_ts, kind="mergesort"
        ).rename(columns={c: f"asof_{c}" for c in value_cols})
        out = pd.merge_asof(
            lpdf, rsel, left_on=left_ts, right_on=right_ts,
            direction="backward",
        )
        if right_ts != left_ts and right_ts in out.columns:
            out = out.drop(columns=[right_ts])
        return out

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
