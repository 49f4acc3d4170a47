"""Stable row-position (``_rowid``) assignment.

Every read/mutation in the reference is positional (nimtables.nim:149-233);
Spark DataFrames have no inherent row order, so the engine materializes a
0-based ``_rowid`` column defined as the rank of a row under a *canonical
total order* (a unique key list, e.g. ``(l_orderkey, l_linenumber)``).

Two strategies:

- ``window`` — ``row_number().over(Window.orderBy(keys)) - 1``. Simple, but
  the empty-partition window forces a single-task global sort: fine for tiny
  tables, a non-starter at 100 TB.
- ``offsets`` (default) — range-partition + sort-within-partitions on the
  canonical keys, count rows per partition (tiny job), broadcast the prefix
  sums, and assign per-partition sequential ids in one Arrow-batched
  ``mapInPandas`` pass. No global single-task sort; the only full-data
  movement is the range shuffle that a sorted write needs anyway. This is the
  public "zipWithIndex prefix-sum" pattern expressed DataFrame-side.

Determinism requires the canonical key to be unique (all driver tables have a
unique canonical key per FIXTURES.md F5); partition boundaries then cannot
change the resulting rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROWID = "_rowid"


def with_rowid(
    df: DataFrame,
    order_by: Sequence[str],
    strategy: str = "auto",
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Return ``df`` with a ``_rowid`` column = 0-based rank under ``order_by``.

    The output is range-partitioned and sorted by ``order_by`` (hence also by
    ``_rowid``), so writing it produces Parquet files whose ``_rowid`` min/max
    row-group stats enable pushdown pruning for positional reads.
    """
    order_by = list(order_by)
    if not order_by:
        raise ValueError("with_rowid requires a canonical order (unique key columns)")
    if ROWID in df.columns:
        df = df.drop(ROWID)
    if strategy == "auto":
        # Few input partitions ⇒ small data ⇒ the single-task window sort is
        # cheaper than spinning up Arrow/Python workers. Many partitions ⇒
        # the data is big enough that a global window would serialize on one
        # task ⇒ use the prefix-sum path. Partition count is plan metadata,
        # no job runs.
        strategy = "window" if df.rdd.getNumPartitions() <= 8 else "offsets"
    if strategy == "window":
        w = Window.orderBy(*[F.col(c) for c in order_by])
        out = df.withColumn(
            ROWID, (F.row_number().over(w) - 1 + F.lit(start)).cast("long")
        )
        return out.select(ROWID, *df.columns)
    if strategy != "offsets":
        raise ValueError(f"unknown rowid strategy: {strategy}")

    sort_cols = [F.col(c) for c in order_by]
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *sort_cols)
    else:
        part = df.repartitionByRange(*sort_cols)
    sorted_df = part.sortWithinPartitions(*sort_cols)

    # Tiny job: one row per partition. Runs before the main pass; at scale,
    # cache `sorted_df` first if recomputing the sort twice is a concern.
    counts = (
        sorted_df.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    schema = sorted_df.withColumn(ROWID, F.lit(0).cast("long")).schema

    def assign(iterator):
        from pyspark import TaskContext

        import numpy as np

        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, start)
        for pdf in iterator:
            n = len(pdf)
            pdf[ROWID] = np.arange(nxt, nxt + n, dtype="int64")
            nxt += n
            yield pdf

    out = sorted_df.mapInPandas(assign, schema=schema)
    return out.select(ROWID, *df.columns)


def next_rowid_start(df: DataFrame) -> int:
    """max(_rowid)+1 of an existing table (0 for empty) — append base."""
    row = df.agg(F.max(ROWID).alias("m")).collect()[0]
    return 0 if row["m"] is None else int(row["m"]) + 1
