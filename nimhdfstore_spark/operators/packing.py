"""Token-block packing — map each document onto the fixed-size training
blocks it occupies after the standard LLM-pretraining concat-and-chunk step
(concatenate all documents in canonical id order, slice into ``block_size``-
token blocks; a document may span several blocks).

The global token offset of every document is an exclusive prefix sum. A
single ``Window.orderBy(id)`` cumsum would move the whole corpus into ONE
task, so this runs the classic two-phase distributed scan instead:

1. per-bucket cumsum   — window partitioned by ``bucket = id div bucket_size``
   (parallel across buckets),
2. bucket offsets      — cumsum over the per-bucket totals (a table
   ``bucket_size`` times smaller; pick ``bucket_size`` so it fits one task,
   or recurse the same trick for another 10^4 reduction),
3. equi-join the offsets back on the bucket key.

All arithmetic is int64 with ``div`` (never float division: a double loses
integer precision above 2^53, which a 100 TB corpus' token count exceeds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BLOCK_SIZE = 256
BUCKET_SIZE = 64


def pack_blocks(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    block_size: int = BLOCK_SIZE,
    bucket_size: int = BUCKET_SIZE,
) -> DataFrame:
    """Output per document: (id, n_tokens, start_token, first_block,
    last_block, n_blocks). Zero-token documents occupy no block
    (first/last = -1 sentinel, n_blocks = 0 — a sentinel rather than NULL
    keeps the columns non-nullable int64 end to end)."""
    base = df.select(
        F.col(id_col), n_tokens.cast("long").alias("n_tokens")
    ).withColumn("bucket", F.expr(f"{id_col} div {bucket_size}"))

    w_in = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn(
        "within_start", F.sum("n_tokens").over(w_in) - F.col("n_tokens")
    )

    btot = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boff = btot.withColumn(
        "bucket_offset", F.sum("btot").over(w_b) - F.col("btot")
    ).select("bucket", "bucket_offset")

    j = within.join(boff, "bucket")
    start = (F.col("bucket_offset") + F.col("within_start")).alias("start_token")
    out = j.select(F.col(id_col), "n_tokens", start)
    first = F.expr(f"start_token div {block_size}")
    last = F.expr(f"(start_token + n_tokens - 1) div {block_size}")
    has = F.col("n_tokens") > 0
    return out.select(
        F.col(id_col),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "start_token",
        F.when(has, first).otherwise(F.lit(-1)).cast("long").alias("first_block"),
        F.when(has, last).otherwise(F.lit(-1)).cast("long").alias("last_block"),
        F.when(has, last - first + 1).otherwise(F.lit(0)).cast("int").alias("n_blocks"),
    )
