"""Fused extension suites — the round-11 extension-side answer to the
core-merge waves' driver-slot economics.

The external sweep verifies a hard 50 rows per round; with ~180 extension
entries, a family of N individually-registered pure-function queries
occupies N potential slots to stay verified. Fusing a family into one row
keeps every leg EXECUTING every run (a broken plan, a lost column, or a
decode crash in any leg fails the row loudly) while the VALUE check
rotates: the returned leg's registered oracle is hash-matched against
DuckDB by the driver, so every leg is engine-independently verified
within ``len(legs)`` rounds. Where a second in-process rendering is cheap
(the oracle text happens to be Spark-SQL-portable, or the leg has a
closed-form rebuild) it is value-compared inside the SAME fused action
every run.

This deliberately differs from the core suites (q09/q20/q25/...), whose
legs mutate scratch stores and are therefore checksummed against
independent relational rebuilds EVERY run: a pure function of the input
parquet has no cheaper second implementation — re-running it through the
same engine proves transcription, not semantics — so the rotation IS the
independent check, and execution-every-run is what the fusion preserves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nimhdfstore_spark.tables import load

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_views(spark, sf_dir: str, tables=ALL_TABLES) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def fused_agg(tag: str, side: str, df: DataFrame) -> DataFrame:
    """One-row (leg, side, n, h, s) checksum aggregate over a frame's FULL
    result: row count + order-insensitive XOR of per-row xxhash64 + an
    order-insensitive SUM of the same hashes. ADVICE r11: XOR alone
    cancels even-multiplicity differences (two frames that differ only by
    a pair of duplicated rows hash identically); the additive aggregate
    breaks parity cancellation — a row present k times contributes k·hash
    to the sum, so multiplicity changes shift it. The sum accumulates in
    decimal(38,0) (not long: 64-bit hash sums overflow LongType after two
    rows, which ANSI mode turns into a runtime error; decimal(38) holds
    ~1e19 rows' worth exactly)."""
    cols = ", ".join(sorted(df.columns))
    return df.select(
        F.lit(tag).alias("leg"),
        F.lit(side).alias("side"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("h"),
        F.expr(f"sum(cast(xxhash64({cols}) as decimal(38,0)))").alias("s"),
    )


def run_fused(
    spark,
    legs: list[tuple[str, DataFrame]],
    rot_idx: int,
    twins: dict[int, DataFrame] | None = None,
) -> DataFrame:
    """Execute every leg's FULL result into a (count, hash) aggregate and
    return ``legs[rot_idx]``'s frame (lazy — the caller's sink executes it
    against the registered oracle).

    ``twins`` maps leg index -> an independently-constructed frame that
    must match that leg exactly (count + order-insensitive full-row
    hashes); twin frames execute in the same batch of checksum jobs.

    The per-leg aggregates collect CONCURRENTLY from a thread pool rather
    than as one union'd action (round-11 verdict ask #2): Catalyst
    analyzes + schedules each 1-row aggregate independently, so the
    checksum pass costs the slowest single leg, not the sum — measured
    3.5 s -> 1.7 s for x210's 13 aggregates at sf0.1 on local[32]. Every
    leg still fully executes every run; a failure in any collect
    propagates from its future and fails the row loudly."""
    from concurrent.futures import ThreadPoolExecutor

    twins = twins or {}

    aggs = []
    for i, (tag, df) in enumerate(legs):
        aggs.append(fused_agg(tag, "got", df))
        if i in twins:
            want = twins[i]
            # frontend dtype drift (SQL DECIMAL vs DataFrame DOUBLE):
            # cast the twin column-for-column to the leg's exact types
            dts = dict(df.dtypes)
            want = want.select(
                *[F.col(c).cast(dts[c]).alias(c) for c in df.columns]
            )
            aggs.append(fused_agg(tag, "want", want))
    with ThreadPoolExecutor(max_workers=min(16, len(aggs))) as ex:
        collected = list(ex.map(lambda a: a.collect()[0], aggs))
    rows = {
        (r["leg"], r["side"]): (r["n"], r["h"], r["s"]) for r in collected
    }
    for i in twins:
        tag = legs[i][0]
        if rows[(tag, "got")] != rows[(tag, "want")]:
            raise AssertionError(
                f"{tag} leg diverged from its independent twin: "
                f"{rows[(tag, 'got')]} != {rows[(tag, 'want')]}"
            )
    return legs[rot_idx][1]
