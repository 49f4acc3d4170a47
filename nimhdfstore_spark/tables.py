"""Test-table bindings: canonical orders (FIXTURES.md F5) and loaders."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nimhdfstore_spark.rowid import ROWID, with_rowid

#: canonical total order defining ``_rowid`` per driver table (FIXTURES.md F5)
CANONICAL: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
    "events": ["ts", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def normalize_events_ts(df: DataFrame):
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    with ``nanosAsLong`` it arrives as bigint nanos. Truncate to micros —
    exactly what DuckDB's reader does — and make it a proper timestamp."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def load_pos(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Table with its canonical ``_rowid`` attached."""
    return with_rowid(load(spark, sf_dir, table), CANONICAL[table])


def rowid_over(table: str) -> str:
    """DuckDB fragment: the table with ``_rowid`` in canonical order."""
    order = ", ".join(CANONICAL[table])
    return (
        f"SELECT CAST(row_number() OVER (ORDER BY {order}) - 1 AS BIGINT)"
        f" AS {ROWID}, * FROM {table}"
    )
