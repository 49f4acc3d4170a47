"""Q29-Q31 — interchange sink/source round-trips (CSV, JSON, ORC).

SURVEY §2.1 maps the reference's storage boundary to a pluggable format
layer (Parquet primary, HDF5 connector in sources/hdf5.py). A complete
engine also speaks the interchange formats every Spark deployment already
reads natively — these queries pin that each one round-trips VALUES
exactly, not just schemas:

- CSV: doubles survive because Spark writes the shortest round-trip decimal
  (Java ``Double.toString``) and parses it back to the identical bits.
- JSON: same number rules; column order irrelevant (schema-by-name).
- ORC: columnar sibling of Parquet, including TIMESTAMP_NTZ.

Each query writes the scratch copy, re-reads it WITH THE SOURCE SCHEMA
(inference is where CSV/JSON round-trips silently drift — e.g. an integral
double column inferring as bigint), asserts an order-insensitive full-row
checksum against the original in-query, and returns the re-read rows for
the oracle hash-match against the untouched Parquet table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

from nimhdfstore_spark.queries import query
from nimhdfstore_spark.queries.core import SCRATCH_ROOT
from nimhdfstore_spark.tables import load


def _checksum(df: DataFrame):
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(" + ", ".join(df.columns) + "))").alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _roundtrip(spark, sf_dir, table: str, fmt: str, key: str, **options):
    src = load(spark, sf_dir, table)
    path = os.path.join(
        SCRATCH_ROOT, f"sink-{fmt}-{os.path.basename(sf_dir)}-{table}"
    )
    shutil.rmtree(path, ignore_errors=True)
    src.write.format(fmt).options(**options).save(path)
    back = spark.read.format(fmt).options(**options).schema(src.schema).load(path)
    if _checksum(src) != _checksum(back):
        raise AssertionError(f"{fmt} round-trip of {table} changed values")
    return back.orderBy(key)


_CUSTOMER_SQL = "SELECT * FROM customer ORDER BY c_custkey"


@query("q29_sink_csv_roundtrip", _CUSTOMER_SQL)
def q29(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "customer", "csv", "c_custkey", header="true")


@query("q30_sink_json_roundtrip", _CUSTOMER_SQL)
def q30(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "customer", "json", "c_custkey")


_ORC_SQL = """
SELECT * FROM lineitem
WHERE l_orderkey % 100 = 7
ORDER BY l_orderkey, l_linenumber
"""


@query("q31_sink_orc_roundtrip", _ORC_SQL)
def q31(spark, sf_dir):
    src = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 7)
    path = os.path.join(SCRATCH_ROOT, f"sink-orc-{os.path.basename(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    src.write.format("orc").save(path)
    back = spark.read.format("orc").schema(src.schema).load(path)
    if _checksum(src) != _checksum(back):
        raise AssertionError("orc round-trip of lineitem changed values")
    return back.orderBy("l_orderkey", "l_linenumber")
