"""Spark-vs-DuckDB oracle comparison, mimicking the driver's t2 check:
row count + schema (column name set) + order-insensitive value hash."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name; every row rendered to a canonical tuple of
    strings; rows sorted — order-insensitive, exact-value comparison."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def assert_matches(spark_df, oracle_query: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_query, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch\n spark={sorted(got.columns)}\n duck ={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = canonicalize(got), canonicalize(want)
    if g != w:
        diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
        msg = "\n".join(f"  row {i}:\n   spark={g[i]}\n   duck ={w[i]}" for i in diff)
        raise AssertionError(f"{name}: value mismatch; first diffs:\n{msg}")
