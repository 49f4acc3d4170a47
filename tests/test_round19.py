"""Round-14 (optimization round 2) pins: the r13 ADVICE fixes.

- ``put(local_max_rows=)``'s violation branch must fire LOUDLY and must be
  enforced through a bounded collect (a wrong caller promise must not
  materialize the whole frame on the driver before the error);
- ``local_frame``'s timestamp refusal and row-shape guards (a Mapping row
  silently zipping over its keys was a corrupt frame, not an error);
- the bench minima table is keyed by (sf, cpus) so a non-default-core run
  can never lower the 32-core reference minima.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# put(local_max_rows=): the promise is ENFORCED, not trusted
# --------------------------------------------------------------------------


def test_local_max_rows_violation_raises_loudly(spark, tmp_path):
    from nimhdfstore_spark.store import Store, StoreError

    store = Store(spark, str(tmp_path / "store"))
    body = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    with pytest.raises(StoreError, match="local_max_rows=10 promised"):
        store.put("t", body, order_by=["k"], local_max_rows=10)


def test_local_max_rows_violation_is_bounded_collect(spark, tmp_path):
    """The enforcement itself must be limit-gated: the arrow table built
    for the bound check carries at most bound+1 rows (r13 ADVICE — the
    old path ran ``body.toArrow()`` on the full frame BEFORE validating,
    so a wrong promise materialized everything on the driver)."""
    import pyarrow as pa

    from nimhdfstore_spark.store import Store, StoreError

    store = Store(spark, str(tmp_path / "store"))
    body = spark.range(10_000).select(F.col("id").alias("k"))

    seen = {}
    orig = pa.parquet.write_table

    real_to_arrow = type(body).toArrow

    def spy_to_arrow(self):
        tbl = real_to_arrow(self)
        seen.setdefault("rows", []).append(tbl.num_rows)
        return tbl

    import unittest.mock as mock

    with mock.patch.object(type(body), "toArrow", spy_to_arrow):
        with pytest.raises(StoreError, match="local_max_rows"):
            store.put("t", body, order_by=["k"], local_max_rows=100)
    assert seen["rows"], "hinted put never went through toArrow"
    assert max(seen["rows"]) <= 101, (
        f"bound check materialized {max(seen['rows'])} rows on the driver; "
        "the limit gate must cap it at local_max_rows + 1"
    )
    assert orig is pa.parquet.write_table  # sanity: nothing wrote


def test_local_max_rows_within_bound_writes_full_table(spark, tmp_path):
    """Within the promise the limited table IS the full table: the write
    must land every row, sorted by _rowid, bit-identical to the
    distributed path's contract."""
    from nimhdfstore_spark.store import Store

    store = Store(spark, str(tmp_path / "store"))
    body = spark.range(64).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    t = store.put("t", body, order_by=["k"], local_max_rows=64)
    got = sorted(r["k"] for r in t.df().collect())
    assert got == list(range(64))


# --------------------------------------------------------------------------
# local_frame row-shape guards
# --------------------------------------------------------------------------


def test_local_frame_refuses_timestamps(spark):
    from nimhdfstore_spark.tables import local_frame

    with pytest.raises(ValueError, match="timestamp"):
        local_frame(spark, [], "a bigint, ts timestamp")


def test_local_frame_rejects_wrong_width_rows(spark):
    from nimhdfstore_spark.tables import local_frame

    with pytest.raises(ValueError, match="2 values for 3 schema fields"):
        local_frame(spark, [(1, "x")], "a bigint, b string, c bigint")


def test_local_frame_accepts_mapping_rows_by_name(spark):
    from nimhdfstore_spark.tables import local_frame

    rows = [{"b": "x", "a": 1}, {"a": 2, "b": "y"}]  # key order shuffled
    df = local_frame(spark, rows, "a bigint, b string")
    assert df.isLocal()
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [
        (1, "x"), (2, "y"),
    ]


def test_local_frame_positional_rows_unchanged(spark):
    from nimhdfstore_spark.tables import local_frame

    df = local_frame(spark, [(1, "x"), (2, "y")], "a bigint, b string")
    assert df.isLocal()
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [
        (1, "x"), (2, "y"),
    ]


# --------------------------------------------------------------------------
# bench minima: cross-core isolation
# --------------------------------------------------------------------------


def _bench():
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_minima_key_is_cpu_scoped():
    b = _bench()
    assert b._minima_key("0.1", "32") == "0.1"  # 32-core history intact
    assert b._minima_key("0.1", 32) == "0.1"
    assert b._minima_key("0.1", "8") == "0.1@8cpu"
    assert b._minima_key("0.001", "16") == "0.001@16cpu"
    # distinct keys can never alias
    assert b._minima_key("0.1", "8") != b._minima_key("0.1", "32")
