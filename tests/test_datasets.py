"""N-dim dataset layer (datasets.py) — golden round-trips against numpy as
the in-memory oracle, mirroring the reference's seq-oracle test pattern
(tests.nim:63-112) for the nimhdf5 dataset surface."""

from __future__ import annotations

import numpy as np
import pytest

from nimhdfstore_spark.datasets import Dataset, create_dataset, open_dataset
from nimhdfstore_spark.store import Store, StoreError


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def test_create_read_roundtrip(store):
    a = np.arange(24, dtype="float64").reshape(2, 3, 4)
    ds = create_dataset(store, "arr", data=a)
    assert ds.shape == [2, 3, 4] and ds.size == 24 and ds.dtype == "double"
    assert (ds.read() == a).all()
    assert (open_dataset(store, "arr").read() == a).all()


def test_hyperslab_matches_numpy(store):
    a = np.arange(20 * 8, dtype="float64").reshape(20, 8)
    ds = create_dataset(store, "m", data=a)
    got = ds.hyperslab(offset=[2, 1], count=[5, 3], stride=[3, 2]).collect()
    want = a[2:15:3, 1:6:2]
    vals = np.array([r["value"] for r in got]).reshape(5, 3)
    assert (vals == want).all()
    assert [(r["i0"], r["i1"]) for r in got[:3]] == [(2, 1), (2, 3), (2, 5)]


def test_indexing_and_elements(store):
    a = np.arange(30, dtype="float64").reshape(5, 6)
    ds = create_dataset(store, "m", data=a)
    row = ds[2].collect()
    assert [r["value"] for r in row] == a[2].tolist()
    cell = ds[1, 3].collect()
    assert len(cell) == 1 and cell[0]["value"] == a[1, 3]
    pts = ds.elements([(0, 0), (4, 5), (-1, -1)]).collect()
    assert sorted(r["value"] for r in pts) == sorted({a[0, 0], a[4, 5]})


def test_write_coords_and_hyperslab(store):
    a = np.zeros((4, 4))
    ds = create_dataset(store, "m", data=a)
    ds.write_coords([(0, 0), (3, 3)], [7.0, 9.0])
    got = ds.read()
    assert got[0, 0] == 7.0 and got[3, 3] == 9.0 and got.sum() == 16.0
    ds.write_hyperslab([1, 0], [2, 4], np.ones((2, 4)))
    assert ds.read()[1:3].sum() == 8.0
    with pytest.raises(StoreError):
        ds.write_hyperslab([0, 0], [1, 4], np.ones((2, 4)))  # shape mismatch


def test_resize_add_overwrite(store):
    ds = create_dataset(store, "v", shape=[6, 2], dtype="double")
    assert ds.read().sum() == 0
    ds.add(np.full((2, 2), 5.0))
    assert ds.shape == [8, 2] and ds.read()[6:].sum() == 20.0
    ds.resize([10, 2])
    assert ds.shape == [10, 2] and ds.read()[8:].sum() == 0
    ds.resize([3, 2])
    assert ds.read().shape == (3, 2)
    ds.overwrite(np.full((3, 2), 1.0))
    assert ds.read().sum() == 6.0
    with pytest.raises(StoreError):
        ds.overwrite(np.zeros((4, 2)))
    ds.resize([3, 5])  # inner-axis grow: relinearize + zero-fill
    assert ds.read().tolist() == [[1.0, 1.0, 0.0, 0.0, 0.0]] * 3


def test_not_a_dataset(store, spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("_rowid"), F.lit(1.0).alias("value")
    )
    store.put("t", df, overwrite=True)
    with pytest.raises(StoreError):
        Dataset(store["t"])


def test_resize_inner_dimension_grow(store, spark):
    d = create_dataset(store, "g", data=[[1.0, 2.0], [3.0, 4.0]])
    d.resize([2, 3])  # widen columns: zero-fill the new column
    assert d.shape == [2, 3]
    assert d.read().tolist() == [[1.0, 2.0, 0.0], [3.0, 4.0, 0.0]]
    # values survive a re-open too (shape attr + data rewritten atomically)
    d2 = Dataset(store["g"])
    assert d2.read().tolist() == [[1.0, 2.0, 0.0], [3.0, 4.0, 0.0]]


def test_resize_inner_dimension_shrink(store, spark):
    d = create_dataset(store, "s", data=[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    d.resize([2, 2])
    assert d.read().tolist() == [[1.0, 2.0], [4.0, 5.0]]


def test_resize_multiple_dims_at_once(store, spark):
    d = create_dataset(
        store, "m",
        data=[[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]],
    )  # 2x2x2
    d.resize([3, 2, 1])  # shrink last dim, grow first
    assert d.shape == [3, 2, 1]
    assert d.read().tolist() == [
        [[1.0], [3.0]], [[5.0], [7.0]], [[0.0], [0.0]],
    ]


def test_resize_rank_change_rejected(store, spark):
    d = create_dataset(store, "r", data=[[1.0, 2.0]])
    with pytest.raises(StoreError):
        d.resize([2])
    with pytest.raises(StoreError):
        d.resize([2, 0])


class TestDimensionScales:
    def test_attach_detach_and_validation(self, spark, tmp_path):
        import pytest as _pytest

        from nimhdfstore_spark.datasets import (
            Dataset, attach_scale, create_dataset, detach_scale, get_scales,
            set_scale,
        )
        from nimhdfstore_spark.store import Store, StoreError

        store = Store(spark, str(tmp_path / "dsstore"))
        target = create_dataset(store, "grid", [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        scale3 = create_dataset(store, "s3", [10.0, 20.0, 30.0])
        scale2 = create_dataset(store, "s2", [0.1, 0.2])
        with _pytest.raises(StoreError):
            attach_scale(target, 0, scale3)  # not marked as a scale yet
        set_scale(scale3, "rows")
        set_scale(scale2, "cols")
        attach_scale(target, 0, scale3)
        attach_scale(target, 1, scale2)
        with _pytest.raises(StoreError):
            attach_scale(target, 0, scale2)  # length 2 != axis extent 3
        with _pytest.raises(StoreError):
            attach_scale(target, 5, scale3)  # axis out of range
        # durable through a fresh handle
        again = Dataset(store.table("grid"))
        assert get_scales(again) == {0: "s3", 1: "s2"}
        detach_scale(again, 0)
        assert get_scales(Dataset(store.table("grid"))) == {1: "s2"}
        with _pytest.raises(StoreError):
            detach_scale(again, 0)  # already detached: explicit error
