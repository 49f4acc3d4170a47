"""Round-2 regression tests: ADVICE/VERDICT findings from round 1.

Covers: empty-slice semantics, path traversal rejection, write-then-swap
overwrite (self-referential copy; failed write preserves the old snapshot),
copy preserving attrs/codec (and cross-store copy), read-only mode, group
attributes, and the cross-file key-overlap check in sorted_parquet_bases.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nimhdfstore_spark.datasets import Dataset, create_dataset
from nimhdfstore_spark.rowid import ROWID, sorted_parquet_bases
from nimhdfstore_spark.store import Store, StoreError

from tests.test_store import SCHEMA, particles, rows_of


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


# -- empty / degenerate python slices (ADVICE store.py:363) -----------------

def test_empty_and_degenerate_slices(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    t = store["p"]
    assert t[0:0].count() == 0
    assert t[5:0].count() == 0
    assert t[5:5].count() == 0
    assert t[13:].count() == 0
    assert t[0:0:3].count() == 0
    # clamping matches python list semantics
    assert t[-100:2].count() == 2
    assert t[11:100].count() == 2
    assert t[0:-100].count() == 0
    assert rows_of(t[-2:]) == [(12, 1, 100.0, 20.0), (13, 1, 100.0, 20.0)]
    with pytest.raises(ValueError):
        t[::-1]


# -- path traversal (ADVICE store.py:50) ------------------------------------

def test_path_traversal_rejected(store, spark, tmp_path):
    victim = tmp_path / "victim"
    victim.mkdir()
    (victim / "data.txt").write_text("precious")
    for bad in ("../victim", "a/../../victim", "a//b", "./x", "a/./b", "..", "a/.."):
        with pytest.raises(StoreError):
            store.put(bad, particles(spark), order_by=["lati"], overwrite=True)
        with pytest.raises(StoreError):
            store.drop(bad)
        with pytest.raises(StoreError):
            store.set_group_attrs(bad, owner="x")
    assert (victim / "data.txt").read_text() == "precious"


# -- write-then-swap overwrite (ADVICE store.py:193) ------------------------

def test_self_referential_overwrite(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    store.copy("p", "p")  # dst == src: must read old snapshot before swap
    assert rows_of(store["p"].df()) == [(i, 1, 100.0, 20.0) for i in range(1, 14)]


def test_combine_into_input(store, spark):
    store.put("a", particles(spark, n=3), order_by=["lati"])
    store.put("b", particles(spark, n=2, start=100), order_by=["lati"])
    store.combine("a", "b", "a", overwrite=True)
    assert store["a"].nrows == 5


def test_failed_overwrite_preserves_old_table(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType())
    def boom(x):
        raise ValueError("injected failure")

    bad = particles(spark).withColumn("lati", boom("lati"))
    with pytest.raises(Exception):
        store.put("p", bad, order_by=["lati"], overwrite=True)
    # old snapshot + meta still intact
    t = store["p"]
    assert t.nrows == 13
    assert rows_of(t.df()) == [(i, 1, 100.0, 20.0) for i in range(1, 14)]


# -- copy preserves attrs/codec; cross-store copy (VERDICT wrong #2, missing #4)

def test_copy_preserves_attrs_and_codec(store, spark):
    t = store.put("src", particles(spark), order_by=["lati"], codec="zstd",
                  attrs={"origin": "sensor-7"})
    t.set_attrs(pass_no=2)
    store.copy("src", "dst")
    d = store["dst"]
    assert d.attrs == {"origin": "sensor-7", "pass_no": 2}
    assert d.codec == "zstd"
    assert d._meta.get("order_by") == ["lati"]
    assert rows_of(d.df()) == rows_of(store["src"].df())


def test_copy_dataset_reopens_as_dataset(store, spark):
    create_dataset(store, "grid", data=[[1.0, 2.0], [3.0, 4.0]])
    store.copy("grid", "grid2")
    d = Dataset(store["grid2"])  # shape attr must survive the copy
    assert d.shape == [2, 2]
    assert d.read().tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_cross_store_copy(store, spark, tmp_path):
    other = Store(spark, str(tmp_path / "other"))
    store.put("src", particles(spark), order_by=["lati"], attrs={"k": "v"})
    store.copy("src", "moved", into=other)
    assert "moved" in other and "moved" not in store
    assert other["moved"].attrs == {"k": "v"}
    assert rows_of(other["moved"].df()) == rows_of(store["src"].df())


# -- read-only mode (hdRead parity, nimtables.nim:60-89) --------------------

def test_read_only_mode(store, spark, tmp_path):
    store.put("p", particles(spark), order_by=["lati"], attrs={"a": 1})
    ro = Store(spark, store.root, mode="r")
    t = ro["p"]
    assert t.nrows == 13                       # reads fine
    assert rows_of(t.row(0)) == [(1, 1, 100.0, 20.0)]
    assert t.attrs == {"a": 1}
    with pytest.raises(StoreError):
        ro.put("q", particles(spark), order_by=["lati"])
    with pytest.raises(StoreError):
        ro.drop("p")
    with pytest.raises(StoreError):
        ro.link("p", "alias")
    with pytest.raises(StoreError):
        t.set_attrs(b=2)
    with pytest.raises(StoreError):
        t.append(particles(spark, n=1))
    with pytest.raises(StoreError):
        t.delete(0)
    with pytest.raises(StoreError):
        ro.set_group_attrs("g", x=1)
    with pytest.raises(StoreError):
        Store(spark, str(tmp_path / "does-not-exist"), mode="r")


def test_truncate_mode(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    w = Store(spark, store.root, mode="w")  # hdOverwrite: truncates
    assert w.keys() == []


# -- group attributes (attributes.nim:207-319 on groups) --------------------

def test_group_attributes(store, spark):
    store.put("exp/run1/t", particles(spark), order_by=["lati"])
    store.set_group_attrs("exp/run1", operator="alice", temperature=4.2)
    store.set_group_attrs("exp/run1", operator="bob")
    assert store.group_attrs("exp/run1") == {"operator": "bob", "temperature": 4.2}
    assert store.group_attrs("exp/other") == {}
    store.del_group_attr("exp/run1", "temperature")
    assert store.group_attrs("exp/run1") == {"operator": "bob"}
    with pytest.raises(StoreError):
        store.del_group_attr("exp/run1", "nope")
    with pytest.raises(StoreError):
        store.set_group_attrs("exp/run1/t", x=1)  # a table is not a group
    # group metadata does not pollute the table catalog
    assert store.keys() == ["exp/run1/t"]


# -- cross-file key overlap must disable the sorted-parquet fast path -------
# (ADVICE rowid.py:200)

def _write_sorted_file(path, lo, hi):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"k": list(range(lo, hi + 1))}), path)


def test_sorted_parquet_bases_rejects_interleaved_files(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    _write_sorted_file(str(d / "part-0.parquet"), 1, 10)
    _write_sorted_file(str(d / "part-1.parquet"), 5, 15)  # interleaves with part-0
    assert sorted_parquet_bases(str(d), ["k"]) is None


def test_sorted_parquet_bases_accepts_disjoint_files(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    _write_sorted_file(str(d / "part-0.parquet"), 11, 20)
    _write_sorted_file(str(d / "part-1.parquet"), 1, 10)
    bases = sorted_parquet_bases(str(d), ["k"])
    assert bases is not None
    # files ordered by key range, not by filename: part-1 holds keys 1-10
    assert [(os.path.basename(f), b, n) for f, b, n in bases] == [
        ("part-1.parquet", 0, 10),
        ("part-0.parquet", 10, 10),
    ]


def test_sorted_verification_distributed_matches_driver(spark, tmp_path):
    # the distributed per-file key-order job must agree with the driver
    # loop: accept sorted files, reject a file whose stats look fine but
    # whose rows are internally unsorted within one row group
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = tmp_path / "good"
    good.mkdir()
    _write_sorted_file(str(good / "part-0.parquet"), 1, 10)
    _write_sorted_file(str(good / "part-1.parquet"), 11, 20)
    b_driver = sorted_parquet_bases(str(good), ["k"])
    b_dist = sorted_parquet_bases(str(good), ["k"], spark=spark)
    assert b_driver == b_dist and b_dist is not None

    bad = tmp_path / "bad"
    bad.mkdir()
    # one row group, min=1 max=10 (stats pass) but rows out of order inside
    pq.write_table(
        pa.table({"k": [1, 3, 2, 4, 5, 6, 7, 8, 9, 10]}),
        str(bad / "part-0.parquet"),
    )
    assert sorted_parquet_bases(str(bad), ["k"]) is None
    assert sorted_parquet_bases(str(bad), ["k"], spark=spark) is None


# -- hyperslab write target enumeration is driver-side arithmetic -----------

def test_write_hyperslab_strided(store, spark):
    d = create_dataset(store, "m", shape=[4, 4], dtype="double")
    d.write_hyperslab([0, 1], [2, 2], [[1.0, 2.0], [3.0, 4.0]], stride=[2, 2])
    got = d.read().tolist()
    assert got[0][1] == 1.0 and got[0][3] == 2.0
    assert got[2][1] == 3.0 and got[2][3] == 4.0
    assert got[1] == [0.0, 0.0, 0.0, 0.0]
    with pytest.raises(StoreError):
        d.write_hyperslab([3, 0], [2, 1], [[1.0], [2.0]])  # exceeds shape


def test_append_rejects_mismatched_schema(store, spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    t = store.put("typed", df, order_by=["k"])
    widened = spark.createDataFrame([(3, 30)], "k long, v int")  # k int->long
    with pytest.raises(StoreError, match="schema"):
        t.append(widened, n=1)
    renamed = spark.createDataFrame([(3, 30)], "k int, w int")
    with pytest.raises(StoreError, match="schema"):
        t.append(renamed, n=1)


# -- snapshot retention for reader isolation --------------------------------

def test_snapshot_retention_protects_inflight_readers(spark, tmp_path):
    s = Store(spark, str(tmp_path / "ret"), keep_snapshots=2)
    t = s.put("p", particles(spark), order_by=["lati"])
    old_reader = t.df()  # lazy plan against the current snapshot's files
    t.update(0, particles(spark, n=1, start=500))  # rewrites a file
    # the previous snapshot is retained, so the stale plan still executes
    assert old_reader.count() == 13
    assert rows_of(old_reader)[0] == (1, 1, 100.0, 20.0)  # pre-update value
    # new handle sees the mutation
    assert rows_of(s["p"].row(0)) == [(500, 1, 100.0, 20.0)]
    # a second mutation prunes the oldest: exactly 2 snapshot dirs remain
    t2 = s["p"]
    t2.update(1, particles(spark, n=1, start=600))
    tdir = os.path.join(s.root, "p")
    snaps = sorted(e for e in os.listdir(tdir) if e.startswith("snap-"))
    assert len(snaps) == 2


def test_default_retention_keeps_single_snapshot(store, spark):
    t = store.put("p", particles(spark), order_by=["lati"])
    t.update(0, particles(spark, n=1, start=500))
    t2 = store["p"]
    t2.update(1, particles(spark, n=1, start=600))
    tdir = os.path.join(store.root, "p")
    snaps = [e for e in os.listdir(tdir) if e.startswith("snap-")]
    assert len(snaps) == 1


# -- SQL over the catalog ----------------------------------------------------

def test_store_sql(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    store.put("exp/run1/t", particles(spark, n=3), order_by=["lati"])
    out = store.sql(
        "SELECT count(*) AS n FROM p WHERE _rowid BETWEEN 2 AND 5"
    ).collect()
    assert out[0].n == 4
    joined = store.sql(
        "SELECT count(*) AS n FROM p JOIN exp__run1__t USING (lati)"
    ).collect()
    assert joined[0].n == 3


# -- time travel over retained snapshots ------------------------------------

def test_time_travel_reads_previous_snapshot(spark, tmp_path):
    s = Store(spark, str(tmp_path / "tt"), keep_snapshots=3)
    t = s.put("p", particles(spark), order_by=["lati"])
    t.update(0, particles(spark, n=1, start=500))
    t2 = s["p"]
    t2.delete(1, 5)
    assert s.snapshots("p") == [0, 1, 2]
    # snapshot 0: original data; snapshot 1: post-update; current: post-delete
    t0 = s.table("p", snapshot=0)
    assert t0.nrows == 13
    assert rows_of(t0.row(0)) == [(1, 1, 100.0, 20.0)]
    t1 = s.table("p", snapshot=1)
    assert t1.nrows == 13
    assert rows_of(t1.row(0)) == [(500, 1, 100.0, 20.0)]
    assert s.table("p", snapshot=2).nrows == 8
    # historical handles refuse mutation
    with pytest.raises(StoreError, match="historical"):
        t0.delete(0)
    with pytest.raises(StoreError, match="historical"):
        t0.set_attrs(x=1)
    # pruned snapshots are explicit errors
    with pytest.raises(StoreError, match="not retained"):
        s.table("p", snapshot=99)


def test_time_travel_unavailable_when_pruned(store, spark):
    t = store.put("p", particles(spark), order_by=["lati"])  # keep=1
    t.update(0, particles(spark, n=1, start=500))
    with pytest.raises(StoreError, match="not retained"):
        store.table("p", snapshot=0)
