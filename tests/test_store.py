"""Store/Table unit tests — the reference's test strategy (SURVEY §5) scaled:
golden round-trips against an in-memory oracle (here a Python list), plus a
seeded randomized mutation-sequence property test (list oracle), mirroring
the reference's 13-row `data: seq[Particle]` pattern (tests.nim:11-112)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from nimhdfstore_spark.rowid import ROWID, with_rowid
from nimhdfstore_spark.store import Store, StoreError

SCHEMA = StructType([
    StructField("lati", LongType()),
    StructField("longi", LongType()),
    StructField("pressure", DoubleType()),
    StructField("temperature", DoubleType()),
])


def particles(spark, n=13, start=1):
    rows = [(i, 1, 100.0, 20.0) for i in range(start, start + n)]
    return spark.createDataFrame(rows, SCHEMA)


def rows_of(df):
    return [tuple(r) for r in df.orderBy(ROWID).drop(ROWID).collect()]


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def test_roundtrip_and_catalog(store, spark):
    p = particles(spark)
    store.put("particles", p, order_by=["lati"])
    store.put("particles2", p, order_by=["lati"])
    assert store.keys() == ["particles", "particles2"]
    assert "particles" in store and "nope" not in store
    t = store["particles"]
    assert t.nrows == 13
    assert rows_of(t.df()) == [(i, 1, 100.0, 20.0) for i in range(1, 14)]
    store.drop("particles2")
    assert store.keys() == ["particles"]
    with pytest.raises(StoreError):
        store.drop("particles2")  # unknown drop is an error, not a no-op


def test_schema_check_and_attrs(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    t = store.table("p", expect_schema=SCHEMA)
    bad = StructType(SCHEMA.fields[:-1])
    with pytest.raises(StoreError):
        store.table("p", expect_schema=bad)
    t.set_attrs(source="survey", version=1)
    assert store.table("p").attrs == {"source": "survey", "version": 1}
    t.del_attr("version")
    assert store.table("p").attrs == {"source": "survey"}
    with pytest.raises(StoreError):
        t.del_attr("nope")


def test_positional_reads(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    t = store["p"]
    assert rows_of(t.row(0)) == [(1, 1, 100.0, 20.0)]
    assert rows_of(t.row(-1)) == [(13, 1, 100.0, 20.0)]     # table[^1]
    assert rows_of(t[3:6]) == [(4, 1, 100.0, 20.0), (5, 1, 100.0, 20.0),
                               (6, 1, 100.0, 20.0)]
    assert rows_of(t.slice(-2, -1)) == [(12, 1, 100.0, 20.0),
                                        (13, 1, 100.0, 20.0)]
    assert [r["lati"] for r in t.hyperslab(1, 4, stride=3).collect()] == [2, 5, 8, 11]
    assert [r["lati"] for r in t.hyperslab(0, 2, stride=5, block=2).collect()] == [1, 2, 6, 7]
    assert [r["lati"] for r in t.elements([0, 5, -1]).collect()] == [1, 6, 13]
    cast = t.read_as({"lati": "double"})
    assert cast.schema["lati"].dataType.simpleString() == "double"


def test_mutations(store, spark):
    store.put("p", particles(spark), order_by=["lati"])
    t = store["p"]
    t.append(particles(spark, n=2, start=14))
    assert t.nrows == 15
    assert rows_of(t.slice(-2, -1)) == [(14, 1, 100.0, 20.0), (15, 1, 100.0, 20.0)]
    t.delete(-3, -1)
    assert t.nrows == 12
    assert rows_of(t.row(-1)) == [(12, 1, 100.0, 20.0)]
    t.insert(3, particles(spark, n=2, start=100))
    assert t.nrows == 14
    assert rows_of(t.slice(2, 5)) == [
        (3, 1, 100.0, 20.0), (100, 1, 100.0, 20.0),
        (101, 1, 100.0, 20.0), (4, 1, 100.0, 20.0)]
    t.update(0, particles(spark, n=1, start=999))  # row 0 mutable (quirk fixed)
    assert rows_of(t.row(0)) == [(999, 1, 100.0, 20.0)]
    with pytest.raises(StoreError):
        t.update(0, particles(spark, n=2, start=5))  # shape checked
    with pytest.raises(StoreError):
        t.delete(t.nrows)


def test_copy_and_link(store, spark):
    store.put("a", particles(spark), order_by=["lati"])
    store.copy("a", "b")
    assert rows_of(store["b"].df()) == rows_of(store["a"].df())
    store.link("a", "alias_a")
    assert store["alias_a"].name == "a"
    assert sorted(store.keys()) == ["a", "alias_a", "b"]


def test_codec_invariance(store, spark):
    p = particles(spark, n=50)
    base = None
    for codec in ("none", "snappy", "zstd", "gzip"):
        store.put(f"p_{codec}", p, order_by=["lati"], codec=codec, overwrite=True)
        got = rows_of(store[f"p_{codec}"].df())
        base = base or got
        assert got == base


def test_rowid_strategies_agree(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = with_rowid(df, ["c_custkey"], strategy="window")
    b = with_rowid(df.repartition(8), ["c_custkey"], strategy="offsets")
    assert a.select(ROWID, "c_custkey").subtract(b.select(ROWID, "c_custkey")).count() == 0


def _inodes(t):
    import glob
    import os

    return {
        os.path.basename(f): os.stat(f).st_ino
        for f in glob.glob(t.snapshot_path + "/*.parquet")
        if os.path.getsize(f) > 0
    }


def test_mutations_reuse_untouched_files(spark, tmp_path):
    # 200 rows / 20-per-file = 10 files; a mutation must rewrite ONLY files
    # whose _rowid range it touches (hardlink reuse elsewhere) — the M8 scale
    # property that makes a point update on a 100 TB table move one file.
    store = Store(spark, str(tmp_path / "store"), rows_per_file=20)
    store.put("p", particles(spark, n=200), order_by=["lati"])
    t = store["p"]
    before = _inodes(t)
    assert len(before) >= 8

    t.append(particles(spark, n=5, start=900))  # append rewrites nothing
    after = _inodes(t)
    assert set(before).issubset(set(after))
    assert all(after[k] == v for k, v in before.items())

    before = _inodes(t)
    t.update(55, particles(spark, n=1, start=901))  # touches one file
    after = _inodes(t)
    reused = [k for k, v in before.items() if after.get(k) == v]
    assert len(before) - len(reused) == 1, "update should rewrite exactly 1 file"

    before = _inodes(t)
    t.delete(150, 152)  # prefix (rowid < 150) reused, suffix rewritten
    after = _inodes(t)
    reused = [k for k, v in before.items() if after.get(k) == v]
    assert len(reused) >= 7, f"delete near tail should reuse the prefix: {len(reused)}"
    assert rows_of(t.row(55)) == [(901, 1, 100.0, 20.0)]
    assert t.nrows == 202


def test_nested_group_keys(store, spark):
    # hierarchical namespace (reference groups, nimhdf5/groups.nim:204-246):
    # "/"-separated keys create directory groups; catalog walk finds leaves
    p = particles(spark, n=3)
    store.put("raw/particles", p, order_by=["lati"])
    store.put("raw/particles2", p, order_by=["lati"])
    store.put("derived/agg/means", p, order_by=["lati"])
    assert store.keys() == ["derived/agg/means", "raw/particles", "raw/particles2"]
    assert "raw/particles" in store
    assert store["derived/agg/means"].nrows == 3
    store.drop("raw/particles2")
    assert store.keys() == ["derived/agg/means", "raw/particles"]


def test_combine_and_add_records_from(store, spark):
    store.put("a", particles(spark, n=5), order_by=["lati"])
    store.put("b", particles(spark, n=3, start=100), order_by=["lati"])
    t = store.combine("a", "b", "ab")  # J1 H5TBcombine_tables
    assert t.nrows == 8
    assert [r["lati"] for r in t.df().orderBy(ROWID).collect()] == [
        1, 2, 3, 4, 5, 100, 101, 102]
    t.add_records_from(store["a"], start=1, n=2)  # J2 H5TBadd_records_from
    assert t.nrows == 10
    assert [r["lati"] for r in t.slice(-2, -1).collect()] == [2, 3]


def test_schema_evolution_and_compact(store, spark):
    store.put("p", particles(spark, n=6), order_by=["lati"])
    t = store["p"]
    t.add_field("flag", "long", 7)
    assert t.df().where(F.col("flag") == 7).count() == 6
    t.drop_field("pressure")
    assert "pressure" not in t.df().columns
    with pytest.raises(StoreError):
        t.drop_field("_rowid")
    with pytest.raises(StoreError):
        t.add_field("flag", "long", 0)
    t.compact()
    assert t.nrows == 6 and t.df().where(F.col("flag") == 7).count() == 6


def test_multifile_sorted_parquet_rowid(spark, tmp_path):
    # multi-file fast path: bases from footers + broadcast join on file_path
    from nimhdfstore_spark.rowid import rowid_from_sorted_parquet, sorted_parquet_bases

    df = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    d = str(tmp_path / "sorted")
    df.repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(d)
    bases = sorted_parquet_bases(d, ["k"])
    assert bases is not None and len(bases) == 4
    assert sum(r for _, _, r in bases) == 1000
    got = rowid_from_sorted_parquet(spark, d, ["k"], bases)
    bad = got.where(F.col(ROWID) != F.col("k")).count()  # k IS the rank
    assert bad == 0
    # unsorted data must be rejected
    df.repartition(4).write.parquet(str(tmp_path / "unsorted"))
    assert sorted_parquet_bases(str(tmp_path / "unsorted"), ["k"]) is None


def test_randomized_mutation_sequence_vs_list_oracle(store, spark):
    rng = random.Random(42)
    store.put("p", particles(spark, n=20), order_by=["lati"])
    t = store["p"]
    oracle = [(i, 1, 100.0, 20.0) for i in range(1, 21)]
    next_key = 1000
    for step in range(8):
        op = rng.choice(["append", "insert", "delete", "update"])
        if op == "append":
            k = rng.randint(1, 3)
            t.append(particles(spark, n=k, start=next_key))
            oracle.extend((i, 1, 100.0, 20.0) for i in range(next_key, next_key + k))
            next_key += k
        elif op == "insert":
            i = rng.randint(0, len(oracle))
            t.insert(i, particles(spark, n=1, start=next_key))
            oracle.insert(i, (next_key, 1, 100.0, 20.0))
            next_key += 1
        elif op == "delete":
            a = rng.randint(0, len(oracle) - 2)
            b = min(len(oracle) - 1, a + rng.randint(0, 2))
            t.delete(a, b)
            del oracle[a : b + 1]
        else:
            i = rng.randint(0, len(oracle) - 1)
            t.update(i, particles(spark, n=1, start=next_key))
            oracle[i] = (next_key, 1, 100.0, 20.0)
            next_key += 1
        assert t.nrows == len(oracle), f"step {step} ({op}): count"
    assert rows_of(t.df()) == oracle
