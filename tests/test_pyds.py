"""Python DataSource connector (sources/pyds.py): schema mapping, value
round-trip vs the library read path, catalog-based partition pruning under
filter pushdown, hardlink resolution, and array-column support."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from nimhdfstore_spark.rowid import ROWID
from nimhdfstore_spark.sources.pyds import StoreDataSource, StoreReader
from nimhdfstore_spark.store import Store


@pytest.fixture()
def pstore(spark, tmp_path):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(StoreDataSource)
    store = Store(spark, str(tmp_path / "pstore"), rows_per_file=10)
    df = spark.createDataFrame(
        [(i, i * 2, float(i) / 4, f"n{i}") for i in range(50)],
        f"{ROWID} long, v long, x double, s string",
    )
    store.put("t", df)
    return store


def _read(spark, store, table):
    return (
        spark.read.format("nimhdfstore")
        .option("store", store.root)
        .option("table", table)
        .load()
    )


class TestPythonDataSource:
    def test_values_match_library_path(self, spark, pstore):
        back = _read(spark, pstore, "t")
        lib = pstore.table("t").df()
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, lib.collect())
        )

    def test_filtered_read_exact(self, spark, pstore):
        out = _read(spark, pstore, "t").where(
            F.col(ROWID).between(12, 17)
        ).orderBy(ROWID)
        assert [r["v"] for r in out.collect()] == [24, 26, 28, 30, 32, 34]

    def test_partition_pruning(self, pstore):
        r = StoreReader(
            {"store": pstore.root, "table": "t"}, [ROWID, "v", "x", "s"]
        )
        assert len(r.partitions()) == 5
        kept = r.pushFilters(
            [GreaterThanOrEqual((ROWID,), 12), LessThanOrEqual((ROWID,), 17)]
        )
        # every filter handed back to Spark for row-exact re-evaluation
        assert len(list(kept)) == 2
        assert len(r.partitions()) == 1

    def test_disjoint_bounds_empty(self, spark, pstore):
        r = StoreReader({"store": pstore.root, "table": "t"}, [ROWID])
        r.pushFilters([GreaterThanOrEqual((ROWID,), 1000)])
        assert r.partitions() == []
        out = _read(spark, pstore, "t").where(F.col(ROWID) >= 1000)
        assert out.count() == 0

    def test_hardlink_resolves(self, spark, pstore):
        pstore.link("t", "alias")
        assert _read(spark, pstore, "alias").count() == 50

    def test_array_column(self, spark, pstore):
        df = spark.createDataFrame(
            [(i, [float(i), float(i + 1)]) for i in range(20)],
            f"{ROWID} long, vec array<double>",
        )
        pstore.put("arr", df)
        back = _read(spark, pstore, "arr").orderBy(ROWID)
        rows = back.collect()
        assert rows[3]["vec"] == [3.0, 4.0]
        assert back.schema["vec"].dataType.simpleString() == "array<double>"


class TestPythonDataSourceWriter:
    def _write(self, spark, root, mode="overwrite", n=40):
        from nimhdfstore_spark.rowid import with_rowid

        df = spark.createDataFrame(
            [(i, i * 3, f"z{i}") for i in range(n)], "k long, v long, s string"
        )
        body = with_rowid(df, ["k"]).repartitionByRange(4, F.col(ROWID))
        (
            body.write.format("nimhdfstore")
            .option("store", root)
            .option("table", "t")
            .mode(mode)
            .save()
        )

    def test_connector_write_library_read(self, spark, tmp_path):
        spark.dataSource.register(StoreDataSource)
        root = str(tmp_path / "wstore")
        self._write(spark, root)
        t = Store(spark, root).table("t")
        assert t.nrows == 40
        # positional semantics intact through the foreign write path
        assert [r["k"] for r in t[5:9].collect()] == [5, 6, 7, 8]
        # multi-file catalog sorted by lo
        los = [e["lo"] for e in t._meta["files"]]
        assert los == sorted(los)

    def test_no_clobber_without_overwrite(self, spark, tmp_path):
        spark.dataSource.register(StoreDataSource)
        root = str(tmp_path / "wstore2")
        self._write(spark, root)
        with pytest.raises(Exception, match="exists"):
            self._write(spark, root, mode="append")
        # original intact
        assert Store(spark, root).table("t").nrows == 40

    def test_overwrite_bumps_snapshot(self, spark, tmp_path):
        spark.dataSource.register(StoreDataSource)
        root = str(tmp_path / "wstore3")
        self._write(spark, root)
        self._write(spark, root, n=10)
        store = Store(spark, root)
        assert store.table("t").nrows == 10
        assert len(store.snapshots("t")) >= 1

    def test_staging_cleaned(self, spark, tmp_path):
        import os

        spark.dataSource.register(StoreDataSource)
        root = str(tmp_path / "wstore4")
        self._write(spark, root)
        left = [d for d in os.listdir(os.path.join(root, "t"))
                if d.startswith("_staging")]
        assert left == []
