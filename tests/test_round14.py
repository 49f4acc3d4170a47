"""Round-10 coverage: delete-to-empty semantics (round-9 verdict #1), the
schema-in-meta catalog entry (verdict #3/#8), and degenerate-input
hardening for the pipeline operators (verdict #5).

The reference's table stays readable at nrecords=0 (``toSeq`` on an empty
table yields an empty seq, nimtables.nim:140-147); a zero-file snapshot
must therefore read as a typed empty frame, not raise
UNABLE_TO_INFER_SCHEMA.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nimhdfstore_spark.rowid import ROWID
from nimhdfstore_spark.store import Store, StoreError


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "s"), keep_snapshots=8)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


def _emptied(spark, store, name="t"):
    t = store.put(name, _kv(spark, [(i, float(i)) for i in range(5)]),
                  order_by=["k"])
    t.delete(0, 4)
    return t


class TestDeleteToEmpty:
    """The recorded round-9 falsifying sequence, explicitly."""

    def test_minimal_falsifying_sequence(self, spark, store):
        t = store.put("t", _kv(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]),
                      order_by=["k"])
        t.delete(0, 2)
        assert t.nrows == 0
        assert t.df().count() == 0
        assert [f.name for f in t.df().schema.fields] == [ROWID, "k", "v"]
        assert [(f.name, f.dataType.simpleString()) for f in t.schema.fields] \
            == [("k", "bigint"), ("v", "double")]

    def test_append_after_empty_restarts_rowids_at_zero(self, spark, store):
        t = _emptied(spark, store)
        t.append(_kv(spark, [(10, 1.5), (11, 2.5)]))
        got = [(r[ROWID], r["k"]) for r in t.df().orderBy(ROWID).collect()]
        assert got == [(0, 10), (1, 11)]

    def test_insert_at_zero_on_empty(self, spark, store):
        t = _emptied(spark, store)
        t.insert(0, _kv(spark, [(7, 7.0)]))
        assert [(r[ROWID], r["k"]) for r in t.df().collect()] == [(0, 7)]

    def test_compact_and_cluster_by_on_empty_stay_empty(self, spark, store):
        t = _emptied(spark, store)
        t.compact()
        assert t.nrows == 0 and t.df().count() == 0
        t.cluster_by("k")
        assert t.nrows == 0 and t.df().count() == 0
        # still appendable afterwards
        t.append(_kv(spark, [(1, 1.0)]))
        assert t.nrows == 1

    def test_positional_mutations_on_empty_raise_cleanly(self, spark, store):
        t = _emptied(spark, store)
        payload = _kv(spark, [(1, 9.0)])
        with pytest.raises(StoreError, match="out of range"):
            t.delete(0)
        with pytest.raises(StoreError, match="out of range"):
            t.update(0, payload)
        with pytest.raises(StoreError, match="out of range"):
            t.delete_deferred(0)
        with pytest.raises(StoreError, match="out of range"):
            t.update_rows(spark.createDataFrame(
                [(0, 1, 9.0)], f"{ROWID} bigint, k bigint, v double"))

    def test_merge_into_empty_inserts(self, spark, store):
        t = _emptied(spark, store)
        res = t.merge(_kv(spark, [(1, 9.0), (2, 8.0)]), "k")
        assert res == {"updated": 0, "inserted": 2}
        assert t.nrows == 2

    def test_changes_since_pre_empty_snapshot(self, spark, store):
        t = store.put("t", _kv(spark, [(1, 1.0), (2, 2.0)]), order_by=["k"])
        base_snap = store.snapshots("t")[-1]
        t.delete(0, 1)
        # changes() emits inserts/updates only — deletions are positional by
        # contract (see docstring). The point here is the empty-frame path
        # doesn't crash and carries the op column.
        ch = t.changes(base_snap)
        assert ch.count() == 0
        assert "op" in ch.columns

    def test_copy_and_combine_of_empty(self, spark, store):
        _emptied(spark, store)
        store.copy("t", "t2")
        assert store.table("t2").nrows == 0
        assert store.table("t2").df().count() == 0
        c = store.combine("t", "t2", "t3")
        assert c.nrows == 0 and c.df().count() == 0

    def test_time_travel_to_empty_snapshot(self, spark, store):
        t = _emptied(spark, store)
        empty_snap = store.snapshots("t")[-1]
        t.append(_kv(spark, [(1, 1.0)]))
        h = store.table("t", snapshot=empty_snap)
        assert h.nrows == 0
        assert h.df().count() == 0
        assert [f.name for f in h.schema.fields] == ["k", "v"]

    def test_bloom_on_empty_extends_on_append(self, spark, store):
        t = _emptied(spark, store)
        idx = t.build_bloom("k")
        assert idx["files"] == {}
        got, kept, total = t.lookup_eq("k", 3)
        assert (got.count(), kept, total) == (0, 0, 0)
        t.append(_kv(spark, [(3, 3.0)]))
        got, kept, total = t.lookup_eq("k", 3)
        assert (got.count(), kept, total) == (1, 1, 1)
        assert t.last_index_scan  # incremental extend, not a rebuild

    def test_zone_scan_on_empty(self, spark, store):
        t = _emptied(spark, store)
        got, kept, total = t.scan_between("k", 1, 2)
        assert (got.count(), kept, total) == (0, 0, 0)

    def test_python_datasource_reads_empty(self, spark, store):
        _emptied(spark, store)
        from nimhdfstore_spark.sources.pyds import ensure_registered

        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        ensure_registered(spark)
        r = (spark.read.format("nimhdfstore")
             .option("store", store.root).option("table", "t").load())
        assert r.count() == 0
        assert [f.name for f in r.schema.fields] == [ROWID, "k", "v"]


class TestSchemaInMeta:
    def test_schema_persisted_at_put(self, spark, store):
        store.put("t", _kv(spark, [(1, 1.0)]), order_by=["k"])
        meta = store._read_meta("t")
        assert "schema" in meta
        import json

        names = [f["name"] for f in json.loads(meta["schema"])["fields"]]
        assert set(names) == {ROWID, "k", "v"}

    def test_schema_property_reads_no_files(self, spark, store, monkeypatch):
        """Table.schema must not plan a scan (verdict #3): poison df() and
        read the schema anyway."""
        t = store.put("t", _kv(spark, [(1, 1.0)]), order_by=["k"])
        monkeypatch.setattr(
            t, "df", lambda: (_ for _ in ()).throw(AssertionError("df() called"))
        )
        assert [f.name for f in t.schema.fields] == ["k", "v"]

    def test_schema_tracks_evolution(self, spark, store):
        t = store.put("t", _kv(spark, [(1, 1.0)]), order_by=["k"])
        t.add_field("w", "int", 7)
        assert [f.name for f in t.schema.fields] == ["k", "v", "w"]
        assert [f.name for f in store.table("t").schema.fields] == ["k", "v", "w"]
        t.drop_field("v")
        assert [f.name for f in store.table("t").schema.fields] == ["k", "w"]

    def test_historical_schema_not_poisoned_by_evolution(self, spark, store):
        t = store.put("t", _kv(spark, [(1, 1.0)]), order_by=["k"])
        old = store.snapshots("t")[-1]
        t.add_field("w", "int", 7)
        h = store.table("t", snapshot=old)
        assert [f.name for f in h.schema.fields] == ["k", "v"]

    def test_legacy_meta_without_schema_still_reads(self, spark, store):
        """Pre-persistence tables (no meta schema) fall back to footers."""
        import json

        t = store.put("t", _kv(spark, [(1, 1.0)]), order_by=["k"])
        mp = store._meta_path("t")
        meta = json.load(open(mp))
        meta.pop("schema")
        json.dump(meta, open(mp, "w"))
        t2 = store.table("t")
        assert [f.name for f in t2.schema.fields] == ["k", "v"]
        assert t2.df().count() == 1
        # and one mutation backfills the persisted schema
        t2.append(_kv(spark, [(2, 2.0)]))
        assert "schema" in store._read_meta("t")

    def test_scan_ranges_foreign_parquet_clear_error(self, spark, tmp_path):
        """ADVICE r9: a parquet file without _rowid must raise StoreError,
        not a bare StopIteration."""
        from nimhdfstore_spark.store import scan_rowid_ranges

        p = str(tmp_path / "foreign")
        _kv(spark, [(1, 1.0)]).write.parquet(p)
        with pytest.raises(StoreError, match=ROWID):
            scan_rowid_ranges(p)
