"""Round-17 pins — ADVICE r11 on the catalog read path:

1. ``FileCatalogBackend.get`` is lock-free read-committed (Store.table()
   heals on every open; a GET that queues behind the server flock
   serializes all opens on the commit lock) and caches the parsed catalog
   image by file identity, so opens of an unchanged catalog don't re-parse
   a JSON that grows with table count.
2. ``Store.table()`` re-runs the mirror heal on the RESOLVED hardlink
   target: before, a cas.post_publish crash on the target left a link open
   serving the target's stale mirror forever.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

from nimhdfstore_spark.store import (
    ConditionalPutCommitter,
    FileCatalogBackend,
    Store,
)


def test_catalog_get_does_not_queue_behind_server_lock(tmp_path):
    """A GET must return promptly while a (hung) writer holds the server
    flock — previously it blocked up to LOCK_TIMEOUT_S (30 s) and then
    raised, serializing every Store.table() open on the commit lock."""
    import fcntl

    cat = str(tmp_path / "catalog.json")
    backend = FileCatalogBackend(cat)
    backend.put_if(("/r", "t"), {"version": 1, "current": "snap-1"},
                   0, False, mirror=lambda: None)
    with open(cat + ".srv", "w") as lk:
        fcntl.flock(lk.fileno(), fcntl.LOCK_EX)  # hung writer
        t0 = time.monotonic()
        e = backend.get(("/r", "t"))
        elapsed = time.monotonic() - t0
    assert e is not None and e["version"] == 1
    assert elapsed < 5.0, f"get() queued behind the server lock: {elapsed:.1f}s"


def test_catalog_get_cache_tracks_publishes(tmp_path):
    cat = str(tmp_path / "catalog.json")
    backend = FileCatalogBackend(cat)
    assert backend.get(("/r", "t")) is None
    backend.put_if(("/r", "t"), {"version": 1, "current": "a"},
                   0, False, mirror=lambda: None)
    assert backend.get(("/r", "t"))["version"] == 1
    # cached read: same file identity, parsed image reused — and the
    # returned copy is safe to mutate without corrupting the cache
    e = backend.get(("/r", "t"))
    e["version"] = 999
    assert backend.get(("/r", "t"))["version"] == 1
    # a publish swaps the inode and invalidates the cache
    backend.put_if(("/r", "t"), {"version": 2, "current": "b"},
                   1, False, mirror=lambda: None)
    assert backend.get(("/r", "t"))["version"] == 2
    # a SECOND handle (fresh cache) sees the same committed state
    assert FileCatalogBackend(cat).get(("/r", "t"))["version"] == 2


_LINK_CRASH_WORKER = '''
import os, sys
sys.path.insert(0, "/root/repo")
root, cat = sys.argv[1:3]
os.environ["SPARK_GRAFT_CRASH_POINT"] = "cas.post_publish"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from nimhdfstore_spark.store import (
    ConditionalPutCommitter, FileCatalogBackend, Store,
)
committer = ConditionalPutCommitter(FileCatalogBackend(cat))
t = Store(spark, root, committer=committer).table("t")
t.append(spark.createDataFrame([(100, 100.0)], "k long, v double"))
print("NO-CRASH")
'''


def test_hardlink_open_heals_resolved_target_mirror(spark, tmp_path):
    """cas.post_publish crash on the TARGET of a hardlink: the catalog
    committed the append, the target's local mirror did not. Opening the
    LINK in a fresh handle must serve the committed state (the heal must
    run on the resolved target, not just the link entry)."""
    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")

    def make_store():
        return Store(
            spark, root,
            committer=ConditionalPutCommitter(FileCatalogBackend(cat)),
        )

    s = make_store()
    s.put("t", spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                     "k long, v double"), order_by=["k"])
    s.link("t", "l")

    script = tmp_path / "crasher.py"
    script.write_text(_LINK_CRASH_WORKER)
    p = subprocess.run(
        [sys.executable, str(script), root, cat],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (
        f"child was not SIGKILLed: rc={p.returncode}\n{p.stdout}\n"
        f"{p.stderr[-1500:]}"
    )
    assert "NO-CRASH" not in p.stdout

    # the catalog is ahead of the target's mirror; open via the LINK
    got = sorted(
        r["k"] for r in make_store().table("l").df().collect()
    )
    assert got == [1, 2, 100], (
        f"link open served the target's stale pre-crash mirror: {got}"
    )


# --------------------------------------------------------------------------
# Round-11 verdict ask #4: crash injection INSIDE the data write (mid-stage,
# before any rename) and inside vacuum's reclaim loop. The staged dir is
# debris the protocol must never surface; vacuum must be re-runnable from
# any partial sweep with no retained snapshot lost.
# --------------------------------------------------------------------------

_STAGE_CRASH_WORKER = '''
import os, sys
sys.path.insert(0, "/root/repo")
root, kind, cat, point = sys.argv[1:5]
os.environ["SPARK_GRAFT_CRASH_POINT"] = point
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from nimhdfstore_spark.store import (
    ConditionalPutCommitter, FileCatalogBackend, LockfileCommitter, Store,
)
committer = (
    LockfileCommitter() if kind == "lockfile"
    else ConditionalPutCommitter(FileCatalogBackend(cat))
)
t = Store(spark, root, rows_per_file=2, committer=committer).table("t")
# touches ONE file; the others hardlink (keep), so stage.mid_link fires
t.update(1, spark.createDataFrame([(1, 777.0)], "k long, v double"))
print("NO-CRASH")
'''

_STAGE_CASES = [
    (kind, point)
    for kind in ("lockfile", "condput")
    for point in ("stage.mid_data", "stage.post_data", "stage.mid_link")
]


@pytest.mark.parametrize("kind,point", _STAGE_CASES)
def test_crash_mid_stage_leaves_invisible_debris(spark, tmp_path, kind, point):
    from nimhdfstore_spark.store import (
        ConditionalPutCommitter,
        FileCatalogBackend,
        LockfileCommitter,
        Store,
        StoreError,
    )

    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")

    def make_store():
        committer = (
            LockfileCommitter() if kind == "lockfile"
            else ConditionalPutCommitter(FileCatalogBackend(cat))
        )
        return Store(spark, root, rows_per_file=2, committer=committer)

    seed = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k long, v double"
    )
    make_store().put("t", seed, order_by=["k"])  # 3 files of 2 rows

    script = tmp_path / "crasher.py"
    script.write_text(_STAGE_CRASH_WORKER)
    p = subprocess.run(
        [sys.executable, str(script), root, kind, cat, point],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (
        f"child was not SIGKILLed at {point}: rc={p.returncode}\n"
        f"{p.stdout}\n{p.stderr[-1500:]}"
    )
    assert "NO-CRASH" not in p.stdout

    # nothing was renamed or published: fresh handles serve the seed
    store = make_store()
    t = store.table("t")
    got = sorted((r["k"], r["v"]) for r in t.df().collect())
    assert got == [(i, float(i)) for i in range(6)], got

    # the crashed attempt's staging dir is on disk but INVISIBLE
    tdir = os.path.join(root, "t")
    debris = [e for e in os.listdir(tdir) if e.startswith(".tmp-snap-")]
    assert debris, f"{point}: expected a .tmp-snap- staging dir"
    assert store.snapshots("t") == [0]
    with pytest.raises(StoreError):
        store.table("t", snapshot=1)

    # young debris survives vacuum (a LIVE commit's staging dir must never
    # be yanked); age-gated debris is reclaimed on the next vacuum
    store.vacuum()
    assert [e for e in os.listdir(tdir) if e.startswith(".tmp-snap-")]
    old = time.time() - 2 * 86400
    for e in debris:
        os.utime(os.path.join(tdir, e), (old, old))
    store.vacuum()
    assert not [e for e in os.listdir(tdir) if e.startswith(".tmp-snap-")]
    # and the table still reads after the reclaim
    assert t.nrows == 6

    # a fresh writer commits cleanly over the debris history
    t2 = make_store().table("t")
    t2.update(1, spark.createDataFrame([(1, 888.0)], "k long, v double"))
    assert sorted(r["v"] for r in t2.df().where("k = 1").collect()) == [888.0]


# --------------------------------------------------------------------------
# Round-11 verdict ask #6: flaky-PUT fault model — transient, AMBIGUOUS
# conditional-PUT failures (the 5xx/connection-reset shape a real object
# store serves), injected before and after the server-side apply. The
# committer's GET-and-match-txn loop must converge with no lost and no
# doubled commit.
# --------------------------------------------------------------------------


class _FlakyBackend:
    """Wraps a real backend; each put_if consumes one schedule entry:
    'ok'     — pass through untouched
    'before' — fault WITHOUT applying (request never reached the server)
    'after'  — apply (or refuse) server-side, then fault (response lost)
    """

    def __init__(self, inner, schedule):
        self.inner = inner
        self.schedule = list(schedule)
        self.faults = 0

    def put_if(self, key, meta, expected_version, require_same_uid,
               mirror, seed=None):
        from nimhdfstore_spark.store import TransientBackendError

        mode = self.schedule.pop(0) if self.schedule else "ok"
        if mode == "before":
            self.faults += 1
            raise TransientBackendError("injected pre-apply fault")
        reason = self.inner.put_if(
            key, meta, expected_version, require_same_uid,
            mirror=mirror, seed=seed,
        )
        if mode == "after":
            self.faults += 1
            raise TransientBackendError("injected post-apply fault")
        return reason

    def get(self, key):
        return self.inner.get(key)

    def delete(self, key):
        return self.inner.delete(key)

    def delete_store(self, root):
        return self.inner.delete_store(root)


def _flaky_store(spark, root, cat, schedule):
    from nimhdfstore_spark.store import (
        ConditionalPutCommitter, FileCatalogBackend,
    )

    backend = _FlakyBackend(FileCatalogBackend(cat), schedule)
    return Store(
        spark, root, committer=ConditionalPutCommitter(backend)
    ), backend


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schedule=st.lists(
    st.sampled_from(["ok", "before", "after"]), min_size=0, max_size=10,
))
def test_flaky_put_converges_exactly_once(spark, tmp_path_factory, schedule):
    """Any schedule of ambiguous faults over a run of appends: every commit
    lands EXACTLY once (post-apply faults must not double on retry,
    pre-apply faults must not lose the commit), catalog == mirror."""
    tmp_path = tmp_path_factory.mktemp("flaky")
    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")

    s, backend = _flaky_store(spark, root, cat, schedule)
    s.put("t", spark.createDataFrame([(0, 0.0)], "k long, v double"),
          order_by=["k"])
    t = s.table("t")
    for i in range(1, 4):
        t.append(
            spark.createDataFrame([(i, float(i))], "k long, v double")
        )

    # exactly-once: every append present, none doubled
    got = sorted(r["k"] for r in s.table("t").df().collect())
    assert got == [0, 1, 2, 3], got
    # catalog and mirror agree on the committed version
    entry = backend.get((s._realroot, "t"))
    assert entry is not None
    assert int(s._read_meta("t")["version"]) == int(entry["version"])
    assert s._read_meta("t")["current"] == entry["current"]


def test_flaky_put_exhaustion_raises_and_loses_nothing(spark, tmp_path):
    from nimhdfstore_spark.store import (
        ConditionalPutCommitter, TransientBackendError,
    )

    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")
    dead = ["before"] * (2 * (1 + ConditionalPutCommitter.TRANSIENT_RETRIES))
    s, backend = _flaky_store(spark, root, cat, [])
    s.put("t", spark.createDataFrame([(0, 0.0)], "k long, v double"),
          order_by=["k"])
    s2, _ = _flaky_store(spark, root, cat, dead)
    t = s2.table("t")
    with pytest.raises(TransientBackendError):
        t.append(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    # nothing committed, nothing visible; a healthy handle proceeds
    s3, _ = _flaky_store(spark, root, cat, [])
    assert sorted(r["k"] for r in s3.table("t").df().collect()) == [0]
    t3 = s3.table("t")
    t3.append(spark.createDataFrame([(2, 2.0)], "k long, v double"))
    assert sorted(r["k"] for r in s3.table("t").df().collect()) == [0, 2]


def test_flaky_put_with_concurrent_writer_no_lost_update(spark, tmp_path):
    """A flaky writer and a clean writer interleave on the same table:
    every committed append survives, none doubles, rowids stay dense."""
    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")
    s, _ = _flaky_store(spark, root, cat, [])
    s.put("t", spark.createDataFrame([(0, 0.0)], "k long, v double"),
          order_by=["k"])

    flaky, _ = _flaky_store(
        spark, root, cat, ["after", "before", "ok", "after", "before"]
    )
    clean, _ = _flaky_store(spark, root, cat, [])

    import threading

    errs = []

    def writer(store, lo):
        try:
            for i in range(lo, lo + 3):
                h = store.table("t")
                h.append(spark.createDataFrame(
                    [(i, float(i))], "k long, v double"
                ))
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    th1 = threading.Thread(target=writer, args=(flaky, 10))
    th2 = threading.Thread(target=writer, args=(clean, 20))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs

    rows = s.table("t").df().collect()
    ks = sorted(r["k"] for r in rows)
    assert ks == [0, 10, 11, 12, 20, 21, 22], ks
    rowids = sorted(r["_rowid"] for r in rows)
    assert rowids == list(range(7)), rowids


_VACUUM_CRASH_WORKER = '''
import os, sys
sys.path.insert(0, "/root/repo")
root, kind, cat = sys.argv[1:4]
os.environ["SPARK_GRAFT_CRASH_POINT"] = "vacuum.mid_reclaim"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from nimhdfstore_spark.store import (
    ConditionalPutCommitter, FileCatalogBackend, LockfileCommitter, Store,
)
committer = (
    LockfileCommitter() if kind == "lockfile"
    else ConditionalPutCommitter(FileCatalogBackend(cat))
)
Store(spark, root, keep_snapshots=5, committer=committer).vacuum(retain=3)
print("NO-CRASH")
'''


@pytest.mark.parametrize("kind", ["lockfile", "condput"])
def test_crash_mid_vacuum_is_rerunnable(spark, tmp_path, kind):
    from nimhdfstore_spark.store import (
        ConditionalPutCommitter,
        FileCatalogBackend,
        LockfileCommitter,
        Store,
    )

    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")

    def make_store():
        committer = (
            LockfileCommitter() if kind == "lockfile"
            else ConditionalPutCommitter(FileCatalogBackend(cat))
        )
        return Store(spark, root, keep_snapshots=5, committer=committer)

    s = make_store()
    s.put("t", spark.createDataFrame([(0, 0.0)], "k long, v double"),
          order_by=["k"])
    t = s.table("t")
    for i in range(1, 5):  # snapshots 2..5 retained alongside 1
        t.append(spark.createDataFrame([(i, float(i))], "k long, v double"))
        t = s.table("t")
    assert len(s.snapshots("t")) == 5

    script = tmp_path / "crasher.py"
    script.write_text(_VACUUM_CRASH_WORKER)
    p = subprocess.run(
        [sys.executable, str(script), root, kind, cat],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (
        f"child was not SIGKILLed: rc={p.returncode}\n{p.stdout}\n"
        f"{p.stderr[-1500:]}"
    )

    # the partial sweep removed SOME doomed snapshot, kept the rest
    s2 = make_store()
    left = s2.snapshots("t")
    assert set(left) >= {2, 3, 4}, left  # no RETAINED snapshot lost
    assert len(left) < 5  # the crashed sweep did reclaim something

    # re-run converges to exactly the newest 3; current still serves
    s2.vacuum(retain=3)
    assert s2.snapshots("t") == [2, 3, 4]
    assert sorted(r["k"] for r in s2.table("t").df().collect()) == [0, 1, 2, 3, 4]
    # historical retained snapshot still readable after the reclaim
    assert sorted(
        r["k"] for r in s2.table("t", snapshot=3).df().collect()
    ) == [0, 1, 2, 3]


# --------------------------------------------------------------------------
# q01 exchange-free plan gate (round-11 verdict ask #5's first find): the
# flagship full scan's trailing orderBy(_rowid) forced a full-data range
# exchange — ~80 GB of shuffle at sf100 — to re-impose an order the sorted
# scan already has and the _rowid VALUE already encodes. The scan must stay
# a pure projection: no exchange, no sort, rowid from file metadata.
# --------------------------------------------------------------------------

def test_q01_plan_is_exchange_free(spark, tmp_path):
    import pyarrow.parquet as pq

    import nimhdfstore_spark.queries as Q

    Q.load_all()
    # q01 on a canonical-key-SORTED source (the layout Store.put produces
    # and the sf1/sf10/sf100 replicas ship): rowid must come from file
    # metadata — a pure projection, no exchange, no sort. On an unsorted
    # source the rank fallback pays its documented shuffle; that path is
    # covered by test_properties_ops.
    src = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    src = src.sort_by([("l_orderkey", "ascending"), ("l_linenumber", "ascending")])
    pq.write_table(src, str(tmp_path / "lineitem.parquet"))
    df = Q.QUERIES["q01_full_scan"](spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Sort" not in plan, plan
    assert df.count() == src.num_rows
