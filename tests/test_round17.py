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
