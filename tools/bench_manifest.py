#!/usr/bin/env python
"""Manifest-scale measurement (round-8 verdict ask #3): at ~100k files per
table, what does one append COMMIT cost (meta serialize + CAS flip under
the lock + hardlink loop) and what does read-path planning cost from the
catalog? Builds a synthetic table of N tiny files directly with pyarrow
(the snapshot layout `Store` itself writes), then times the real code
paths. Run: python tools/bench_manifest.py [n_files ...]"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_FILE = 10


def build_table(spark, root: str, n_files: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(root, ignore_errors=True)
    snap = os.path.join(root, "t", "snap-00000000")
    os.makedirs(snap)
    entries = []
    for i in range(n_files):
        lo = i * ROWS_PER_FILE
        name = f"part-{i:06d}.parquet"
        tbl = pa.table({
            "_rowid": np.arange(lo, lo + ROWS_PER_FILE, dtype=np.int64),
            "k": np.arange(lo, lo + ROWS_PER_FILE, dtype=np.int64),
        })
        pq.write_table(tbl, os.path.join(snap, name), compression="snappy")
        entries.append(
            {"name": name, "rows": ROWS_PER_FILE, "lo": lo,
             "hi": lo + ROWS_PER_FILE - 1}
        )
    meta = {
        "current": "snap-00000000",
        "uid": uuid.uuid4().hex,
        "codec": "snappy",
        "attrs": {},
        "order_by": [],
        "files": entries,
        "count": n_files * ROWS_PER_FILE,
        "version": 1,
    }
    with open(os.path.join(root, "t", "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def measure(spark, n_files: int) -> dict:
    from pyspark.sql import functions as F

    from nimhdfstore_spark.store import Store

    root = f"/tmp/manifest_bench/{n_files}"
    t0 = time.perf_counter()
    build_table(spark, root, n_files)
    build_s = time.perf_counter() - t0

    # open: catalog entry -> Table handle
    t0 = time.perf_counter()
    store = Store(spark, root)
    t = store.table("t")
    open_s = time.perf_counter() - t0

    # plan: positional slice through the file catalog (driver-side file
    # pruning + Spark read plan over the surviving file)
    t0 = time.perf_counter()
    mid = n_files * ROWS_PER_FILE // 2
    got = t[mid:mid + 3].collect()
    assert len(got) == 3
    plan_s = time.perf_counter() - t0

    # one append commit, end to end (includes the payload write, the
    # hardlink loop over every kept file, meta serialize + CAS flip)
    payload = spark.createDataFrame(
        [(9_000_000_000 + i,) for i in range(3)], "k long"
    )
    t0 = time.perf_counter()
    t.append(payload, n=3)
    append_s = time.perf_counter() - t0
    # steady state: the first append on a legacy inline meta pays a one-
    # time migration (parse 9 MB + write the initial fold shard); the
    # second shows the per-append cost the sharded catalog settles at
    t0 = time.perf_counter()
    t.append(payload, n=3)
    append2_s = time.perf_counter() - t0

    # raw meta serialize (the under-lock write the commit pays) — with
    # sharded manifests this shrinks from the full file list to shard names
    t0 = time.perf_counter()
    body = json.dumps(t._meta, indent=1, sort_keys=True)
    ser_s = time.perf_counter() - t0
    sharded = "manifests" in t._meta

    # isolate the hardlink loop cost (the local-FS stand-in for manifest
    # reference reuse; an object store pays zero here)
    src = t.snapshot_path
    dst = src + "-linkprobe"
    os.makedirs(dst)
    names = [e["name"] for e in t._ranges()][:n_files]
    t0 = time.perf_counter()
    for nm in names:
        os.link(os.path.join(src, nm), os.path.join(dst, nm))
    link_s = time.perf_counter() - t0
    shutil.rmtree(dst)

    # incremental bloom maintenance at file-count scale: full build once
    # (one distributed scan), then an append must extend it by scanning
    # ONLY the new file — never rebuild over n_files
    t0 = time.perf_counter()
    t.build_bloom("k", bits=256, k=3)
    bloom_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    t.append(payload, n=3)
    bloom_append_s = time.perf_counter() - t0
    assert t.last_index_scan is not None and len(t.last_index_scan) == 1, (
        f"append maintenance scanned {t.last_index_scan}"
    )
    out_probe, scanned, total = t.lookup_eq("k", 9_000_000_001)
    assert out_probe.count() >= 1 and scanned < total

    out = {
        "n_files": n_files,
        "sharded": sharded,
        "meta_bytes": len(body),
        "build_s": round(build_s, 2),
        "open_s": round(open_s, 4),
        "plan_slice_s": round(plan_s, 3),
        "meta_serialize_s": round(ser_s, 4),
        "append_commit_s": round(append_s, 3),
        "append_steady_s": round(append2_s, 3),
        "bloom_build_s": round(bloom_build_s, 3),
        "bloom_append_s": round(bloom_append_s, 3),
        "hardlink_loop_s": round(link_s, 3),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("manifest-bench")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 50_000, 100_000]
    for n in sizes:
        print(json.dumps(measure(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
