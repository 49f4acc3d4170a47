#!/usr/bin/env python
"""sf10 q01 IO-cache spread probe (round-9 verdict ask #7).

BASELINE.md's sorted-sf10 row recorded q01 (full-scan + canonical rowid,
zero-shuffle footer path) spreading 5.1-43 s across page-cache states.
This measures whether the spread is pure IO:

  1. drop the page cache, run q01 (cold),
  2. run it again immediately (second-cold: readahead + whatever the first
     run left cached),
  3. run it a third time (warm),
  4. drop the cache again and repeat with
     spark.sql.files.maxPartitionBytes=32m (more, smaller splits -> more
     concurrent read streams against a cold device).

One JSON line per configuration. Requires /tmp/sf10 (tools/make_sf1.py)
and root for /proc/sys/vm/drop_caches.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF10_DIR", "/tmp/sf10")


def drop_caches() -> bool:
    try:
        subprocess.run(["sync"], check=True)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def run_config(max_partition_bytes: str | None) -> dict:
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[32]")
        .appName("sf10-iocache")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if max_partition_bytes:
        b = b.config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import nimhdfstore_spark.queries as Q

    Q.load_all()
    q01 = Q.QUERIES["q01_full_scan"]

    cold_ok = drop_caches()
    out = {"maxPartitionBytes": max_partition_bytes or "default(128m)",
           "cache_dropped": cold_ok, "runs_s": []}
    for _ in range(3):  # cold, second-cold (readahead), warm
        t0 = time.perf_counter()
        q01(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out["runs_s"].append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
    spark.stop()
    return out


def main() -> None:
    # one PROCESS per config: the sorted-parquet verification memo
    # (tables._SORTED_CACHE) is process-level, so a second in-process
    # config would skip the cold footer+key verification the first paid
    if len(sys.argv) > 1:
        print(json.dumps(run_config(
            None if sys.argv[1] == "default" else sys.argv[1])))
        return
    results = []
    for conf in ("default", "32m"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), conf],
            capture_output=True, text=True, check=True,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    print(json.dumps({"sf": 10, "query": "q01_full_scan",
                      "configs": results}))


if __name__ == "__main__":
    main()
