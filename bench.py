#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized through the `noop` sink (full computation, no
driver-side collect skew). Each query is timed end-to-end including its own
plan/IO; the Spark session is shared (startup excluded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("nimhdfstore-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # The driver json-parses the tail of combined output; progress bars
        # and late stderr lines can displace the final JSON line (round-1
        # BENCH tail ended in a FutureWarning, parsed:null). Keep the
        # console quiet and print the line after spark.stop().
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        # 43 queries' generated classes live in one JVM; the default ~240 MB
        # JIT code cache fills mid-run and compilation of the biggest
        # whole-stage-codegen expressions then stalls for tens of seconds.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -Xlog:gc:/tmp/bench_gc.log",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from nimhdfstore_spark import queries as registry

    registry.load_all()

    # JIT/codepath warmup (uncounted): one tiny end-to-end query so the first
    # measured query doesn't absorb JVM warmup. Runs at sf0.001, not the
    # bench scale factor — no bench-data caching.
    try:
        registry.QUERIES["q06_hyperslab"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep benching; report the failure
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        # Per-query hygiene (uncounted): drop cached blocks (rowid pins a
        # sorted copy per load_pos) and streaming memory-sink tables so state
        # doesn't accumulate across 43 queries and skew later timings.
        try:
            spark.catalog.clearCache()
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
        except Exception:
            pass
    detail = {
        "metric": "declared_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }
    if failures:
        detail["failures"] = failures
    # Full-name per-query timings for humans / the judge.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    # The driver captures only the last few KB of stdout and json-parses the
    # final line; with 80+ queries the full-name dict overflows that buffer
    # (round-2 BENCH recorded parsed:null). Emit a compact line: short query
    # ids (prefix before first '_'), 2-decimal seconds, no spaces. Full names
    # are in bench_detail.json and BASELINE.md.
    out = {
        "metric": "declared_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k.split("_", 1)[0]: round(v, 2) for k, v in sorted(timings.items())},
        "sf": sf_num,
    }
    if failures:
        out["failures"] = {k.split("_", 1)[0]: v[:60] for k, v in failures.items()}
    # The driver's capture window is 2000 bytes of combined-output tail
    # (BENCH_r03 `tail` was exactly 2000 chars, front-clipped mid-JSON, so
    # parsed:null three rounds running). Shrink the line until it fits with
    # margin: full dict if it fits, else total + top-K heaviest queries.
    line = json.dumps(out, separators=(",", ":"))
    for k in (40, 30, 20, 15, 10, 5):
        if len(line) <= 1700:
            break
        heavy = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:k])
        out["queries"] = {n.split("_", 1)[0]: round(v, 2) for n, v in heavy.items()}
        out["queries_note"] = f"top{k}_by_sec_full_list_in_bench_detail.json"
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1700 and "failures" in out:  # last resort: count, not text
        out["failures"] = {"count": len(failures)}
        line = json.dumps(out, separators=(",", ":"))
    # Stop Spark BEFORE printing: stop() (and executor teardown) can emit
    # trailing log lines that would displace the JSON line from the tail of
    # combined stdout+stderr the driver parses.
    spark.stop()
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
