"""Per-query profiler for the optimization rounds: run named registry
queries repeatedly under the bench session config, timing each run through
the same noop sink as bench.py, optionally dumping `.explain("formatted")`
and a driver-side cProfile.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--explain OUTDIR]
                                [--cprofile] name [name ...]

Timing methodology is bench.py's: build the DataFrame inside the timed
region, materialize via noop, clear caches/temp views after (uncounted).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("names", nargs="+")
p.add_argument("--sf", default="/root/testdata/sf0.1")
p.add_argument("--runs", type=int, default=3)
p.add_argument("--explain", default=None, help="dir for <name>.txt explain dumps")
p.add_argument("--cprofile", action="store_true")
p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
args = p.parse_args()

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{args.cpus}]")
    .appName("profile-query")
    .config("spark.sql.shuffle.partitions", str(args.cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .config(
        "spark.driver.extraJavaOptions",
        "-XX:ReservedCodeCacheSize=512m",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import nimhdfstore_spark.queries as Q  # noqa: E402

Q.load_all()

# same uncounted warmup as bench.py
try:
    Q.QUERIES["q03_positional_suite"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
except Exception:
    pass
try:
    from nimhdfstore_spark.sources.pyds import ensure_registered

    ensure_registered(spark)
except Exception:
    pass


def hygiene():
    try:
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
    except Exception:
        pass


def steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


for name in args.names:
    fn = Q.QUERIES[name]
    times = []
    for i in range(args.runs):
        s0 = steal()
        t0 = time.perf_counter()
        if args.cprofile and i == args.runs - 1:
            import cProfile
            import pstats

            pr = cProfile.Profile()
            pr.enable()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            pr.disable()
            sec = time.perf_counter() - t0
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print(f"--- cProfile (driver side) for {name} ---")
            st.print_stats(30)
        else:
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
        times.append(sec)
        print(
            f"{name} run {i + 1}/{args.runs}: {sec:.3f} s"
            f" (steal {steal() - s0:.1f} s)",
            flush=True,
        )
        if args.explain and i == 0:
            os.makedirs(args.explain, exist_ok=True)
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(txt)
        hygiene()
    print(f"== {name}: min {min(times):.3f} s over {args.runs} runs ==", flush=True)

spark.stop()
