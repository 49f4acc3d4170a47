"""sf100 fourth-decade sweep (round-11 verdict ask #5): the flagship paths
at 600M-row lineitem / 5M docs / 150M orders — q01 (zero-shuffle sorted
rowid), x90 (dedup-first clean-corpus pipeline), q09 (mutation suite).

Usage: python tools/sweep_sf100.py [/tmp/sf100] [query ...]
Warm best-of-2 noop-write per query, per-window steal bookended.
"""
import sys, time, json
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "64g")
         .config("spark.driver.maxResultSize", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import nimhdfstore_spark.queries as Q
Q.load_all()

def steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8])

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
names = sys.argv[2:] or ["q01_full_scan", "x90_pipeline_clean_corpus",
                         "q09_mutation_suite"]
out = {}
for name in names:
    times = []
    for i in range(2):
        s0 = steal(); t0 = time.perf_counter()
        Q.QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0; s1 = steal()
        times.append(dt)
        print(f"{name} run{i}: {dt:.1f} s (steal ticks {s1-s0})", flush=True)
    out[name] = min(times)
    print(f"BEST {name}: {min(times):.1f} s", flush=True)
print(json.dumps({"sf": 100, "best": out}), flush=True)
