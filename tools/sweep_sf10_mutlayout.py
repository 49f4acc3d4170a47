"""sf10 mutation/layout sweep (round-11 verdict ask #4): q09's mutation
legs and q33's layout legs at 60M-row lineitem, warm best-of-2."""
import sys, time, os
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import nimhdfstore_spark.queries as Q
Q.load_all()

def steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8])

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
for name in ("q09_mutation_suite", "q33_layout_suite"):
    times = []
    for i in range(2):
        s0 = steal(); t0 = time.perf_counter()
        Q.QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0; s1 = steal()
        times.append(dt)
        print(f"{name} run{i}: {dt:.1f} s (steal ticks {s1-s0})", flush=True)
    print(f"BEST {name}: {min(times):.1f} s", flush=True)
