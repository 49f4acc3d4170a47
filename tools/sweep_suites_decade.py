import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import nimhdfstore_spark.queries as Q
Q.load_all()

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])

names = ["q34_incremental_suite", "q29_ingest_suite", "x210_tpch_suite",
         "x211_media_decode_suite", "x212_text_quality_suite",
         "x213_stats_suite", "x214_sketch_suite", "x215_rollup_suite",
         "x216_window_cube_suite"]
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/sf1"):
    for name in names:
        best, st = None, None
        for i in range(2):
            s0 = steal(); t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if best is None or dt < best: best, st = dt, steal()-s0
        print(f"{sf.split('/')[-1]:6s} {name:28s} best {best:6.2f} s (last steal {st})", flush=True)
