"""Full-registry oracle sweep: run EVERY registry query against its DuckDB
oracle at sf0.01 in one fresh session (the builder-side mirror of the
driver's CORRECTNESS check; same compare as tests/_compare.py).

Usage: python tools/check_registry.py [sf_dir] [name ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import nimhdfstore_spark.queries as Q  # noqa: E402
from tests._compare import assert_matches, canonicalize  # noqa: E402

Q.load_all()
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2:] or list(Q.sweep_order())
ok, bad = 0, []
for i, name in enumerate(names):
    t0 = time.perf_counter()
    try:
        df = Q.QUERIES[name](spark, sf)
        if name in Q.ORACLE:
            assert_matches(df, Q.ORACLE[name], sf, name)
        else:
            n = len(canonicalize(df.toPandas()))
            assert n >= 0
        ok += 1
        print(f"[{i + 1}/{len(names)}] {name}: OK ({time.perf_counter() - t0:.1f} s)", flush=True)
    except Exception as e:  # noqa: BLE001
        bad.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
print(json.dumps({"green": ok, "red": bad, "total": len(names)}), flush=True)
