"""Dump `.explain("formatted")` for named registry queries.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> name...

Runs the registry from <repo_root> (so a git worktree of an older commit
yields that commit's plans) and writes <out_dir>/<name>_<suffix>.txt.
"""
import contextlib
import io
import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import nimhdfstore_spark.queries as Q  # noqa: E402

Q.load_all()
os.makedirs(out_dir, exist_ok=True)
for name in names:
    try:
        df = Q.QUERIES[name](spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"ok {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    try:
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
    except Exception:
        pass
spark.stop()
