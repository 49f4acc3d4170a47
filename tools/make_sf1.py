#!/usr/bin/env python
"""Generate the sf1 scaling dataset (~6M-row lineitem) used by the
BASELINE.md decade sweep: a 10× key-shifted replication of the driver's
sf0.1 parquet tables.

Replication preserves every value distribution while multiplying row
counts 10×; shift units sit above each key's max so copies never collide.
Note the corpus is deliberately DUP-HEAVY (every document/vector appears
10× verbatim) — that is the adversarial case for pair-enumeration
operators (work grows with Σ clique², i.e. 100×), which is exactly what
the sweep is probing. Usage::

    python tools/make_sf1.py [/tmp/sf1] [reps]

``reps`` (default 10) is the replication factor: 10 → sf1 (~6M lineitem
rows), 100 → sf10 (~60M). Key shifts are per-copy constants sized above
each key's sf0.1 max, so copies never collide at any ``reps``.
"""

from __future__ import annotations

import os
import shutil
import sys


def main() -> None:
    import duckdb

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    con.execute(f"CREATE VIEW k AS SELECT unnest(range({reps})) AS k")
    # Replicas are emitted KEY-SORTED (round-8 verdict ask #6): the driver's
    # own sf* parquet is canonical-key sorted, which lets the zero-shuffle
    # sorted-parquet ``_rowid`` projection engage (tables.load_pos). The
    # round-11 sf10 sweep paid a 170 s global sort-rank on q01 purely
    # because the k-replication emitted rows key-UNsorted — that cost was
    # an artifact of this generator, not of the engine. ``events`` stays
    # unsorted: its canonical key is excluded from the fast path by design.
    specs = {
        "lineitem": (
            "SELECT l_orderkey + k*200000 AS l_orderkey, l_partkey, l_suppkey,"
            " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
            " l_returnflag, l_linestatus, l_shipdate"
            " FROM read_parquet('{s}/lineitem.parquet'), k"
            " ORDER BY l_orderkey, l_linenumber"
        ),
        "orders": (
            "SELECT o_orderkey + k*200000 AS o_orderkey, o_custkey,"
            " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            " FROM read_parquet('{s}/orders.parquet'), k"
            " ORDER BY o_orderkey"
        ),
        "documents": (
            "SELECT doc_id + k*5000 AS doc_id, text, lang, source, n_chars"
            " FROM read_parquet('{s}/documents.parquet'), k"
            " ORDER BY doc_id"
        ),
        "embeddings": (
            "SELECT vec_id + k*2000 AS vec_id, embedding, label"
            " FROM read_parquet('{s}/embeddings.parquet'), k"
            " ORDER BY vec_id"
        ),
        "events": (
            "SELECT event_id + k*100000 AS event_id, ts, user_id, event_type,"
            " value, props FROM read_parquet('{s}/events.parquet'), k"
        ),
    }
    for name, q in specs.items():
        con.execute(
            f"COPY ({q.format(s=src)}) TO '{dst}/{name}.parquet'"
            " (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/lineitem.parquet')"
    ).fetchone()[0]
    print(f"sf{reps / 10:g} at {dst}: lineitem rows = {n}")


if __name__ == "__main__":
    main()
