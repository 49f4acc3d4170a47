#!/usr/bin/env python
"""Generate scaled replicas (sf1/sf10/sf100) of the driver's sf0.1 parquet:
a ``reps``× key-shifted replication of every scaling table.

Replication preserves every value distribution while multiplying row
counts ``reps``×; shift units sit above each key's max so copies never
collide. Note the corpus is deliberately DUP-HEAVY (every document/vector
appears ``reps``× verbatim) — that is the adversarial case for
pair-enumeration operators (work grows with Σ clique², i.e. reps²), which
is exactly what the sweep is probing. Usage::

    python tools/make_sf1.py [/tmp/sf1] [reps]

``reps`` (default 10) is the replication factor: 10 → sf1 (~6M lineitem
rows), 100 → sf10 (~60M), 1000 → sf100 (~600M).

Replicas are emitted KEY-SORTED (round-8 verdict ask #6) so the
zero-shuffle sorted-parquet ``_rowid`` projection engages (tables.load_pos)
— the round-11 sf10 sweep paid a 170 s q01 global sort-rank purely because
an earlier generator emitted rows key-unsorted. Since key shifts are
per-copy constants above the key's max, copies occupy DISJOINT ascending
key ranges: sorting the sf0.1 SOURCE once (600k rows, in-memory) and
streaming shifted copies in k-order yields an exactly globally-sorted
output — the earlier DuckDB ``ORDER BY`` over the full cross join sorted
reps×600k rows for the same result (at reps=1000 that is a 600M-row
external sort; the streaming writer replaces it with O(source) memory and
pure sequential IO). ``events`` stays unsorted: its canonical key is
excluded from the fast path by design.
"""

from __future__ import annotations

import os
import shutil
import sys

#: per-table (key column to shift, per-copy shift unit, sort keys or None)
SPECS: dict[str, tuple[str, int, list[str] | None]] = {
    "lineitem": ("l_orderkey", 200_000, ["l_orderkey", "l_linenumber"]),
    "orders": ("o_orderkey", 200_000, ["o_orderkey"]),
    "documents": ("doc_id", 5_000, ["doc_id"]),
    "embeddings": ("vec_id", 2_000, ["vec_id"]),
    "events": ("event_id", 100_000, None),
}

#: target rows per ParquetWriter flush — copies are buffered up to this
#: size so small tables (embeddings: 2k rows/copy) don't degenerate into
#: thousands of tiny row groups
FLUSH_ROWS = 2_000_000


def replicate(src: str, dst: str, name: str, reps: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key, unit, sort = SPECS[name]
    tbl = pq.read_table(f"{src}/{name}.parquet")
    if sort is not None:
        tbl = tbl.sort_by([(c, "ascending") for c in sort])
    ki = tbl.schema.get_field_index(key)
    with pq.ParquetWriter(
        f"{dst}/{name}.parquet", tbl.schema, compression="snappy"
    ) as w:
        buf: list[pa.Table] = []
        buffered = 0
        for k in range(reps):
            shifted = tbl.set_column(
                ki, tbl.schema.field(ki),
                pc.add(tbl.column(ki), pa.scalar(k * unit, tbl.schema.field(ki).type)),
            )
            buf.append(shifted)
            buffered += shifted.num_rows
            if buffered >= FLUSH_ROWS or k == reps - 1:
                w.write_table(pa.concat_tables(buf))
                buf, buffered = [], 0


def main() -> None:
    import pyarrow.parquet as pq

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    os.makedirs(dst, exist_ok=True)
    for name in SPECS:
        replicate(src, dst, name, reps)
        print(f"{name}: done", flush=True)
    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    n = pq.ParquetFile(f"{dst}/lineitem.parquet").metadata.num_rows
    print(f"sf{reps / 10:g} at {dst}: lineitem rows = {n}")


if __name__ == "__main__":
    main()
