"""Round-11 registry pins: ninth/tenth core-merge waves.

q34+q43+q45 fused into q34_incremental_suite (continuous-aggregate
refresh / deletion vectors / incremental join view) and q29+q36+q41 into
q29_ingest_suite (CSV/JSON/ORC round-trips / ANALYZE stats / binaryFile
media ingest) — round-10 verdict ask #1. Core 21 -> 17 rows, extension
slots 29 -> 33.
"""

from __future__ import annotations

import nimhdfstore_spark.queries as Q

Q.load_all()

MERGED_AWAY_R11 = [
    "q34_continuous_aggregate", "q43_deletion_vectors",
    "q45_incremental_join_view",
    "q29_sink_interchange_roundtrip", "q36_analyze_table_stats",
    "q41_binaryfile_ingest",
]


def test_wave9_wave10_rows_absent():
    for name in MERGED_AWAY_R11:
        assert name not in Q.QUERIES, f"{name} must stay merged away"
        assert name not in Q.ORACLE


def test_incremental_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import core

    leg = core._Q34_LEG
    assert leg == Q.sweep_rotation() % 3
    sqls = (core._Q34_SQL, core._Q43_SQL, core._Q45_SQL)
    assert Q.ORACLE["q34_incremental_suite"] == sqls[leg]
    assert len(set(sqls)) == 3


def test_ingest_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import sinks

    leg = sinks._Q29_LEG
    assert leg == Q.sweep_rotation() % 5
    assert Q.ORACLE["q29_ingest_suite"] == sinks._q29_oracle()
    # the five leg oracles are genuinely distinct queries (csv/json share
    # the customer shape but differ in the leg literal)
    import importlib
    import os

    sqls = set()
    try:
        for r in range(5):
            os.environ["SPARK_GRAFT_SWEEP_ROTATION"] = str(r)
            mod = importlib.reload(sinks)
            sqls.add(mod._q29_oracle())
    finally:
        os.environ.pop("SPARK_GRAFT_SWEEP_ROTATION", None)
        importlib.reload(sinks)
    assert len(sqls) == 5


def test_sweep_priority_front_loads_fresh_partition(monkeypatch):
    """Round-10 verdict ask #5: the streaming family (+ x209) must land in
    this round's driver slots. Priority names sort to the FRONT of the
    fresh partition in list order regardless of the cyclic shift; verified
    names are skipped (self-draining)."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "7")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    order = Q.sweep_order()
    ext = [n for n in order if not n.startswith("q")]
    live_prio = [n for n in Q.SWEEP_PRIORITY if n in Q.QUERIES]
    assert ext[: len(live_prio)] == live_prio
    # a verified priority entry drops out of the front
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", live_prio[0])
    order2 = Q.sweep_order()
    ext2 = [n for n in order2 if not n.startswith("q")]
    assert ext2[: len(live_prio) - 1] == live_prio[1:]
    assert live_prio[0] in ext2  # still swept, just in the verified tail


def test_sweep_priority_names_exist():
    missing = [n for n in Q.SWEEP_PRIORITY if n not in Q.QUERIES]
    assert not missing, f"stale SWEEP_PRIORITY names: {missing}"
