"""Round-15 pins: the fourth core-merge wave (q25_snapshot_suite,
q14_hdf5_suite).

The heavyweight correctness of every rotation leg is covered by the
registry-driven oracle sweep (tests/test_queries_oracle.py) plus the
manual all-legs sf0.001 sweep run before landing; these pins guard the
cheap invariants that would silently skew a driver round: the captured
leg index always agrees with the registered oracle, the merged-away rows
are really gone, and the freed sweep slots landed where the slot
economics say they must.
"""

from __future__ import annotations

import nimhdfstore_spark.queries as Q

Q.load_all()

MERGED_AWAY = [
    # wave 4 (this round)
    "q25_time_travel", "q28_snapshot_diff", "q42_vacuum",
    "q47_transaction_publish", "q14_vlen", "q46_hdf5_roundtrip",
    "q49_hdf5_vlen_roundtrip",
    # wave 5 (this round): the attribute/metadata family
    "q15_attributes", "q21_copy_group_attrs", "q37_dimension_scales",
    # wave 6 (this round): the physical-layout family
    "q23_compaction", "q32_partitioned_layout_prune", "q33_layout_index",
    # wave 7 (this round): the keyed/structural mutation family
    "q20_schema_evolution", "q24_combine_tables", "q27_merge_upsert",
    # wave 8 (this round): the governed-access family
    "q26_store_sql", "q40_table_constraints", "q48_read_policies",
    # earlier waves — must never resurface
    "q04_backwards_index", "q05_slice", "q06_hyperslab", "q07_point_set",
    "q08_cast_projection", "q10_insert", "q11_delete", "q12_update",
    "q39_python_datasource_write",
]


def test_merged_rows_absent():
    for name in MERGED_AWAY:
        assert name not in Q.QUERIES, f"{name} must stay merged away"
        assert name not in Q.ORACLE


def test_snapshot_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import core

    leg = core._Q25_LEG
    assert leg == Q.sweep_rotation() % 4
    sqls = (core._Q25_SQL, core._Q28_SQL, core._Q42_SQL, core._Q47_SQL)
    assert Q.ORACLE["q25_snapshot_suite"] == sqls[leg]
    # the four leg oracles are genuinely distinct queries
    assert len(set(sqls)) == 4


def test_hdf5_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import core

    leg = core._Q14_LEG
    assert leg == Q.sweep_rotation() % 3
    sqls = (core._Q14_SQL, core._Q46_SQL, core._Q49_SQL)
    assert Q.ORACLE["q14_hdf5_suite"] == sqls[leg]
    assert len(set(sqls)) == 3


def test_attribute_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import datasets as dsq

    leg = dsq._Q15_LEG
    assert leg == Q.sweep_rotation() % 4
    sqls = (
        dsq._Q15_SQL,
        dsq._values_sql(dsq._Q15_COPY_ROWS),
        dsq._values_sql(dsq._Q15_ATTR_ROWS),
        dsq._Q37_SQL,
    )
    assert Q.ORACLE["q15_attribute_suite"] == sqls[leg]
    assert len(set(sqls)) == 4


def test_layout_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import sinks
    from nimhdfstore_spark.tables import rowid_over

    leg = sinks._Q33_LEG
    assert leg == Q.sweep_rotation() % 5
    sqls = (
        sinks._Q33_SQL.format(rowid_over=rowid_over("lineitem")),
        sinks._Q35_SQL.format(rowid_over=rowid_over("lineitem")),
        sinks._Q44_SQL.format(rowid_over=rowid_over("part")),
        sinks._Q23_SQL,
        sinks._Q32_SQL,
    )
    assert Q.ORACLE["q33_layout_suite"] == sqls[leg]
    assert len(set(sqls)) == 5


def test_evolution_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import core

    leg = core._Q20_LEG
    assert leg == Q.sweep_rotation() % 3
    sqls = (core._Q20_SQL, core._Q24_SQL, core._Q27_SQL)
    assert Q.ORACLE["q20_evolution_suite"] == sqls[leg]
    assert len(set(sqls)) == 3


def test_governance_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import sinks

    leg = sinks._Q26_LEG
    assert leg == Q.sweep_rotation() % 3
    sqls = (sinks._Q26_SQL, sinks._Q40_SQL, sinks._Q48_SQL)
    assert Q.ORACLE["q26_governance_suite"] == sqls[leg]
    assert len(set(sqls)) == 3


def test_q16_still_registered():
    """Regression pin: the wave-7 block excision briefly deleted the
    q16_compression registration (its leading comment had no dashed
    separator, so an index('# -----') overshot). The row is load-bearing
    reference parity (C1-C3 codec invariance) and must never silently
    drop out of the registry again."""
    assert "q16_compression" in Q.QUERIES
    assert "q16_compression" in Q.ORACLE


def test_core_slot_economics():
    """Core 17 rows (after the round-11 ninth/tenth merge waves) -> 33
    extension slots inside the driver's 50-row sweep window.

    Round-12 rewrite (verdict ask #1 / ADVICE r11): the original version
    asserted every one of the 33 slots was never-driver-verified — an
    invariant that EXPIRED the moment CORRECTNESS_r11.json landed and the
    fresh backlog (26) fell below the slot count. Assert the durable
    ORDERING property instead: never-verified entries sort strictly before
    verified ones within the extension partition, so the window's slots
    always carry min(backlog, slots) fresh entries — and the test survives
    backlog exhaustion (backlog 0 => the min is 0 and rotation of verified
    repeats takes over, which is the designed behavior)."""
    order = Q.sweep_order()
    core_rows = [n for n in order if n.startswith("q")]
    assert len(core_rows) == 17
    ext_slots = [n for n in order[:50] if not n.startswith("q")]
    assert len(ext_slots) == 33
    seen = Q.driver_verified()
    ext_all = [n for n in order if not n.startswith("q")]
    backlog = [n for n in ext_all if n not in seen]
    # every fresh entry sorts before every verified one
    if backlog:
        last_fresh = max(i for i, n in enumerate(ext_all) if n not in seen)
        first_done = min(
            (i for i, n in enumerate(ext_all) if n in seen),
            default=len(ext_all),
        )
        assert last_fresh < first_done, (
            "a driver-verified entry sorted ahead of a never-verified one"
        )
    # the window carries exactly min(backlog, slots) fresh entries
    fresh_in_window = [n for n in ext_slots if n not in seen]
    assert len(fresh_in_window) == min(len(backlog), 33)


def test_h5lite_corrupted_size_raises_valueerror_not_memoryerror():
    """Regression pin for the round-14 fuzz finding: a single flipped byte
    (vlen fixture, originally offset 1364 -> 2) landed in a row count /
    data address and made the contiguous read path PRE-ALLOCATE the
    corrupted region size via f.read(n) -> MemoryError, outside the
    documented ValueError contract. Every header-derived read is now
    bounded by the file's actual size before any allocation.

    ADVICE r10: the original pin hard-coded the byte offset, so any
    h5lite writer-layout change turned it into a manual re-aiming
    exercise. This version is layout-proof: it sweeps EVERY offset of
    the file (flipping each byte to the falsifying value 2, one at a
    time), asserts clean-read-or-ValueError at all of them, and asserts
    at least one offset actually raised — so the pin stays non-vacuous
    without referencing where the row-count/address fields happen to
    live this week."""
    import tempfile

    import numpy as np

    from nimhdfstore_spark.sources import h5lite

    vdt = np.dtype([
        ("doc_id", "<i8"),
        ("text", np.dtype("O", metadata={"vlen": bytes})),
    ])
    va = np.empty(40, dtype=vdt)
    va["doc_id"] = np.arange(40)
    va["text"] = [b"x" * (i % 17) for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/vlen.h5"
        h5lite.write(p, {"t": va})
        blob = bytearray(open(p, "rb").read())
        pc = f"{d}/corrupt.h5"
        n_raised = 0
        for off in range(len(blob)):
            orig = blob[off]
            if orig == 2:
                continue  # not a flip — would silently test the clean file
            blob[off] = 2
            with open(pc, "wb") as fh:
                fh.write(blob)
            blob[off] = orig
            try:
                for name in h5lite.catalog(pc):
                    h5lite.read(pc, name)
            except ValueError:
                n_raised += 1  # the ONLY acceptable failure class
        assert n_raised > 0, (
            "no single-byte flip raised anywhere — the structural fields "
            "must validate SOMETHING; the pin has gone vacuous"
        )
