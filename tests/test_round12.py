"""Round-8 additions: vacuous-oracle audit (round-7 verdict "what's wrong"
#1) and the de-vacuated rows themselves."""

from __future__ import annotations

import pytest

from nimhdfstore_spark import queries as registry
from tests._compare import run_oracle

registry.load_all()

SF001 = "/root/testdata/sf0.01"


def test_no_unannotated_empty_oracles_sf001():
    """Every declared oracle returns rows at sf0.01, or is explicitly
    annotated EXPECTED_EMPTY. A driver row whose oracle is empty verifies
    `0 == 0`: an implementation returning everything, nothing, or garbage-
    then-filtered passes identically (round-7 verdict found x57, x110 and
    x183 in that state — all three are de-vacuated this round)."""
    empty = []
    for name, sql in sorted(registry.ORACLE.items()):
        n = len(run_oracle(sql, SF001))
        if n == 0 and name not in registry.EXPECTED_EMPTY:
            empty.append(name)
        if n > 0 and name in registry.EXPECTED_EMPTY:
            empty.append(f"{name} (annotated empty but returned {n} rows)")
    assert not empty, f"vacuous/mis-annotated oracles at sf0.01: {empty}"


# --------------------------------------------------------------------------
# Verified-aware sweep rotation (round-7 verdict ask #2): never-driver-
# verified extension entries order FIRST, so the driver's ~5 extension
# slots always add new verification breadth; already-green entries fill
# the back of the sweep. No-repeat-until-exhaustion pinned by simulation.
# --------------------------------------------------------------------------


def _ext(order):
    n_core = sum(n.startswith("q") for n in order)
    return order[n_core:]


def test_front_slots_never_already_verified(monkeypatch):
    """With the real archived CORRECTNESS records, every front extension
    slot is first-time-verified (the round-7 'done' criterion)."""
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_VERIFIED", raising=False)
    seen = registry.driver_verified()
    assert seen, "archived CORRECTNESS records exist; the set cannot be empty"
    ext = _ext(registry.sweep_order())
    n_fresh = sum(n not in seen for n in ext)
    # every fresh entry precedes every verified entry
    assert all(n not in seen for n in ext[:n_fresh])
    assert all(n in seen for n in ext[n_fresh:])
    # the driver's extension slots (front ~8) are all first-time
    assert not set(ext[:8]) & seen


def test_driver_verified_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    assert registry.driver_verified() == set()
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "x30_dedup_exact,x45_x")
    assert registry.driver_verified() == {"x30_dedup_exact", "x45_x"}


def test_no_repeat_until_exhaustion(monkeypatch):
    """Simulate the driver loop: each round the front K extension slots get
    verified and the counter advances. No entry may occupy a slot twice
    before every extension entry has been verified once."""
    K = 5
    verified: set[str] = set()
    slotted: list[str] = []
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    n_ext = len(_ext(registry.sweep_order()))
    for r in range(0, (n_ext + K - 1) // K):
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(verified))
        # once fewer than K fresh entries remain, the slot window's tail is
        # legitimately backfilled with already-verified entries — only the
        # fresh-region prefix is under the no-repeat contract
        take = min(K, n_ext - len(verified))
        slots = _ext(registry.sweep_order())[:take]
        dup = set(slots) & set(slotted)
        assert not dup, f"round {r} re-offered already-verified slots: {dup}"
        slotted.extend(slots)
        verified |= set(slots)
    assert len(set(slotted)) == len(slotted) == n_ext, (
        "every extension entry must be slotted exactly once per cycle"
    )


def test_failed_slot_is_reoffered_not_pinned(monkeypatch):
    """An entry that FAILS driver verification stays fresh; the 3·r shift
    within the fresh partition moves the window past it so it cannot pin
    the front slots forever while still being re-offered eventually."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "0")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    ext0 = _ext(registry.sweep_order())
    flaky = ext0[0]
    # verify everything round 0 offered EXCEPT the flaky first slot
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(ext0[1:5]))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "1")
    ext1 = _ext(registry.sweep_order())
    assert flaky in ext1[: len(ext1) - 4], "failed entry must remain fresh"
    # and it is NOT frozen at position 0 (the shift moved the window)
    assert ext1[0] != flaky


@pytest.mark.parametrize(
    "name",
    ["x57_not_exists_antijoin", "x110_tpch_q22_no_orders",
     "x183_dedup_multiprobe_lsh"],
)
def test_devacuated_rows_nonempty_every_sf(spark, name):
    """The three rows the round-7 audit flagged stay non-empty at every
    generated scale factor (the oracle side; the Spark side is covered by
    the existing test_queries_oracle sweep)."""
    for sf in ("0.001", "0.01", "0.1"):
        n = len(run_oracle(registry.ORACLE[name], f"/root/testdata/sf{sf}"))
        assert n > 0, f"{name} oracle empty at sf{sf}"
