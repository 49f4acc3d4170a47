"""Round-10 additions (driver round 6):

- Sweep-slot rotation (round-5 verdict ask #1/#8): the driver's external
  correctness sweep verifies only ~50 entries; the extension ordering now
  rotates per round on a persisted counter (count of CORRECTNESS_r*.json
  records) so the ~3 extension slots verify three NEW entries every round.
  Invariants property-pinned here, over the real registry AND hypothesis-
  generated synthetic registries:
    * the frozen 47-entry core is always first, q01 the flagship, for any
      rotation;
    * every rotation yields a permutation of the full registry;
    * consecutive rounds' extension slots are disjoint until the cycle
      wraps, and every extension entry is driver-verified within
      ceil(len(ext)/3) rounds;
    * the rotation index is read from persisted state, not wall clock.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import nimhdfstore_spark.queries as Q

Q.load_all()

N_SLOTS = 3  # extension slots under the driver's ~50-entry cap


def _order(monkeypatch, r: int) -> list[str]:
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
    return Q.sweep_order()


def test_rotation_env_override_and_persisted_default(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "41")
    assert Q.sweep_rotation() == 41
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION")
    # Default = number of archived CORRECTNESS records at the repo root:
    # deterministic persisted state, stable within a round.
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(Q.__file__)))
    root = os.path.dirname(root)
    expected = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert Q.sweep_rotation() == expected


def test_core_frozen_and_permutation_for_any_rotation(monkeypatch):
    base = _order(monkeypatch, 0)
    core = [n for n in base if n.startswith("q")]
    assert base[: len(core)] == core and base[0] == "q01_full_scan"
    for r in (0, 1, 5, 13, 56, 57, 1000):
        o = _order(monkeypatch, r)
        assert o[: len(core)] == core, "rotation must not touch the core"
        assert sorted(o) == sorted(base), "rotation must permute, not drop"


def test_slots_disjoint_per_round_and_full_coverage(monkeypatch):
    base = _order(monkeypatch, 0)
    n_core = sum(n.startswith("q") for n in base)
    ext = len(base) - n_core
    rounds = math.ceil(ext / N_SLOTS)
    seen: set[str] = set()
    prev: set[str] = set()
    for r in range(rounds):
        slots = set(_order(monkeypatch, r)[n_core : n_core + N_SLOTS])
        assert not (slots & prev), f"round {r} repeats round {r-1} slots"
        seen |= slots
        prev = slots
    assert len(seen) == ext, "every extension entry driver-verified in a cycle"


def test_round6_slots_are_new_vs_r05(monkeypatch):
    """The concrete 'done' criterion from the round-5 verdict: this round's
    slots differ from the x30/x156/x28 trio CORRECTNESS_r05 verified."""
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION", raising=False)
    base = Q.sweep_order()
    n_core = sum(n.startswith("q") for n in base)
    slots = base[n_core : n_core + N_SLOTS]
    assert Q.sweep_rotation() >= 5
    assert not set(slots) & {"x30_dedup_exact", "x156_bfs_hops", "x28_tfidf_terms"}


@given(
    fam_sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8),
    n_core=st.integers(min_value=1, max_value=6),
    r=st.integers(min_value=0, max_value=200),
)
# monkeypatch resets per test, not per example — safe here because every
# example overwrites the same attributes before reading anything.
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rotation_invariants_on_synthetic_registries(fam_sizes, n_core, r, monkeypatch):
    queries = {f"q{i:02d}_core": (lambda *a: None) for i in range(1, n_core + 1)}
    queries["q01_full_scan"] = lambda *a: None
    family = {}
    for fi, size in enumerate(fam_sizes):
        for j in range(size):
            name = f"x{fi:02d}{j:02d}_op"
            queries[name] = lambda *a: None
            family[name] = f"fam{fi:02d}"
    monkeypatch.setattr(Q, "QUERIES", queries)
    monkeypatch.setattr(Q, "FAMILY", family)
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
    order = Q.sweep_order()
    assert sorted(order) == sorted(queries)
    core = [n for n in order if n.startswith("q")]
    assert order[: len(core)] == core and order[0] == "q01_full_scan"
    ext = order[len(core):]
    # same rotation → identical order (determinism)
    assert Q.sweep_order() == order
    # rotation is a cyclic shift of the r=0 interleave by 3·r
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "0")
    ext0 = Q.sweep_order()[len(core):]
    s = (3 * r) % len(ext0)
    assert ext == ext0[s:] + ext0[:s]
