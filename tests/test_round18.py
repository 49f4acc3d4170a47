"""Round-13 pins: implementation-fingerprint staleness for driver
verification (r12 verdict ask #3) and fused-suite leg-coverage slot
pinning (ask #2).

All sweep-state tests here use the SPARK_GRAFT_SWEEP_* env overrides and
synthetic source trees — none read the archived CORRECTNESS records or
the working tree's FPRINTS.json, so every invariant holds at every
rotation / backlog / staleness depth (the r11/r12 repeat-offender class).
"""

from __future__ import annotations

import pytest

import nimhdfstore_spark.queries as Q

Q.load_all()


# --------------------------------------------------------------------------
# fingerprint_source: the shared recipe (working tree == git tree)
# --------------------------------------------------------------------------

_MOD = "nimhdfstore_spark/queries/fake.py"
_OP = "nimhdfstore_spark/operators/fakeop.py"
_TREE = {
    _MOD: (
        "from nimhdfstore_spark.operators import fakeop\n"
        "from nimhdfstore_spark.queries import query\n"
        "\n"
        "HELPER = 1\n"
        "\n"
        "@query('x_fake')\n"
        "def x_fake(spark, sf_dir):\n"
        "    return fakeop.kernel(spark)\n"
        "\n"
        "def sibling(spark, sf_dir):\n"
        "    return None\n"
    ),
    _OP: "def kernel(spark):\n    return 42\n",
}


def _fp(tree, oracle="SELECT 1"):
    return Q.fingerprint_source(
        "x_fake", _MOD, lambda p: tree.get(p), lambda p: p in tree, oracle
    )


def test_fingerprint_stable_and_deterministic():
    assert _fp(_TREE) == _fp(dict(_TREE))
    assert _fp(_TREE) is not None


def test_fingerprint_changes_on_fn_body_edit():
    t = dict(_TREE)
    t[_MOD] = t[_MOD].replace("fakeop.kernel(spark)", "fakeop.kernel(None)")
    assert _fp(t) != _fp(_TREE)


def test_fingerprint_changes_on_operator_module_edit():
    """The motivating x30/x32 case: the kernel module rewritten while the
    registered function text is unchanged."""
    t = dict(_TREE)
    t[_OP] = "def kernel(spark):\n    return 43\n"
    assert _fp(t) != _fp(_TREE)


def test_fingerprint_changes_on_oracle_edit():
    assert _fp(_TREE, "SELECT 2") != _fp(_TREE, "SELECT 1")


def test_fingerprint_ignores_same_module_sibling_edit():
    """Deliberate bench-matching stance: hashing the whole defining module
    would stale every sibling row on any one-row edit and flood the
    sweep's re-verification slots."""
    t = dict(_TREE)
    t[_MOD] = t[_MOD].replace("return None", "return 7")
    assert _fp(t) == _fp(_TREE)


def test_fingerprint_ignores_registry_bookkeeping():
    """Every module imports the registry for @query; sweep-machinery edits
    must not stale all 166 rows (first-run bug, fixed by the skip set)."""
    t = dict(_TREE)
    t["nimhdfstore_spark/queries/__init__.py"] = "# registry v2\n"
    assert _fp(t) == _fp(_TREE)


def test_fingerprint_none_when_function_missing():
    t = {_MOD: "def other():\n    pass\n"}
    assert _fp(t) is None


def test_working_tree_fingerprint_matches_recipe_on_real_row():
    """impl_fingerprint is fingerprint_source over the real tree; it must
    resolve for every registered row (an unresolvable row would silently
    never participate in staleness)."""
    for name in ("q01_full_scan", "x30_dedup_exact", "x210_tpch_suite"):
        assert Q.impl_fingerprint(name), name


# --------------------------------------------------------------------------
# sweep_order partitions: fresh -> pinned suites -> stale -> rotated rest
# --------------------------------------------------------------------------

def _ext(order):
    return [n for n in order if not n.startswith("q")]


def _all_ext():
    return sorted(n for n in Q.QUERIES if not n.startswith("q"))


def test_stale_rows_reenter_verification_front(monkeypatch):
    """A verified row whose fingerprint changed sorts ahead of every
    un-stale verified row (minus the pinned leg-coverage suites), at any
    rotation."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(_all_ext()))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_STALE", "x44_knn_classify")
    # all suite legs checked -> no pinning in the way
    monkeypatch.setenv(
        "SPARK_GRAFT_LEG_RECORDS",
        ";".join(f"{r}:{'|'.join(Q.SUITE_LEGS)}" for r in range(12)),
    )
    for rot in ("0", "7", "13"):
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", rot)
        ext = _ext(Q.sweep_order())
        assert ext[0] == "x44_knn_classify", (rot, ext[:3])


def test_pinned_suites_hold_slots_until_legs_covered(monkeypatch):
    """Verified fused suites with unchecked legs occupy the slots right
    after the fresh partition, in SWEEP_PRIORITY order; a fully
    leg-covered suite drops back into the rotated remainder."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(_all_ext()))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_STALE", "")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "12")
    # no legs checked anywhere -> all seven suites pinned
    monkeypatch.setenv("SPARK_GRAFT_LEG_RECORDS", "")
    ext = _ext(Q.sweep_order())
    suites = [n for n in Q.SWEEP_PRIORITY if n in Q.SUITE_LEGS]
    assert ext[: len(suites)] == suites
    # x212's 7 legs all checked (greens at 7 distinct rotations) -> it
    # alone unpins; the other six keep their slots
    recs = ";".join(f"{r}:x212_text_quality_suite" for r in range(7))
    monkeypatch.setenv("SPARK_GRAFT_LEG_RECORDS", recs)
    assert len(Q.checked_legs("x212_text_quality_suite", 7)) == 7
    ext = _ext(Q.sweep_order())
    expect = [n for n in suites if n != "x212_text_quality_suite"]
    assert ext[: len(expect)] == expect
    assert "x212_text_quality_suite" in ext[len(expect):]


def test_fresh_precedes_pinned_precedes_stale(monkeypatch):
    """Full partition order with every class populated: a never-verified
    row, the pinned suites, a priority stale row, other stale rows, then
    the rotated remainder."""
    all_ext = _all_ext()
    fresh_name = "x20_text_top_tokens"
    verified = [n for n in all_ext if n != fresh_name]
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(verified))
    monkeypatch.setenv(
        "SPARK_GRAFT_SWEEP_STALE",
        "x30_dedup_exact,x44_knn_classify,x59_histogram",
    )
    monkeypatch.setenv("SPARK_GRAFT_LEG_RECORDS", "")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "12")
    ext = _ext(Q.sweep_order())
    suites = [n for n in Q.SWEEP_PRIORITY if n in Q.SUITE_LEGS]
    assert ext[0] == fresh_name
    assert ext[1 : 1 + len(suites)] == suites
    # priority stale row fronts the stale partition
    assert ext[1 + len(suites)] == "x30_dedup_exact"
    rest_stale = set(ext[2 + len(suites) : 4 + len(suites)])
    assert rest_stale == {"x44_knn_classify", "x59_histogram"}


def test_stale_env_override_and_empty():
    import os

    old = os.environ.get("SPARK_GRAFT_SWEEP_STALE")
    try:
        os.environ["SPARK_GRAFT_SWEEP_STALE"] = ""
        assert Q.stale_verified() == set()
        os.environ["SPARK_GRAFT_SWEEP_STALE"] = "a,b"
        assert Q.stale_verified() == {"a", "b"}
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_SWEEP_STALE", None)
        else:
            os.environ["SPARK_GRAFT_SWEEP_STALE"] = old


def test_unrecorded_names_are_not_stale(monkeypatch, tmp_path):
    """A row with no recorded fingerprint (tool not yet run for it) must
    not be stale: it is either never-verified (already fresh) or gets a
    fingerprint when its next green record lands."""
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_STALE", raising=False)
    monkeypatch.setattr(Q, "_STALE_SNAPSHOT", None)
    monkeypatch.setattr(Q, "recorded_fingerprints", lambda: {})
    assert Q.stale_verified() == set()
    monkeypatch.setattr(Q, "_STALE_SNAPSHOT", None)


def test_sweep_order_is_permutation_with_staleness(monkeypatch):
    """Partitioning must permute the registry, never drop or duplicate a
    row, whatever the stale/verified/leg state."""
    all_ext = _all_ext()
    monkeypatch.setenv(
        "SPARK_GRAFT_SWEEP_VERIFIED", ",".join(all_ext[: len(all_ext) // 2])
    )
    monkeypatch.setenv(
        "SPARK_GRAFT_SWEEP_STALE", ",".join(all_ext[: len(all_ext) // 3])
    )
    monkeypatch.setenv("SPARK_GRAFT_LEG_RECORDS", "")
    for rot in ("0", "5", "12", "99"):
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", rot)
        order = Q.sweep_order()
        assert sorted(order) == sorted(Q.QUERIES), rot
