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
