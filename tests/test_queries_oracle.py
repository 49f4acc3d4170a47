"""Golden round-trip: every declared query with an oracle hash-matches DuckDB
at sf0.001 — the local mirror of the driver's t2 gate (SURVEY §5)."""

from __future__ import annotations

import pytest

from nimhdfstore_spark import queries as registry
from tests._compare import assert_matches

registry.load_all()

WITH_ORACLE = sorted(registry.ORACLE)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_matches(df, registry.ORACLE[name], sf_dir, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
