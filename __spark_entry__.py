"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship positional pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` re-export the registry in
``nimhdfstore_spark.queries`` (one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nimhdfstore_spark import queries as _registry  # noqa: E402

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: canonical-rowid strided hyperslab + projection over
    lineitem (SURVEY §2.14 Q6) at sf0.001. Inlined rather than pulled from
    the registry: the old q06_hyperslab row merged into the rotating
    q03_positional_suite, whose returned leg (and schema) changes per round
    — entry()'s smoke contract wants a stable schema."""
    from nimhdfstore_spark.operators import positional
    from nimhdfstore_spark.rowid import ROWID
    from nimhdfstore_spark.tables import load_pos

    df = load_pos(spark, "/root/testdata/sf0.001", "lineitem")
    return (
        df.where(positional.hyperslab(offset=1000, count=50, stride=7))
        .select(ROWID, "l_quantity", "l_extendedprice")
        .orderBy(ROWID)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Insertion order = the driver's sweep order, and the sweep is
    # time-budgeted (round 2 recorded 52/170): core parity suite first,
    # then round-robin across extension families for breadth under a cut.
    return {n: _registry.QUERIES[n] for n in _registry.sweep_order()}


def oracle_sql() -> dict[str, str]:
    order = [n for n in _registry.sweep_order() if n in _registry.ORACLE]
    return {n: _registry.ORACLE[n] for n in order}
