"""Data-quality constraint auditing (Deequ-style, public pattern).

The reference has no integrity checking of any kind — its only validation
is structural schema compatibility on open (``checkCompatiblity``,
/root/reference/nimtables.nim:133-138). A 100 TB ingest pipeline needs the
relational analog: declarative constraints (NOT NULL, value ranges,
uniqueness, referential integrity) evaluated as ONE audit pass whose output
is a small per-rule violation report, not a second copy of the data.

Scale shape:

- **Row-level rules** (not-null, ranges, cross-column predicates) compile
  into a single aggregate over one scan — N rules cost one conditional SUM
  each inside the same map-side-combined projection; adding a rule adds
  zero I/O.
- **Uniqueness** is a groupBy on the key with a HAVING count > 1 — one
  shuffle on the checked key, partial-aggregated map-side.
- **Referential integrity** is a LEFT ANTI join against the parent key set
  — broadcast when the parent is a dim table, shuffle-hash otherwise;
  never a cartesian.

Every rule returns ``(rule, n_violations)`` rows, so the full audit is a
UNION of tiny one-row frames — the report is driver-sized at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level rules in one pass: ``rules`` maps rule name to a
    boolean *violation* condition. Returns ``(rule, n_violations)`` — one
    scan, one conditional SUM per rule, no shuffle beyond the final
    single-row combine."""
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) as (rule, n_violations)")
    )


def uniqueness_violations(df: DataFrame, key_cols: list[str], rule: str) -> DataFrame:
    """Count rows participating in duplicate key groups (a unique
    constraint counts every extra row as a violation: group_size - 1
    summed over offending groups)."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    return dup.agg(
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations")
    ).select(F.lit(rule).alias("rule"), "n_violations")


def referential_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, rule: str
) -> DataFrame:
    """Count child rows whose key has no parent (LEFT ANTI join — the
    orphan scan). NULL child keys are not orphans (SQL FK semantics);
    pair with a NOT NULL rule if nulls are also illegal."""
    orphans = child.where(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
        F.lit(rule).alias("rule"), "n_violations"
    )


def audit(parts: list[DataFrame]) -> DataFrame:
    """Union the per-rule reports into one ``(rule, n_violations)`` frame."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
