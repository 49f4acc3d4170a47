"""Deterministic-sampling declared queries: the DuckDB oracle recomputes the
same multiplicative id-hash, so every sampled row set matches exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import sampling as SA
from nimhdfstore_spark.queries import query
from nimhdfstore_spark.tables import load

def _h(id_expr: str, salt: int = 0) -> str:
    """SQL twin of operators.sampling.sample_hash (keep in lockstep)."""
    m = 4294967296
    pm = f"(({id_expr} % {m}) + {m}) % {m}"
    h0 = f"xor({pm}, {(salt * 40503 + 17) % m})"
    h1 = f"(({h0}) * 40503 % {m})"
    return f"xor({h1}, ({h1}) // 65536) * 65599 % {m}"


# -- x76: 10% Bernoulli sample of documents ---------------------------------

_FRACTION = 0.10

_X_BERNOULLI_SQL = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_h('doc_id')} < {int(_FRACTION * SA.MOD32)}
ORDER BY doc_id
"""


@query("x76_sample_bernoulli", _X_BERNOULLI_SQL)
def x_bernoulli(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        SA.hash_sample(docs, "doc_id", _FRACTION)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


# -- x77: stratified rates by event_type (source-mixing ratios) -------------

_RATES = {"click": 0.05, "view": 0.02, "purchase": 1.0}

_X_STRATIFIED_SQL = f"""
SELECT event_id, event_type, user_id
FROM events
WHERE {_h('event_id')} < CASE event_type
  WHEN 'click' THEN {int(0.05 * SA.MOD32)}
  WHEN 'purchase' THEN {int(1.0 * SA.MOD32)}
  WHEN 'view' THEN {int(0.02 * SA.MOD32)}
  ELSE 0 END
ORDER BY event_id
"""


@query("x77_sample_stratified", _X_STRATIFIED_SQL)
def x_stratified(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        SA.stratified_hash_sample(ev, "event_id", "event_type", _RATES)
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    )


# -- x78: exactly-k uniform sample (deterministic reservoir) ----------------

_K = 100

_X_FIXEDK_SQL = f"""
SELECT doc_id, source
FROM documents
ORDER BY {_h('doc_id')}, doc_id LIMIT {_K}
"""


@query("x78_sample_fixed_k", _X_FIXEDK_SQL)
def x_fixed_k(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return SA.fixed_size_hash_sample(docs, "doc_id", _K).select("doc_id", "source")
