"""Round-4 operator tests: RAG chunking, HyperLogLog, incremental MinHash
dedup, data-quality audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.operators import quality as QA
from nimhdfstore_spark.operators import sketches as SK
from nimhdfstore_spark.operators.text import chunk_tokens, tokens


# -- chunking ---------------------------------------------------------------

def test_chunk_tokens_covers_and_overlaps(spark):
    text = " ".join(f"w{i}" for i in range(127))
    df = spark.createDataFrame([(1, text), (2, "only three tokens"), (3, "")],
                               ["doc_id", "text"])
    out = chunk_tokens(df, "doc_id", "text", chunk_size=50, overlap=10)
    rows = {(r.id, r.chunk_id): r for r in out.collect()}
    # doc 3 is empty -> no chunks; doc 2 -> one short chunk
    assert not any(k[0] == 3 for k in rows)
    assert rows[(2, 0)].n_tokens == 3 and rows[(2, 0)].chunk_text == "only three tokens"
    # doc 1: starts at 0,40,80,120 -> 4 chunks; last is short (127-120=7)
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2, 3]
    assert rows[(1, 0)].n_tokens == 50 and rows[(1, 3)].n_tokens == 7
    # chunk k starts at token k*40: first token of chunk 1 is w40
    assert rows[(1, 1)].chunk_text.split(" ")[0] == "w40"
    # overlap: last 10 tokens of chunk 0 == first 10 of chunk 1
    assert rows[(1, 0)].chunk_text.split(" ")[-10:] == \
        rows[(1, 1)].chunk_text.split(" ")[:10]
    # full coverage: stride-prefixes of each chunk reassemble the doc
    reassembled = []
    for k in d1:
        reassembled.extend(rows[(1, k)].chunk_text.split(" ")[:40])
    assert reassembled == [f"w{i}" for i in range(127)]


def test_chunk_tokens_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    import pytest
    with pytest.raises(ValueError):
        chunk_tokens(df, "doc_id", "text", chunk_size=10, overlap=10)


# -- HyperLogLog ------------------------------------------------------------

def test_hll_register_bounds_and_accuracy(spark):
    n = 20_000
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("k"))
    regs = SK.hll_registers(df, "k")
    reg_rows = regs.collect()
    assert len(reg_rows) <= SK.HLL_M
    assert all(1 <= r.m_j <= SK.HLL_RMAX for r in reg_rows)
    est = SK.hll_estimate(regs).collect()[0]
    # 256 registers -> ~6.5% std error; allow 4 sigma
    assert abs(est.hll_estimate - n) / n < 0.26
    assert est.n_registers_used == len(reg_rows)


def test_hll_insensitive_to_duplicates_and_order(spark):
    a = spark.range(1000).select(F.col("id").alias("k"))
    dup = a.union(a).union(a.orderBy(F.desc("k")))
    ra = SK.hll_estimate(SK.hll_registers(a, "k")).collect()[0]
    rd = SK.hll_estimate(SK.hll_registers(dup, "k")).collect()[0]
    assert ra.sum_scaled == rd.sum_scaled
    assert ra.hll_estimate == rd.hll_estimate


# -- incremental MinHash dedup ----------------------------------------------

def test_minhash_incremental_flags_known_dup(spark):
    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet forest until dawn breaks")
    corpus = spark.createDataFrame(
        [(1, base), (3, "completely different text about spark engines and "
                        "distributed columnar storage formats")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(10, base),                      # exact dup of corpus doc 1
         (20, "nothing like anything in the corpus whatsoever zzz qqq")],
        ["doc_id", "text"],
    )
    index = D.minhash_buckets(corpus, "doc_id", "text")
    out = {r.id: r for r in D.minhash_lsh_incremental(
        batch, index, "doc_id", "text", threshold=0.6).collect()}
    assert out[10].is_dup == 1 and out[10].best_match_id == 1
    assert out[10].best_est == 1.0
    assert out[20].is_dup == 0 and out[20].best_match_id == -1
    assert out[20].n_dup_candidates == 0


def test_minhash_incremental_matches_pairs_form(spark, sf_dir):
    """Batch-vs-corpus join must find exactly the cross-side pairs the
    self-join form finds (restricted to batch x corpus)."""
    from nimhdfstore_spark.tables import load
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    index = D.minhash_buckets(corpus, "doc_id", "text")
    inc = D.minhash_lsh_incremental(batch, index, "doc_id", "text",
                                    threshold=0.6)
    flagged = {r.id for r in inc.collect() if r.is_dup}
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.6)
    cross = pairs.where(
        ((F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 != 0))
        | ((F.col("id_a") % 10 != 0) & (F.col("id_b") % 10 == 0))
    ).collect()
    expected = set()
    for r in cross:
        expected.add(r.id_a if r.id_a % 10 == 0 else r.id_b)
    assert flagged == expected


# -- data-quality audit ------------------------------------------------------

def test_quality_rules(spark):
    child = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, 60.0), (9, 10.0)], ["k", "v"]
    )
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    report = QA.audit([
        QA.row_rule_violations(child, {
            "null_v": F.col("v").isNull(),
            "v_over_50": F.col("v") > 50,
        }),
        QA.uniqueness_violations(child, ["k"], "dup_k"),
        QA.referential_violations(child, "k", parent, "pk", "fk_k"),
    ])
    got = {r.rule: r.n_violations for r in report.collect()}
    assert got == {"null_v": 1, "v_over_50": 1, "dup_k": 1, "fk_k": 1}


def test_quality_empty_rules_raise(spark):
    import pytest
    df = spark.range(1)
    with pytest.raises(ValueError):
        QA.row_rule_violations(df, {})


# -- streaming restart recovery ---------------------------------------------

def test_restart_recovery_equals_batch_and_commits_twice(spark, sf_dir):
    import os
    from pyspark.sql import functions as F
    from nimhdfstore_spark.streaming.windows import restart_recovery_stream
    from nimhdfstore_spark.tables import load

    got = restart_recovery_stream(spark, sf_dir).collect()
    want = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("total_value"))
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.n_events) for r in got] == \
        [(r.event_type, r.n_events) for r in want]
    for g, w in zip(got, want):
        assert abs(g.total_value - w.total_value) < 1e-5
    # two separate availableNow drains => exactly two committed batches
    commits = [
        e for e in os.listdir("/tmp/nimhdfstore_scratch/x142_restart/ckpt/commits")
        if not e.startswith(".")
    ]
    assert sorted(commits) == ["0", "1"]


# -- table constraints -------------------------------------------------------

def test_constraints_persist_and_validate(spark, tmp_path):
    from nimhdfstore_spark.store import Store, StoreError
    import pytest

    store = Store(spark, str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 3.0)], ["k", "v"]
    )
    t = store.put("t", df, order_by=["k", "v"])
    t.add_constraint("v_nonneg", check="v >= 0")
    t.add_constraint("uniq_k", unique=["k"])
    got = {r.rule: r.n_violations for r in t.validate().collect()}
    assert got == {"v_nonneg": 1, "uniq_k": 1}
    # constraints survive a mutation (append) and a fresh handle
    t.append(spark.createDataFrame([(9, -1.0)], ["k", "v"]))
    fresh = store.table("t")
    assert set(fresh.constraints) == {"v_nonneg", "uniq_k"}
    got2 = {r.rule: r.n_violations for r in fresh.validate().collect()}
    assert got2 == {"v_nonneg": 2, "uniq_k": 1}
    fresh.drop_constraint("uniq_k")
    assert set(store.table("t").constraints) == {"v_nonneg"}
    with pytest.raises(StoreError):
        fresh.drop_constraint("nope")
    with pytest.raises(StoreError):
        fresh.add_constraint("two_kinds", check="v >= 0", unique=["k"])
    with pytest.raises(StoreError):
        fresh.add_constraint("bad_fk", foreign_key=("k", "missing", "x"))


def test_constraint_fk_and_null_check_semantics(spark, tmp_path):
    from nimhdfstore_spark.store import Store

    store = Store(spark, str(tmp_path / "s"))
    store.put("parent", spark.createDataFrame([(1,), (2,)], ["pk"]),
              order_by=["pk"])
    child = spark.createDataFrame(
        [(1, 1), (2, 7), (3, None)], ["k", "ref"]
    )
    t = store.put("child", child, order_by=["k"])
    t.add_constraint("fk", foreign_key=("ref", "parent", "pk"))
    # SQL CHECK semantics: NULL passes a check, and NULL FKs are not orphans
    t.add_constraint("ref_small", check="ref < 100")
    got = {r.rule: r.n_violations for r in t.validate().collect()}
    assert got == {"fk": 1, "ref_small": 0}


# -- MMR diverse selection ---------------------------------------------------

def test_mmr_prefers_diverse_over_redundant(spark):
    from nimhdfstore_spark.operators.similarity import mmr_select

    # candidates 11 and 12 are near-duplicates, both highly query-similar;
    # 13 is less relevant but diverse. Plain top-2 would take {11, 12};
    # MMR must take 11 then 13.
    pool = spark.createDataFrame(
        [(1, 11, 0.95), (1, 12, 0.94), (1, 13, 0.60)],
        ["probe_id", "neighbor_id", "qsim"],
    )
    sims = [(1, 11, 12, 0.99), (1, 11, 13, 0.10), (1, 12, 13, 0.12)]
    pairs = spark.createDataFrame(
        sims + [(p, b, a, s) for p, a, b, s in sims],
        ["probe_id", "id_a", "id_b", "sim"],
    )
    out = mmr_select(pool, pairs, k=2).orderBy("position").collect()
    assert [r.vec_id for r in out] == [11, 13]
    # position-1 score is lam*qsim; position-2 pays the redundancy penalty
    assert abs(out[0].mmr_score - 0.7 * 0.95) < 1e-12
    assert abs(out[1].mmr_score - (0.7 * 0.60 - 0.3 * 0.10)) < 1e-12


def test_mmr_ties_break_to_lowest_id_and_k_caps(spark):
    from nimhdfstore_spark.operators.similarity import mmr_select

    pool = spark.createDataFrame(
        [(1, 5, 0.9), (1, 3, 0.9)], ["probe_id", "neighbor_id", "qsim"]
    )
    pairs = spark.createDataFrame(
        [(1, 3, 5, 0.0), (1, 5, 3, 0.0)], ["probe_id", "id_a", "id_b", "sim"]
    )
    out = mmr_select(pool, pairs, k=5).orderBy("position").collect()
    assert [r.vec_id for r in out] == [3, 5]      # tie -> lowest id first
    assert len(out) == 2                          # k caps at pool size


# -- vacuum ------------------------------------------------------------------

def test_vacuum_retains_current_and_respects_dry_run(spark, tmp_path):
    from nimhdfstore_spark.store import Store, StoreError
    import pytest

    store = Store(spark, str(tmp_path / "s"), keep_snapshots=5)
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["k", "v"])
    t = store.put("t", df, order_by=["k"])
    for _ in range(3):
        t.update(0, t[0:1])
    assert len(store.snapshots("t")) == 4
    rep = store.vacuum(retain=2, dry_run=True)
    assert len(rep["t"]["removed"]) == 2 and rep["t"]["bytes"] > 0
    assert len(store.snapshots("t")) == 4          # dry run deleted nothing
    rep = store.vacuum(retain=2)
    assert len(store.snapshots("t")) == 2
    # current snapshot survived; table still reads
    assert store.table("t").nrows == 10
    # vacuum to 1 keeps exactly the current snapshot
    store.vacuum(retain=1)
    assert len(store.snapshots("t")) == 1
    assert store.table("t")[0:3].count() == 3
    with pytest.raises(StoreError):
        store.vacuum(retain=0)


def test_vacuum_readonly_guard(spark, tmp_path):
    from nimhdfstore_spark.store import Store, StoreError
    import pytest

    rw = Store(spark, str(tmp_path / "s"))
    rw.put("t", spark.createDataFrame([(1,)], ["k"]), order_by=["k"])
    ro = Store(spark, str(tmp_path / "s"), mode="r")
    assert ro.vacuum(dry_run=True)["t"]["removed"] == []   # dry run allowed
    with pytest.raises(StoreError):
        ro.vacuum()
