"""Round-11 registry pins: ninth/tenth core-merge waves.

q34+q43+q45 fused into q34_incremental_suite (continuous-aggregate
refresh / deletion vectors / incremental join view) and q29+q36+q41 into
q29_ingest_suite (CSV/JSON/ORC round-trips / ANALYZE stats / binaryFile
media ingest) — round-10 verdict ask #1. Core 21 -> 17 rows, extension
slots 29 -> 33.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import nimhdfstore_spark.queries as Q

Q.load_all()

MERGED_AWAY_R11 = [
    "q34_continuous_aggregate", "q43_deletion_vectors",
    "q45_incremental_join_view",
    "q29_sink_interchange_roundtrip", "q36_analyze_table_stats",
    "q41_binaryfile_ingest",
]


def test_wave9_wave10_rows_absent():
    for name in MERGED_AWAY_R11:
        assert name not in Q.QUERIES, f"{name} must stay merged away"
        assert name not in Q.ORACLE


def test_incremental_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import core

    leg = core._Q34_LEG
    assert leg == Q.sweep_rotation() % 3
    sqls = (core._Q34_SQL, core._Q43_SQL, core._Q45_SQL)
    assert Q.ORACLE["q34_incremental_suite"] == sqls[leg]
    assert len(set(sqls)) == 3


def test_ingest_suite_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import sinks

    leg = sinks._Q29_LEG
    assert leg == Q.sweep_rotation() % 5
    assert Q.ORACLE["q29_ingest_suite"] == sinks._q29_oracle()
    # the five leg oracles are genuinely distinct queries (csv/json share
    # the customer shape but differ in the leg literal)
    import importlib
    import os

    sqls = set()
    try:
        for r in range(5):
            os.environ["SPARK_GRAFT_SWEEP_ROTATION"] = str(r)
            mod = importlib.reload(sinks)
            sqls.add(mod._q29_oracle())
    finally:
        os.environ.pop("SPARK_GRAFT_SWEEP_ROTATION", None)
        importlib.reload(sinks)
    assert len(sqls) == 5


def test_sweep_priority_front_loads_fresh_partition(monkeypatch):
    """Round-10 verdict ask #5: the streaming family (+ x209) must land in
    this round's driver slots. Priority names sort to the FRONT of the
    fresh partition in list order regardless of the cyclic shift; verified
    names are skipped (self-draining)."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "7")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    order = Q.sweep_order()
    ext = [n for n in order if not n.startswith("q")]
    live_prio = [n for n in Q.SWEEP_PRIORITY if n in Q.QUERIES]
    assert ext[: len(live_prio)] == live_prio
    # a verified priority entry drops out of the front
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", live_prio[0])
    order2 = Q.sweep_order()
    ext2 = [n for n in order2 if not n.startswith("q")]
    assert ext2[: len(live_prio) - 1] == live_prio[1:]
    assert live_prio[0] in ext2  # still swept, just in the verified tail


def test_sweep_priority_names_exist():
    missing = [n for n in Q.SWEEP_PRIORITY if n not in Q.QUERIES]
    assert not missing, f"stale SWEEP_PRIORITY names: {missing}"


# --------------------------------------------------------------------------
# Crash injection (round-10 verdict "what's missing" #2): a child process
# SIGKILLs ITSELF at a named point inside a real commit — post-stage,
# post-rename, pre-PUT, mid-flock, post-publish — for BOTH durable
# committers. The parent then asserts the crash-safety invariants the
# hand-placed-debris tests only modeled: no committed update is lost, an
# uncommitted attempt is never served (debris not resolvable), vacuum
# reclaims debris only past the age gate, and the next writer proceeds.
# --------------------------------------------------------------------------

_CRASH_WORKER_SRC = '''
import os, sys
sys.path.insert(0, "/root/repo")
root, kind, cat, point = sys.argv[1:5]
os.environ["SPARK_GRAFT_CRASH_POINT"] = point
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from nimhdfstore_spark.store import (
    ConditionalPutCommitter, FileCatalogBackend, LockfileCommitter, Store,
)
committer = (
    LockfileCommitter() if kind == "lockfile"
    else ConditionalPutCommitter(FileCatalogBackend(cat))
)
t = Store(spark, root, committer=committer).table("t")
t.append(spark.createDataFrame([(100, 100.0)], "k long, v double"))
print("NO-CRASH")  # reached only if the injected point never fired
'''

# (kind, kill point, committed?) — committed=True iff the kill lands AFTER
# the committer's atomic publish (lockfile: the meta write; conditional
# PUT: the catalog os.replace), so the child's append MUST survive.
_CRASH_CASES = [
    ("lockfile", "lock.pre_rename", False),
    ("lockfile", "lock.post_rename", False),
    ("lockfile", "lock.post_meta", True),
    ("condput", "cas.post_unique", False),
    ("condput", "cas.pre_publish", False),
    ("condput", "cas.post_publish", True),
]


@pytest.mark.parametrize("kind,point,committed", _CRASH_CASES)
def test_crash_injected_commit_invariants(spark, tmp_path, kind, point, committed):
    import signal
    import subprocess
    import sys
    import time

    from nimhdfstore_spark.store import (
        ConditionalPutCommitter,
        FileCatalogBackend,
        LockfileCommitter,
        Store,
        StoreError,
    )

    root = str(tmp_path / "store")
    cat = str(tmp_path / "catalog.json")

    def make_committer():
        return (
            LockfileCommitter() if kind == "lockfile"
            else ConditionalPutCommitter(FileCatalogBackend(cat))
        )

    seed = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    Store(spark, root, committer=make_committer()).put(
        "t", seed, order_by=["k"]
    )

    script = tmp_path / "crasher.py"
    script.write_text(_CRASH_WORKER_SRC)
    p = subprocess.run(
        [sys.executable, str(script), root, kind, cat, point],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (
        f"child was not SIGKILLed at {point}: rc={p.returncode}\n"
        f"{p.stdout}\n{p.stderr[-1500:]}"
    )
    assert "NO-CRASH" not in p.stdout

    # fresh handles after the crash: committed state only
    store = Store(spark, root, committer=make_committer())
    t = store.table("t")
    want = [1, 2] + ([100] if committed else [])
    got = sorted(r["k"] for r in t.df().collect())
    assert got == want, f"{point}: committed state wrong: {got} != {want}"

    tdir = os.path.join(root, "t")
    cur = store._read_meta("t")["current"]
    cur_no = int(cur.split("-")[1])
    debris = [
        e for e in os.listdir(tdir)
        if e.startswith("snap-") and os.path.isdir(os.path.join(tdir, e))
        and int(e.split("-")[1]) > cur_no
    ]
    if not committed and point in ("lock.post_rename", "cas.post_unique",
                                   "cas.pre_publish"):
        # the crashed attempt's renamed-but-never-committed snapshot dir
        assert debris, f"{point}: expected above-current crash debris"
        # never resolvable as a snapshot read
        with pytest.raises(StoreError):
            store.table("t", snapshot=cur_no + 1)
        assert store.snapshots("t") == [cur_no]
        # age-gated vacuum: fresh debris survives, 2-day-old debris goes
        store.vacuum()
        for e in debris:
            assert os.path.isdir(os.path.join(tdir, e)), (
                f"{point}: vacuum reclaimed debris inside the age gate "
                "(a live racer's in-flight rename looks identical)"
            )
        old = time.time() - 2 * 86400
        for e in debris:
            os.utime(os.path.join(tdir, e), (old, old))
        store.vacuum()
        for e in debris:
            assert not os.path.exists(os.path.join(tdir, e)), (
                f"{point}: vacuum left age-expired crash debris"
            )

    # the next writer proceeds and no committed update is lost
    t.append(spark.createDataFrame([(200, 200.0)], "k long, v double"))
    final = Store(spark, root, committer=make_committer()).table("t")
    got = sorted(r["k"] for r in final.df().collect())
    assert got == want + [200], f"{point}: post-crash append lost rows: {got}"
    assert final.nrows == len(want) + 1


# --------------------------------------------------------------------------
# Concurrent-writer mutation x evolution property test (round-10 verdict
# ask #6): the single-writer interleaving model (test_round14) run from TWO
# threads under BOTH durable committers. Interleaving makes a positional
# list-model nondeterministic, so the committed-winner invariants are what
# the model asserts instead, after EVERY successful op and at the end:
#   - no lost update: final row count == seed + the sum of the row-count
#     deltas of exactly the ops whose commits SUCCEEDED (a silently
#     dropped commit breaks the arithmetic; a doubled one breaks it the
#     other way);
#   - the committed state is always well-formed: _rowid dense 0..n-1,
#     catalog count == actual rows;
#   - schema evolution composes: each thread adds/drops only its OWN
#     column, so the final field set is exactly seed + the columns whose
#     add succeeded without a later successful drop, order-independent.
# Conflicted positional ops retry from a refreshed handle (the documented
# caller recipe); appends auto-retry internally.
# --------------------------------------------------------------------------

_CW_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "insert", "update", "delete", "add_field",
             "drop_field"]
        ),
        st.integers(0, 999),
        st.integers(1, 2),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(ops_a=_CW_OPS, ops_b=_CW_OPS,
       kind=st.sampled_from(["lockfile", "condput"]))
def test_concurrent_mutation_evolution_both_committers(
    spark, tmp_path_factory, ops_a, ops_b, kind
):
    import shutil
    import threading

    from pyspark.sql import functions as F

    from nimhdfstore_spark.rowid import ROWID
    from nimhdfstore_spark.store import (
        _RACER_PRUNE_ERRORS,
        ConditionalPutCommitter,
        FileCatalogBackend,
        LockfileCommitter,
        Store,
        StoreConflictError,
        StoreError,
    )

    base_dir = str(tmp_path_factory.mktemp("cwev"))
    root = os.path.join(base_dir, "store")
    cat = os.path.join(base_dir, "catalog.json")
    shutil.rmtree(root, ignore_errors=True)

    def make_committer():
        return (
            LockfileCommitter() if kind == "lockfile"
            else ConditionalPutCommitter(FileCatalogBackend(cat))
        )

    seed_n = 6
    # retention depth > 1: a racer's commit pruning the snapshot the other
    # thread planned from is a liveness hazard, not the property under
    # test — retained snapshots keep the retry loop clean
    store0 = Store(spark, root, committer=make_committer(), keep_snapshots=8)
    store0.put(
        "t",
        spark.createDataFrame([(i * 10,) for i in range(seed_n)], "v long"),
        order_by=["v"],
    )

    results: dict[str, dict] = {}
    errors: list[BaseException] = []
    retryable = (StoreConflictError,) + _RACER_PRUNE_ERRORS

    def worker(tag: str, ops, vbase: int) -> None:
        try:
            st_ = Store(
                spark, root, committer=make_committer(), keep_snapshots=8
            )
            t = st_.table("t")
            my_field = f"w{tag}"
            has_field = False
            delta = 0
            nxt = vbase
            for op, pos, width in ops:
                for _attempt in range(10):
                    try:
                        t.refresh()
                        cols = [
                            f.name for f in t.schema.fields if f.name != ROWID
                        ]

                        def payload(k):
                            nonlocal nxt
                            rows = [
                                tuple(nxt + j if c == "v" else nxt + j + 7
                                      for c in cols)
                                for j in range(k)
                            ]
                            nxt += k
                            return spark.createDataFrame(
                                rows, ", ".join(f"{c} long" for c in cols)
                            )

                        n = t.nrows
                        if op == "append":
                            t.append(payload(width))
                            delta += width
                        elif op == "insert":
                            t.insert(pos % (n + 1), payload(width))
                            delta += width
                        elif op == "update":
                            if n == 0:
                                break
                            a = pos % n
                            b = min(a + width - 1, n - 1)
                            t.update(a, payload(b - a + 1), b)
                        elif op == "delete":
                            if n == 0:
                                break
                            a = pos % n
                            b = min(a + width - 1, n - 1)
                            t.delete(a, b)
                            delta -= b - a + 1
                        elif op == "add_field":
                            if has_field:
                                break
                            t.add_field(my_field, "long", 0)
                            has_field = True
                        elif op == "drop_field":
                            if not has_field:
                                break
                            t.drop_field(my_field)
                            has_field = False
                        # committed-winner invariant after every success:
                        # dense rowids, catalog count == actual rows
                        t.refresh()
                        rid = [
                            r[ROWID]
                            for r in t.df().select(ROWID).orderBy(ROWID)
                            .collect()
                        ]
                        assert rid == list(range(len(rid))), (
                            f"{tag}/{op}: non-dense rowids {rid[:10]}..."
                        )
                        assert t.nrows == len(rid), (
                            f"{tag}/{op}: catalog count {t.nrows} != "
                            f"{len(rid)} actual rows"
                        )
                        break
                    except retryable:
                        t = st_.table("t")  # replan from committed state
                    except StoreError as e:
                        # a concurrent add/drop_field between this
                        # attempt's payload build and the append's schema
                        # gate surfaces as the documented payload-schema
                        # mismatch — the caller rebuilds the payload from
                        # the refreshed schema and retries; anything else
                        # is a real failure
                        if "payload schema" not in str(e):
                            raise
                        t = st_.table("t")
                else:
                    raise AssertionError(
                        f"{tag}/{op}: starved after 10 conflict retries"
                    )
            results[tag] = {"delta": delta, "field": has_field}
        except BaseException as e:  # surface thread failures in the test
            errors.append(e)

    ta = threading.Thread(target=worker, args=("a", ops_a, 1000))
    tb = threading.Thread(target=worker, args=("b", ops_b, 2000))
    ta.start(), tb.start()
    ta.join(180), tb.join(180)
    assert not errors, errors[0]
    assert set(results) == {"a", "b"}

    final = Store(spark, root, committer=make_committer()).table("t")
    want_n = seed_n + results["a"]["delta"] + results["b"]["delta"]
    rows = final.df().orderBy(ROWID).collect()
    assert final.nrows == want_n, (
        f"lost/duplicated update: {final.nrows} rows vs {want_n} committed"
    )
    assert [r[ROWID] for r in rows] == list(range(want_n))
    want_cols = {"v"} | {
        f"w{tag}" for tag in ("a", "b") if results[tag]["field"]
    }
    got_cols = {f.name for f in final.schema.fields if f.name != ROWID}
    assert got_cols == want_cols, f"schema diverged: {got_cols} != {want_cols}"


# --------------------------------------------------------------------------
# x210 TPC-H fused suite pins (round-11 extension-side merge)
# --------------------------------------------------------------------------

X210_MERGED_AWAY = [
    "x85_tpch_q3_topk", "x96_tpch_q5_join", "x100_tpch_q10_returns",
    "x102_tpch_q7_trade", "x103_tpch_q6_forecast", "x107_tpch_q17_small_qty",
    "x111_tpch_q8_mkt_share", "x112_tpch_q21_waiting",
    "x134_tpch_q20_excess_stock", "x135_tpch_q2_min_cost",
    "x136_tpch_q16_supplier_cnt", "x137_tpch_q9_profit",
]


def test_x210_merged_rows_absent():
    for name in X210_MERGED_AWAY:
        assert name not in Q.QUERIES, f"{name} must stay merged away"
        assert name not in Q.ORACLE
    assert "x210_tpch_suite" in Q.QUERIES
    assert "x210_tpch_suite" in Q.ORACLE


def test_x210_leg_matches_registered_oracle():
    from nimhdfstore_spark.queries import tpch

    leg = tpch._X210_LEG
    assert leg == Q.leg_choice("x210_tpch_suite", 12)
    assert Q.ORACLE["x210_tpch_suite"] == tpch._x210_oracle(leg)
    # twelve genuinely distinct oracles
    assert len({tpch._x210_oracle(i) for i in range(12)}) == 12
    # round-12: the returned leg is never one an archived green record
    # already hash-checked, until every leg has been checked once
    checked = Q.checked_legs("x210_tpch_suite", 12)
    if len(checked) < 12:
        assert leg not in checked


# --------------------------------------------------------------------------
# Round-11 fused extension suites (x211-x216) pins
# --------------------------------------------------------------------------

FUSED_MERGED_AWAY = {
    "x211_media_decode_suite": [
        "x185_png_resize_roundtrip", "x190_apng_frame_sample",
        "x197_jpeg_decode_pixels", "x198_avi_mjpeg_frame_sample",
        "x207_gif_frame_sample",
    ],
    "x212_text_quality_suite": [
        "x115_text_type_token_stats", "x159_bigram_lm_score",
        "x171_ngram_novelty", "x194_repetition_trim",
        "x200_unicode_nfc_normalize", "x201_html_to_text",
        "x204_readability_scores",
    ],
    "x213_stats_suite": [
        "x149_grouped_regression", "x165_chi_square_independence",
        "x170_correlation_matrix",
    ],
    "x214_sketch_suite": [
        "x139_hll_distinct_estimate", "x145_histogram_quantiles",
        "x173_sliding_hll_distinct",
    ],
    "x215_rollup_suite": [
        "x54_moving_average", "x147_ohlc_downsample",
        "x169_time_weighted_average",
    ],
    "x216_window_cube_suite": [
        "x83_window_suite", "x121_window_suite2", "x97_cube",
        "x122_grouping_sets", "x80_group_quantiles", "x163_winsorize",
    ],
}


def test_fused_suites_registered_and_parts_absent():
    for suite, parts in FUSED_MERGED_AWAY.items():
        assert suite in Q.QUERIES and suite in Q.ORACLE
        for name in parts:
            assert name not in Q.QUERIES, f"{name} must stay merged away"
            assert name not in Q.ORACLE


def test_fused_suite_legs_match_registered_oracles():
    from nimhdfstore_spark.queries import (
        multimodal, relational, sketches, text, timeseries,
    )

    assert multimodal._X211_LEG == Q.leg_choice("x211_media_decode_suite", 5)
    assert Q.ORACLE["x211_media_decode_suite"] == (
        multimodal._X211_SQLS[multimodal._X211_LEG]
    )
    assert text._X212_LEG == Q.leg_choice("x212_text_quality_suite", 7)
    assert Q.ORACLE["x212_text_quality_suite"] == getattr(
        text, text._X212_LEGS[text._X212_LEG][2]
    )
    assert relational._X213_LEG == Q.leg_choice("x213_stats_suite", 3)
    assert Q.ORACLE["x213_stats_suite"] == getattr(
        relational, relational._X213_LEGS[relational._X213_LEG][2]
    )
    assert sketches._X214_LEG == Q.leg_choice("x214_sketch_suite", 3)
    assert Q.ORACLE["x214_sketch_suite"] == (
        sketches._X214_LEGS[sketches._X214_LEG][2]
    )
    assert timeseries._X215_LEG == Q.leg_choice("x215_rollup_suite", 3)
    assert Q.ORACLE["x215_rollup_suite"] == getattr(
        timeseries, timeseries._X215_LEGS[timeseries._X215_LEG][2]
    )
    assert relational._X216_LEG == Q.leg_choice("x216_window_cube_suite", 6)
    assert Q.ORACLE["x216_window_cube_suite"] == getattr(
        relational, relational._X216_LEGS[relational._X216_LEG][2]
    )
    # until a suite's legs are all checked, the returned leg is fresh
    for suite, n in (
        ("x211_media_decode_suite", 5), ("x212_text_quality_suite", 7),
        ("x213_stats_suite", 3), ("x214_sketch_suite", 3),
        ("x215_rollup_suite", 3), ("x216_window_cube_suite", 6),
    ):
        checked = Q.checked_legs(suite, n)
        if len(checked) < n:
            assert Q.leg_choice(suite, n) not in checked


def test_leg_choice_covers_all_legs_despite_gaps():
    """Verdict r11 ask #3 pin: full leg coverage in <= n_legs GREEN
    records, regardless of missing rounds, replaying the greedy rule over
    synthetic record histories."""
    name, n = "x210_tpch_suite", 12
    # history: suite green at rotations 10, 11, 13, 14, ... (round 12's
    # record missing — rotation 12 never happened); every green record
    # checks a NEW leg until all 12 are covered
    records: list[tuple[int, set[str]]] = []
    rots = [10, 11] + list(range(13, 30))
    covered: set[int] = set()
    greens = 0
    for rot in rots:
        leg = Q._greedy_leg(rot, n, Q.checked_legs(name, n, records))
        if greens < n:
            assert leg not in covered, (rot, leg, covered)
        covered.add(leg)
        records.append((rot, {name}))
        greens += 1
        if len(covered) == n:
            break
    assert len(covered) == n and greens == n
    # historical replay exactness: the single r11 record (rotation 10,
    # empty checked set) reproduces the old rot%n choice
    assert Q.checked_legs(name, n, [(10, {name})]) == {10 % n}
    # a red round (record exists, suite not green) advances rotation but
    # marks nothing
    assert Q.checked_legs(name, n, [(10, set())]) == set()


# --------------------------------------------------------------------------
# Crash injection for the multi-table transaction: a kill between the
# per-table pointer flips exposes the DOCUMENTED prefix bound (flipped
# tables committed, the rest staged-only, readers never see a partial
# snapshot) — and nothing worse: the unflipped table serves its prior
# state, its staged .tmp- dir is invisible to snapshot listing and
# reclaimed age-gated, and both tables accept the next write.
# --------------------------------------------------------------------------

_TXN_CRASH_WORKER_SRC = '''
import os, sys
sys.path.insert(0, "/root/repo")
root = sys.argv[1]
os.environ["SPARK_GRAFT_CRASH_POINT"] = "txn.mid_flip"
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from nimhdfstore_spark.store import Store
store = Store(spark, root)
with store.transaction() as tx:
    tx.put("a", spark.createDataFrame([(10, 10.0)], "k long, v double"),
           order_by=["k"], overwrite=True)
    tx.put("b", spark.createDataFrame([(20, 20.0)], "k long, v double"),
           order_by=["k"], overwrite=True)
print("NO-CRASH")
'''


def test_crash_injected_transaction_prefix_bound(spark, tmp_path):
    import signal
    import subprocess
    import sys
    import time

    from nimhdfstore_spark.store import Store

    root = str(tmp_path / "store")
    store = Store(spark, root)
    for name in ("a", "b"):
        store.put(
            name,
            spark.createDataFrame([(1, 1.0)], "k long, v double"),
            order_by=["k"],
        )

    script = tmp_path / "txn_crasher.py"
    script.write_text(_TXN_CRASH_WORKER_SRC)
    p = subprocess.run(
        [sys.executable, str(script), root],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (
        f"child not SIGKILLed: rc={p.returncode}\n{p.stdout}\n"
        f"{p.stderr[-1500:]}"
    )

    # prefix bound: table 'a' (first flip) committed, 'b' at prior state
    store2 = Store(spark, root)
    ka = sorted(r["k"] for r in store2.table("a").df().collect())
    kb = sorted(r["k"] for r in store2.table("b").df().collect())
    assert ka == [10], f"first-flipped table must be committed: {ka}"
    assert kb == [1], f"unflipped table must serve its prior state: {kb}"

    # b's staged snapshot is .tmp- debris: not a snapshot, reclaimed only
    # past the age gate
    bdir = os.path.join(root, "b")
    staged = [e for e in os.listdir(bdir) if e.startswith(".tmp-snap-")]
    assert staged, "expected the unflipped staged dir as debris"
    assert store2.snapshots("b") == [0]
    store2.vacuum()
    for e in staged:
        assert os.path.isdir(os.path.join(bdir, e)), "age gate violated"
    old = time.time() - 2 * 86400
    for e in staged:
        os.utime(os.path.join(bdir, e), (old, old))
    store2.vacuum()
    for e in staged:
        assert not os.path.exists(os.path.join(bdir, e)), (
            "age-expired staged debris not reclaimed"
        )

    # both tables accept the next write
    for name, want in (("a", [10, 99]), ("b", [1, 99])):
        t = store2.table(name)
        t.append(spark.createDataFrame([(99, 9.9)], "k long, v double"))
        got = sorted(r["k"] for r in t.df().collect())
        assert got == want, f"{name}: post-crash append broken: {got}"


# --------------------------------------------------------------------------
# Plan gates for the fused suites: fusing 12-24 plans into one action must
# not smuggle in a cartesian/nested-loop join that the per-leg plan tests
# (test_round3_ops/test_plans) would have caught on the individual rows.
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name", [
    "x210_tpch_suite", "x212_text_quality_suite", "x213_stats_suite",
    "x216_window_cube_suite", "q34_incremental_suite",
])
def test_fused_suite_returned_plan_no_cartesian(spark, name):
    """Round-13 rewrite (verdict ask #1): the blanket BNLJ ban went red
    when rotation 12 flipped x212's returned leg to x115, whose corpus-
    total join broadcasts a ONE-ROW global aggregate — a legitimate,
    scale-safe nested loop at any corpus size. The gate now holds at
    EVERY rotation: cartesians and multi-row-build nested loops only."""
    from tests._plancheck import assert_no_unbounded_nested_loop

    df = Q.QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_no_unbounded_nested_loop(df)


def test_every_fused_leg_plan_no_unbounded_nested_loop(spark):
    """Gate EVERY leg of every fused suite (39 legs), not just the leg
    the current rotation returns (verdict r12 ask #1): builds each leg's
    frame directly from the leg tables — pure Catalyst analysis, no fused
    checksum execution — so the gate is rotation-independent and a plan
    regression in a leg is caught the round it lands, not n_legs rounds
    later when the rotation reaches it."""
    from tests._plancheck import bnlj_violations, fused_leg_builders

    legs = fused_leg_builders()
    assert len(legs) == 39
    bad = {}
    for suite, tag, build in legs:
        df = build(spark, "/root/testdata/sf0.001")
        v = bnlj_violations(
            df._jdf.queryExecution().executedPlan().toString()
        )
        if v:
            bad[f"{suite}:{tag}"] = v
    assert not bad, f"unbounded nested-loop plans in fused legs: {bad}"
