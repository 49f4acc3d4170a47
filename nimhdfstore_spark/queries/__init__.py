"""Declared query registry — the SURVEY §2.14 correctness contract.

Each query is registered under a stable name with (a) a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (b) where SQL-expressible, a DuckDB
oracle string over the same Parquet tables. The driver hash-compares the two
at sf0.01; ``tests/test_queries_oracle.py`` does the same locally at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
FAMILY: dict[str, str] = {}  # query name -> registering module basename

#: oracles whose CORRECT result is zero rows at some sf — every name here
#: must carry a comment at the registration site saying why. An unlisted
#: empty oracle is a registry bug: a driver row verifying `0 == 0` proves
#: nothing (round-7 verdict: x57's anti-join was empty at every sf because
#: the generator references every custkey). tests/test_round12.py sweeps
#: every oracle at sf0.01 and fails on unannotated empties.
EXPECTED_EMPTY: set[str] = set()

_ROTATION_SNAPSHOT: int | None = None  # per-process file-count cache
_VERIFIED_SNAPSHOT: set[str] | None = None  # per-process verified-name cache
_STALE_SNAPSHOT: set[str] | None = None  # per-process stale-name cache

#: Leg counts of the fused extension suites (one driver row, N rotating
#: verified legs each). Core suites rotate legs too, but all 17 core rows
#: sit inside the driver's 50-row window every round, so only the
#: extension suites need sweep-slot pinning to keep their legs advancing.
SUITE_LEGS: dict[str, int] = {
    "x210_tpch_suite": 12,
    "x211_media_decode_suite": 5,
    "x212_text_quality_suite": 7,
    "x213_stats_suite": 3,
    "x214_sketch_suite": 3,
    "x215_rollup_suite": 3,
    "x216_window_cube_suite": 6,
}

#: Round-scoped verification priorities (round-10 verdict ask #5,
#: extended round 13 per verdict ask #2): a listed name sorts to the
#: front of whichever partition it currently occupies —
#:   * never-driver-verified (or fingerprint-stale): front of the fresh
#:     partition, ahead of the cyclic shift, guaranteeing a driver slot;
#:   * verified fused suite with unchecked legs (``SUITE_LEGS`` /
#:     ``checked_legs``): front of the re-verification region, so each
#:     green round hash-checks one NEW leg until all legs are covered;
#:   * verified and fully leg-checked: no effect (self-draining).
#: Round 14 (r13 verdict ask #1): the 14 rows round 13 rewrote that the
#: r13 rotation happened not to sample — their green records tested the
#: PRE-rewrite code, so the driver must re-verify the current
#: implementation this round. All 14 are fingerprint-stale (the r13
#: rewrites touched their functions or 1-level module closure), so they
#: front the stale partition at positions ~24-37 of ``sweep_order`` —
#: inside the driver's ~50-row budget. The seven fused suites stay pinned
#: for leg coverage (7/39 checked); x30/x32 drained (driver-green on the
#: current code in r13).
SWEEP_PRIORITY: list[str] = [
    "x210_tpch_suite",
    "x211_media_decode_suite",
    "x212_text_quality_suite",
    "x213_stats_suite",
    "x214_sketch_suite",
    "x215_rollup_suite",
    "x216_window_cube_suite",
    "x153_entity_resolution",
    "x148_triangle_count",
    "x196_stream_incremental_dedup",
    "x186_media_dispatch_pipeline",
    "x209_empty_table_lifecycle",
    "x208_incremental_index_append",
    "x189_ann_ivf_persisted",
    "x140_dedup_incremental",
    "x127_stream_merge_upsert",
    "x166_stream_deferred_deletes",
    "x131_stream_stream_left_outer",
    "x132_stream_timeout_sessions",
    "x65_stream_session_window",
    "x66_stream_stream_join",
    # round-14 rewrites (lineage cuts, knn_graph gate fuse,
    # connected_components LocalRelation mapping, LSH hot-bucket spec):
    # front these behind the round-13 block so this round's edits also
    # land inside the driver's oracle window
    "x116_pagerank_trade",
    "x167_pair_lift",
    "x177_knn_graph",
    "x178_mutual_knn_clusters",
    "x35_dedup_components",
    "x90_pipeline_clean_corpus",
    "x34_dedup_embedding_cosine",
    "x183_dedup_multiprobe_lsh",
]


def query(name: str, sql: str | None = None):
    """Register a declared query; ``sql=None`` marks it rows-only checked
    (non-SQL-expressible, e.g. hash-dependent LSH or streaming state)."""

    def deco(fn):
        QUERIES[name] = fn
        FAMILY[name] = fn.__module__.rsplit(".", 1)[-1]
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def sweep_rotation() -> int:
    """Cumulative driver-round counter used to rotate the extension lanes.

    The external sweep verifies only ~50 entries per round; without rotation
    the same three extension representatives would occupy slots 48–50
    forever (round-5 verdict ask #1).  The counter is the number of
    ``CORRECTNESS_r*.json`` records the driver has already archived at the
    repo root: persisted state that advances exactly once per round and is
    stable *within* a round (the driver writes the new record only after
    the sweep completes, so ``queries()`` / ``oracle_sql()`` / bench all see
    one value).  ``SPARK_GRAFT_SWEEP_ROTATION`` overrides for tests.

    The file count is SNAPSHOT once per process (ADVICE r6: q29's leg was
    captured at module import while ``sweep_order()`` re-globbed per call —
    a record archived mid-process could make the verified leg disagree with
    the rotated slots in the same sweep). The env override stays dynamic so
    rotation property tests can vary it without reloading modules.
    """
    import glob
    import os

    env = os.environ.get("SPARK_GRAFT_SWEEP_ROTATION")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    global _ROTATION_SNAPSHOT
    if _ROTATION_SNAPSHOT is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        try:
            _ROTATION_SNAPSHOT = len(
                glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
            )
        except OSError:
            _ROTATION_SNAPSHOT = 0
    return _ROTATION_SNAPSHOT


def driver_verified() -> set[str]:
    """Query names already verified green by an archived driver sweep.

    Reads the ``CORRECTNESS_r*.json`` records at the repo root (the same
    persisted state ``sweep_rotation`` counts) and returns every name whose
    row passed all three checks (rows/schema/hash, no error) in ANY round.
    Snapshot once per process, like the rotation counter, so a record
    archived mid-process cannot split one sweep's ordering.

    Round-7 verdict "what's wrong" #2: the position-only rotation had no
    memory of what was already green — round 7 spent 2 of its 5 extension
    slots re-verifying r02 entries while ~131 entries had never seen a
    driver row. ``sweep_order`` uses this set to put never-verified
    entries first. ``SPARK_GRAFT_SWEEP_VERIFIED`` (comma-separated names;
    empty string = empty set) overrides for tests.
    """
    import glob
    import json
    import os

    env = os.environ.get("SPARK_GRAFT_SWEEP_VERIFIED")
    if env is not None:
        return {n for n in env.split(",") if n}
    global _VERIFIED_SNAPSHOT
    if _VERIFIED_SNAPSHOT is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        out: set[str] = set()
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            if not isinstance(rec, dict):
                continue
            for name, row in rec.items():
                if (
                    isinstance(row, dict)
                    and row.get("err") is None
                    and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    out.add(name)
        _VERIFIED_SNAPSHOT = out
    return _VERIFIED_SNAPSHOT


def _pkg_refs(text: str) -> set[str]:
    import re

    return set(re.findall(r"nimhdfstore_spark(?:\.[A-Za-z0-9_]+)+", text))


def fingerprint_source(
    fn_name: str,
    module_rel: str,
    read,
    exists,
    oracle: str | None = None,
) -> str | None:
    """Implementation fingerprint of one registered query, computed
    against an arbitrary source tree (round-12 verdict ask #3 — mirror
    the bench's per-query source fingerprints on the VERIFICATION side,
    so a row whose implementation changed since its last driver-green
    re-enters the fresh partition of ``sweep_order``).

    Recipe: sha1 over (a) the registered function's own source segment
    (decorators included, extracted by ast so the recipe is identical for
    the working tree and for historical git trees), (b) its registered
    oracle text, and (c) the FULL text of every package module referenced
    by the function body or by the defining module's import lines —
     a 1-level closure, so rewriting an operator kernel (x30/x32's r6
    rewrite — the motivating cases) stales its dependents. Same-module
    helper drift is deliberately not hashed, matching the bench's stance
    (bench.py `_query_fingerprints`): hashing the whole defining module
    would stale every sibling row on any one-row edit and flood the
    sweep's ~26 re-verification slots.

    ``read(rel_path) -> str | None`` and ``exists(rel_path) -> bool``
    abstract the tree (filesystem now, ``git show`` for the tree a past
    driver record actually tested). Returns None when the function cannot
    be located — callers treat that as stale."""
    import ast
    import hashlib
    import re

    text = read(module_rel)
    if text is None:
        return None
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    lines = text.splitlines(keepends=True)
    seg = None
    for node in tree.body:
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name == fn_name
        ):
            start = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            ) - 1
            seg = "".join(lines[start : node.end_lineno])
            break
    if seg is None:
        return None
    import_lines = [
        line
        for line in text.splitlines()
        if re.match(r"\s*(from|import)\s+nimhdfstore_spark", line)
    ]
    refs = _pkg_refs(seg) | _pkg_refs("\n".join(import_lines))
    for line in import_lines:
        m = re.match(
            r"\s*from\s+(nimhdfstore_spark[\w.]*)\s+import\s+(.+)", line
        )
        if m:
            base = m.group(1)
            for sym in m.group(2).split(","):
                sym = sym.split(" as ")[0].strip().strip("()")
                if sym.isidentifier():
                    refs.add(f"{base}.{sym}")
    # the registry itself and the measured cost table are sweep
    # BOOKKEEPING, not query implementation — every module imports the
    # registry for @query, so including it would stale all 166 rows on
    # any sweep-machinery edit (exactly what happened on first run)
    skip = {
        module_rel,
        "nimhdfstore_spark/queries/__init__.py",
        "nimhdfstore_spark/queries/_costs.py",
    }
    paths = set()
    for r in sorted(refs):
        rel = r.replace(".", "/")
        for cand in (rel + ".py", rel + "/__init__.py"):
            if cand not in skip and exists(cand):
                paths.add(cand)
                break
    h = hashlib.sha1()
    h.update(seg.encode())
    h.update(b"\0" + (oracle or "").encode())
    for p in sorted(paths):
        h.update(b"\0" + p.encode() + b"\0" + (read(p) or "").encode())
    return h.hexdigest()[:16]


def _repo_root() -> str:
    import os

    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def impl_fingerprint(name: str) -> str | None:
    """Working-tree fingerprint of a registered query (recipe above)."""
    import os

    fn = QUERIES[name]
    module_rel = fn.__module__.replace(".", "/") + ".py"
    root = _repo_root()

    def read(rel):
        try:
            with open(os.path.join(root, rel)) as f:
                return f.read()
        except OSError:
            return None

    def exists(rel):
        return os.path.isfile(os.path.join(root, rel))

    return fingerprint_source(
        fn.__name__, module_rel, read, exists, ORACLE.get(name)
    )


def recorded_fingerprints() -> dict[str, str | None]:
    """``FPRINTS.json`` at the repo root: per query name, the fingerprint
    of the implementation its LAST green driver record actually tested
    (rebuilt idempotently by ``tools/update_fingerprints.py`` from the
    archived records + the per-round driver commits; ``None`` = the
    historical source could not be resolved, treated as stale)."""
    import json
    import os

    try:
        with open(os.path.join(_repo_root(), "FPRINTS.json")) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return {}
    fp = rec.get("fp")
    return fp if isinstance(fp, dict) else {}


def stale_verified() -> set[str]:
    """Driver-verified names whose implementation fingerprint changed
    since their last green record — indistinguishable from fresh greens
    before round 13 (verdict ask #3). These re-enter the fresh partition
    of ``sweep_order`` so the driver re-verifies the CURRENT code, not
    the code of the round that went green. Missing entries (no recorded
    fingerprint — e.g. the tool has not run since a new row registered)
    are NOT stale: they are either never-verified (already fresh) or
    freshly recorded next round. Snapshot once per process.
    ``SPARK_GRAFT_SWEEP_STALE`` (comma-separated; "" = empty) overrides
    for tests."""
    import os

    env = os.environ.get("SPARK_GRAFT_SWEEP_STALE")
    if env is not None:
        return {n for n in env.split(",") if n}
    global _STALE_SNAPSHOT
    if _STALE_SNAPSHOT is None:
        recorded = recorded_fingerprints()
        out = set()
        for name in QUERIES:
            if name not in recorded:
                continue
            want = recorded[name]
            if want is None or want != impl_fingerprint(name):
                out.add(name)
        _STALE_SNAPSHOT = out
    return _STALE_SNAPSHOT


_LEG_RECORDS_SNAPSHOT: list[tuple[int, set[str]]] | None = None


def leg_records() -> list[tuple[int, set[str]]]:
    """Per archived driver record: ``(rotation_at_sweep_time, green_names)``.

    The rotation the registry saw DURING round K's sweep equals the number
    of ``CORRECTNESS_r*.json`` records already archived at that moment —
    i.e. the count of records with round number < K (the driver writes
    round K's record only after its sweep completes). That reconstruction
    stays correct even when a round crashed and left no record: the
    missing round simply never incremented anyone's rotation. Snapshot
    once per process like the other registry state.
    ``SPARK_GRAFT_LEG_RECORDS`` overrides for tests
    (format ``"rot:name1|name2;rot:name3"``; empty string = no records).
    """
    import glob
    import json
    import os
    import re

    env = os.environ.get("SPARK_GRAFT_LEG_RECORDS")
    if env is not None:
        out = []
        for part in env.split(";"):
            if not part.strip():
                continue
            rot, names = part.split(":", 1)
            out.append((int(rot), {n for n in names.split("|") if n}))
        return out
    global _LEG_RECORDS_SNAPSHOT
    if _LEG_RECORDS_SNAPSHOT is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        rounds: dict[int, set[str]] = {}
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            if not isinstance(rec, dict):
                continue
            greens = {
                name
                for name, row in rec.items()
                if isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            }
            rounds[int(m.group(1))] = greens
        ks = sorted(rounds)
        _LEG_RECORDS_SNAPSHOT = [
            (sum(1 for j in ks if j < k), rounds[k]) for k in ks
        ]
    return _LEG_RECORDS_SNAPSHOT


def checked_legs(
    name: str, n_legs: int,
    records: list[tuple[int, set[str]]] | None = None,
) -> set[int]:
    """Leg indices of suite ``name`` that have already occupied the
    driver-hash-checked (returned/oracle) position in a GREEN driver row.

    A suite row green in a record taken at rotation ``r`` proves leg
    ``choice(r)`` was engine-independently verified. For records predating
    this mechanism the choice was ``r % n_legs``; replaying the greedy
    rule below over the sorted records reproduces that for the historical
    rounds (the fused suites first went green at exactly one record each)
    and stays exact going forward."""
    recs = leg_records() if records is None else records
    checked: set[int] = set()
    for rot, greens in sorted(recs):
        if name in greens:
            checked.add(_greedy_leg(rot, n_legs, checked))
    return checked


def _greedy_leg(rotation: int, n_legs: int, checked: set[int]) -> int:
    unchecked = [i for i in range(n_legs) if i not in checked]
    if unchecked:
        return unchecked[rotation % len(unchecked)]
    return rotation % n_legs


def leg_choice(
    name: str, n_legs: int,
    records: list[tuple[int, set[str]]] | None = None,
) -> int:
    """Returned-leg index for fused suite ``name`` this round: the first
    never-driver-checked leg (rotated within the unchecked set so a leg
    that keeps failing verification doesn't pin the slot), falling back to
    plain rotation once every leg has been checked at least once.

    Round-11 verdict ask #3: with plain ``rotation % n_legs`` a suite's
    full leg coverage needs ``n_legs`` CONSECUTIVE archived records —
    a single missing round (driver crash, budget cut) skips that round's
    leg for a whole extra cycle. Preferring never-checked legs guarantees
    full coverage after ``n_legs`` GREEN records, regardless of gaps:
    a missing record leaves the rotation counter unchanged, so the same
    unchecked leg is simply offered again."""
    checked = checked_legs(name, n_legs, records)
    return _greedy_leg(sweep_rotation(), n_legs, checked)


def sweep_order() -> list[str]:
    """Registry names ordered for a time-budgeted external sweep.

    The grading driver checks queries in ``queries()`` insertion order and
    stops when its budget runs out (round-2 CORRECTNESS recorded 52 of 170).
    Order for maximum coverage-per-minute: the reference-parity core suite
    first — q01 (the flagship full-scan hash) leading, the rest ascending
    by measured sweep cost (``_costs.py``) so a budget cut mid-core still
    checked the most queries — then a round-robin across the extension
    families, each family lane also cheapest-first, so a truncated sweep
    samples every operator family at its cheapest representative.

    The extension ordering rotates per driver round (``sweep_rotation()``):
    the interleaved lane sequence is one fixed cycle over all extension
    entries, rotated left by ``3·r`` — so the ~3 extension slots under the
    driver's ~50-entry cap verify three *new* entries every round
    (consecutive rounds are disjoint until the cycle wraps), every family
    lands in a driver slot within ``ceil(L/3)+1`` rounds, and every
    extension entry is driver-verified within ``ceil(len(ext)/3)`` rounds.
    The core suite is unaffected by rotation.
    """
    try:
        from nimhdfstore_spark.queries._costs import COSTS
    except ImportError:  # regenerating the table: fall back to name order
        COSTS = {}

    def cost(n: str) -> tuple:
        return (COSTS.get(n, 1.0), n)  # name tie-break keeps order stable

    core = sorted((n for n in QUERIES if n.startswith("q")), key=cost)
    if "q01_full_scan" in core:
        core.remove("q01_full_scan")
        core.insert(0, "q01_full_scan")
    rest: dict[str, list[str]] = {}
    for n in sorted(QUERIES):
        if n in core or n.startswith("q"):
            continue
        rest.setdefault(FAMILY.get(n, "misc"), []).append(n)
    out = list(core)
    lanes = [sorted(rest[f], key=cost) for f in sorted(rest)]
    flat: list[str] = []
    for i in range(max((len(l) for l in lanes), default=0)):
        for lane in lanes:
            if i < len(lane):
                flat.append(lane[i])
    if flat:
        # Never-driver-verified entries first (round-7 verdict ask #2): the
        # driver's extension slots land on the FRONT of this list, so
        # re-offering already-green entries wastes verification breadth.
        # The 3·r cyclic shift still applies WITHIN the fresh partition as
        # a safety net — if a slot fails to verify (driver timeout, flaky
        # window) it stays fresh, and without the shift it would pin the
        # front forever; with it, the next round samples past it. All
        # partitions keep the family-interleaved cheapest-first order.
        #
        # Round-13 partition order (verdict asks #2/#3):
        #   1. never-driver-verified        (first verification is urgent)
        #   2. pinned fused suites with unchecked legs (SWEEP_PRIORITY ∩
        #      SUITE_LEGS — each green round hash-checks one NEW leg)
        #   3. fingerprint-stale verified rows (their green record tested
        #      an older implementation — re-verify the current one)
        #   4. the rest, rotated (ADVICE r8: once nothing needs a slot,
        #      the shift spreads RE-verification across the registry)
        seen = driver_verified()
        stale = stale_verified() & seen
        fresh = [n for n in flat if n not in seen]
        pinned = [
            n
            for n in SWEEP_PRIORITY
            if n in SUITE_LEGS
            and n in seen
            and len(checked_legs(n, SUITE_LEGS[n])) < SUITE_LEGS[n]
        ]
        staled = [n for n in flat if n in stale and n not in pinned]
        done = [
            n
            for n in flat
            if n in seen and n not in stale and n not in pinned
        ]
        # Fresh-partition priorities land at the very front, in list
        # order, BEFORE the cyclic shift (which then only rotates the
        # non-priority remainder). See SWEEP_PRIORITY.
        prio = [n for n in SWEEP_PRIORITY if n in QUERIES and n not in seen]
        fresh = [n for n in fresh if n not in set(prio)]

        def shift(part: list[str]) -> list[str]:
            if not part:
                return part
            s = (3 * sweep_rotation()) % len(part)
            return part[s:] + part[:s]

        # Stale-partition priorities front their partition too (the
        # shift only rotates the non-priority remainder), mirroring the
        # fresh-partition rule.
        prio_stale = [n for n in SWEEP_PRIORITY if n in staled]
        staled = [n for n in staled if n not in set(prio_stale)]
        flat = (
            prio + shift(fresh) + pinned
            + prio_stale + shift(staled) + shift(done)
        )
    out.extend(flat)
    return out


def load_all() -> None:
    """Import every query module (registration side effects).

    Imports are NOT guarded: a broken query module must fail loudly here,
    not silently shrink the registry (the driver would just report fewer
    queries). Optional deps are gated inside the individual modules."""
    from nimhdfstore_spark.queries import core  # noqa: F401

    for mod in ("datasets", "dedup", "graph", "ir", "pipeline", "quality",
                "relational", "sampling", "similarity", "sinks", "sketches",
                "text", "timeseries", "tpch", "multimodal", "stream"):
        __import__(f"nimhdfstore_spark.queries.{mod}")
