"""Shared physical-plan gate helpers.

Round-13 (verdict ask #1): the blanket ``"BroadcastNestedLoopJoin" not in
plan`` gate was wrong — broadcasting a ONE-ROW global aggregate (an
x106-style max-compare, x115's corpus-total join) is planned by Spark as
an inner BroadcastNestedLoopJoin and is legitimate at any data scale: the
build side is exactly one row regardless of corpus size, so the "nested
loop" is a constant-fold against each probe row. The r12 driver record
rotated x212's returned leg onto x115 and the gate went red on a correct,
scale-safe plan.

``bnlj_violations`` parses the executed-plan tree text and flags a
BroadcastNestedLoopJoin ONLY when its build side is not provably <= 1 row
(a global aggregate — ``keys=[]`` — or ``GlobalLimit 1`` reached through
row-count-preserving wrappers). CartesianProduct is always flagged.
"""

from __future__ import annotations

import re

_MARK = re.compile(r"^(?P<pre>[ :]*)[+:]-\s(?P<body>.*)$")

#: node prefixes that cannot INCREASE the build side's row count while we
#: walk its first-child spine looking for the 1-row producer. Filter and
#: Project only drop/reshape rows; exchanges, codegen wrappers and AQE
#: query stages pass rows through unchanged.
_SPINE_OK = (
    "BroadcastExchange", "Exchange", "ShuffleExchange", "AQEShuffleRead",
    "ShuffleQueryStage", "BroadcastQueryStage", "TableCacheQueryStage",
    "InputAdapter", "WholeStageCodegen", "ColumnarToRow", "RowToColumnar",
    "Project", "Filter", "Sort ", "Coalesce", "InMemoryTableScan",
    "AdaptiveSparkPlan", "ResultQueryStage",
)

_SINGLETON = re.compile(
    r"^(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]"
)


def _strip(body: str) -> str:
    """Drop the whole-stage-codegen star prefix ``*(3) ``."""
    return re.sub(r"^\*\(\d+\)\s", "", body)


def _parse(plan: str) -> list[tuple[int, str]]:
    """``(marker_depth, body)`` per plan-tree line; lines with no tree
    marker (the root operator, ``== Physical Plan ==`` style headers,
    subquery banners) get depth -3 so root children at depth 0 parse as
    their children."""
    out: list[tuple[int, str]] = []
    for line in plan.splitlines():
        m = _MARK.match(line)
        if m:
            out.append((len(m.group("pre")), m.group("body")))
        elif line.strip():
            out.append((-3, line.strip()))
    return out


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    d = nodes[i][0]
    kids = []
    for j in range(i + 1, len(nodes)):
        dj = nodes[j][0]
        if dj <= d:
            break
        if dj == d + 3:
            kids.append(j)
    return kids


def _spine_is_singleton(nodes: list[tuple[int, str]], k: int) -> bool:
    """True iff the subtree rooted at ``k`` provably yields <= 1 row,
    walking the first-child spine through row-count-preserving nodes."""
    i = k
    while True:
        b = _strip(nodes[i][1])
        if _SINGLETON.match(b):
            return True
        if b.startswith("GlobalLimit 1,") or b == "GlobalLimit 1" or (
            b.startswith("CollectLimit 1,") or b == "CollectLimit 1"
        ):
            return True
        if b.startswith("Scan OneRowRelation") or re.match(
            r"Range \(0, 1, step=1", b
        ):
            return True
        m = re.match(r"Generate explode\(\[([^\]]*)\]\)", b)
        if m and "#" not in m.group(1):
            # exploding a LITERAL array (no attribute refs) multiplies the
            # child's rows by a plan-time constant — bounded iff the child
            # is; fall through to keep walking the spine.
            pass
        elif not b.startswith(_SPINE_OK):
            return False
        kids = _children(nodes, i)
        if not kids:
            return False
        i = kids[0]


def bnlj_violations(plan: str) -> list[str]:
    """Offending join node lines: every CartesianProduct, and every
    BroadcastNestedLoopJoin whose build side is not provably <= 1 row."""
    nodes = _parse(plan)
    bad: list[str] = []
    for i, (_, body) in enumerate(nodes):
        b = _strip(body)
        if b.startswith("CartesianProduct"):
            bad.append(b)
        elif b.startswith("BroadcastNestedLoopJoin"):
            kids = _children(nodes, i)
            build = 0 if "BuildLeft" in b else 1
            if len(kids) < 2 or not _spine_is_singleton(nodes, kids[build]):
                bad.append(b)
    return bad


def assert_no_unbounded_nested_loop(df) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = bnlj_violations(plan)
    assert not bad, f"unbounded nested-loop/cartesian join(s): {bad}\n{plan}"


def fused_leg_builders() -> list[tuple[str, str, object]]:
    """``(suite, leg_tag, builder)`` for EVERY leg of every fused
    extension suite — builders are the underlying pure leg functions, so a
    plan gate can inspect each leg without executing the fused checksum
    pass (and without depending on which leg the current rotation
    returns — the r12 red was exactly that state-dependence)."""
    import nimhdfstore_spark.queries.multimodal as mm
    import nimhdfstore_spark.queries.relational as rel
    import nimhdfstore_spark.queries.sketches as sk
    import nimhdfstore_spark.queries.text as tx
    import nimhdfstore_spark.queries.timeseries as ts
    import nimhdfstore_spark.queries.tpch as tp

    out: list[tuple[str, str, object]] = []
    for tag, mod, fn, _ in tp._X210_LEG_DEFS:
        src = rel if mod == "relational" else tp
        out.append(("x210_tpch_suite", tag, getattr(src, fn)))
    for tag, fn in (
        ("png_resize", "x185"), ("apng_sample", "x190"),
        ("jpeg_decode", "x197"), ("avi_sample", "x198"),
        ("gif_sample", "x207"),
    ):
        out.append(("x211_media_decode_suite", tag, getattr(mm, fn)))
    for tag, fn, _ in tx._X212_LEGS:
        out.append(("x212_text_quality_suite", tag, getattr(tx, fn)))
    for tag, fn, _, _ in rel._X213_LEGS:
        out.append(("x213_stats_suite", tag, getattr(rel, fn)))
    for tag, fn, _ in sk._X214_LEGS:
        out.append(("x214_sketch_suite", tag, getattr(sk, fn)))
    for tag, fn, _ in ts._X215_LEGS:
        out.append(("x215_rollup_suite", tag, getattr(ts, fn)))
    for tag, fn, _, _ in rel._X216_LEGS:
        out.append(("x216_window_cube_suite", tag, getattr(rel, fn)))
    return out
