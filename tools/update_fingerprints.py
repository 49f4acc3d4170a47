#!/usr/bin/env python
"""Rebuild FPRINTS.json — the per-query implementation fingerprints the
driver-verification staleness check compares against (round-12 verdict
ask #3).

For every registry name, find its LATEST green driver record
(CORRECTNESS_rK.json), resolve the git commit whose tree that sweep
actually tested (the "round K: verdict/..." marker commit — the driver
archives the record in that commit on top of the code it swept), and
compute the fingerprint of the query's implementation IN THAT TREE via
the same recipe the registry applies to the working tree
(``nimhdfstore_spark.queries.fingerprint_source``). A name whose
historical source cannot be resolved (module moved, function renamed,
round predates the marker convention) gets ``null`` — permanently stale
until a new green record supersedes it.

Idempotent and working-tree-independent: every fingerprint is computed
from git history, so the tool can run at any point in a round and always
produces the same table for the same set of archived records. Run it
once at round start (after the driver lands the previous round's
record + marker commit).
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from nimhdfstore_spark import queries as registry  # noqa: E402

registry.load_all()


def round_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "-C", ROOT, "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout
    marks: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            # newest first; keep the first (latest) marker per round
            marks.setdefault(int(m.group(2)), m.group(1))
    return marks


def green_rounds() -> dict[str, int]:
    """name -> latest round whose record shows the row fully green."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        k = int(m.group(1))
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
                and latest.get(name, -1) < k
            ):
                latest[name] = k
    return latest


@functools.lru_cache(maxsize=4096)
def _git_show(commit: str, rel: str) -> str | None:
    p = subprocess.run(
        ["git", "-C", ROOT, "show", f"{commit}:{rel}"],
        capture_output=True, text=True,
    )
    return p.stdout if p.returncode == 0 else None


def historical_fingerprint(name: str, commit: str) -> str | None:
    fn = registry.QUERIES[name]
    module_rel = fn.__module__.replace(".", "/") + ".py"

    def read(rel: str) -> str | None:
        return _git_show(commit, rel)

    def exists(rel: str) -> bool:
        return _git_show(commit, rel) is not None

    return registry.fingerprint_source(
        fn.__name__, module_rel, read, exists, registry.ORACLE.get(name)
    )


def main() -> None:
    marks = round_commits()
    greens = green_rounds()
    fp: dict[str, str | None] = {}
    rounds: dict[str, int] = {}
    unresolved = []
    for name in sorted(registry.QUERIES):
        k = greens.get(name)
        if k is None:
            continue  # never green: already in the fresh partition
        commit = marks.get(k)
        h = historical_fingerprint(name, commit) if commit else None
        fp[name] = h
        rounds[name] = k
        if h is None:
            unresolved.append(name)
    out = {"fp": fp, "round": rounds}
    with open(os.path.join(ROOT, "FPRINTS.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    stale = sorted(
        n for n, h in fp.items()
        if h is None or h != registry.impl_fingerprint(n)
    )
    print(f"recorded {len(fp)} fingerprints "
          f"({len(unresolved)} unresolved -> stale)")
    print(f"stale vs working tree ({len(stale)}): {stale}")


if __name__ == "__main__":
    main()
