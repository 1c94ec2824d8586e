"""Mechanized rotation-staleness audit (VERDICT r6 item 7).

A driver correctness row is only evidence for the code that existed when
it was graded. This module computes, for every registered query, the
freshest GREEN driver round and whether the query's implementing code
(its registry module plus the transitive in-package import closure)
changed after that round's boundary commit. The debt classes:

- ``never``   — no green driver row in any CORRECTNESS_r*.json;
- ``expired`` — freshest green row is >= STALE_ROUNDS rounds old at the
  coming close;
- ``changed`` — some file in the query's import closure has a commit
  newer than the boundary commit of its freshest green round.

``tests/test_rotation_staleness.py`` asserts the rotation in
``__spark_entry__._PRIORITY`` spends the driver's ~50-row budget on this
debt before anything fresh; ``python tools/staleness.py`` prints the
audit so each round's rotation can be GENERATED from it instead of
hand-reconciled prose (the round-6 provenance section of BENCH_NOTES).

Greenness matches the driver: hash_match true, or the documented
rows-only check for approximate-by-design families (err == "no_oracle"
with a recorded spark row count).
"""

from __future__ import annotations

import ast
import functools
import glob
import json
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "code_graph_backend_spark"
# a green row whose age at the COMING close exceeds 4 rounds is evidence
# debt (VERDICT r6 item 1's bar: "no green row older than 4 rounds at
# the next close") — age = current_round - green_round
STALE_ROUNDS = 5
# registration plumbing: importing ONLY these names from the registry
# hub creates no semantic dependency on it (every ext module pulls
# `register`; without this carve-out the hub's own import closure —
# operators, sources, functions — would mark every query 'changed'
# whenever any shared kernel changes)
_HUB = PKG + "/registry.py"
_HUB_PLUMBING = {"register", "ORACLE", "QUERIES"}


def _green(row: dict) -> bool:
    if row.get("hash_match"):
        return True
    return row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0


def correctness_rounds() -> dict[int, dict]:
    out = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            out[int(m.group(1))] = json.load(open(f))
    return out


def freshest_green() -> tuple[dict[str, int], int]:
    """(query -> freshest green round, current round number)."""
    rounds = correctness_rounds()
    cur = (max(rounds) + 1) if rounds else 1
    fresh: dict[str, int] = {}
    for rnd in sorted(rounds):
        for q, row in rounds[rnd].items():
            if _green(row):
                fresh[q] = rnd
    return fresh, cur


@functools.lru_cache(maxsize=None)
def _module_imports(relpath: str) -> frozenset[str]:
    """In-package module names imported (anywhere, incl. inside function
    bodies — kernels are imported lazily) by the package file."""
    try:
        tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    except (OSError, SyntaxError):
        return frozenset()
    found: set[str] = set()
    pkg_dir = os.path.dirname(relpath)  # package-relative base for level-1
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative: from .x import y / from ..a.b import c
                base = pkg_dir
                for _ in range(node.level - 1):
                    base = os.path.dirname(base)
                mod = (node.module or "").replace(".", "/")
                target = os.path.join(base, mod) if mod else base
            elif node.module and node.module.startswith(PKG):
                target = node.module.replace(".", "/")
            else:
                continue
            if (
                target + ".py" == _HUB
                and relpath != _HUB
                and {a.name for a in node.names} <= _HUB_PLUMBING
            ):
                continue
            found.add(target)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    found.add(alias.name.replace(".", "/"))
    out = set()
    for mod in found:
        for cand in (mod + ".py", os.path.join(mod, "__init__.py")):
            if os.path.exists(os.path.join(REPO, cand)):
                out.add(cand)
                break
    return frozenset(out)


@functools.lru_cache(maxsize=None)
def import_closure(relpath: str) -> frozenset[str]:
    seen: set[str] = set()
    stack = [relpath]
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        stack.extend(_module_imports(p))
    return frozenset(seen)


@functools.lru_cache(maxsize=None)
def _last_commit_ts(relpath: str) -> int:
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", relpath],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return int(out) if out else 0
    except Exception:
        return 0


@functools.lru_cache(maxsize=None)
def round_boundary_ts() -> dict[int, int]:
    """round number -> committer timestamp of its 'round N:' commit (the
    driver's round-close artifact commit; a round-R green row is evidence
    for the tree as of that commit)."""
    try:
        log = subprocess.run(
            ["git", "log", "--format=%ct %s"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        return {}
    out: dict[int, int] = {}
    for line in log.splitlines():
        m = re.match(r"(\d+) round (\d+): verdict", line)
        if m:
            out.setdefault(int(m.group(2)), int(m.group(1)))
    return out


def query_file(fn) -> str:
    mod = getattr(fn, "__module__", "") or ""
    return mod.replace(".", "/") + ".py"


def debt(queries: dict) -> dict[str, str]:
    """query name -> debt class, omitting fresh queries.

    Classes, strongest evidence first:
    - 'never'    — no green driver row ever (precise);
    - 'expired'  — green row's age exceeds 4 rounds at the coming close
      (precise);
    - 'changed'  — the query's OWN registry module file has a commit
      newer than its green round's boundary commit (precise at file
      level: the file holding the query's code changed);
    - 'dep-changed' — ADVISORY: some file in the module's transitive
      in-package import closure changed after the green round. Shared
      kernels (operators/undirected.py, functions/*.py) sit under many
      families, so this class over-approximates by design — it feeds
      rotation ORDERING judgment, not the hard gate.
    """
    fresh, cur = freshest_green()
    boundaries = round_boundary_ts()
    out: dict[str, str] = {}
    for name, fn in queries.items():
        rnd = fresh.get(name)
        if rnd is None:
            out[name] = "never"
            continue
        if cur - rnd >= STALE_ROUNDS:
            out[name] = "expired"
            continue
        boundary = boundaries.get(rnd)
        if boundary:
            qf = query_file(fn)
            if os.path.exists(os.path.join(REPO, qf)):
                if _last_commit_ts(qf) > boundary:
                    out[name] = "changed"
                elif max(
                    (_last_commit_ts(p) for p in import_closure(qf)),
                    default=0,
                ) > boundary:
                    out[name] = "dep-changed"
    return out


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    d = debt(qs)
    fresh, cur = freshest_green()
    order = list(qs)
    hard = sum(1 for c in d.values() if c != "dep-changed")
    print(f"current round: r{cur}; registered: {len(qs)}; "
          f"hard debt: {hard}; advisory dep-changed: {len(d) - hard}")
    for cls in ("never", "changed", "expired", "dep-changed"):
        members = [q for q in order if d.get(q) == cls]
        print(f"\n[{cls}] {len(members)}")
        for q in members:
            pos = order.index(q)
            extra = f" (green r{fresh[q]})" if q in fresh else ""
            print(f"  {pos:3d}  {q}{extra}")


if __name__ == "__main__":
    main()
