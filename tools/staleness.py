"""Mechanized rotation-staleness audit (VERDICT r6 item 7).

A driver correctness row is only evidence for the code that existed when
it was graded. This module computes, for every registered query, the
freshest GREEN driver round and whether the query's implementing code
(its registry module plus the transitive in-package import closure)
changed after that round's boundary commit. The debt classes:

- ``never``   — no green driver row in any CORRECTNESS_r*.json;
- ``expired`` — freshest green row is >= STALE_ROUNDS rounds old at the
  coming close;
- ``changed`` — the query's OWN top-level symbol (decorators included,
  so an @register oracle edit counts) differs between the boundary
  commit of its freshest green round and HEAD;
- ``dep-impact`` — own symbol unchanged, but symbol-level reachability
  (VERDICT r7 item 3) proves the query's entry function transitively
  references a top-level symbol — in its own file or any closure
  file — whose SOURCE TEXT differs between the green round's boundary
  commit and HEAD. This is HARD debt: the code the driver graded is
  not the code that runs today.

Changes the entry function provably cannot reach — including
unrelated edits elsewhere in the query's own file — are cleared (no
debt class): the r7 ``dep-changed`` advisory limbo is gone.
Adjudication failures (unparseable old version, unresolvable entry
symbol) fall back to ``changed`` — conservative, never silent.

``tests/test_rotation_staleness.py`` asserts the rotation in
``__spark_entry__._PRIORITY`` spends the driver's ~50-row budget on this
debt before anything fresh; ``python tools/staleness.py`` prints the
audit so each round's rotation can be GENERATED from it instead of
hand-reconciled prose (the round-6 provenance section of BENCH_NOTES).

Greenness matches the driver: hash_match true, or the documented
rows-only check for approximate-by-design families (err == "no_oracle"
with a recorded spark row count).

FREEZE INVARIANT (VERDICT r9 item 2): evidence is a renewable budget —
every registered query must be re-graded every STALE_ROUNDS rounds, so
steady-state expiry is registry_size / STALE_ROUNDS rows per round and
the registry can only grow while

    observed_driver_cap() * STALE_ROUNDS >= registry_size

holds (234 queries / 5-round cycle ≈ 47 expiries vs the 50-row cap:
AT capacity, 3 rows/round of slack for the round's own kernel edits).
Every query added beyond that bound permanently exceeds the re-grading
budget and manufactures un-clearable debt. The gate suite asserts this
mechanically (tests/test_rotation_staleness.py::
test_registry_frozen_at_evidence_budget_capacity); do not add queries
while the assertion is tight unless the driver's observed cap rises.
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
# rotation head sizing (VERDICT r8 item 7): the driver grades roughly
# the first len(CORRECTNESS_rN) rows each round; positions cap..cap+SPILL
# are the declared spill block — still debt-carrying, graded only if the
# observed cap moves up. Sized from the LAST observed cap, not a guess.
SPILL = 5
_DEFAULT_CAP = 50


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


def observed_driver_cap() -> int:
    """Row count of the newest CORRECTNESS_r*.json — the driver's
    empirically-observed per-round grading budget (r8/r9: exactly 50).
    The rotation head the gate asserts against is THIS number, so 'debt
    fits the budget' arithmetic is mechanical instead of a hardcoded 60
    (VERDICT r8 item 7: the 5-row spill gamble cost r8 its target).

    FLOORED at _DEFAULT_CAP: a truncated or partial driver run (say 10
    rows) must not silently shrink the gate head for the next round and
    spuriously trip test_never_and_expired_fit_the_rotation_head — the
    historical budget is the better estimate of the NEXT run than one
    short artifact (ADVICE r9). A driver that genuinely grades more
    than the floor raises the cap as before."""
    rounds = correctness_rounds()
    if not rounds:
        return _DEFAULT_CAP
    return max(len(rounds[max(rounds)]), _DEFAULT_CAP)


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
def _dirty_files() -> frozenset[str]:
    """Files with uncommitted working-tree edits. A dirty file's
    last-commit timestamp says nothing about its CURRENT text, so the
    timestamp short-circuits below must not apply to it (ADVICE r8:
    dirty edits to a file last committed before the boundary were
    classified 'untouched since green' and never symbol-diffed)."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        return frozenset()
    files: set[str] = set()
    for line in out.splitlines():
        path = line[3:].strip()
        if " -> " in path:  # rename: both sides moved
            a, b = path.split(" -> ", 1)
            files.update((a.strip('"'), b.strip('"')))
        else:
            files.add(path.strip('"'))
    return frozenset(files)


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


@functools.lru_cache(maxsize=None)
def round_boundary_commits() -> dict[int, str]:
    """round number -> commit hash of its 'round N: verdict' commit."""
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %ct %s"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        return {}
    out: dict[int, str] = {}
    for line in log.splitlines():
        m = re.match(r"([0-9a-f]{40}) \d+ round (\d+): verdict", line)
        if m:
            out.setdefault(int(m.group(2)), m.group(1))
    return out


def query_file(fn) -> str:
    mod = getattr(fn, "__module__", "") or ""
    return mod.replace(".", "/") + ".py"


# ---------------------------------------------------------------------------
# Symbol-level provenance (VERDICT r7 item 3): adjudicate dep-changed.
#
# A query whose own module is untouched since its green round, but whose
# import closure moved, is only stale if its entry function can actually
# REACH a changed top-level symbol. We build a (file, symbol) reference
# graph at HEAD — top-level def/class/assign symbols, edges from the
# names each symbol's body references, resolved through the file's
# import bindings — and diff each changed closure file's symbol table
# between the green round's boundary commit and HEAD. BFS from the
# registry entry's defining function: hit a changed symbol -> hard
# 'dep-impact'; exhaust without a hit -> cleared. Over-approximates
# (whole class = one symbol; a changed module-level statement marks the
# file's '<module>' pseudo-symbol, which every symbol in that file
# depends on) — never under-approximates on static references.
# ---------------------------------------------------------------------------

_MODULE_SYM = "<module>"


def _symbol_table(source: str) -> dict[str, str]:
    """Top-level symbol name -> exact source segment (decorators
    included). Non-def/assign module-level statements concatenate into
    the '<module>' pseudo-symbol."""
    tree = ast.parse(source)
    lines = source.splitlines()

    def seg(node, include_deco=()) -> str:
        start = min([node.lineno] + [d.lineno for d in include_deco])
        return "\n".join(lines[start - 1: node.end_lineno])

    out: dict[str, str] = {}
    module_parts: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[node.name] = seg(node, node.decorator_list)
        elif isinstance(node, ast.Assign):
            text = seg(node)
            for tgt in node.targets:
                for n in ast.walk(tgt):
                    if isinstance(n, ast.Name):
                        out[n.id] = text
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out[node.target.id] = seg(node)
        else:
            module_parts.append(seg(node))
    out[_MODULE_SYM] = "\n".join(module_parts)
    return out


@functools.lru_cache(maxsize=None)
def _head_symbols(relpath: str) -> dict[str, str] | None:
    try:
        return _symbol_table(open(os.path.join(REPO, relpath)).read())
    except (OSError, SyntaxError):
        return None


@functools.lru_cache(maxsize=None)
def _changed_symbols(relpath: str, commit: str) -> frozenset[str] | None:
    """Symbols of relpath whose source differs between commit and HEAD
    (added/deleted count as changed). None = adjudication impossible."""
    head = _head_symbols(relpath)
    if head is None:
        return None
    try:
        show = subprocess.run(
            ["git", "show", f"{commit}:{relpath}"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
        if show.returncode != 0:  # file did not exist at the boundary
            return frozenset(head)
        old = _symbol_table(show.stdout)
    except Exception:
        return None
    return frozenset(
        s for s in set(head) | set(old) if head.get(s) != old.get(s)
    )


@functools.lru_cache(maxsize=None)
def _file_bindings(relpath: str) -> tuple[dict, dict]:
    """(name -> (dep relpath, original symbol), module-alias -> dep
    relpath) from the file's in-package imports at HEAD."""
    try:
        tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    except (OSError, SyntaxError):
        return {}, {}
    pkg_dir = os.path.dirname(relpath)

    def resolve(modpath: str) -> str | None:
        for cand in (modpath + ".py", os.path.join(modpath, "__init__.py")):
            if os.path.exists(os.path.join(REPO, cand)):
                return cand
        return None

    sym_bind: dict[str, tuple[str, str]] = {}
    mod_bind: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_dir
                for _ in range(node.level - 1):
                    base = os.path.dirname(base)
                mod = (node.module or "").replace(".", "/")
                target = os.path.join(base, mod) if mod else base
            elif node.module and node.module.startswith(PKG):
                target = node.module.replace(".", "/")
            else:
                continue
            for alias in node.names:
                bound = alias.asname or alias.name
                sub = resolve(os.path.join(target, alias.name))
                if sub:  # `from . import mod` — binds a module
                    mod_bind[bound] = sub
                else:
                    dep = resolve(target)
                    if dep:
                        sym_bind[bound] = (dep, alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    dep = resolve(alias.name.replace(".", "/"))
                    if dep:
                        mod_bind[alias.asname or alias.name] = dep
    return sym_bind, mod_bind


@functools.lru_cache(maxsize=None)
def _symbol_refs(relpath: str) -> dict[str, tuple[frozenset, frozenset]] | None:
    """symbol -> (bare names referenced, (base, attr) pairs referenced)
    inside that top-level symbol's body, at HEAD."""
    try:
        tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    except (OSError, SyntaxError):
        return None

    def refs(node) -> tuple[frozenset, frozenset]:
        names, attrs = set(), set()
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                names.add(n.id)
            elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
                attrs.add((n.value.id, n.attr))
        return frozenset(names), frozenset(attrs)

    out: dict[str, tuple[frozenset, frozenset]] = {}
    mod_names, mod_attrs = set(), set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[node.name] = refs(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            n, a = refs(node)
            targets = {
                t.id
                for t in ast.walk(node)
                if isinstance(t, ast.Name) and isinstance(t.ctx, ast.Store)
            }
            for tgt in targets:
                prev = out.get(tgt, (frozenset(), frozenset()))
                out[tgt] = (prev[0] | n, prev[1] | a)
        else:
            n, a = refs(node)
            mod_names |= n
            mod_attrs |= a
    out[_MODULE_SYM] = (frozenset(mod_names), frozenset(mod_attrs))
    return out


def _dep_impacted(
    qfile: str, entry_symbol: str, commit: str, boundary_ts: int
) -> bool | None:
    """BFS the (file, symbol) reference graph at HEAD from the query's
    entry function; True if any reachable symbol changed between the
    boundary commit and HEAD. None = could not adjudicate."""
    changed_cache: dict[str, frozenset[str] | None] = {}

    def changed_in(f: str) -> frozenset[str] | None:
        if f not in changed_cache:
            # the commit-timestamp short-circuit only applies to CLEAN
            # files: _changed_symbols diffs the working tree vs the
            # boundary, so a dirty file must be diffed regardless of
            # when it was last committed (ADVICE r8)
            if _last_commit_ts(f) <= boundary_ts and f not in _dirty_files():
                changed_cache[f] = frozenset()  # file untouched since green
            else:
                changed_cache[f] = _changed_symbols(f, commit)
        return changed_cache[f]

    head = _head_symbols(qfile)
    if head is None or entry_symbol not in head:
        return None
    seen: set[tuple[str, str]] = set()
    stack = [(qfile, entry_symbol)]
    while stack:
        f, s = stack.pop()
        if (f, s) in seen:
            continue
        seen.add((f, s))
        ch = changed_in(f)
        if ch is None:
            return None
        if s in ch and not (f == _HUB and s in _HUB_PLUMBING):
            return True
        refs = _symbol_refs(f)
        table = _head_symbols(f)
        if refs is None or table is None:
            return None
        if s not in refs:
            continue
        names, attrs = refs[s]
        sym_bind, mod_bind = _file_bindings(f)
        if s != _MODULE_SYM:
            stack.append((f, _MODULE_SYM))
        for n in names:
            if n == s or (f == _HUB and n in _HUB_PLUMBING):
                pass
            elif n in table:
                stack.append((f, n))
            elif n in sym_bind:
                dep, orig = sym_bind[n]
                # the registration-plumbing carve-out, same rationale as
                # _HUB_PLUMBING in the file-level closure: every ext
                # module's decorators reference `register`, so an edit to
                # the hub's plumbing would otherwise flag all 234 queries
                if dep == _HUB and orig in _HUB_PLUMBING:
                    continue
                stack.append((dep, orig))
            elif n in mod_bind:
                # bare module reference (passed around): depend on the
                # whole module conservatively
                dep = mod_bind[n]
                dep_table = _head_symbols(dep)
                if dep_table is None:
                    return None
                stack.extend((dep, ds) for ds in dep_table)
        for base, attr in attrs:
            if base in mod_bind:
                dep = mod_bind[base]
                dep_table = _head_symbols(dep) or {}
                if attr in dep_table:
                    stack.append((dep, attr))
                stack.append((dep, _MODULE_SYM))
    return False


def debt(queries: dict) -> dict[str, str]:
    """query name -> debt class, omitting fresh queries.

    Classes, strongest evidence first (ALL are hard debt — the r7
    'dep-changed' advisory limbo is adjudicated away, VERDICT r7 item 3):
    - 'never'    — no green driver row ever (precise);
    - 'expired'  — green row's age exceeds 4 rounds at the coming close
      (precise);
    - 'changed'  — the query's OWN top-level symbol (decorator included,
      so @register oracle edits count) differs between its green round's
      boundary commit and HEAD;
    - 'dep-impact' — own symbol unchanged, but the entry function
      transitively references a symbol (own file or closure file) whose
      source differs between the boundary commit and HEAD — symbol-level
      BFS, see _dep_impacted. Adjudication failure lands in 'changed'
      (conservative). Edits the entry function provably cannot reach —
      including unrelated edits elsewhere in the query's OWN file — are
      CLEARED: no debt entry at all.
    """
    fresh, cur = freshest_green()
    boundaries = round_boundary_ts()
    commits = round_boundary_commits()
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
        if not boundary:
            continue
        qf = query_file(fn)
        if not os.path.exists(os.path.join(REPO, qf)):
            continue
        closure = import_closure(qf)
        closure_moved = max(
            (_last_commit_ts(p) for p in closure), default=0
        ) > boundary or any(p in _dirty_files() for p in closure)
        if not closure_moved:
            continue
        if rnd not in commits:
            out[name] = "changed"  # no boundary commit: can't adjudicate
            continue
        sym = getattr(fn, "__name__", "")
        own_moved = _last_commit_ts(qf) > boundary or qf in _dirty_files()
        own = _changed_symbols(qf, commits[rnd]) if own_moved else frozenset()
        if own is None or sym in own:
            out[name] = "changed"
            continue
        impacted = _dep_impacted(qf, sym, commits[rnd], boundary)
        if impacted is None:
            out[name] = "changed"
        elif impacted:
            out[name] = "dep-impact"
    return out


def emit_priority(queries: dict, d: dict[str, str], fresh: dict[str, int]) -> str:
    """Render a ready-to-paste _PRIORITY body from the audit: never,
    then expired (oldest green first), then changed, then dep-impact,
    then the cleared/fresh remainder OLDEST GREEN FIRST — so the spill
    block (positions cap..cap+SPILL) is automatically the evidence
    that expires next round, and driver overflow always refreshes the
    soonest-to-expire rows. Nothing left for the builder to hand-pick
    (VERDICT r8 item 7)."""
    order = list(queries)

    def block(cls):
        members = [q for q in order if d.get(q) == cls]
        if cls != "never":
            members.sort(key=lambda q: (fresh.get(q, 0), order.index(q)))
        return members

    cleared = [q for q in order if q not in d]
    cleared.sort(key=lambda q: (fresh.get(q, 10**9), order.index(q)))
    segments = [
        ("never graded", block("never")),
        ("expired, oldest green first", block("expired")),
        ("changed: own symbol differs since green round", block("changed")),
        ("dep-impact: reachable symbol changed", block("dep-impact")),
        ("cleared / fresh, oldest green first (head = next round's spill)",
         cleared),
    ]
    lines = []
    for title, members in segments:
        if not members:
            continue
        lines.append(f"    # {title} ({len(members)})")
        cur_line = "    "
        for q in members:
            tok = f'"{q}",'
            if len(cur_line) + len(tok) + 1 > 76:
                lines.append(cur_line.rstrip())
                cur_line = "    "
            cur_line += tok + " "
        lines.append(cur_line.rstrip())
    return "\n".join(lines)


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    d = debt(qs)
    fresh, cur = freshest_green()
    if "--emit-priority" in sys.argv:
        print("_PRIORITY = [")
        print(emit_priority(qs, d, fresh))
        print("]")
        return
    order = list(qs)
    print(f"current round: r{cur}; registered: {len(qs)}; "
          f"hard debt: {len(d)} (all classes hard since r8; "
          f"unreachable dep edits are cleared, not listed)")
    for cls in ("never", "changed", "expired", "dep-impact"):
        members = [q for q in order if d.get(q) == cls]
        print(f"\n[{cls}] {len(members)}")
        for q in members:
            pos = order.index(q)
            extra = f" (green r{fresh[q]})" if q in fresh else ""
            print(f"  {pos:3d}  {q}{extra}")


if __name__ == "__main__":
    main()
