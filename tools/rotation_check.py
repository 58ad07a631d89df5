"""Mechanized driver-window rotation ledger (VERDICT r5 #4).

The driver records correctness rows for exactly the FIRST 50 ``queries()``
entries (the ``_PRIORITY`` window in ``__spark_entry__.py``). The rotation
rules the judge audits:

1. every entry whose implementation OR oracle changed since its newest green
   evidence must be INSIDE the window;
2. an entry outside the window must be byte-unchanged (its implementation,
   its oracle, and every project function its implementation transitively
   calls) since its newest green evidence.

This tool replaces the historical prose ledger: it computes, per entry, a
SHA-256 over (a) the source bytes of the transitive closure of project
functions/classes/constants the entry's callable references and (b) the
oracle SQL text, and keeps ``tools/rotation_ledger.json`` mapping
entry -> {hash, evidence}. Resolution is static (AST over each function's
module globals, recursing into project modules only), so renames, split
modules and star-imports are followed; constants are hashed by repr.

Usage:
    python tools/rotation_check.py --check
        FAIL (exit 1) if any entry violates a rotation rule:
        - hash != ledger hash (or entry unknown) and entry not in-window;
        prints a table of violations. This is the CI gate
        (tests/test_rotation_ledger.py runs it in pytest).

    python tools/rotation_check.py --stamp <evidence-label> [entry ...]
        Record the CURRENT hash + evidence label for the given entries
        (default: all). Run this ONLY after the named evidence actually
        exists — e.g. after a full check_oracle sweep
        (``--stamp r6-session-sweep-sf0.01``) or after a driver round's
        CORRECTNESS file lands (``--stamp CORRECTNESS_r06``).

    python tools/rotation_check.py --explain <entry>
        Print the resolved closure (function list) for one entry.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEDGER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rotation_ledger.json")
PROJECT_PREFIX = "iceberg_ingestion_spark"
WINDOW_SIZE = 50


def _is_project_module(mod) -> bool:
    name = getattr(mod, "__name__", "")
    return name.startswith(PROJECT_PREFIX) or name == "__spark_entry__"


def _qualname(obj) -> str:
    mod = getattr(obj, "__module__", "?")
    name = getattr(obj, "__qualname__", getattr(obj, "__name__", repr(obj)))
    return f"{mod}.{name}"


def _source_or_none(obj) -> str | None:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return None


def _referenced(func) -> list[object]:
    """Project objects a function/class references: resolved from its module
    globals (Name / Attribute-on-module / in-function ImportFrom)."""
    src = _source_or_none(func)
    if src is None:
        return []
    try:
        tree = ast.parse(src)
    except SyntaxError:
        # indented method source — dedent
        import textwrap

        tree = ast.parse(textwrap.dedent(src))
    mod = sys.modules.get(getattr(func, "__module__", ""), None)
    gl = getattr(mod, "__dict__", {}) if mod else {}
    out: list[object] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id in gl:
            out.append(gl[node.id])
        elif isinstance(node, ast.Attribute):
            base = node.value
            if isinstance(base, ast.Name) and base.id in gl:
                basev = gl[base.id]
                if isinstance(basev, types.ModuleType) and _is_project_module(basev):
                    if hasattr(basev, node.attr):
                        out.append(getattr(basev, node.attr))
        elif isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith(PROJECT_PREFIX)
        ):
            try:
                imod = __import__(node.module, fromlist=[a.name for a in node.names])
            except ImportError:
                continue
            for a in node.names:
                if hasattr(imod, a.name):
                    out.append(getattr(imod, a.name))
    return out


def closure_sources(entry_fn) -> dict[str, str]:
    """qualified-name -> hashable text for the transitive closure of project
    functions/classes/constants reachable from ``entry_fn``."""
    seen: dict[str, str] = {}
    stack = [entry_fn]
    visited_ids: set[int] = set()
    while stack:
        obj = stack.pop()
        if id(obj) in visited_ids:
            continue
        visited_ids.add(id(obj))
        if isinstance(obj, types.ModuleType):
            continue  # whole project modules referenced bare: too coarse, skip
        if inspect.isfunction(obj) or inspect.isclass(obj):
            mod = getattr(obj, "__module__", "")
            if not (mod.startswith(PROJECT_PREFIX) or mod == "__spark_entry__"):
                continue
            src = _source_or_none(obj)
            if src is None:
                continue
            seen[_qualname(obj)] = src
            stack.extend(_referenced(obj))
        elif isinstance(obj, (int, float, str, bool, tuple, list, dict, set, frozenset)):
            # module-level constant (threshold, query workload, column list):
            # identified by value repr; name-resolution context is already
            # captured by the caller's source. Sets repr in hash order, which
            # PYTHONHASHSEED perturbs across processes — sort them.
            if isinstance(obj, (set, frozenset)):
                r = repr(sorted(obj, key=repr))
            else:
                r = repr(obj)
            if len(r) < 10_000:
                seen.setdefault(f"const:{hashlib.sha256(r.encode()).hexdigest()[:16]}", r)
    return seen


def entry_hash(name: str, fn, oracle: str | None) -> str:
    parts = closure_sources(fn)
    h = hashlib.sha256()
    for k in sorted(parts):
        h.update(k.encode())
        h.update(parts[k].encode())
    h.update(b"__oracle__")
    h.update((oracle or "<no-oracle>").encode())
    return h.hexdigest()


def load_registry():
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(queries)[:WINDOW_SIZE]
    return queries, oracles, window


def load_ledger() -> dict:
    if not os.path.exists(LEDGER_PATH):
        return {}
    with open(LEDGER_PATH) as f:
        return json.load(f)


def save_ledger(ledger: dict) -> None:
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")


def cmd_check() -> int:
    queries, oracles, window = load_registry()
    ledger = load_ledger()
    in_window = set(window)
    violations = []
    for name, fn in queries.items():
        cur = entry_hash(name, fn, oracles.get(name))
        rec = ledger.get(name)
        if name in in_window:
            continue  # in-window entries get fresh driver rows regardless
        if rec is None:
            violations.append((name, "OUT of window with NO ledger record"))
        elif rec["hash"] != cur:
            violations.append(
                (name, f"OUT of window but hash drifted since {rec['evidence']}")
            )
    if violations:
        print("ROTATION VIOLATIONS:")
        for name, why in violations:
            print(f"  {name:40s} {why}")
        return 1
    n_out = len(queries) - len(window)
    print(
        f"rotation OK: {len(window)} in-window, {n_out} displaced entries all "
        "byte-stable since their recorded evidence"
    )
    return 0


def cmd_stamp(evidence: str, names: list[str]) -> int:
    queries, oracles, _ = load_registry()
    ledger = load_ledger()
    targets = names or list(queries)
    unknown = [n for n in targets if n not in queries]
    if unknown:
        print(f"unknown entries: {unknown}")
        return 1
    for name in targets:
        ledger[name] = {
            "hash": entry_hash(name, queries[name], oracles.get(name)),
            "evidence": evidence,
        }
    save_ledger(ledger)
    print(f"stamped {len(targets)} entries with evidence {evidence!r}")
    return 0


def cmd_explain(name: str) -> int:
    queries, oracles, _ = load_registry()
    if name not in queries:
        print(f"unknown entry {name}")
        return 1
    parts = closure_sources(queries[name])
    for k in sorted(parts):
        print(k)
    print(f"hash = {entry_hash(name, queries[name], oracles.get(name))}")
    return 0


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--check":
        return cmd_check()
    if len(sys.argv) >= 3 and sys.argv[1] == "--stamp":
        return cmd_stamp(sys.argv[2], sys.argv[3:])
    if len(sys.argv) >= 3 and sys.argv[1] == "--explain":
        return cmd_explain(sys.argv[2])
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
