"""Self-enforcing driver-window rotation (VERDICT r6 Next #2).

The driver's correctness harness re-checks only the FIRST
``DRIVER_WINDOW`` registered queries each round, so any query whose
backing code changed after its last driver row carries stale external
evidence until it rotates back into the window. Rounds 5 and 6 both
planned that rotation in a hand-maintained tuple; round 6 forgot to
execute it. This test turns the plan into a red/green invariant:

    every registered query whose backing module — or whose underlying
    df-level api.py function — was touched since the last round-boundary
    commit MUST appear in the first DRIVER_WINDOW positions of
    ``all_queries()``.

"Touched" is computed from git (committed + working tree), so the test
fails the moment a refactor lands without the matching reorder of
``_ROUND7_PRIORITY`` — no judge archaeology required.

Infrastructure modules (registry.py, session.py, io.py, __init__.py,
utils.py) are exempt: a change there affects all 199 queries equally and
is covered by the full local oracle sweep, not by window ordering.
"""

from __future__ import annotations

import ast
import importlib
import inspect
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = "dicebox_sensorybatchprocessor_spark"

_INFRA = {
    f"{PKG}/__init__.py",
    f"{PKG}/registry.py",
    f"{PKG}/session.py",
    f"{PKG}/io.py",
    f"{PKG}/utils.py",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _round_boundary() -> str | None:
    """Hash of the most recent driver round-boundary commit
    (subject ``round N: ...``)."""
    out = _git("log", "--format=%H %s")
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"^round \d+:", subject):
            return sha
    return None


def _touched_files(boundary: str) -> set[str]:
    """Package .py files changed between the boundary commit and the
    working tree (committed and uncommitted alike)."""
    out = _git("diff", "--name-only", boundary, "--", f"{PKG}/")
    return {p for p in out.splitlines() if p.endswith(".py")} - _INFRA


def _changed_api_functions(boundary: str) -> set[str]:
    """Top-level api.py function names whose bodies overlap the new-side
    line ranges of ``git diff -U0 boundary -- api.py``."""
    api_rel = f"{PKG}/api.py"
    diff = _git("diff", "-U0", boundary, "--", api_rel)
    changed_lines: set[int] = set()
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        changed_lines.update(range(start, start + max(count, 1)))
    if not changed_lines:
        return set()
    tree = ast.parse((REPO / api_rel).read_text())
    names: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            span = range(node.lineno, (node.end_lineno or node.lineno) + 1)
            if changed_lines.intersection(span):
                names.add(node.name)
    return names


def test_touched_queries_are_inside_driver_window() -> None:
    boundary = _round_boundary()
    if boundary is None:
        pytest.skip("no round-boundary commit in history (fresh clone)")

    eng = importlib.import_module(PKG)
    queries = eng.all_queries()
    window = set(list(queries)[: eng.DRIVER_WINDOW])

    touched = _touched_files(boundary)
    api_rel = f"{PKG}/api.py"
    api_fns = _changed_api_functions(boundary) if api_rel in touched else set()
    touched.discard(api_rel)  # handled at function granularity below

    must_front: dict[str, str] = {}
    for name, spec in queries.items():
        mod = sys.modules.get(spec.fn.__module__) or importlib.import_module(
            spec.fn.__module__
        )
        mod_rel = str(Path(mod.__file__).resolve().relative_to(REPO))
        if mod_rel in touched:
            must_front[name] = mod_rel
            continue
        if api_fns:
            src = inspect.getsource(spec.fn)
            if any(re.search(rf"\bapi\.{fn}\s*\(", src) for fn in api_fns):
                must_front[name] = f"{api_rel}:{'/'.join(sorted(api_fns))}"

    stragglers = {n: why for n, why in must_front.items() if n not in window}
    assert not stragglers, (
        f"{len(stragglers)} queries touched since round boundary "
        f"{boundary[:9]} are OUTSIDE the first {eng.DRIVER_WINDOW} driver "
        f"slots — front them in _ROUND7_PRIORITY (or its successor): "
        f"{stragglers}"
    )
