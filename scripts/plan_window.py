#!/usr/bin/env python
"""Generate the next round's driver-window priority ordering.

The window contract (see tests/test_window_rotation.py): every query
whose backing module — or underlying api.py function — changed since the
last ``round N:`` boundary commit must sit inside the first
``DRIVER_WINDOW`` registry slots; remaining slots go to the queries with
the OLDEST last driver-green CORRECTNESS row. Hand-maintaining that
ordering is exactly what round 6 forgot to do; this script derives it:

    python scripts/plan_window.py            # print the plan
    python scripts/plan_window.py --tuple    # ready-to-paste python tuple

Output sections:
  touched   — queries the rotation test will REQUIRE in the window
  backlog   — oldest-green fill, in rotation order, up to DRIVER_WINDOW
  overflow  — touched queries that do NOT fit (window math broken: split
              the refactor across rounds or grow nothing else)

The generator reuses the same git/module/api mapping as the enforcing
test, so "plan_window says it fits" and "the test passes" cannot drift
apart.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_window_rotation import (  # noqa: E402
    _round_boundary,
    dirty_query_names,
    never_driver_checked,
)

PKG = "dicebox_sensorybatchprocessor_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> dict[str, int]:
    """query -> highest round with a rows+schema-matching driver row."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, v in data.items():
            if isinstance(v, dict) and v.get("rows_match") and v.get("schema_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    import importlib
    import inspect
    from pathlib import Path

    eng = importlib.import_module(PKG)
    queries = eng.all_queries()
    window_n = eng.DRIVER_WINDOW

    boundary = _round_boundary()
    required = dirty_query_names(boundary, queries) if boundary else {}
    for name in never_driver_checked(queries):
        required.setdefault(name, "never driver-checked (new query)")
    touched = [n for n in queries if n in required]

    last = last_green_rounds()
    backlog = sorted(
        (n for n in queries if n not in touched),
        key=lambda n: (last.get(n, -1), list(queries).index(n)),
    )

    in_window_touched = touched[:window_n]
    overflow = touched[window_n:]
    fill = backlog[: max(0, window_n - len(in_window_touched))]

    print(f"# boundary: {boundary[:9] if boundary else 'none'}; "
          f"window={window_n}; touched={len(touched)}; fill={len(fill)}")
    if overflow:
        print(f"# !! OVERFLOW ({len(overflow)}): {overflow}")
        print("# split the refactor across rounds — the rotation test WILL fail")
    if "--tuple" in sys.argv:
        print("_ROUND_NEXT_PRIORITY = (")
        print("    # -- touched since last round boundary (required) --")
        for n in in_window_touched:
            print(f'    "{n}",')
        print("    # -- oldest-driver-green rotation fill --")
        for n in fill:
            print(f'    "{n}",  # last green r{last.get(n, 0)}')
        print(")")
    else:
        print("touched (required in window):")
        for n in in_window_touched:
            print(f"  {n}")
        print("fill (oldest green first):")
        for n in fill:
            print(f"  {n}  (last green r{last.get(n, 0)})")


if __name__ == "__main__":
    main()
