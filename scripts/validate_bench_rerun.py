#!/usr/bin/env python
"""One-shot validation of bench.py's round-14 load-rerun path.

Monkeypatches ``_load_prev_round`` to return an artificial previous
round whose entries are tiny, so every query flags, the targeted rerun
fires, and every survivor must carry a ``load_context`` annotation.
Run at sf0.001 (cheap); restores nothing — bench_detail.json is
clobbered exactly like any bench run (``git checkout bench_detail.json``
afterwards, see NOTES).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/validate_bench_rerun.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

_SF = float(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    .rstrip("/")
    .rsplit("sf", 1)[-1]
)


def _fake_prev(repo_dir):
    # 1 ms everywhere: every measured entry is ">25% slower and >20ms".
    prev = {
        "sf": _SF,
        "queries": {n: 0.001 for n in bench.HEADLINE},
        "llm_queries": {n: 0.001 for n in bench.LLM_BLOCK},
        "sql_queries": {n: 0.001 for n in bench.SQL_BLOCK},
        "floor_measured_s": {"headline": 0.001},
    }
    return "SYNTHETIC_prev_for_rerun_validation", prev


bench._load_prev_round = _fake_prev
bench.main()

detail = json.load(open(os.path.join(os.path.dirname(bench.__file__), "bench_detail.json")))
regs = detail["regressions"]
ctx = detail["regression_check"]
assert ctx["load_rerun"] is not None, "rerun must have fired"
assert ctx["load_rerun"]["reran"], "rerun list must be non-empty"
assert regs, "synthetic 1ms prev must leave survivors"
for r in regs:
    assert "load_context" in r, f"survivor without load_context: {r}"
    lc = r["load_context"]
    assert "floor_elevated" in lc and "loadavg_1m_at_rerun" in lc
assert ctx["loadavg_1m_5m_15m"]["headline"] is not None
assert "rerun" in detail["floor_measured_s"]
print("RERUN-VALIDATION-PASS:", len(regs), "annotated survivors,",
      len(ctx["load_rerun"]["reran"]), "reran")
