"""Floor-aware regression flagging (r16, VERDICT r15 #7): a query whose
wall-clock sits at or under the per-block job floor measures
scheduler+fetch overhead, not its plan — the flagger must not cry wolf
on it when the floor moves, while still catching a real plan
regression."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "sbp_bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def _prev(floor: float) -> dict:
    return {
        "queries": {"floor_bound": 0.040, "real_query": 0.400},
        "floor_measured_s": {"headline": floor},
    }


def test_floor_bound_entry_reads_flat_under_floor_perturbation():
    """±15% floor moves on a sub-floor entry must not flag (the r15 q1
    'regression' was exactly this: 39.5→45.1 ms against a 49.4 ms
    floor)."""
    for cur_floor in (0.040, 0.046, 0.034):  # idle, +15%, −15%
        cur = {"queries": {"floor_bound": cur_floor + 0.005, "real_query": 0.401}}
        flags = _bench._flag_regressions(
            _prev(0.040), cur, {"headline": cur_floor}
        )
        assert flags == [], (cur_floor, flags)


def test_real_regression_still_flags_with_floor_context():
    cur = {"queries": {"floor_bound": 0.041, "real_query": 0.800}}
    flags = _bench._flag_regressions(_prev(0.040), cur, {"headline": 0.040})
    assert [f["query"] for f in flags] == ["real_query"]
    f = flags[0]
    # raw numbers preserved alongside the adjusted rule inputs
    assert f["prev_s"] == 0.400 and f["cur_s"] == 0.800
    assert f["ratio"] == 2.0
    assert f["prev_s_floor_adj"] == 0.360 and f["cur_s_floor_adj"] == 0.760
    assert f["ratio_floor_adj"] == round(0.760 / 0.360, 2)


def test_missing_floor_samples_reproduce_raw_rule():
    """Pre-r15 artifacts carry no floor_measured_s — both floors default
    to 0 and the raw 25%/20ms rule applies unchanged."""
    prev = {"queries": {"q": 0.100}}
    cur = {"queries": {"q": 0.130}}
    flags = _bench._flag_regressions(prev, cur, None)
    assert [f["query"] for f in flags] == ["q"]
    assert flags[0]["ratio_floor_adj"] == 1.3
