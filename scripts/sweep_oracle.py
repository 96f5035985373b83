"""Full-registry oracle sweep at an arbitrary scale factor.

Runs EVERY registered query against its DuckDB oracle (same strict canon
as tests/oracle.py — a pass predicts a driver hash-match) and prints one
line per query plus a summary. Used per round to re-affirm the SURVEY.md
claim that the whole suite holds at sf0.1 (bench scale), not just at the
driver's sf0.01.

Usage:  python scripts/sweep_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicebox_sensorybatchprocessor_spark import all_queries, get_session
from tests.oracle import assert_query_matches


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="sbp-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    failed, rows_only = [], []
    t_all = time.perf_counter()
    for i, (name, spec) in enumerate(specs.items(), 1):
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                rows_only.append(name)
                status = f"rows-only ({n} rows)"
            else:
                assert_query_matches(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
                status = "match"
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            failed.append(name)
            status = f"FAIL: {str(e)[:160]}"
        print(f"[{i:3}/{len(specs)}] {name:28s} {time.perf_counter() - t0:7.2f}s  {status}", flush=True)
    print(
        f"\nswept {len(specs)} queries in {time.perf_counter() - t_all:.0f}s at {sf_dir}: "
        f"{len(specs) - len(failed) - len(rows_only)} match, "
        f"{len(rows_only)} rows-only, {len(failed)} FAILED {failed or ''}"
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
