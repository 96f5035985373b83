"""Targeted oracle check: verify NAMED queries against their DuckDB
oracles at one or more scale factors (same strict canon as the full
sweep — a pass predicts a driver hash-match). The r15 optimization
loop runs this after every operator-internals change.

Usage:  python scripts/check_queries.py q1,q2,... [sf_dir ...]
        (default sf dirs: sf0.001 sf0.01 sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicebox_sensorybatchprocessor_spark import all_queries, get_session
from tests.oracle import assert_query_matches


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_session(app_name="sbp-check")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    failed = []
    for sf_dir in sf_dirs:
        for name in names:
            spec = specs[name]
            t0 = time.perf_counter()
            try:
                if spec.oracle is None:
                    n = spec.fn(spark, sf_dir).count()
                    status = f"rows-only ({n} rows)"
                else:
                    assert_query_matches(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
                    status = "match"
            except Exception as e:  # noqa: BLE001 — report, not die
                failed.append((os.path.basename(sf_dir), name))
                status = f"FAIL: {str(e)[:200]}"
            print(
                f"{os.path.basename(sf_dir):8s} {name:30s} "
                f"{time.perf_counter() - t0:7.2f}s  {status}",
                flush=True,
            )
    print(f"\n{'ALL MATCH' if not failed else f'FAILED: {failed}'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
