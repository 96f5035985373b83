#!/usr/bin/env python
"""Measure DuckDB baselines for the bench blocks (VERDICT r2 #4, refreshed
per VERDICT r5 #7): run each bench query's own oracle SQL on the same
machine/scale factor under the SAME protocol bench.py uses for Spark
(one warm-up execution, then a uniform best-of-5 AND median-of-5 —
round 6 unified the sample count across blocks), so every bench entry
has a symmetric same-machine ratio. Results are pasted into BASELINE.md.

A floor sentinel (`SELECT 1` fetchdf, best-of-5) is measured inside the
same run and reported next to the numbers: when a future round's ratios
drift, comparing the two rounds' sentinels distinguishes machine-regime
drift (both sentinel and queries moved) from a genuine engine change.
The r4→r5→r6 drift episodes (dedup_ngram_jaccard 3.4→4.4→3.0 s Spark-side
with no plan change) are why the baseline must carry its measurement
date and sentinel.

stream_tumbling's baseline is its *batch-equivalent* SQL — DuckDB has no
streaming runtime, while the Spark side pays real staging + state-store
work per run; the asymmetry is noted in BASELINE.md rather than tuned
around.

Usage: python scripts/measure_llm_baseline.py [sf_dir] [llm|sql|headline]
"""

from __future__ import annotations

import datetime
import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from dicebox_sensorybatchprocessor_spark import all_queries  # noqa: E402

from bench import HEADLINE, LLM_BLOCK, SQL_BLOCK  # noqa: E402  (single source of truth)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_N = 5  # uniform with bench.py's per-query sample count (round 6)


def _best_median(con, sql: str) -> tuple[float, float]:
    con.execute(sql).fetchdf()  # warm-up
    runs = []
    for _ in range(_N):
        t0 = time.perf_counter()
        con.execute(sql).fetchdf()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4), round(statistics.median(runs), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "llm"
    block = {"llm": LLM_BLOCK, "sql": SQL_BLOCK, "headline": HEADLINE}[which]
    specs = all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    floor_best, _ = _best_median(con, "SELECT 1")
    out = {}
    for name in block:
        best, median = _best_median(con, specs[name].oracle)
        out[name] = {"best_of_5": best, "median_of_5": median}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "block": which,
                "measured": datetime.date.today().isoformat(),
                "n_samples": _N,
                "duckdb_floor_s": floor_best,
                "duckdb_baseline": out,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
