#!/usr/bin/env python
"""Measure DuckDB baselines for the bench LLM block (VERDICT r2 #4): run
each LLM-block query's own oracle SQL on the same machine/scale factor
under the SAME protocol bench.py uses for Spark (one warm-up execution,
then best-of-3 AND median-of-3), so the round's llm_queries block has a
symmetric same-machine ratio. Results are pasted into BASELINE.md.

stream_tumbling's baseline is its *batch-equivalent* SQL — DuckDB has no
streaming runtime, while the Spark side pays real staging + state-store
work per run; the asymmetry is noted in BASELINE.md rather than tuned
around.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from dicebox_sensorybatchprocessor_spark import all_queries  # noqa: E402

from bench import LLM_BLOCK, SQL_BLOCK  # noqa: E402  (single source of truth)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    block = LLM_BLOCK if (len(sys.argv) < 3 or sys.argv[2] == "llm") else SQL_BLOCK
    specs = all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = {}
    for name in block:
        sql = specs[name].oracle
        con.execute(sql).fetchdf()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchdf()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "best_of_3": round(min(runs), 4),
            "median_of_3": round(statistics.median(runs), 4),
        }
    print(json.dumps({"sf_dir": sf_dir, "duckdb_llm_baseline": out}, indent=2))


if __name__ == "__main__":
    main()
