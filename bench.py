#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries from
BASELINE.md at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Per-query time is warm wall-clock (best of 2 runs after a warm-up run),
excluding session startup — matching how BASELINE.md measured DuckDB
(second-run warm timings). Results are fetched with Arrow (toPandas),
the columnar analogue of DuckDB's ``.df()`` fetch used for the baseline;
row-object materialization (.collect()) measures py4j overhead, not the
engine."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dicebox_sensorybatchprocessor_spark import all_queries, get_session

HEADLINE = [
    "q1_pricing_summary",
    "join_agg_revenue_by_nation",
    "topk_orders",
    "win_topk_group",
    "events_tumbling",
    "sim_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(app_name="sbp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        fn = specs[name].fn
        fn(spark, sf_dir).toPandas()  # warm-up: JIT, code cache, file footers
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
