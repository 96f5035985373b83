#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries from
BASELINE.md at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Protocol: one global warm-up pass over all headline queries (JVM JIT /
codegen caches / parquet footers — the steady state a resident Spark
service runs in), then per-query warm wall-clock reported as BOTH
best-of-3 and median-of-3 (ADVICE r2: the median makes the comparison
basis symmetric with single-warm-run baselines; the best tracks
round-over-round drift). Results are fetched with Arrow (toPandas), the
columnar analogue of DuckDB's ``.df()`` fetch used for the baseline.

Secondary block: ``llm_queries`` times representative north-star
operators (dedup / similarity / text pipeline / streaming) so a perf
regression in that surface is visible round-over-round, under the same
best-of-3 + median-of-3 protocol. BASELINE.md carries same-machine
DuckDB numbers for this block measured under the identical protocol
(scripts/measure_llm_baseline.py). The dominant entry,
dedup_ngram_jaccard, is the *exact* all-pairs verifier over a
deliberately degenerate fixture vocabulary (13k distinct shingles /
1.35M shingle rows => 279M join pairs at sf0.1); DuckDB running the
identical oracle SQL measures ~12 s warm on the same 32 cores, so Spark
is ~3-4x faster on it — and dedup_near_verified is the composed
candidates->verify pipeline that replaces it at scale.

``floor_note`` records the local-mode interpretation caveat for the
per-query 2x bar: a Spark job submission + Arrow fetch floors at ~50 ms
in local mode regardless of the plan (spark.range(1) measures the same),
so sub-30 ms DuckDB queries (topk_orders: 15 ms) cannot meet a per-query
2x bar here even with the optimal plan (TakeOrderedAndProject, zero
exchange, plan-asserted in tests/test_plans.py). The aggregate ratio is
the comparable number; at larger inputs the fixed floor amortizes away.
"""

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

# North-star LLM-pipeline + streaming surface (secondary block; not part
# of the BASELINE.md headline total, tracked for round-over-round drift).
LLM_BLOCK = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_near_verified",
    "dedup_minhash_banded",
    "dedup_simhash",
    "sim_knn_query",
    "text_quality",
    "pipeline_corpus_preprocess",
    "stream_tumbling",
]

# Deep-SQL / maintenance block (round 3): the optimizer-heavy TPC-H
# shapes and the interval/CDC joins, same protocol, with same-machine
# DuckDB baselines in BASELINE.md (scripts/measure_llm_baseline.py sql).
# join_interval_chunked is the interesting ratio: Spark runs the chunked
# equi-join decomposition while the DuckDB baseline runs the naive
# interval theta-join the decomposition replaces.
SQL_BLOCK = [
    "sql_q2_min_cost_supplier",
    "sql_q9_product_profit",
    "sql_q13_order_distribution",
    "sql_q21_sole_blame",
    "join_interval_chunked",
    "cdc_snapshot_diff",
]


def _timed_runs(fn, runs: int) -> list[float]:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts


def _best(ts: list[float]) -> float:
    return round(min(ts), 4)


def _median(ts: list[float]) -> float:
    return round(sorted(ts)[len(ts) // 2], 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(app_name="sbp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    headline = [n for n in HEADLINE if n in specs]
    # Global warm-up: every query once, so per-query timing measures the
    # steady state rather than first-touch JIT compilation.
    for name in headline:
        specs[name].fn(spark, sf_dir).toPandas()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in headline:
        fn = specs[name].fn
        fn(spark, sf_dir).toPandas()  # per-query warm-up (plan-local caches)
        runs = _timed_runs(lambda: fn(spark, sf_dir).toPandas(), 3)
        timings[name] = _best(runs)
        medians[name] = _median(runs)

    def _block(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        bests: dict[str, float] = {}
        meds: dict[str, float] = {}
        for name in names:
            if name not in specs:
                continue
            fn = specs[name].fn
            fn(spark, sf_dir).toPandas()  # warm-up
            runs = _timed_runs(lambda: fn(spark, sf_dir).toPandas(), 3)
            bests[name] = _best(runs)
            meds[name] = _median(runs)
        return bests, meds

    llm_timings, llm_medians = _block(LLM_BLOCK)
    sql_timings, sql_medians = _block(SQL_BLOCK)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median_of_3": medians,
                "total_median_of_3": round(sum(medians.values()), 4),
                "llm_queries": llm_timings,
                "llm_queries_median_of_3": llm_medians,
                "sql_queries": sql_timings,
                "sql_queries_median_of_3": sql_medians,
                "sf": sf,
                "protocol_note": (
                    "warm-up pass + best-of-3 AND median-of-3 per query; "
                    "BASELINE.md DuckDB numbers for the LLM block were "
                    "re-measured under the identical protocol (ADVICE r2: "
                    "symmetric comparison basis)"
                ),
                "floor_note": (
                    "local-mode job floor ~0.05s/query (spark.range(1) "
                    "toPandas measures the same); per-query ratios vs "
                    "sub-30ms DuckDB baselines are floor-bound, aggregate "
                    "ratio is the comparable number"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
