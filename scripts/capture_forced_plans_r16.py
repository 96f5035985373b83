#!/usr/bin/env python
"""Capture .explain("formatted") for the r16 over-budget (forced) routes:
the blocked Arrow kernels that replaced the interpreted-HOF nested-loop
fallbacks, and text_containment's prefix-filter fallback. Plan-build
only — no query execution."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicebox_sensorybatchprocessor_spark import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def dump(df, name):
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(plan)
    print(name, "exchanges:", plan.count("Exchange"),
          "groupsInPandas:", plan.count("FlatMapGroupsInPandas") // 2,
          "BNLJ:", plan.count("BroadcastNestedLoopJoin") // 2, flush=True)


def main() -> None:
    spark = get_session(app_name="sbp-forced-plans-r16")
    spark.sparkContext.setLogLevel("ERROR")

    from dicebox_sensorybatchprocessor_spark.llm import curation as C
    from dicebox_sensorybatchprocessor_spark.llm import dedup as D
    from dicebox_sensorybatchprocessor_spark.llm import similarity as S
    from dicebox_sensorybatchprocessor_spark.llm import text as T

    S._INDEX_BYTE_BUDGET = 0
    dump(S.emb_label_margin.__wrapped__(spark, SF), "emb_label_margin_forced_blocked_after")
    dump(D.dedup_embedding.__wrapped__(spark, SF), "dedup_embedding_forced_blocked_after")
    dump(C.dedup_semantic_buckets.__wrapped__(spark, SF), "dedup_semantic_buckets_forced_blocked_after")
    dump(S._exact_radius_pairs(spark, SF), "sim_ann_lsh_exact_side_forced_blocked_after")
    T._CONTAIN_TEXT_BUDGET = 0
    dump(T.text_containment.__wrapped__(spark, SF), "text_containment_forced_prefix_after")


if __name__ == "__main__":
    main()
