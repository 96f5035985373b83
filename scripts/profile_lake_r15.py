#!/usr/bin/env python
"""Round-15 lake-block phase profiler (guide §1): break the warm cost of
the lake lifecycle queries into their commit/refresh phases by timing the
underlying lake/mv verbs directly, so optimization targets the phase that
actually costs, not the query wrapper.

Usage: python scripts/profile_lake_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark import all_queries, get_session
from dicebox_sensorybatchprocessor_spark import lake
from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.lake import ManifestTable, merge_upsert
from dicebox_sensorybatchprocessor_spark.mv import MaterializedAgg
from dicebox_sensorybatchprocessor_spark.utils import scratch_dir


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="sbp-profile-lake")
    spark.sparkContext.setLogLevel("ERROR")

    def t(label, fn):
        sc = spark.sparkContext
        sc.setJobDescription(f"lake-profile: {label}")
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        print(f"  {label:42s} {dt:7.3f}s", flush=True)
        return out

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    li.count()  # warm the scan

    print("== lake_incremental_mv phases (one pass)")
    table = ManifestTable(scratch_dir(prefix="sbp_prof_mv_base_"))
    t("merge_upsert initial (8 buckets)", lambda: merge_upsert(
        table, li, ("l_orderkey", "l_linenumber"), n_buckets=8))
    view = MaterializedAgg(
        table,
        scratch_dir(prefix="sbp_prof_mv_state_"),
        ("l_returnflag",),
        {
            "n": ("count", "*"),
            "sum_qty": ("sum", "l_quantity"),
            "avg_qty": ("avg", "l_quantity"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
    )
    t("refresh 1 (initial, small_table_bytes=0)", lambda: view.refresh(
        spark, small_table_bytes=0))
    batch2 = li.filter(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey", "l_linenumber",
        F.when(F.col("l_orderkey") % 25 == 0, "Z").otherwise(
            F.col("l_returnflag")).alias("l_returnflag"),
        (F.col("l_quantity") + 10).alias("l_quantity"),
    )
    t("merge_upsert batch2 (update feed)", lambda: merge_upsert(
        table, batch2, ("l_orderkey", "l_linenumber")))
    t("refresh 2 (incremental)", lambda: view.refresh(spark, small_table_bytes=0))
    feed = li.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey", "l_linenumber",
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(1).alias("seq"), F.lit("delete").alias("op"),
    )
    t("merge_apply delete feed", lambda: lake.merge_apply(
        table, feed, ("l_orderkey", "l_linenumber"), op_col="op", seq_col="seq"))
    t("refresh 3 (incremental)", lambda: view.refresh(spark, small_table_bytes=0))
    batch4 = (
        li.filter((F.col("l_orderkey") % 5 != 0) & (F.col("l_orderkey") % 7 != 0))
        .orderBy("l_orderkey", "l_linenumber").limit(1)
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                (F.col("l_quantity") + 5).alias("l_quantity"))
    )
    t("merge_upsert batch4 (single key)", lambda: merge_upsert(
        table, batch4, ("l_orderkey", "l_linenumber")))
    t("refresh 4 (incremental)", lambda: view.refresh(spark, small_table_bytes=0))
    t("view.read.toPandas", lambda: view.read(spark).toPandas())

    print("== whole-query warm samples (toPandas, n=3)")
    specs = all_queries()
    for name in ("lake_incremental_mv", "lake_cdc_apply", "lake_merge_into",
                 "lake_update_delete", "lake_zorder_skip", "maintenance_compact"):
        fn = specs[name].fn
        fn(spark, sf_dir).toPandas()  # warm-up
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            ts.append(time.perf_counter() - t0)
        print(f"  {name:42s} best={min(ts):7.3f}s  med={sorted(ts)[1]:7.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
