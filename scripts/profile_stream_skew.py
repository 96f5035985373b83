#!/usr/bin/env python
"""Profile the stream-static hot-key join (VERDICT r5 #6): WHY does
salting win only ~15-35% wall-clock in the streaming regime when the
equivalent batch join wins ~25%?

Decomposition: each sample is a full availableNow query lifecycle; the
StreamingQueryProgress durationMs split separates the fixed lifecycle
cost (query start, offset/commit log writes, teardown — paid once by a
resident stream) from addBatch (the actual join+agg micro-batch work the
salting targets). The probe runs plain and salted at salt_n in {4, 8,
16} over the x64-amplified events (~60% of rows on ONE key), AQE skew
split + broadcast disabled (the regime where a micro-batch join cannot
be re-planned), and prints wall / triggerExecution / addBatch per
variant. Read with scripts/../NOTES.md round-6 entry.

Usage: python scripts/profile_stream_skew.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dicebox_sensorybatchprocessor_spark import get_session  # noqa: E402
from dicebox_sensorybatchprocessor_spark.io import load  # noqa: E402
from dicebox_sensorybatchprocessor_spark.session import (  # noqa: E402
    PINNED_SHUFFLE_KEY,
    ensure_engine_conf,
)
from dicebox_sensorybatchprocessor_spark.streaming import streams as S  # noqa: E402
from dicebox_sensorybatchprocessor_spark.utils import fixed_point_sum  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="sbp-skewstream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    child = spark.newSession()
    ensure_engine_conf(child)
    width = 8
    child.conf.set("spark.sql.shuffle.partitions", str(width))
    child.conf.set(PINNED_SHUFFLE_KEY, str(width))
    child.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    amp = 64

    ev = load(child, sf_dir, "events")
    skewed = (
        ev.select("event_id", "user_id", "value")
        .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(amp)])))
        .select(
            F.when(
                F.pmod(F.col("event_id") + F.col("rep"), F.lit(10)) < 6,
                F.lit(7).cast("bigint"),
            )
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            (F.col("event_id") * amp + F.col("rep")).alias("event_id"),
            "value",
        )
    )
    staged = S._stage_files(child, [skewed], "skewstream", cache_key=sf_dir)
    schema = "user_id BIGINT, event_id BIGINT, value DOUBLE"
    cust = load(child, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def run(salt_n: int | None, tag: str) -> dict:
        s = child.readStream.schema(schema).parquet(staged)
        if salt_n is None:
            j = s.join(cust, s.user_id == cust.c_custkey)
        else:
            s2 = s.withColumn(
                "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_n)).cast("int")
            )
            c2 = cust.withColumn(
                "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
            )
            j = s2.join(c2, (s2.user_id == c2.c_custkey) & (s2.salt == c2.salt))
        agg = j.groupBy("c_mktsegment").agg(
            F.count("*").alias("n_events"),
            fixed_point_sum(F.col("value"), 6).alias("sum_value"),
        )
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            S._run_to_table(child, agg, f"skprof_{tag}", "complete").toPandas()
            wall = time.perf_counter() - t0
            d = S.LAST_PROGRESS.get(f"skprof_{tag}", {})
            sample = {
                "wall": round(wall, 3),
                "triggerExecution": round(d.get("triggerExecution", 0) / 1000, 3),
                "addBatch": round(d.get("addBatch", 0) / 1000, 3),
            }
            if best is None or sample["wall"] < best["wall"]:
                best = sample
        best["lifecycle_overhead"] = round(best["wall"] - best["triggerExecution"], 3)
        return best

    out = {"plain": run(None, "plain")}
    for n in (4, 8, 16):
        out[f"salted_{n}"] = run(n, f"s{n}")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
