#!/usr/bin/env python
"""r16 blocked-route stress (VERDICT r15 #1 'done' criterion): on a
synthetic x10 embeddings fixture (20k vectors, 64 dims — 10x sf0.1),
the forced over-budget BLOCKED route must run within ~2x of the
broadcast route's rate and return identical rows. Writes
stress_blocked_r16.json."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dicebox_sensorybatchprocessor_spark import get_session
from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

N_ROWS, DIM = 20000, 64


def main() -> None:
    spark = get_session(app_name="sbp-stress-blocked-r16")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from dicebox_sensorybatchprocessor_spark.llm import dedup as D
    from dicebox_sensorybatchprocessor_spark.llm import similarity as S

    # deterministic synthetic fixture: md5-derived pseudo-random floats,
    # a handful of planted near-dup pairs so the threshold leg is real
    out = scratch_dir(prefix="sbp_stress_emb_")
    sf_dir = os.path.join(out, "fixture")
    os.makedirs(sf_dir, exist_ok=True)
    base = spark.range(N_ROWS).select(
        F.col("id").alias("vec_id"),
        F.concat(F.lit("L"), (F.col("id") % 17).cast("string")).alias("label"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), j -> "
            "cast(conv(substring(md5(concat('sv|', cast(vec_id as string), '|', cast(j as string))), 1, 8), 16, 10) as double)"
            " / 4294967296.0 - 0.5)"
        ).alias("embedding"),
    )
    # planted dups: ids >= N-100 copy (id - 100)'s vector with a tiny
    # deterministic nudge on dim 0
    dup = F.expr(
        f"CASE WHEN vec_id >= {N_ROWS - 100} THEN "
        f"transform(sequence(0, {DIM - 1}), j -> "
        f"cast(conv(substring(md5(concat('sv|', cast(vec_id - 100 as string), '|', cast(j as string))), 1, 8), 16, 10) as double)"
        f" / 4294967296.0 - 0.5 + CASE WHEN j = 0 THEN 0.001 ELSE 0.0 END)"
        " ELSE embedding END"
    )
    base.select("vec_id", "label", dup.alias("embedding")).coalesce(4).write.mode(
        "overwrite"
    ).parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def run(tag, fn):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rows = sorted(map(tuple, ((str(v) for v in r) for r in df.collect())))
        dt = time.perf_counter() - t0
        print(f"{tag}: {len(rows)} rows in {dt:.1f}s", flush=True)
        return rows, round(dt, 2)

    results = {"n_rows": N_ROWS, "dim": DIM}
    for name, fn in (
        ("dedup_embedding", D.dedup_embedding.__wrapped__),
        ("emb_label_margin", S.emb_label_margin.__wrapped__),
    ):
        rows_fast, t_fast = run(f"{name} broadcast", fn)
        S._INDEX_BYTE_BUDGET = 0
        S._BLOCK_TARGET_BYTES = 2 << 20  # ~6 blocks of the 10 MB matrix
        try:
            rows_blk, t_blk = run(f"{name} blocked", fn)
        finally:
            S._INDEX_BYTE_BUDGET = 256 << 20
            S._BLOCK_TARGET_BYTES = 64 << 20
        results[name] = {
            "broadcast_s": t_fast,
            "blocked_s": t_blk,
            "ratio": round(t_blk / t_fast, 2),
            "rows_equal": rows_fast == rows_blk,
            "n_rows_out": len(rows_fast),
        }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stress_blocked_r16.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
