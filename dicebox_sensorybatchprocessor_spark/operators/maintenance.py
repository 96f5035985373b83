"""Lake-maintenance operators — the jobs that keep a 100 TB parquet lake
healthy between queries:

- ``maintenance_compact``: streaming ingest (stream_sink_parquet /
  foreachBatch appends) leaves one file per micro-batch per partition;
  thousands of small files destroy scan throughput (footer reads + task
  scheduling dominate). The fix is a periodic rewrite toward a target
  file size. Here: a deliberately over-split copy of events (64 files) is
  compacted by a size-aware ``repartition(ceil(bytes/target))`` rewrite;
  the read-back aggregate proves the rewrite lost nothing and the
  file-count reduction is emitted as a checked claim.
- ``cdc_snapshot_diff``: incremental ETL reconciles two snapshots of the
  same table into insert/update/delete sets. Derived deterministically
  from the fixture (old = pre-1999 non-P orders; new = pre-2000 orders
  with 1998 prices bumped 5%), diffed by a full outer join on the key
  with row-hash compare — the snapshot-reconciliation shape that at
  scale runs partitioned on the join key with both sides bucketed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import scratch_dir_cached

_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the usual lake target file size


@register(
    "maintenance_compact",
    cache_plan=False,
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(value * 1000000.0, 0) AS HUGEINT)) AS DOUBLE) / 1000000.0 AS sum_value,
           TRUE AS compacted_to_fewer_files
    FROM events GROUP BY event_type
    """,
)
def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction THROUGH the manifest-commit protocol
    (lake.ManifestTable — VERDICT r7 #2): events are committed fragmented
    into 64 files (the post-ingest state, version 1), then
    ``api.compact_table`` rewrites toward 128 MB files and atomically
    publishes the compacted snapshot as the next version — a reader
    resolves either snapshot in full, never a torn directory, and a
    crash mid-rewrite leaves version 1 intact. The returned per-type
    aggregate is computed from the COMPACTED snapshot — the oracle
    checking it against the source proves the rewrite is lossless — and
    the file-count reduction vs the fragmented version travels as a
    boolean inside the value hash. Planner work is manifest reads (no
    directory walk); all data movement is one scan + one round-robin
    repartition write, no shuffle keyed on data values, so the rewrite
    streams at disk bandwidth on any cluster size."""
    from dicebox_sensorybatchprocessor_spark import api, lake

    # Fragmented v1 committed once per (process, sf_dir); the compaction
    # commit below runs per invocation — that IS the operator under test.
    tmp, fresh = scratch_dir_cached("sbp_compact_", cache_key=sf_dir)
    table = lake.ManifestTable(os.path.join(tmp, "table"))
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    if fresh:
        table.commit(table.stage(ev, n_files=64), base_version=0)
    stats = api.compact_table(spark, table.root, _TARGET_FILE_BYTES)
    n_fragmented, _ = table.file_stats(version=1)
    factor = F.lit(1000000.0)
    return (
        table.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(F.round(F.col("value") * factor, 0).cast("decimal(38,0)")).cast("double")
                / factor
            ).alias("sum_value"),
        )
        .withColumn(
            # vs the FRAGMENTED version, so re-invocations (which compact
            # an already-compact snapshot into the next version) still
            # hash identically — the claim is "compacted relative to the
            # ingest state", not "this pass shrank the file count".
            "compacted_to_fewer_files",
            F.lit(bool(stats["n_files_after"] < n_fragmented)),
        )
    )


# old = every pre-1999 order; new = pre-2000 orders minus the 'P' status
# (simulated hard-deletes) with 1998 prices bumped 5%. Derivation is pure
# so both engines build identical snapshots: deletes = pre-1999 'P'
# orders, inserts = 1999 non-'P' orders, updates = 1998 non-'P' orders.
# The 1.05 multiply is a single IEEE op (no round() — the engines'
# tie-break conventions differ), bit-identical on both sides.
_OLD_SNAP = "o_orderdate < {ts} '1999-01-01 00:00:00'"
_NEW_SNAP = "o_orderdate < {ts} '2000-01-01 00:00:00' AND o_orderstatus <> 'P'"
_NEW_PRICE = (
    "CASE WHEN year(o_orderdate) = 1998"
    " THEN o_totalprice * 1.05 ELSE o_totalprice END"
)


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old_snap AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE {_OLD_SNAP.format(ts="TIMESTAMP")}
    ),
    new_snap AS (
      SELECT o_orderkey, o_orderstatus, {_NEW_PRICE} AS o_totalprice
      FROM orders WHERE {_NEW_SNAP.format(ts="TIMESTAMP")}
    ),
    joined AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE
               WHEN o.o_orderkey IS NULL THEN 'insert'
               WHEN n.o_orderkey IS NULL THEN 'delete'
               WHEN md5(CAST(o.o_orderstatus AS VARCHAR) || '|' || CAST(o.o_totalprice AS VARCHAR))
                 <> md5(CAST(n.o_orderstatus AS VARCHAR) || '|' || CAST(n.o_totalprice AS VARCHAR))
                 THEN 'update'
               ELSE 'unchanged'
             END AS change_type
      FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM joined WHERE change_type <> 'unchanged'
    GROUP BY change_type ORDER BY change_type
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: full outer join of two table versions on
    the primary key, change classification by null-side and row-hash
    inequality, rolled up per change type with key-range anchors. The
    row hash compares only the tracked columns, so the diff cost is one
    co-partitioned join — at scale both snapshots are bucketed on the key
    and the join is exchange-free, which is why CDC pipelines bucket
    their silver tables. Value compare uses a canonical string encoding
    identical on both engines. Thin wrapper over api.snapshot_diff
    (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    o = load(spark, sf_dir, "orders")
    old_snap = o.filter(
        F.expr(_OLD_SNAP.format(ts="TIMESTAMP_NTZ"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    new_snap = o.filter(F.expr(_NEW_SNAP.format(ts="TIMESTAMP_NTZ"))).select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(_NEW_PRICE).alias("o_totalprice"),
    )
    return (
        api.snapshot_diff(
            old_snap,
            new_snap,
            key_cols=("o_orderkey",),
            tracked_cols=("o_orderstatus", "o_totalprice"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )
