"""SparkSession factory and the engine config profile (SURVEY.md §4).

The profile pins the behaviors every operator depends on:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — ``events.ts`` is
  nanosecond-precision parquet (FIXTURES.md). Early PySpark 4.x builds
  refuse the read otherwise (PARQUET_TYPE_ILLEGAL) and deliver ns-LONG
  with it; current builds read TIMESTAMP(NANOS) natively as µs-truncated
  TIMESTAMP_NTZ and ignore this knob, so :mod:`.io` (batch) and
  :mod:`.streaming.streams` (staged streams) branch on the observed
  dtype rather than assuming either behavior.
- UTC session timezone — fixture timestamps are naive; the DuckDB
  correctness oracle compares naive microsecond values.
- AQE on — runtime shuffle-partition coalescing and skew-join splitting;
  free at test scale, load-bearing at the 100 TB design point.
- Arrow on — vectorized JVM↔Python boundary for every pandas UDF.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

_log = logging.getLogger(__name__)

# Conf keys where a failed runtime set is acceptable (perf-only, or not
# runtime-settable on some builds). Anything else failing to apply is
# correctness-bearing (nanosAsLong, timeZone) and must be loud.
_OPTIONAL_CONF_KEYS = {
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.shuffle.partitions",
}

# Conf that is safe (and necessary) to (re)apply at runtime on a session we
# did not create — e.g. the driver-owned session passed to entry()/queries().
_RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Streaming stateful operators run one state store per shuffle
    # partition and AQE cannot coalesce them; the vanilla default of 200
    # costs ~6× wall-clock on the §2.8 ops at local scale (measured:
    # stream_stream_join 43 s → 7 s). Batch shuffles are AQE-coalesced
    # regardless. A cluster deployment overrides via SPARK_GRAFT_SHUFFLE_
    # PARTITIONS / --conf to ~2-3× total cores.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # AQE's parallelism-first coalescing only keeps post-shuffle
    # parallelism down to this floor; the 1 MB default collapses small
    # shuffles (a 1.4 MB window/agg result) onto ONE task while 31 cores
    # idle — measured 185 ms → 81 ms on win_topk_group at sf0.1. At the
    # 100 TB design point target sizes are governed by
    # advisoryPartitionSizeInBytes (64 MB), so a 64 KB floor only affects
    # shuffles that are tiny relative to the cluster — where keeping
    # parallelism is equally right.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64KB",
    # Same blindness one level up (r13): AQE's 64 MB advisory TARGET is
    # byte-based, so a CPU-dense reduce stage over a compact shuffle —
    # the near-dup verify aggregation hashes every candidate pair's
    # shingles but ships only ids — coalesces to a handful of tasks on
    # a 32-core box (measured: dedup_near_verified 3.6 → 2.7 s at sf0.1
    # with a 4 MB target; file-split size had no effect — the reduce
    # side was the bottleneck). At the 100 TB design point production
    # shuffle partitions dwarf any advisory so coalescing never binds;
    # deployments should instead watch the skew-join interaction (the
    # advisory is also the skew-SPLIT target — raise it back toward
    # 64 MB via --conf where skew splitting dominates).
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
}


# Marker conf: a session that pins its own shuffle width (the streaming
# child sessions pin the state-store width) sets this to the pinned value;
# ensure_engine_conf then re-asserts THAT width instead of the batch
# default. Without it, any load()/_events_raw() call routed through the
# child re-applied the batch width mid-session — the silent cause of the
# r2→r4 stream_tumbling cost creep (state ran with 32 stores per
# micro-batch, not the pinned streaming width; VERDICT r4 #3).
PINNED_SHUFFLE_KEY = "spark.sbp.pinnedShuffleWidth"


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine profile to an existing session.

    Idempotent and cheap; every registered query runs through this so the
    engine behaves identically on driver-owned sessions.
    """
    pinned = spark.conf.get(PINNED_SHUFFLE_KEY, None)
    for key, value in _RUNTIME_CONF.items():
        if key == "spark.sql.shuffle.partitions" and pinned is not None:
            value = pinned
        try:
            spark.conf.set(key, value)
        except Exception as exc:
            if key in _OPTIONAL_CONF_KEYS:
                continue  # perf-only knob; session behavior stays correct
            # Correctness-bearing key (nanosAsLong, UTC timeZone): a silent
            # miss would mean silently divergent results, so say so.
            _log.warning(
                "engine conf %s=%s could not be applied to this session: %s",
                key,
                value,
                exc,
            )
    return spark


def get_session(
    app_name: str = "dicebox-sensorybatchprocessor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the full engine profile.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env var is
    set, else ``local[*]``. ``shuffle_partitions`` defaults to 32 — sized to
    local core count; a real cluster deployment sets it to ~2-3× total
    cores (or relies on AQE coalescing from a high initial value).
    """
    # getOrCreate() on an already-running session silently ignores builder
    # configs — don't mkdtemp a warehouse dir (leaked, unused) or pretend
    # the profile applied; just re-assert the runtime-settable conf.
    active = SparkSession.getActiveSession()
    if active is not None:
        ensure_engine_conf(active)
        if shuffle_partitions is not None:  # runtime-settable: honor the ask
            active.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        return active

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        # keep catalog metadata (bucketed-table entries) out of the repo cwd
        .config("spark.sql.warehouse.dir", scratch_dir("sbp_warehouse_"))
    )
    for key, value in _RUNTIME_CONF.items():
        builder = builder.config(key, value)
    return ensure_engine_conf(builder.getOrCreate())
