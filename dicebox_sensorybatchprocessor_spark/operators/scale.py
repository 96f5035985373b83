"""Scale-pattern operators — the two shuffle-elimination techniques a
100 TB deployment leans on, expressed as first-class, oracle-checked
queries rather than advice in a docstring:

- ``join_bucketed`` — co-located fact⋈fact join over bucketed tables.
  Both sides are written ``bucketBy(N, key)``; a later join on that key
  reads bucket-aligned splits and needs **zero Exchange** (asserted in
  tests/test_plans.py). On a cluster this is the difference between
  re-shuffling 100 TB per join and shuffling once at ingest time.
- ``join_skew_salted`` — hot-key mitigation: the fact side's key is
  extended with a deterministic salt, the dimension side is exploded
  ×SALT, and the join runs on (key, salt) so one hot key's rows spread
  over SALT reducers instead of one straggler. AQE's skew-join split
  handles moderate skew automatically; salting is the explicit form that
  also works for stateful/streaming joins where AQE cannot re-plan.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import (
    fixed_point_sum,
    fixed_point_sum_sql,
    scratch_dir,
)

_N_BUCKETS = 8
_SALT = 8

_BUCKETED_READY: set[tuple[str, str]] = set()


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem + orders bucketed by the join key (once per session ×
    scale factor) and return the table names. Models the one-time ingest
    cost that every subsequent co-located join amortizes."""
    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    li_name, o_name = f"sbp_li_b{tag}", f"sbp_o_b{tag}"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BUCKETED_READY:
        root = scratch_dir("sbp_bucketed_")
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .write.mode("overwrite")
            .option("path", f"{root}/{li_name}")
            .bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(li_name)
        )
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.mode("overwrite")
            .option("path", f"{root}/{o_name}")
            .bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(o_name)
        )
        _BUCKETED_READY.add(key)
    return li_name, o_name


@register(
    "join_bucketed",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus,
           count(*) AS n_lines,
           {fixed_point_sum_sql("l.l_extendedprice", 2)} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    cache_plan=False,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join: both sides bucketed by the join key,
    MERGE hint to keep the sort-merge path (broadcast would hide the
    bucket alignment at fixture scale), then a per-order aggregate that
    also reuses the bucket partitioning — zero Exchange in the plan."""
    li_name, o_name = _bucketed_tables(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey, "inner")
    return joined.groupBy("o_orderkey", "o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        fixed_point_sum(F.col("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_events,
           CAST(SUM(CAST(round(e.value * 1000000.0, 0) AS HUGEINT)) AS DOUBLE) / 1000000.0
             AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi join: fact key → (key, salt) with a deterministic salt,
    dimension exploded ×SALT, join on the pair. Result is identical to the
    plain join; the plan spreads each key over SALT reducers. The salt is
    derived from event_id (not random) so the query stays deterministic
    and oracle-checkable."""
    e = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT)).cast("int")
    )
    c = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)])))
    )
    # shuffle_hash hint: salting only matters for shuffle joins (a broadcast
    # join never shuffles the fact side) — keep the demonstrated plan honest
    # even at fixture scale where Catalyst would otherwise broadcast.
    joined = e.hint("shuffle_hash").join(
        c, (e.user_id == c.c_custkey) & (e.salt == c.salt), "inner"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        fixed_point_sum(F.col("value"), 6).alias("sum_value"),
    )


_DPP_READY: dict[tuple[str, str], tuple[str, str]] = {}


def _partitioned_events(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write events partitioned by day plus a day-dimension table (once per
    session × scale factor) — the ingest-time layout dynamic partition
    pruning needs."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DPP_READY:
        fact_dir = scratch_dir("sbp_dpp_fact_")
        dim_dir = scratch_dir("sbp_dpp_dim_")
        ev = load(spark, sf_dir, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(fact_dir)
        # dim day is DATE to match the read-back partition column type, so
        # the join key is the bare partition attribute (an expression over
        # it would defeat the PartitionPruning rule). The focus marker is a
        # STRING equality filter on a non-join-key column: a bare boolean
        # attribute fails Catalyst's isLikelySelective test (no DPP), and a
        # predicate on the join key itself would propagate to the fact as a
        # static filter via constraint inference (pruning, but not dynamic).
        days = (
            ev.select(F.to_date("day").alias("day"))
            .distinct()
            .withColumn(
                "day_type",
                F.when(
                    F.col("day") <= F.lit("2024-01-03").cast("date"), "focus"
                ).otherwise("other"),
            )
        )
        days.coalesce(1).write.mode("overwrite").parquet(dim_dir)
        _DPP_READY[key] = (fact_dir, dim_dir)
    return _DPP_READY[key]


@register(
    "join_dpp_partitioned",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day, event_type,
           count(*) AS n_events,
           {fixed_point_sum_sql("value", 6)} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) <= DATE '2024-01-03'
    GROUP BY day, event_type
    """,
    cache_plan=False,
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, exercised for real: events are laid out
    partitioned by day (the 100 TB ingest layout), the day dimension is
    filtered to a 3-day focus window, and the fact⋈dim join lets Catalyst
    inject a DynamicPruningSubquery so the scan reads ONLY the 3 matching
    day partitions out of 30 — the fact-side filter is never written by
    the query, it is *derived from the dim at runtime* (asserted in
    tests/test_plans.py). This is partition pruning driven through a join,
    the dominant scan-elimination mechanism for star-schema queries at
    scale."""
    fact_dir, dim_dir = _partitioned_events(spark, sf_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("day_type") == "focus").select("day")
    return (
        fact.join(dim, "day")
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            fixed_point_sum(F.col("value"), 6).alias("sum_value"),
        )
    )
