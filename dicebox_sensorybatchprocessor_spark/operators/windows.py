"""§2.5 window functions + batch sessionization (SURVEY.md).

Window determinism rules applied throughout (the oracle hash-compares):
- ORDER BY keys form a total order within each partition — events.ts is
  µs-unique per user (verified), orders adds o_orderkey as tiebreaker.
- Ranking ints are cast to BIGINT (DuckDB window functions return BIGINT;
  Spark returns INT).
- Windowed sums run in integer fixed-point units: Spark accumulates frames
  sequentially while DuckDB uses segment trees, so double sums would
  differ in accumulation order; integer sums are exact under any order.

Scale: a window is one shuffle on the partition key + per-partition sort.
Skewed partitions (one giant user) are the hazard at 100 TB — the
sessionize operator's key carries the skew; salting by time-bucket is the
documented mitigation for pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register


@register(
    "win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS prk,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function family over one window spec."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value, 1, -1.0) OVER w AS prev_value,
           lead(event_type, 1, 'none') OVER w AS next_type,
           value - lag(value, 1, 0.0) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults; delta is per-row double subtraction (exact).
    Thin wrapper over api.lag_features (round 7) — all three shifted
    features share one window spec, so Catalyst collapses them into ONE
    Window node over one shuffle+sort."""
    from dicebox_sensorybatchprocessor_spark import api

    ev = api.lag_features(
        load(spark, sf_dir, "events"),
        partition_cols=("user_id",),
        order_by=("ts",),
        specs=[
            ("prev_value", "value", 1, -1.0),
            ("next_type", "event_type", -1, "none"),
            ("__sbp_prev0", "value", 1, 0.0),
        ],
    )
    return ev.select(
        "event_id",
        "user_id",
        "prev_value",
        "next_type",
        (F.col("value") - F.col("__sbp_prev0")).alias("delta"),
    )


@register(
    "win_frame_rows",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_spend,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_last3
    FROM orders
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running cumulative spend + sliding 3-row count per
    customer in order-date order (fixed-point cents keep the running sum
    exact under both engines' frame evaluation strategies)."""
    o = load(spark, sf_dir, "orders")
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_slide = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    cents = F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint")
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w_run).cast("double") / 100.0).alias("running_spend"),
        F.count("*").over(w_slide).cast("bigint").alias("n_last3"),
    )


@register(
    "win_frame_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) OVER w AS DOUBLE) / 1000000.0
             AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a value axis: trailing-24h per-user count and sum,
    ordered by epoch microseconds (both engines see identical integers)."""
    ev = load(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-86400000000, 0)
    )
    micros = F.round(F.col("value") * 1000000.0, 0).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_24h"),
        (F.sum(micros).over(w).cast("double") / 1000000.0).alias("sum_24h"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_value_seen,
           last_value(value) OVER w AS last_value_seen,
           first_value(nullif(event_type, 'error') IGNORE NULLS) OVER w AS first_ok_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over the whole partition, incl. IGNORE NULLS on a
    manufactured-null column (no stored nulls in fixtures)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("last_value_seen"),
        F.first(F.nullif(F.col("event_type"), F.lit("error")), ignorenulls=True)
        .over(w)
        .alias("first_ok_type"),
    )


@register(
    "win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (row_number + filter) — the BASELINE.md
    win_topk_group headline. Spark 3.5+ rewrites this to a WindowGroupLimit
    (per-partition top-k heap) before the full window sort. Thin wrapper
    over api.top_k_per_group (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return api.top_k_per_group(
        o,
        group_cols=("o_custkey",),
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-minute inactivity gap): lag →
    gap flag → running sum = session id → per-session rollup. One shuffle
    on user_id; the same sessions must fall out of the streaming
    session_window operator (§2.8 batch-equivalence). Thin wrapper over
    api.sessionize (round 6) so arbitrary (user, ts) relations share
    this oracle."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.sessionize(load(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile(4)
    per priority class. The ordering carries o_orderkey as a tiebreaker —
    ntile assigns by row *position*, so under value ties its output is
    partition-order-dependent unless the sort is total. percent_rank and
    cume_dist are (rank-1)/(n-1)-style exact rationals, identical IEEE
    divisions on both engines. One shuffle on the partition key; each
    window evaluates in a single pass over its sorted partition."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS first_occ
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_occ) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — not directly expressible in
    either engine (distinct aggregates are unsupported in window frames),
    so it decomposes into two plain windows: flag each (user, type)'s
    first occurrence via row_number, then running-sum the flags. Both
    windows sort once per user partition on the same (ts, event_id) total
    order, so Spark plans a single shuffle + sort with two Window nodes —
    the standard rewrite that keeps an otherwise O(n·k) running-distinct
    linear.

    Both windows partition by user_id alone — the first-occurrence flag
    comes from a type-change boundary under a (event_type, ts, event_id)
    sort rather than a row_number per (user_id, event_type), so the two
    Window nodes share ONE exchange (re-partitioning by (user, type) for
    the flag and again by user for the running sum would shuffle the
    table twice; plan-asserted single-Exchange in tests/test_plans.py)."""
    ev = load(spark, sf_dir, "events")
    w_type = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("event_type", 1).over(w_type).isNull()
            | (F.lag("event_type", 1).over(w_type) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("first_occ"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_occ").over(w_run).cast("bigint").alias("distinct_types_so_far"),
    )
