"""Analytics-pipeline operators (round-3 §2.10 additions): cohort
retention, ordered funnels, histograms, per-group mode, gaps-and-islands
runs, RFM segmentation, session rollups, and incremental (mergeable)
window rollups — the query shapes a production events/corpus warehouse
runs daily, composed entirely from built-in DataFrame ops.

Scale notes: every operator here is one or two hash shuffles on its
natural key (user_id / bucket / day); the only global windows are the
RFM ntile scores, which at 100 TB would be replaced by sketch-derived
cut points (see orders_rfm docstring). No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import (
    fixed_point_sum,
    fixed_point_sum_sql,
    stable_round,
)


@register(
    "events_retention_cohort",
    oracle="""
    WITH days AS (
      SELECT user_id, date_trunc('day', ts) AS day FROM events
    ),
    firstd AS (
      SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, d.day) AS day_offset,
           count(DISTINCT d.user_id) AS n_users
    FROM days d JOIN firstd f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    every later day offset — the canonical activation/retention matrix.
    Two shuffles (first-day agg on user_id, then the cohort×offset agg);
    the first-day table is one row per user, so Catalyst broadcasts it
    into the join at any realistic cardinality. Thin wrapper over
    api.retention_cohort (round 6) so the df-level face shares this
    oracle."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.retention_cohort(load(spark, sf_dir, "events"), grain="day")


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1 GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage_order, 'signup' AS stage, count(*) AS n_users FROM s
      UNION ALL
      SELECT 2, 'view', count(*) FROM v
      UNION ALL
      SELECT 3, 'purchase', count(*) FROM p
    ) ORDER BY stage_order
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: each stage
    counts users whose stage event happened strictly AFTER their previous
    stage's first event (time-ordered, not mere co-occurrence). Each stage
    is a filter + per-user min + broadcast-sized join — linear scans, no
    self-join explosion, the shape that holds at 100 TB because stage
    tables shrink monotonically. Thin wrapper over api.funnel (round 6)
    so arbitrary stage lists share this oracle."""
    from dicebox_sensorybatchprocessor_spark import api

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return api.funnel(ev, ["signup", "view", "purchase"])


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(round(o_totalprice * 100.0, 0) AS BIGINT) // 5000000 AS bucket,
           (CAST(round(o_totalprice * 100.0, 0) AS BIGINT) // 5000000) * 50000.0 AS bucket_lo,
           count(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100.0, 0) AS HUGEINT)) AS DOUBLE) / 100.0
             AS sum_price
    FROM orders
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram ($50k buckets over o_totalprice) — the
    profiling primitive behind data-quality dashboards and feature
    bucketing. Bucket ids are computed by INTEGER division on exact cents
    (never floor of a double quotient) so boundary values land in the same
    bucket on every engine; one map-side-combined aggregation."""
    o = load(spark, sf_dir, "orders")
    bucket = F.expr("CAST(round(o_totalprice * 100.0, 0) AS BIGINT) div 5000000")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "agg_mode",
    oracle="""
    SELECT user_id, event_type AS mode_type, n AS n_events
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
             ) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent event_type per user) with a
    deterministic tie-break (lexicographically smallest type wins):
    count aggregation, then a WindowGroupLimit-eligible row_number over
    the small per-user type set — never a collect of value lists."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), F.col("n").alias("n_events"))
    )


@register(
    "win_gap_islands",
    oracle="""
    SELECT user_id, event_type, min(ts) AS run_start, count(*) AS run_len
    FROM (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS grp
      FROM events
    )
    GROUP BY user_id, event_type, grp
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events per
    user via the row_number-difference trick (two window passes over the
    SAME partition/order — Catalyst collapses them into one sort), then
    one aggregate per island. The total-order tiebreaker (ts, event_id)
    pins island composition deterministically on both engines. Thin
    wrapper over api.gap_islands (round 6) so arbitrary (user, ts, type)
    relations share this oracle."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.gap_islands(load(spark, sf_dir, "events"))


@register(
    "orders_rfm",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
    base AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT ref_date FROM ref)) AS recency_days,
             count(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100.0, 0) AS HUGEINT)) AS DOUBLE) / 100.0
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
    FROM base
    """,
)
def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus max date), frequency (order count), monetary (exact fixed-point
    revenue), each quartiled into a 1-4 score with a deterministic
    o_custkey tiebreaker. The global ntile windows are exact-rank cuts —
    correct at fixture scale and for any per-segment output that fits a
    sort; at 100 TB the idiomatic swap is sketch_quantiles cut points
    joined back (no total order), which changes only the scoring join,
    not this operator's aggregation shape."""
    o = load(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            fixed_point_sum(F.col("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.to_date("ref_date"), F.to_date("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy(F.col("recency_days").asc(), "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.col("monetary").desc(), "o_custkey")).alias("m_score"),
    )


@register(
    "events_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS s, max(ts) AS e
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
           round(sum(epoch_us(e) - epoch_us(s)) / 1000000.0, 6) AS total_span_secs
    FROM sessions GROUP BY user_id
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup on top of gap-based sessionization
    (30-minute inactivity): session count, largest session, and total
    in-session span. Durations are summed as INTEGER microseconds and
    divided once, so the double result is accumulation-order-independent
    (the same fixed-point discipline as money sums)."""
    from dicebox_sensorybatchprocessor_spark.operators.windows import sessionize_batch

    sessions = sessionize_batch(spark, sf_dir)
    span_us = F.unix_micros(F.col("session_end").cast("timestamp")) - F.unix_micros(
        F.col("session_start").cast("timestamp")
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum(span_us).alias("total_us"),
        )
        .select(
            "user_id",
            "n_sessions",
            "max_session_events",
            F.round(F.col("total_us") / 1000000.0, 6).alias("total_span_secs"),
        )
    )


@register(
    "agg_rollup_incremental",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day_start, event_type,
           count(*) AS n_events,
           {fixed_point_sum_sql("value", 6)} AS sum_value
    FROM events GROUP BY date_trunc('day', ts), event_type
    """,
)
def agg_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup (the hypertable pattern): hourly partial
    aggregates are MERGED into daily aggregates instead of re-scanning the
    raw events — the oracle computes the daily result directly from raw
    rows, so the hash match proves the partials are lossless. Counts and
    fixed-point integer unit sums are algebraic (merge = sum), which is
    exactly why the 100 TB continuous-aggregate pipeline stores hourly
    partials and serves any coarser grain from them."""
    ev = load(spark, sf_dir, "events")
    units = F.round(F.col("value") * 1000000.0, 0).cast("long")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum(units).alias("units"))
    return (
        hourly.groupBy(F.date_trunc("day", "hour_start").alias("day_start"), "event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("units").alias("u"))
        .select(
            "day_start",
            "event_type",
            "n_events",
            (F.col("u").cast("double") / 1000000.0).alias("sum_value"),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_start,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY date_trunc('hour', ts)
    ), scored AS (
      SELECT hour_start, n_events,
             avg(n_events) OVER w AS trail_mean,
             stddev_samp(n_events) OVER w AS trail_std,
             count(*) OVER w AS n_trail
      FROM hourly
      WINDOW w AS (ORDER BY hour_start ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour_start, n_events,
           floor((n_events - trail_mean) / trail_std * 1000000.0 + 0.5)
             / 1000000.0 AS zscore
    FROM scored
    WHERE n_trail = 24 AND trail_std > 0
      AND abs((n_events - trail_mean) / trail_std) >= 2.0
    ORDER BY hour_start
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: hourly event counts scored against the
    trailing 24 CLOSED hours (frame ends at 1 PRECEDING — including the
    current hour would let the anomaly suppress its own z-score), flagged
    at |z| ≥ 2. The trailing mean/stddev are over exact integer counts,
    so the float math is the same two IEEE ops on both engines. Shape:
    one shuffle to hourly grain (map-side combined), then a single-pass
    window over a series 5 orders of magnitude smaller than the input —
    the monitoring rollup pattern where the expensive part is the first
    aggregate, not the analytics on top."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count("*").alias("n_events")
    )
    w = Window.orderBy("hour_start").rowsBetween(-24, -1)
    scored = hourly.select(
        "hour_start",
        "n_events",
        F.avg("n_events").over(w).alias("trail_mean"),
        F.stddev_samp("n_events").over(w).alias("trail_std"),
        F.count("*").over(w).alias("n_trail"),
    )
    z = (F.col("n_events") - F.col("trail_mean")) / F.col("trail_std")
    return (
        scored.filter((F.col("n_trail") == 24) & (F.col("trail_std") > 0) & (F.abs(z) >= 2.0))
        .select("hour_start", "n_events", stable_round(z).alias("zscore"))
    )


@register(
    "orders_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_type
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY a.p_type, b.p_type
    ORDER BY n_orders DESC, type_a, type_b
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining: how often two part types appear in the same
    order — the basket self-join. The DISTINCT-first projection is the
    scale move: the join fans out per order as (distinct types)², capped
    at 6 types here (≤15 pairs/order) instead of (lineitems)² (up to
    7²=49) — on a 100 TB basket table that pre-distinct is the difference
    between a bounded and an unbounded fan-out, and the < ordering halves
    the pair space while making pairs canonical."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    items = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(F.col("a.p_type").alias("type_a"), F.col("b.p_type").alias("type_b"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "parts_abc_pareto",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0, 0) AS HUGEINT))
               AS rev_units
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, rev_units,
             CAST(SUM(rev_units) OVER (ORDER BY rev_units DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
               AS running_units,
             CAST((SELECT SUM(rev_units) FROM per_part) AS HUGEINT) AS total_units
      FROM per_part
    ), classed AS (
      SELECT l_partkey, rev_units,
             CASE WHEN running_units * 1.0 / total_units <= 0.8 THEN 'A'
                  WHEN running_units * 1.0 / total_units <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_units) AS DOUBLE) / 10000.0 AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def parts_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, running
    cumulative share cut at 80% (A) and 95% (B) — the inventory-analysis
    staple. Everything order-sensitive runs in EXACT integer units: the
    per-part revenue is a fixed-point bigint sum, the running total is a
    window cumsum of those integers under a total (revenue, partkey)
    order, and the share compare divides two exact integers — so the
    class boundaries are bit-deterministic on both engines (a double
    running sum would accumulate in window order and could flip a
    boundary part between engines). Two shuffles: the per-part aggregate
    and the single-partition ranking window — the ranking input is one
    row per part (~1/30th of lineitem), the usual pareto-rollup shape."""
    li = load(spark, sf_dir, "lineitem")
    units = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000.0, 0
    ).cast("decimal(38,0)")
    per_part = li.groupBy("l_partkey").agg(F.sum(units).alias("rev_units"))
    w_run = (
        Window.orderBy(F.col("rev_units").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = per_part.agg(F.sum("rev_units")).first()[0]
    share = F.col("running_units").cast("double") / F.lit(float(total))
    ranked = per_part.withColumn("running_units", F.sum("rev_units").over(w_run))
    classed = ranked.withColumn(
        "abc_class",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            (F.sum("rev_units").cast("double") / 10000.0).alias("class_revenue"),
        )
    )


@register(
    "orders_backlog_aging",
    oracle="""
    WITH as_of AS (SELECT max(o_orderdate) AS now FROM orders),
    open_orders AS (
      SELECT o.o_orderkey, o.o_totalprice, o.o_orderpriority,
             datediff('day', CAST(o.o_orderdate AS DATE), CAST(a.now AS DATE)) AS age_days
      FROM orders o, as_of a
      WHERE o.o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 90 THEN '0-90'
                WHEN age_days <= 365 THEN '91-365'
                WHEN age_days <= 730 THEN '366-730'
                ELSE '730+' END AS age_bucket,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100.0, 0) AS HUGEINT)) AS DOUBLE) / 100.0
             AS backlog_value
    FROM open_orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: open ('O') orders bucketed by calendar-day age
    relative to the dataset's as-of date (max order date — computed
    in-engine, not wall clock, so the result is reproducible), crossed
    with priority, with exact fixed-point backlog value. The as-of scalar
    is one tiny aggregate broadcast into a per-row expression; the rest
    is a single filtered scan + hash aggregate — the nightly-report shape
    where the only full pass is the one aggregate."""
    o = load(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate")).first()[0]
    age = F.datediff(F.lit(asof).cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(age <= 90, "0-90")
        .when(age <= 365, "91-365")
        .when(age <= 730, "366-730")
        .otherwise("730+")
    )
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(bucket.alias("age_bucket"), "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("decimal(38,0)")).cast("double")
                / 100.0
            ).alias("backlog_value"),
        )
    )


@register(
    "supplier_scorecard",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returned,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000.0, 0)
                         AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier fulfillment scorecard: per supplier, line volume, on-time
    share numerator (shipped within 30 days of order), return count, and
    exact revenue — the vendor-review rollup. Counts are integer CASE
    sums (exact), revenue is fixed-point; orders joins on the fact key,
    supplier/nation broadcast. One shuffle: the (suppkey, name, nation)
    hash aggregate; ratios are left to the consumer so every emitted
    value is exact (a ratio column would be two exact ints divided —
    derivable, and keeping it out avoids the float-division ulp
    cross-engine worry entirely)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    on_time = F.when(
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), 1
    ).otherwise(0)
    returned = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    rev_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0, 0
    ).cast("decimal(38,0)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(on_time).cast("bigint").alias("n_on_time"),
            F.sum(returned).cast("bigint").alias("n_returned"),
            (F.sum(rev_units).cast("double") / 10000.0).alias("revenue"),
        )
    )


@register(
    "events_twap",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events
    ),
    agg AS (
      SELECT user_id, count(*) AS n_events,
             CAST(SUM(CASE WHEN nxt IS NOT NULL THEN nxt - t ELSE 0 END)
                  AS BIGINT) AS active_us,
             SUM(CASE WHEN nxt IS NOT NULL
                      THEN CAST(round(value * 1000000.0, 0) AS HUGEINT)
                           * (nxt - t)
                      ELSE CAST(0 AS HUGEINT) END) AS wv
      FROM seq GROUP BY user_id
    )
    SELECT user_id, n_events, active_us,
           floor((CAST(wv AS DOUBLE) / 1000000.0 / CAST(active_us AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS twap
    FROM agg WHERE active_us > 0
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    holds until the user's next event, so the average weights each
    reading by its holding duration in MICROSECONDS — the step-function
    integral a last-observation-carried-forward sensor/price series
    needs, where a plain AVG over-counts bursts of readings. One lead()
    window + one hash agg = one shuffle on user_id. Products are
    (fixed-point value units) x (µs duration) in decimal(38,0) — a
    double accumulator would be partition-order-dependent and an int64
    overflows at day-long gaps — and the final division mirrors the
    oracle's IEEE operation order, with stable_round closing the
    half-point hazard. Users with a single event (no holding interval)
    are excluded, as is each user's last reading."""
    ev = load(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(t, F.col("event_id"))
    nxt = F.lead(t).over(w)
    dt = (nxt - t).cast("decimal(38,0)")
    units = F.round(F.col("value") * 1000000.0, 0).cast("decimal(38,0)")
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        F.when(nxt.isNotNull(), nxt - t).otherwise(F.lit(0)).alias("dt_us"),
        F.when(nxt.isNotNull(), units * dt)
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("wv"),
    )
    agg = seq.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("dt_us").cast("long").alias("active_us"),
        F.sum("wv").alias("wv"),
    )
    return agg.filter(F.col("active_us") > 0).select(
        "user_id",
        "n_events",
        "active_us",
        stable_round(
            F.col("wv").cast("double")
            / F.lit(1000000.0)
            / F.col("active_us").cast("double"),
            6,
        ).alias("twap"),
    )


@register(
    "events_ohlc",
    oracle="""
    WITH seq AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
               AS n_all
      FROM events
    )
    SELECT event_type, bucket,
           max(CASE WHEN rn = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn = n_all THEN value END) AS close,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 1000000.0, 0) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS volume
    FROM seq GROUP BY event_type, bucket
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the time-series resample every
    market-data / sensor pipeline runs: open = first value in the
    bucket, close = last (both tie-broken by event_id so the bars are
    partition- and rerun-deterministic), high/low = extrema, volume =
    fixed-point sum. ONE shuffle on (event_type, hour): both window
    functions (row_number ordered, count unordered) share the partition
    spec so they reuse one Exchange, and close is found as
    rn == count-over-partition rather than a second descending sort.
    The hash aggregate that follows is map-side combinable."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    # partition both windows AND the groupBy on the materialized bucket
    # attribute, so the aggregate's requirement is satisfied by the
    # window's Exchange — one shuffle total, not two
    seq = ev.select(
        "event_type",
        "bucket",
        "value",
        F.row_number()
        .over(
            Window.partitionBy("event_type", "bucket").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type", "bucket"))
        .alias("n_all"),
    )
    return seq.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("n_all"), F.col("value"))).alias(
            "close"
        ),
        F.count("*").alias("n_events"),
        fixed_point_sum(F.col("value"), 6).alias("volume"),
    )


@register(
    "events_resample",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    last_per_hour AS (SELECT user_id, h, value FROM hourly WHERE rn = 1),
    bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1
      FROM last_per_hour GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    joined AS (
      SELECT g.user_id, g.h, l.value,
             l.value IS NOT NULL AS is_observed
      FROM grid g LEFT JOIN last_per_hour l
        ON g.user_id = l.user_id AND g.h = l.h
    )
    SELECT user_id, h AS hour,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING
           ) AS value,
           is_observed
    FROM joined
    """,
)
def events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample an irregular per-user series onto a regular hourly grid
    with last-observation-carried-forward fill — the step every
    downstream model/join needs before aligning sensors sampled at
    different rates. Three shuffles, each on user-ish keys: (1) last
    reading per (user, hour) via one descending row_number (tie-broken
    by event_id — deterministic under partitioning); (2) per-user grid
    bounds, then the grid itself GENERATED DISTRIBUTEDLY with
    sequence()+explode — one row per user expands to its hours on the
    executors, no driver-side calendar; (3) a left join back onto
    observations plus one ordered window whose last(ignorenulls) fills
    gaps forward. Unobserved grid hours are flagged, not silently
    fabricated. At 100 TB the grid never materializes on any single
    node: it is partitioned by user before the fill window."""
    ev = load(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    hourly = ev.select(
        "user_id",
        h.alias("h"),
        "value",
        F.row_number()
        .over(
            Window.partitionBy("user_id", h).orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        )
        .alias("rn"),
    )
    last_per_hour = hourly.filter(F.col("rn") == 1).drop("rn")
    bounds = last_per_hour.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = grid.join(last_per_hour, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        "value",
        F.col("value").isNotNull().alias("is_observed"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour"),
        F.last("value", ignorenulls=True).over(w).alias("value"),
        "is_observed",
    )


@register(
    "agg_weighted_percentiles",
    oracle="""
    WITH seq AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
             ) AS cum,
             SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) OVER (
               PARTITION BY l_returnflag
             ) AS tot
      FROM lineitem
    )
    SELECT l_returnflag,
           min(CASE WHEN 4 * cum >= tot THEN l_extendedprice END) AS p25,
           min(CASE WHEN 2 * cum >= tot THEN l_extendedprice END) AS p50,
           min(CASE WHEN 10 * cum >= 9 * tot THEN l_extendedprice END) AS p90,
           CAST(max(tot) AS DOUBLE) / 100.0 AS total_weight
    FROM seq GROUP BY l_returnflag
    """,
)
def agg_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (price percentiles weighted by quantity):
    the inventory/VWAP-style distribution question a plain
    percentile() answers wrongly when rows carry different weights.
    The cut point is the first value whose CUMULATIVE weight reaches
    p × total — computed with integer-only threshold tests
    (4·cum ≥ tot, 2·cum ≥ tot, 10·cum ≥ 9·tot over fixed-point weight
    units), so no floating multiply can disagree between engines, and
    a (price, orderkey, linenumber) total order pins accumulation
    deterministically. ONE shuffle: both window functions and the
    final hash aggregate share the l_returnflag partitioning (same
    exchange-reuse shape as events_ohlc). At 100 TB this is the exact
    form; the sketch family (sketch_quantiles) is the one-pass
    approximate alternative when a shuffle per grouping is too dear."""
    li = load(spark, sf_dir, "lineitem")
    units = F.round(F.col("l_quantity") * 100.0, 0).cast("long")
    win_ord = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_all = Window.partitionBy("l_returnflag")
    seq = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(units).over(win_ord).alias("cum"),
        F.sum(units).over(win_all).alias("tot"),
    )
    price = F.col("l_extendedprice")
    return seq.groupBy("l_returnflag").agg(
        F.min(F.when(4 * F.col("cum") >= F.col("tot"), price)).alias("p25"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), price)).alias("p50"),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("tot"), price)
        ).alias("p90"),
        (F.max("tot").cast("double") / 100.0).alias("total_weight"),
    )
