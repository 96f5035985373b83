"""§2.4 aggregation (SURVEY.md) — including the flagship TPC-H Q1 shape.

All aggregates are two-phase hash aggregates (partial map-side combine →
final after shuffle); at 100 TB the partials shrink shuffle traffic to
one row per (partition × group). Order-sensitive float sums use the
fixed-point pattern from utils.py so results hash-match DuckDB exactly
regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import fixed_point_sum, fixed_point_sum_sql, ts_ntz

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {fixed_point_sum_sql("l_quantity", 2)} AS sum_qty,
       {fixed_point_sum_sql("l_extendedprice", 2)} AS sum_base_price,
       {fixed_point_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       {fixed_point_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       {fixed_point_sum_sql("l_quantity", 2)} / count(*) AS avg_qty,
       {fixed_point_sum_sql("l_extendedprice", 2)} / count(*) AS avg_price,
       {fixed_point_sum_sql("l_discount", 2)} / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, aliases=("agg_hash",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship query (SURVEY.md §7).

    scan → pushed-down filter → project → 8-aggregate hash group-by.
    Sums/avgs are fixed-point-exact (utils.py) so every value is
    bit-identical to the oracle; avgs divide the exact sum by the exact
    count rather than re-accumulating.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= ts_ntz("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fixed_point_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            fixed_point_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            fixed_point_sum(disc_price, 4).alias("sum_disc_price"),
            fixed_point_sum(charge, 6).alias("sum_charge"),
            (fixed_point_sum(F.col("l_quantity"), 2) / cnt).alias("avg_qty"),
            (fixed_point_sum(F.col("l_extendedprice"), 2) / cnt).alias("avg_price"),
            (fixed_point_sum(F.col("l_discount"), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           {fixed_point_sum_sql("l_quantity", 2)} AS total_qty,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no group-by) aggregate — partial aggregation on every
    partition then a single-row final merge; the shuffle moves one row
    per partition regardless of input size."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        fixed_point_sum(F.col("l_quantity"), 2).alias("total_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_distinct",
    oracle=f"""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates (expand + two-phase agg)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           count(*) AS n_rows,
           TRUE AS approx_within_3rsd
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct. Sketch estimates are
    engine-specific, so the raw estimate can never hash-match an oracle —
    instead the *tolerance claim* is the checked output: Spark emits
    |estimate − exact| ≤ 3·rsd·exact per group (deterministic for a given
    dataset — HLL++ is not randomized), the oracle emits literal TRUE, and
    the driver's value-hash becomes a real accuracy check instead of a
    rows-only count. At 100 TB the sketch is the only affordable
    distinct-count; the exact variant is in agg_distinct."""
    rsd = 0.02
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.count("*").alias("n_rows"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd).cast("double")
                - F.countDistinct("user_id").cast("double")
            )
            <= 3 * rsd * F.countDistinct("user_id").cast("double")
        ).alias("approx_within_3rsd"),
    )


@register(
    "agg_filtered",
    oracle=f"""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           {fixed_point_sum_sql("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END", 2)}
             AS discounted_revenue,
           count(*) AS n_total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aggregate predicates (FILTER clause ≡ sum/count over CASE)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
        fixed_point_sum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0.0), 2
        ).alias("discounted_revenue"),
        F.count("*").alias("n_total"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (status → status×priority → grand total); NULL
    subtotal markers are coalesced to 'ALL' so the label is explicit. The
    fixture has no stored NULLs, so the sentinel is unambiguous."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_items,
           {fixed_point_sum_sql("l_quantity", 2)} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping-set combinations."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            fixed_point_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@register(
    "agg_collect",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / array_agg. The set is sorted then joined to a string so
    the comparison is representation-stable (array encodings differ between
    engines; element order inside collect_set is nondeterministic)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_seen"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_extendedprice), 0) AS var_price,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 0) AS covar_price_qty,
           round(median(l_extendedprice), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. These accumulate in floating point on both
    engines (no fixed-point shortcut exists for second moments) and the
    merge algorithms differ (~1e-10 relative), so values round on BOTH
    sides with a step that dominates that gap at each column's magnitude.
    Spark's exact percentile interpolates like DuckDB's quantile_cont."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(price), 2).alias("sd_price"),
        F.round(F.var_samp(price), 0).alias("var_price"),
        F.round(F.corr(price, F.col("l_quantity")), 6).alias("corr_price_qty"),
        F.round(F.covar_samp(price, F.col("l_quantity")), 0).alias("covar_price_qty"),
        F.round(F.median(price), 4).alias("median_price"),
        F.round(F.percentile(price, F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax (min_by/max_by): the customer's biggest/smallest order.

    Determinism: argmax ties are broken arbitrarily on both engines, so the
    ranking value must be duplicate-free per group — (o_custkey,
    o_totalprice) verified tie-free at oracle SF (o_orderdate is not).
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "events_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n_events,
           {fixed_point_sum_sql("value", 6)} AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window aggregate (the BASELINE.md events_tumbling
    headline); the streaming §2.8 stream_tumbling operator must produce
    exactly these rows (batch-equivalence)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        fixed_point_sum(F.col("value"), 6).alias("sum_value"),
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
    """
    + ",\n    ".join(
        f"coalesce(count(*) FILTER (WHERE event_type = '{t}'), 0) AS {t}" for t in _EVENT_TYPES
    )
    + """
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide: per-user event counts, one column per event type.
    The value list is pinned (no discovery pass) — required at scale and
    for a stable output schema."""
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", list(_EVENT_TYPES)).agg(F.count(F.lit(1)))
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in _EVENT_TYPES],
    )


@register(
    "agg_percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`, verified bit-identical linear interpolation) —
    the exact twin of sketch_quantiles' mergeable GK bound. Exact
    percentile is a full-sort-per-group aggregate: fine when group
    cardinality × group size fits a shuffle (this shape), while the
    sketch path is the streaming/mergeable route at 100 TB. Both belong
    in the surface because percentile SLAs are usually contractual
    (exact) at reporting grain and approximate upstream."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 6).alias(name)
            for q, name in ((0.25, "p25"), (0.50, "p50"), (0.95, "p95"), (0.99, "p99"))
        ]
    )
