"""Data-quality operators — the validation gates a production lake runs
before promoting a batch (the reference's R2 validate stage generalized
to table level, Deequ-style):

- ``dq_profile``: per-column completeness / cardinality / range profile
  of the events table, computed in ONE pass (every metric is an
  aggregate over the same scan — no per-column jobs). At 100 TB this is
  the single-scan profiling job whose output feeds anomaly detection;
  the per-column metrics are plain aggregates, so partial aggregation
  and AQE apply as for any rollup.
- ``dq_constraints``: referential-integrity and domain checks as
  anti-join counts (orphaned FKs) and predicate-violation counts, one
  row per constraint with the violating-row count and a pass flag —
  exactly the shape a CI gate consumes. Anti joins broadcast the PK
  side's keys; no constraint requires more than one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import stable_round_sql


@register(
    "dq_profile",
    oracle="""
    SELECT 'events' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(event_id) AS BIGINT) AS event_id_nonnull,
           CAST(count(DISTINCT event_id) AS BIGINT) AS event_id_distinct,
           CAST(count(DISTINCT user_id) AS BIGINT) AS user_id_distinct,
           CAST(count(DISTINCT event_type) AS BIGINT) AS event_type_distinct,
           min(value) AS value_min,
           max(value) AS value_max,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS value_negative,
           min(ts) AS ts_min,
           max(ts) AS ts_max
    FROM events
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile: completeness (non-null counts), key
    uniqueness (distinct vs row count), categorical cardinality, numeric
    range + sign violations, event-time span. One scan, one aggregate —
    the profile a 100 TB lake computes per batch promotion, not one job
    per column. Thin wrapper over api.profile (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.profile(
        load(spark, sf_dir, "events"),
        table_name="events",
        key_cols=("event_id",),
        categorical_cols=("user_id", "event_type"),
        numeric_cols=("value",),
        ts_cols=("ts",),
    )


@register(
    "dq_constraints",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_custkey_fk' AS constraint_name,
             CAST((SELECT count(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
               AS n_violations
      UNION ALL
      SELECT 'lineitem_orderkey_fk',
             CAST((SELECT count(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      UNION ALL
      SELECT 'lineitem_discount_domain',
             CAST((SELECT count(*) FROM lineitem
                   WHERE l_discount < 0.0 OR l_discount > 0.5) AS BIGINT)
      UNION ALL
      SELECT 'orders_status_domain',
             CAST((SELECT count(*) FROM orders
                   WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
      UNION ALL
      SELECT 'events_props_json',
             CAST((SELECT count(*) FROM events
                   WHERE json_extract(props, '$.k') IS NULL) AS BIGINT)
    )
    ORDER BY constraint_name
    """,
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation as a one-row-per-check report: FK integrity
    via anti joins (the PK side reduces to a distinct-key broadcast),
    domain checks as predicate counts, JSON extractability as a parse
    probe. The report unions five scalar aggregates — each an
    independent branch Spark schedules concurrently — and a CI gate
    promotes the batch iff every n_violations is 0 (the pass flag is
    derivable, kept out of the output so the oracle stays pure SQL).
    Thin wrapper over api.fk_violations + api.check_constraints
    (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    return api.check_constraints(
        [
            (
                "orders_custkey_fk",
                api.fk_violations(orders, customer, "o_custkey", "c_custkey"),
            ),
            (
                "lineitem_orderkey_fk",
                api.fk_violations(lineitem, orders, "l_orderkey", "o_orderkey"),
            ),
            (
                "lineitem_discount_domain",
                lineitem.filter(
                    (F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.5)
                ),
            ),
            (
                "orders_status_domain",
                orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")),
            ),
            (
                "events_props_json",
                events.filter(F.get_json_object("props", "$.k").isNull()),
            ),
        ]
    )


@register(
    "dq_drift",
    # rel_change mirrors api.profile_drift's stable_round bit-for-bit
    # (ADVICE r7: plain round() diverges from Spark's floor form when
    # x*1e6 lands on a binary half-point, esp. for negative changes)
    oracle=f"""
    WITH a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_rows,
             CAST(count(DISTINCT user_id) AS DOUBLE) AS user_id_distinct,
             CAST(count(DISTINCT event_type) AS DOUBLE) AS event_type_distinct,
             CAST(min(value) AS DOUBLE) AS value_min,
             CAST(max(value) AS DOUBLE) AS value_max,
             CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS DOUBLE) AS value_negative
      FROM events WHERE event_id % 2 = 0
    ),
    b AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_rows,
             CAST(count(DISTINCT user_id) AS DOUBLE) AS user_id_distinct,
             CAST(count(DISTINCT event_type) AS DOUBLE) AS event_type_distinct,
             CAST(min(value) AS DOUBLE) AS value_min,
             CAST(max(value) AS DOUBLE) AS value_max,
             CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS DOUBLE) AS value_negative
      FROM events WHERE event_id % 2 = 1
    ),
    m AS (
      SELECT 'n_rows' AS metric, a.n_rows AS value_a, b.n_rows AS value_b FROM a, b
      UNION ALL SELECT 'user_id_distinct', a.user_id_distinct, b.user_id_distinct FROM a, b
      UNION ALL SELECT 'event_type_distinct', a.event_type_distinct, b.event_type_distinct FROM a, b
      UNION ALL SELECT 'value_min', a.value_min, b.value_min FROM a, b
      UNION ALL SELECT 'value_max', a.value_max, b.value_max FROM a, b
      UNION ALL SELECT 'value_negative', a.value_negative, b.value_negative FROM a, b
    )
    SELECT metric, value_a, value_b,
           {stable_round_sql("(value_b - value_a) / nullif(abs(value_a), 0.0)")} AS rel_change,
           abs(value_b - value_a) <= 0.2 * abs(value_a) AS within_tolerance
    FROM m
    """,
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-over-batch profile drift: two deterministic ingest batches
    (even/odd event_id — the fixture stand-in for consecutive
    promotions) are profiled with the SAME single-pass api.profile and
    compared metric-by-metric; a metric whose relative change exceeds
    20% fails the within_tolerance gate. This is the check that catches
    a halved row count or an exploding categorical cardinality BEFORE
    promotion. Thin wrapper over api.profile + api.profile_drift
    (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    ev = load(spark, sf_dir, "events")
    prof = lambda batch: api.profile(  # noqa: E731 — two batches, one recipe
        batch,
        categorical_cols=("user_id", "event_type"),
        numeric_cols=("value",),
    )
    return api.profile_drift(
        prof(ev.filter(F.col("event_id") % 2 == 0)),
        prof(ev.filter(F.col("event_id") % 2 == 1)),
        metrics=(
            "n_rows",
            "user_id_distinct",
            "event_type_distinct",
            "value_min",
            "value_max",
            "value_negative",
        ),
        tolerance=0.2,
    )
