"""§2.1 addendum — stored nested/null parquet coverage (VERDICT r1 gap #4).

Round 1 exercised MapType/StructType/NULL semantics only on *constructed*
columns because the driver fixtures contain none (SURVEY.md §1.2 [V]).
This module closes the gap between "function works on an expression" and
"scan of stored nested data works": it derives a parquet from ``events``
with real MapType / StructType / NULL-bearing columns, then runs queries
against the **stored** file, so the parquet nested encode/decode path
(definition/repetition levels, nested column readers, nested-field
pruning) is on the verified path.

Derivation is deterministic per row, so the DuckDB oracle expresses the
same computation inline over ``events`` — the comparison checks the full
write→read round trip, not just the final expressions.

Scale: the derivation is a single narrow map stage (no shuffle) writing
once per (application, sf_dir); downstream queries are ordinary scans
with nested-field pruning (`ReadSchema` shows only the accessed
subfields). At 100 TB the derived dataset would be written partitioned
by the struct's bucket field and the queries below would prune on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import (
    fixed_point_sum,
    fixed_point_sum_sql,
    scratch_dir,
)

# One derived dir per (application, sf_dir): the write is deterministic,
# so every query (and repeated driver invocations) reuses the first copy.
_NESTED_CACHE: dict[tuple[str, str], str] = {}


def nested_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived parquet with stored map / struct / nullable columns.

    Columns:
      event_id     bigint
      attrs        map<string,string>   {'type','k','bucket'} per row
      meta         struct<etype string, bucket bigint, v double>
      v_null       double   NULL when event_id % 7 == 0
      etype_null   string   NULL when event_id % 11 == 0
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NESTED_CACHE:
        out = os.path.join(scratch_dir(prefix="sbp_nested_"), "events_nested")
        bucket = F.pmod(F.col("user_id"), F.lit(5))
        k_str = F.get_json_object("props", "$.k")
        derived = load(spark, sf_dir, "events").select(
            "event_id",
            F.create_map(
                F.lit("type"), F.col("event_type"),
                F.lit("k"), k_str,
                F.lit("bucket"), bucket.cast("string"),
            ).alias("attrs"),
            F.struct(
                F.col("event_type").alias("etype"),
                bucket.alias("bucket"),
                F.col("value").alias("v"),
            ).alias("meta"),
            F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v_null"),
            F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(F.col("event_type")).alias("etype_null"),
        )
        derived.write.mode("overwrite").parquet(out)
        _NESTED_CACHE[key] = out
    return spark.read.parquet(_NESTED_CACHE[key])


@register(
    "nested_struct_stored",
    oracle=f"""
    SELECT event_type AS etype,
           count(*) AS n,
           {fixed_point_sum_sql('value', 6)} AS sum_v
    FROM events
    WHERE user_id % 5 = 2
    GROUP BY event_type
    """,
)
def nested_struct_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored StructType scan: filter + group on nested fields.

    The filter and grouping key are struct subfields of the stored
    ``meta`` column, so the parquet reader must prune to
    ``meta.etype/bucket/v`` (nested-schema pruning,
    spark.sql.optimizer.nestedSchemaPruning.enabled is on by default) and
    the predicate pushes to the scan.
    """
    ne = nested_events(spark, sf_dir)
    return (
        ne.filter(F.col("meta.bucket") == 2)
        .groupBy(F.col("meta.etype").alias("etype"))
        .agg(F.count("*").alias("n"), fixed_point_sum(F.col("meta.v"), 6).alias("sum_v"))
    )


@register(
    "nested_map_stored",
    oracle="""
    SELECT event_type AS etype,
           CAST(user_id % 5 AS VARCHAR) AS bucket,
           count(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1, 2
    """,
)
def nested_map_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored MapType scan: element_at lookups drive the aggregation.

    Groups by two map-value lookups and sums a third parsed as bigint —
    all reading the stored ``attrs`` map (parquet key_value repeated
    group), which DuckDB recomputes inline from the source columns.
    """
    ne = nested_events(spark, sf_dir)
    return ne.groupBy(
        F.element_at("attrs", "type").alias("etype"),
        F.element_at("attrs", "bucket").alias("bucket"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.element_at("attrs", "k").try_cast("bigint")).alias("sum_k"),
    )


@register(
    "nested_null_stored",
    oracle=f"""
    SELECT event_type AS etype,
           count(*) AS n_rows,
           count(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END) AS n_v,
           count(CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END) AS n_et,
           {fixed_point_sum_sql('CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END', 6)} AS sum_v
    FROM events
    GROUP BY event_type
    """,
)
def nested_null_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored NULLs: count(*) vs count(col) vs null-skipping sum.

    ``v_null``/``etype_null`` carry real NULLs in the parquet definition
    levels (unlike the all-non-null driver fixtures), so this verifies
    null materialization from storage and SQL null-skipping aggregate
    semantics over it.
    """
    ne = nested_events(spark, sf_dir)
    return ne.groupBy(F.element_at("attrs", "type").alias("etype")).agg(
        F.count("*").alias("n_rows"),
        F.count("v_null").alias("n_v"),
        F.count("etype_null").alias("n_et"),
        fixed_point_sum(F.col("v_null"), 6).alias("sum_v"),
    )
