"""Fixture table loaders (SURVEY.md §2.1 scan_parquet / scan_parquet_ns).

One shared loader for all operators so the ``events`` nanosecond-timestamp
repair (FIXTURES.md "events") is applied exactly once, in one place:

* parquet stores ``events.ts`` as timestamp[ns]; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as a LONG of
  nanoseconds since epoch.
* ``timestamp_micros(ts div 1000)`` rebuilds a microsecond TIMESTAMP_NTZ.
  Integer ``div`` (JVM-side long division) is exact; a double-precision
  ``/`` would lose up to ~128 ns on epoch-scale nanos. DuckDB also floors
  ns → µs, so both sides agree to the microsecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; repairs ``events.ts`` to TIMESTAMP_NTZ(µs).

    Memoized per (session, path): ``spark.read.parquet`` builds a fresh
    file index + footer schema read each call (~70 ms); the returned
    DataFrame is an immutable plan, so reuse is free and data is still
    re-scanned at execution."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _LOAD_CACHE:
        ensure_engine_conf(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _repair_events(df)
        _LOAD_CACHE[key] = df
    return _LOAD_CACHE[key]


def _repair_events(df: DataFrame) -> DataFrame:
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for ``spark.sql`` callers."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
