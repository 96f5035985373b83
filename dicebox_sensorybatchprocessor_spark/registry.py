"""Query registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a ``QuerySpec``:
a (spark, sf_dir) -> DataFrame callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin projections of this dict, so an operator cannot
ship without its oracle pairing being a conscious choice.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from functools import wraps

from pyspark.sql import DataFrame, SparkSession

from dicebox_sensorybatchprocessor_spark.session import ensure_engine_conf

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver's weaker rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, *, aliases: tuple[str, ...] = ()):
    """Decorator: register ``fn`` under ``name`` (and ``aliases``).

    The wrapped callable applies the engine runtime conf first, so queries
    behave identically on a driver-owned SparkSession.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        for key in (name, *aliases):
            if key in QUERIES:
                raise ValueError(f"duplicate query registration: {key}")
            QUERIES[key] = QuerySpec(key, wrapped, oracle, doc=(fn.__doc__ or ""))
        return wrapped

    return deco
