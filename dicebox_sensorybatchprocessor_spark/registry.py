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
    # True for deliberately-quadratic exact twins kept to audit an
    # approximate/banded production path (e.g. dedup_ngram_jaccard audits
    # dedup_near_verified). Audit-only ops are correct and oracle-checked
    # but must NOT be called as the production path at scale; the registry
    # surfaces the flag so callers/tools can route to the scale path.
    audit_only: bool = False


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    aliases: tuple[str, ...] = (),
    cache_plan: bool = True,
    audit_only: bool = False,
):
    """Decorator: register ``fn`` under ``name`` (and ``aliases``).

    The wrapped callable applies the engine runtime conf first, so queries
    behave identically on a driver-owned SparkSession.

    ``cache_plan=True`` (default) memoizes the *DataFrame* per
    (session, sf_dir) — the prepared-statement pattern. DataFrames are
    immutable plans, so reuse is safe for any purely declarative query and
    skips re-paying py4j plan construction, analysis, and whole-stage
    codegen compilation on every invocation (measured ~1.2 s of the 1.4 s
    warm wall-clock of TPC-H Q1 at sf0.1; data is still re-scanned on each
    collect). Operators with driver-side side effects (file sinks, staged
    streaming replays) must pass ``cache_plan=False``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        plans: dict[tuple[str, str], DataFrame] = {}

        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            if not cache_plan:
                return fn(spark, sf_dir)
            key = (spark.sparkContext.applicationId, sf_dir)
            if key not in plans:
                plans[key] = fn(spark, sf_dir)
            return plans[key]

        for key in (name, *aliases):
            if key in QUERIES:
                raise ValueError(f"duplicate query registration: {key}")
            QUERIES[key] = QuerySpec(
                key, wrapped, oracle, doc=(fn.__doc__ or ""), audit_only=audit_only
            )
        return wrapped

    return deco
