"""PySpark-native analytics engine with the query/data-processing surface
of ``shapeandshare/dicebox.sensorybatchprocessor`` (see SURVEY.md).

The reference (SURVEY.md §1.1) is a streaming-ingest → batch-persist ML
data preprocessor; this engine re-expresses that surface — plus the full
relational/window/streaming/LLM-pipeline operator inventory of SURVEY.md
§2 — as idiomatic Spark SQL / DataFrame plans.

Public API:
    get_session()      — SparkSession with the engine config profile (§4)
    load()/load_all()  — fixture loaders with the events ns-ts repair
    all_queries()      — {name: QuerySpec} for every registered operator
"""

from __future__ import annotations

from dicebox_sensorybatchprocessor_spark.io import TABLES, load, load_all
from dicebox_sensorybatchprocessor_spark.registry import QUERIES, QuerySpec
from dicebox_sensorybatchprocessor_spark.session import ensure_engine_conf, get_session

_OPERATOR_MODULES = (
    "dicebox_sensorybatchprocessor_spark.sources.scans",
    "dicebox_sensorybatchprocessor_spark.operators.relational",
    "dicebox_sensorybatchprocessor_spark.operators.joins",
    "dicebox_sensorybatchprocessor_spark.operators.aggregates",
    "dicebox_sensorybatchprocessor_spark.operators.windows",
    "dicebox_sensorybatchprocessor_spark.operators.setops",
    "dicebox_sensorybatchprocessor_spark.operators.scale",
    "dicebox_sensorybatchprocessor_spark.operators.sqlapi",
    "dicebox_sensorybatchprocessor_spark.functions.families",
    "dicebox_sensorybatchprocessor_spark.llm.udx",
    "dicebox_sensorybatchprocessor_spark.llm.dedup",
    "dicebox_sensorybatchprocessor_spark.llm.similarity",
    "dicebox_sensorybatchprocessor_spark.llm.text",
    "dicebox_sensorybatchprocessor_spark.llm.multimodal",
    "dicebox_sensorybatchprocessor_spark.llm.pipelines",
    "dicebox_sensorybatchprocessor_spark.streaming.streams",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry. Keys are the SURVEY.md §2 operator IDs."""
    import importlib

    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(QUERIES)


__all__ = [
    "TABLES",
    "QUERIES",
    "QuerySpec",
    "all_queries",
    "ensure_engine_conf",
    "get_session",
    "load",
    "load_all",
]
