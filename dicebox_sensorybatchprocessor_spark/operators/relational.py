"""§2.2 projection / filter / predicates + §2.6 sort / limit / distinct.

All pure Catalyst built-ins: predicates push down to the parquet scan,
projections prune columns at the reader, and ORDER BY + LIMIT plans as
``TakeOrderedAndProject`` (top-k without a full sort) — verified via
``.explain``; see tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import fixed_point_sum, ts_ntz


@register(
    "project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select / rename / computed projection. Per-row double arithmetic is
    order-independent, so disc_price is bit-identical to the oracle."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@register(
    "filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 45 AND l_discount <= 0.05) OR NOT (l_returnflag <> 'R')
    """,
)
def filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates with AND/OR/NOT composition."""
    li = load(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 45) & (F.col("l_discount") <= 0.05)) | ~(
        F.col("l_returnflag") != "R"
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate — compiles to an In expression the parquet scan
    receives as PushedFilters (plan-asserted in tests/test_plans.py), so
    row groups without matching dictionary entries are skipped."""
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@register(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-03-31 23:59:59'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on a timestamp column (pushed to parquet row groups)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(ts_ntz("1997-01-01 00:00:00"), ts_ntz("1997-03-31 23:59:59"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type FROM part
    WHERE p_name LIKE '%gold%' OR (p_brand LIKE 'Brand#1%' AND regexp_matches(p_type, '^(ECONOMY|PROMO)$'))
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regexp predicates — the LIKE prefix/suffix forms push down
    as StringContains/StartsWith; the regexp stays a codegen'd residual
    filter (regexps are not pushable), evaluated JVM-side."""
    p = load(spark, sf_dir, "part")
    pred = F.col("p_name").like("%gold%") | (
        F.col("p_brand").like("Brand#1%") & F.col("p_type").rlike("^(ECONOMY|PROMO)$")
    )
    return p.filter(pred).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "filter_null",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null, o_orderstatus
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NULL
       OR (nullif(o_orderstatus, 'P') = 'O' AND o_totalprice > 250000)
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics / three-valued logic: the fixture has no stored nulls
    (FIXTURES.md), so nulls are manufactured with nullif."""
    o = load(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.withColumn("status_or_null", status_or_null)
        .filter(
            F.col("status_or_null").isNull()
            | ((F.col("status_or_null") == "O") & (F.col("o_totalprice") > 250000))
        )
        .select("o_orderkey", "status_or_null", "o_orderstatus")
    )


@register(
    "cond_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_label
    FROM orders
    """,
)
def cond_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif conditional projection."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("finished")).alias(
            "status_label"
        ),
    )


@register(
    "cast_try",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           TRY_CAST(event_type AS DOUBLE) AS bad_cast,
           CAST(floor(value) AS BIGINT) AS value_int
    FROM events
    """,
)
def cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts including failure-safe try_cast (ANSI mode stays on).

    value_int goes through an explicit floor: Spark's double→bigint cast
    truncates while DuckDB's rounds, so a bare cast would diverge on the
    two engines. floor() is exact on both.
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.col("event_type").try_cast("double").alias("bad_cast"),
        F.floor(F.col("value")).cast("bigint").alias("value_int"),
    )


@register(
    "sort_multi",
    oracle="""
    SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_returnflag ASC, l_quantity DESC NULLS LAST, l_orderkey ASC,
             l_linenumber ASC, l_extendedprice ASC
    LIMIT 500
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (asc/desc, nulls-last). lineitem has no unique key
    (verified: (l_orderkey, l_linenumber) repeats), so the sort covers every
    output column — tied rows are then identical and the LIMIT cut is
    value-deterministic."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_quantity").desc_nulls_last(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("l_extendedprice").asc(),
        )
        .limit(500)
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    aliases=("topk_orders",),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k — plans as TakeOrderedAndProject (per-partition
    heap + driver merge), not a full sort; o_orderkey breaks the one known
    o_totalprice tie deterministically."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row deduplication (hash-aggregate under the hood)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@register(
    "project_unpivot",
    oracle="""
    SELECT measure, count(*) AS n,
           CAST(SUM(CAST(round(val * 100.0, 0) AS HUGEINT)) AS DOUBLE) / 100.0 AS total
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'price', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
    ) GROUP BY measure
    """,
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (DataFrame.unpivot, Spark 3.4+): three measure
    columns become (measure, val) rows in a single scan — no UNION ALL
    re-reads — then a compact per-measure rollup. At 100 TB the single
    scan matters: the UNION ALL formulation reads the table three times."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn(
        "measure",
        F.element_at(
            F.create_map(
                F.lit("l_quantity"), F.lit("quantity"),
                F.lit("l_extendedprice"), F.lit("price"),
                F.lit("l_discount"), F.lit("discount"),
            ),
            F.col("measure"),
        ),
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("val"), 2).alias("total"),
    )
