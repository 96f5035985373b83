"""§2.6 set operations (SURVEY.md).

Bag semantics (ALL) and set semantics both map to single Catalyst
operators; UNION is a zero-shuffle concatenation of children, while the
set variants plan as hash aggregates / joins on the shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping lineitem slices (rows with l_quantity == 25 appear in
    both) so ALL vs DISTINCT variants are observably different."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    return li.filter(F.col("l_quantity") <= 25), li.filter(F.col("l_quantity") >= 25)


_HALF_LO = "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem WHERE l_quantity <= 25"
_HALF_HI = "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem WHERE l_quantity >= 25"


@register("union_all", oracle=f"{_HALF_LO} UNION ALL {_HALF_HI}")
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by column name (rows at the overlap boundary duplicate)."""
    lo, hi = _halves(spark, sf_dir)
    return lo.unionByName(hi)


@register("union_distinct", oracle=f"{_HALF_LO} UNION {_HALF_HI}")
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct hash aggregate."""
    lo, hi = _halves(spark, sf_dir)
    return lo.unionByName(hi).distinct()


_OPEN = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
_FINISHED = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"


@register("intersect", oracle=f"{_OPEN} INTERSECT {_FINISHED}")
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: customers having both open and finished orders."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin)


@register("intersect_all", oracle=f"{_OPEN} INTERSECT ALL {_FINISHED}")
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity = min of the two sides)."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersectAll(fin)


@register("except_distinct", oracle=f"{_OPEN} EXCEPT {_FINISHED}", aliases=("except",))
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers with open but no finished orders."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(fin)


@register("except_all", oracle=f"{_OPEN} EXCEPT ALL {_FINISHED}")
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity = max(0, left - right))."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.exceptAll(fin)
