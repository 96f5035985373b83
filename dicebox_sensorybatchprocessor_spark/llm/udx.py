"""§2.9 UDx surface (SURVEY.md): the four Python-extension patterns, all
Arrow-vectorized (pandas UDFs / applyInPandas / mapInPandas) — never
row-at-a-time Python. These exist to prove the extension seams; every
operator that CAN be a built-in expression elsewhere in this engine is
one (UDFs are the slow path, SURVEY.md §4)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register


@register(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy arithmetic).
    Per-row double arithmetic is order-free, so the result is bit-identical
    to the oracle's expression."""

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(round(l_discount * l_quantity * 10000.0, 0) AS HUGEINT)) AS DOUBLE)
            / 10000.0)
           / (CAST(SUM(CAST(round(l_quantity * 100.0, 0) AS HUGEINT)) AS DOUBLE) / 100.0)
             AS weighted_avg_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted average discount.
    The UDF accumulates in integer fixed-point (exact under any order),
    mirrored by the oracle SQL — same discipline as utils.fixed_point_sum."""

    @pandas_udf("double")
    def weighted_avg(disc: pd.Series, qty: pd.Series) -> float:
        num = int((disc * qty * 10000.0).round().astype("int64").sum())
        den = int((qty * 100.0).round().astype("int64").sum())
        return (num / 10000.0) / (den / 100.0)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_discount", "l_quantity").alias("weighted_avg_discount")
    )


@register(
    "udtf_grouped_map",
    oracle="""
    WITH norms AS (
      SELECT vec_id, label,
             sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')) AS nrm
      FROM embeddings
    )
    SELECT vec_id, label,
           round(nrm, 6) AS l2_norm,
           round((nrm - avg(nrm) OVER (PARTITION BY label))
                 / stddev_samp(nrm) OVER (PARTITION BY label), 4) AS norm_zscore
    FROM norms
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-group DataFrame→DataFrame): z-score of
    each embedding's L2 norm within its label class — the normalize-
    per-group pattern of ML feature pipelines. One shuffle on the group
    key; each group processed as a single Arrow batch."""
    import numpy as np

    def zscore(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(g["embedding"].to_numpy()).astype("float64")
        nrm = np.sqrt((mat * mat).sum(axis=1))
        mu = nrm.mean()
        sd = nrm.std(ddof=1)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"],
                "label": g["label"],
                "l2_norm": np.round(nrm, 6),
                # z-scores round at 4: numpy's two-pass std and DuckDB's
                # single-pass welford agree only to ~1e-8 here, and the
                # rounding step must dominate that gap.
                "norm_zscore": np.round((nrm - mu) / sd, 4),
            }
        )

    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        zscore, "vec_id long, label int, l2_norm double, norm_zscore double"
    )


@register(
    "udtf_map",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT)
             AS max_token_len,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def udtf_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise mapInPandas table function (iterator of Arrow batches
    in/out) — the shape for custom scans/transforms that need Python
    libraries; here a tokenizer stand-in."""

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            toks = batch["text"].str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": toks.str.len().astype("int64"),
                    "max_token_len": toks.map(lambda ts: max(len(t) for t in ts)).astype("int64"),
                    "n_bytes": batch["text"].str.len().astype("int64"),
                }
            )

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        tokenize, "doc_id long, n_tokens long, max_token_len long, n_bytes long"
    )
