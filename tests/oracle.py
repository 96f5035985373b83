"""Local differential-test harness mirroring the driver's oracle gate
(SURVEY.md §5.2): run the Spark query and the DuckDB oracle SQL on the
same parquet, compare row count, schema shape, and values order-
insensitively. Stricter than tolerant — exact equality after canonical
rounding — so a pass here predicts a driver hash-match."""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

from dicebox_sensorybatchprocessor_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, (np.floating, float)):
        if isinstance(v, float) and math.isnan(v) or isinstance(v, np.floating) and np.isnan(v):
            return ("nan",)
        return ("f", float(v))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_canon_cell(x) for x in v))
    if v is pd.NaT:
        return ("null",)
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        # Spark DATE arrives as datetime.date, DuckDB DATE as midnight
        # datetime64 — normalize both to a midnight timestamp string.
        return ("t", f"{v.isoformat()}T00:00:00")
    return ("s", str(v))


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=repr)
    return rows


def assert_query_matches(spark_df, oracle: str, sf_dir: str) -> None:
    sp = spark_df.toPandas()
    du = run_oracle(oracle, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duckdb={len(du)}"
    sp_rows = _canon_rows(sp)
    du_rows = _canon_rows(du)
    bad = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(sp_rows, du_rows))
        if a != b
    ]
    assert not bad, f"{len(bad)} mismatched rows; first: {bad[0]}"
