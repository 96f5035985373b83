"""Smoke tests for the driver contract surface itself."""

from __future__ import annotations

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_contract_shape(spark):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) > 0
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_registered_query_is_documented():
    """The registry is the public surface: every QuerySpec must carry a
    docstring (semantics + scale rationale) — the contract SURVEY.md §2
    points at. An empty doc means an operator shipped without its design
    note."""
    from dicebox_sensorybatchprocessor_spark import all_queries

    undocumented = [n for n, s in all_queries().items() if len((s.doc or "").strip()) < 40]
    assert not undocumented, undocumented


def test_oracle_coverage_is_total():
    """Round-3 invariant: the rows-only list stays empty — every query
    carries an oracle (exact SQL or boolean-claim form). A regression
    here silently weakens the driver's correctness gate."""
    from dicebox_sensorybatchprocessor_spark import all_queries

    missing = [n for n, s in all_queries().items() if s.oracle is None]
    assert not missing, missing
