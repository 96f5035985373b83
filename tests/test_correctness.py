"""Differential tests mirroring the driver's t2 oracle gate: every
registered query with an oracle must match DuckDB exactly at sf0.01;
oracle-less (rows-only) queries must at least run and return a stable
schema."""

from __future__ import annotations

import pytest

from dicebox_sensorybatchprocessor_spark import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle import assert_query_matches

_SPECS = all_queries()
_WITH_ORACLE = sorted(name for name, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(name for name, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert_query_matches(df, spec.oracle, SF_ORACLE)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert len(df.columns) > 0
    assert df.count() >= 0
