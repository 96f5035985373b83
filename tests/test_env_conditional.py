"""Environment-conditional surface, reported loudly (VERDICT r10 #6).

`stream_stateful_tws` registers only where `google.protobuf` is
importable (transformWithStateInPandas runs a protobuf-based state
server between the JVM and the Python worker). Silent conditional
registration hid that gap from every test report; this module turns it
into an explicit SKIP with the probe a cluster user needs, and — where
protobuf IS present — into a real end-to-end check, so the TWS leg is
exercised automatically the moment the environment provides it.
"""

from __future__ import annotations

import pytest

from dicebox_sensorybatchprocessor_spark.streaming.streams import _tws_available

from tests.conftest import SF_ORACLE
from tests.oracle import assert_query_matches


def test_tws_registration_matches_environment():
    """The registry must agree with the probe in BOTH directions: absent
    protobuf => no stream_stateful_tws entry (the driver would record an
    err row for a query that cannot run); present => registered with its
    oracle (a probe regression would silently drop a working query)."""
    import dicebox_sensorybatchprocessor_spark as eng

    qs = eng.all_queries()
    if _tws_available():
        spec = qs.get("stream_stateful_tws")
        assert spec is not None and spec.oracle is not None
    else:
        assert "stream_stateful_tws" not in qs


@pytest.mark.skipif(
    not _tws_available(),
    reason=(
        "google.protobuf not importable in this environment — "
        "transformWithStateInPandas needs its protobuf state server, so "
        "stream_stateful_tws is unregistered here (the "
        "applyInPandasWithState twin stream_stateful covers the "
        "semantics). On a standard Spark 4 cluster image this test runs; "
        "probe: python -c 'import google.protobuf'"
    ),
)
def test_stream_stateful_tws_end_to_end(spark):
    """Where the environment provides protobuf, the TWS leg must run its
    two-micro-batch stateful aggregation and hash-match the batch
    oracle, exactly as the driver would check it."""
    import dicebox_sensorybatchprocessor_spark as eng

    spec = eng.all_queries()["stream_stateful_tws"]
    assert_query_matches(spec.fn(spark, SF_ORACLE), spec.oracle, SF_ORACLE)
