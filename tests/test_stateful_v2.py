"""transformWithState twin of the stateful tracker.

The container has no google.protobuf runtime (see the module's
ENVIRONMENT GATE note), so the stream cannot execute here: the test
runs the operator if protobuf is importable (asserting batch
equivalence) and otherwise pins the documented failure mode so the
gate is verified, not assumed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table
from iot_elt_airflow_mongo_timescaledb_spark.streaming.stateful_v2 import (
    user_activity_stream_v2,
)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_matches_batch_aggregate_or_documented_gate(spark, sf_dir):
    if not _protobuf_available():
        with pytest.raises(Exception) as exc:
            user_activity_stream_v2(spark, sf_dir).collect()
        assert "protobuf" in str(exc.value) or "Stream" in type(exc.value).__name__
        pytest.skip("google.protobuf absent: transformWithState gated in this container")
    got = {
        (r["user_id"], r["n_events"], r["total_value"])
        for r in user_activity_stream_v2(spark, sf_dir).collect()
    }
    want = {
        (r["user_id"], r["n_events"], r["total_value"])
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want
