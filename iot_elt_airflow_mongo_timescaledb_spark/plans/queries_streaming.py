"""Streaming queries exposed through the driver contract.

The streaming result is deterministic (drained to completion), so it
gets a full SQL oracle: the windowed rollup must equal the equivalent
batch aggregation."""

from __future__ import annotations

from ..streaming.micro_batch import hourly_rollup_stream
from .registry import query


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rollup(spark, sf_dir):
    """T1/T7 — Structured Streaming tumbling-window rollup, drained with
    processAllAvailable (the micro-batch sync as a real stream)."""
    return hourly_rollup_stream(spark, sf_dir)
