"""Streaming queries exposed through the driver contract.

The streaming result is deterministic (drained to completion), so it
gets a full SQL oracle: the windowed rollup must equal the equivalent
batch aggregation."""

from __future__ import annotations

from ..streaming.micro_batch import dedup_counts_stream, hourly_rollup_stream
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


@query(
    "streaming_dedup_counts",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY 1
    """,
)
def streaming_dedup_counts(spark, sf_dir):
    """T8 — stateful streaming dropDuplicates on the primary key, then a
    per-type count; equals the batch COUNT(DISTINCT pk)."""
    return dedup_counts_stream(spark, sf_dir)
