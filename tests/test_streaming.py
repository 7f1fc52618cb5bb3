"""Streaming ≡ batch equivalence (SURVEY T1/T7).

The drained Structured-Streaming rollup must equal the same aggregation
run as a batch plan — the defining property of the micro-batch sync.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table
from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
    hourly_rollup_stream,
)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir):
    streamed = hourly_rollup_stream(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
