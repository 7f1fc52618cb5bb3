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


def test_track_user_multi_chunk_out_of_order():
    """A group spanning several Arrow chunks delivered out of order must
    compute max_gap over the globally-sorted timestamps, not per-chunk
    (streaming/stateful.py — the round-2 chunk-ordering defect)."""
    import numpy as np
    import pandas as pd

    from iot_elt_airflow_mongo_timescaledb_spark.streaming.stateful import _track_user

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def chunk(ts_seconds):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime(np.array(ts_seconds, dtype="int64"), unit="s"),
                "value": np.ones(len(ts_seconds)),
            }
        )

    # true timeline: 0, 10, 20, …, 90 plus one 1000s outlier gap to 1090;
    # delivered as three interleaved, unsorted chunks
    ts = list(range(0, 100, 10)) + [1090]
    chunks = [chunk([ts[i] for i in (9, 1, 4)]),
              chunk([ts[i] for i in (10, 0, 7, 2)]),
              chunk([ts[i] for i in (5, 8, 3, 6)])]
    state = FakeState()
    [out] = list(_track_user((42,), iter(chunks), state))
    assert out["n_events"].iloc[0] == 11
    assert out["max_gap_s"].iloc[0] == 1000.0  # NOT a bogus inter-chunk gap

    # second micro-batch: carried last_ts (1090) → gap to 1100 is 10s,
    # so max_gap stays 1000
    state2_out = list(_track_user((42,), iter([chunk([1100, 1095])]), state))
    assert state2_out[0]["max_gap_s"].iloc[0] == 1000.0
    assert state2_out[0]["n_events"].iloc[0] == 13


def test_stream_join_drains_to_file_sink_and_matches_batch(spark, sf_dir, tmp_path):
    """The stream-stream join's append output is unbounded, so it must
    drain through the parquet file sink — never the memory sink, which
    would collect the full join result into driver memory (the round-3
    scale-killer).  Asserted structurally: the returned DataFrame is a
    file scan over the sink directory and no memory-sink temp view is
    registered; then value-checked against the batch interval join."""
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
        view_purchase_join_stream,
    )

    sink = str(tmp_path / "join_sink")
    streamed = view_purchase_join_stream(spark, sf_dir, sink_dir=sink)

    files = streamed.inputFiles()
    assert files and all(sink in f for f in files)  # file-based, our dir
    assert not [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("view_purchase_join")
    ]  # no memory sink

    events = table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("user_id", "purchase_ts", "view_ts", "purchase_value", "view_value")
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_stream_join_sink_at_scheme_qualified_uri(spark, sf_dir, tmp_path):
    """r5 (VERDICT task 7): an explicit DURABLE sink may be a scheme-
    qualified URI (file:/ standing in for hdfs://s3a: shared storage) —
    the file sink, its checkpoint, and the distributed read-back must
    all resolve through the Hadoop FileSystem, and the result must
    still equal the batch interval join."""
    import os

    from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
        view_purchase_join_stream,
    )

    sink_uri = f"file:{tmp_path}/join_sink_uri"
    streamed = view_purchase_join_stream(spark, sf_dir, sink_dir=sink_uri)
    # physically durable at the URI's local path: data + checkpoint
    local = str(tmp_path / "join_sink_uri")
    assert os.path.isdir(os.path.join(local, "data"))
    assert os.path.isdir(os.path.join(local, "_checkpoint"))

    events = table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("user_id", "purchase_ts", "view_ts", "purchase_value", "view_value")
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in batch.collect()
    }
