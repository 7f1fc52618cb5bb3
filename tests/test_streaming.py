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
