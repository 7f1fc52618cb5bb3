"""The driver's events.parquet has shipped with two physical types for
``ts`` — int64 TIMESTAMP(NANOS) (rounds 1-3) and plain TIMESTAMP(MICROS)
(round 4).  Both the batch reader (plans.registry.table) and the
streaming reader (streaming.micro_batch.events_stream) must normalize
either to the same UTC microsecond timestamp."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table
from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
    events_stream,
)

TS = datetime.datetime(2024, 5, 1, 12, 30, 0)
ROW = dict(event_id=1, user_id=7, event_type="view", value=1.5, props="{}")


def _single_file_fixture(df, out: str) -> str:
    """The driver ships events.parquet as a single FILE; Spark writes a
    directory — promote the part file so the streaming glob filter
    (``pathGlobFilter=events.parquet``) matches like it does in
    production testdata."""
    import glob
    import shutil

    stage = os.path.join(out, "__stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(out, "events.parquet"))
    shutil.rmtree(stage)
    return out


@pytest.fixture(scope="module")
def nanos_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_nanos"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    nanos = int(TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e9)
    return _single_file_fixture(
        spark.createDataFrame([{**ROW, "ts": nanos}], schema), out
    )


@pytest.fixture(scope="module")
def micros_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_micros"))
    df = spark.createDataFrame([{**ROW, "ts": TS}]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    return _single_file_fixture(df, out)


@pytest.mark.parametrize("fixture", ["nanos_dir", "micros_dir"])
def test_batch_table_normalizes(spark, fixture, request):
    sf_dir = request.getfixturevalue(fixture)
    df = table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.collect()[0]["ts"] == TS


@pytest.mark.parametrize("fixture", ["nanos_dir", "micros_dir"])
def test_stream_reader_normalizes(spark, fixture, request):
    """Drains the stream and checks the VALUE — a wrong ns→µs divisor or
    a wrong format branch must fail here, not only distort aggregates."""
    import uuid

    sf_dir = request.getfixturevalue(fixture)
    stream = events_stream(spark, sf_dir)
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    sink = f"fmt_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(
        sink
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(sink).collect()
    assert len(rows) == 1
    assert rows[0]["ts"] == TS
    assert rows[0]["event_id"] == ROW["event_id"]


def test_timeseries_queries_survive_nanos_events(spark, tmp_path):
    """End-to-end ns-flip drill for the hypertable family: DuckDB writes
    a genuine TIMESTAMP_NS events.parquet (the rounds-1-3 physical
    type, which Spark itself cannot write), and the order-sensitive
    timeseries queries must match their DuckDB oracles on it — pinning
    both the reader normalization and the epoch_us() oracle hardening."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import (
        spark_queries,
        oracle_queries,
    )
    from tools.parity import compare_query

    out = str(tmp_path / "events.parquet")
    base_ns = 1704067200_000_000_000  # 2024-01-01T00:00:00Z in ns
    n = 400
    etypes = ["click", "view", "purchase", "signup", "error"]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            # 17-minute grid plus an i*13 NANOSECOND offset: sub-microsecond
            # detail the reader must truncate and the oracle must ignore
            "ts": pa.array(
                [base_ns + i * 17 * 60 * 1_000_000_000 + i * 13 for i in range(n)],
                type=pa.timestamp("ns"),
            ),
            "user_id": pa.array([i % 7 for i in range(n)], type=pa.int64()),
            "event_type": pa.array([etypes[i % 5] for i in range(n)]),
            "value": pa.array([round(0.5 + (i * 37 % 1000) / 7.0, 3) for i in range(n)]),
            "props": pa.array(['{"k": %d}' % (i % 100) for i in range(n)]),
        }
    )
    pq.write_table(tbl, out, version="2.6")  # 2.6 keeps TIMESTAMP(NANOS)
    con = duckdb.connect()
    # confirm the fixture really is nanosecond-typed
    (ltype,) = con.execute(
        f"SELECT logical_type FROM parquet_schema('{out}') WHERE name = 'ts'"
    ).fetchone()
    assert "Nano" in str(ltype), ltype
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{out}')")

    qs, os_ = spark_queries(), oracle_queries()
    for name in ("first_last_daily", "counter_rate_stats", "ohlc_bars",
                 "threshold_alerts", "counter_total_increase"):
        problems = compare_query(spark, con, qs[name], os_[name], str(tmp_path))
        assert not problems, f"{name}: " + " | ".join(problems)
