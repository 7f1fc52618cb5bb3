"""Streaming dedup state must EVICT — the round-2 unbounded-state defect.

``dropDuplicatesWithinWatermark`` expires a key once the watermark
passes its event time + delay; plain ``dropDuplicates`` (without the
event-time column in the key set) never evicts and OOMs a long-running
stream.  This drives three micro-batches whose event times advance well
past the delay and asserts the state store actually removed rows.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
    EVENTS_SCHEMA,
)

_HOUR_NS = 3_600 * 10**9
_T0 = 1_577_836_800 * 10**9  # 2020-01-01T00:00:00Z in nanos


def _write_batch(spark, src, batch_idx, event_ids):
    rows = [
        (
            int(eid),
            _T0 + batch_idx * 3 * _HOUR_NS + i * 10**9,
            1,
            "view",
            1.0,
            "{}",
        )
        for i, eid in enumerate(event_ids)
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(0.05)  # distinct mtimes keep the file-source batch order


def test_dedup_state_evicts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events_src")
    # batch 0 carries an in-batch duplicate (71 twice); batches are 3 h
    # apart with a 1 h delay, so batch-0 keys expire once later batches
    # advance the watermark
    _write_batch(spark, src, 0, [70, 71, 71, 72])
    _write_batch(spark, src, 1, [80, 81])
    _write_batch(spark, src, 2, [90, 91])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_unique"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dedup_evict_probe")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p is not None]
    finally:
        q.stop()

    assert len(progresses) >= 3  # one per file → watermark really advanced
    dedup_ops = [
        op
        for p in progresses
        for op in p["stateOperators"]
        if "dedupe" in op["operatorName"].lower()
    ]
    assert dedup_ops, [p["stateOperators"] for p in progresses]
    # the unbounded-state bug: numRowsRemoved stays 0 forever
    assert sum(op["numRowsRemoved"] for op in dedup_ops) > 0
    # in-batch duplicate (71) was dropped: 7 unique views, not 8
    out = spark.table("dedup_evict_probe")
    assert [r["n_unique"] for r in out.collect()] == [7]
