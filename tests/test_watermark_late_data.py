"""Event-time watermark semantics (T8 — late data) on a real stream.

Append-mode windowed aggregation: a window is emitted once the
watermark passes its end, and events arriving after that are DROPPED —
the Structured-Streaming contract the reference's strict-> transform
watermark approximates (SURVEY §2.9.8)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write(path, rows):
    path.write_text(
        "\n".join(json.dumps({"ts": ts, "v": v}) for ts, v in rows)
    )


def test_append_mode_drops_late_rows(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("v").alias("total"))
            .select(F.col("w.start").alias("h"), "total")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: events in hour 10 and hour 13 — watermark advances to
    # 12:50, so window [10:00, 11:00) closes and is appended
    _write(src / "b1.json", [("2020-02-01T10:05:00", 1), ("2020-02-01T10:10:00", 2),
                             ("2020-02-01T13:00:00", 5)])
    run_batch()
    sink = spark.read.schema("h timestamp, total long").parquet(str(tmp_path / "sink"))
    closed = {(str(r["h"]), r["total"]) for r in sink.collect()}
    assert ("2020-02-01 10:00:00", 3) in closed

    # batch 2: a LATE event for the already-closed 10:00 window + one
    # fresh event; the late row must be dropped, the closed window stays
    _write(src / "b2.json", [("2020-02-01T10:30:00", 100), ("2020-02-01T14:30:00", 7)])
    run_batch()
    sink2 = spark.read.schema("h timestamp, total long").parquet(str(tmp_path / "sink"))
    rows = {(str(r["h"]), r["total"]) for r in sink2.collect()}
    assert ("2020-02-01 10:00:00", 3) in rows          # unchanged
    assert ("2020-02-01 10:00:00", 103) not in rows    # late row dropped
    assert ("2020-02-01 10:00:00", 100) not in rows    # not re-opened
