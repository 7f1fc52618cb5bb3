"""Streaming ELT sync tests — checkpointed incremental ingestion.

The file-stream checkpoint must give each source file exactly-once
processing across run_once() invocations (the Airflow-run-equivalent),
including when new files land between runs.
"""

from __future__ import annotations

import json

from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
    DocumentStreamSync,
)

DOCS_BATCH1 = [
    {"_id": "h1", "device_id": "d1", "created_at": 1580515200,
     "metrics": [{"ts": 1580515800, "bpm": 60, "confidence": 3}]},
    {"_id": "h2", "device_id": "d2", "created_at": 1580515200,
     "metrics": [{"ts": 1580516400, "bpm": 70, "confidence": 2}]},
]

DOCS_BATCH2 = [
    # h2 re-delivered (boundary re-read) + one genuinely new doc
    {"_id": "h2", "device_id": "d2", "created_at": 1580515200,
     "metrics": [{"ts": 1580516400, "bpm": 70, "confidence": 2}]},
    {"_id": "h3", "device_id": "d1", "created_at": 1580529600,
     "metrics": [{"ts": 1580530000, "bpm": 80, "confidence": 1},
                 {"ts": 1580530600, "bpm": 90, "confidence": 1}]},
]


def test_stream_sync_exactly_once_and_incremental(spark, tmp_path):
    src = tmp_path / "heart_rates"
    src.mkdir()
    (src / "batch1.json").write_text(json.dumps(DOCS_BATCH1))

    sync = DocumentStreamSync(
        spark, str(tmp_path / "wh"), "heart_rates", str(src)
    )
    sync.run_once()
    assert sync.wh.read("raw.heart_rates").count() == 2
    assert sync.wh.read("raw.heart_rates__metrics").count() == 2

    # second run with no new files: checkpoint makes it a no-op
    sync.run_once()
    assert sync.wh.read("raw.heart_rates").count() == 2

    # new file lands; only it is processed, re-delivered h2 upserts clean
    (src / "batch2.json").write_text(json.dumps(DOCS_BATCH2))
    sync.run_once()
    parents = sync.wh.read("raw.heart_rates")
    assert parents.count() == 3
    assert parents.select("_id").distinct().count() == 3
    assert sync.wh.read("raw.heart_rates__metrics").count() == 4


def test_streaming_agg_sync_matches_full_recompute(spark, tmp_path):
    """Two drained fact files merged through the streaming rollup equal
    the one-shot aggregate over their union; an empty third drain is a
    no-op."""
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingAggSync,
    )

    src = tmp_path / "facts"
    src.mkdir()
    b1 = spark.createDataFrame(
        [("u1", "d1", 10.0), ("u2", "d1", 5.0)], "user string, day string, value double"
    )
    b2 = spark.createDataFrame(
        [("u1", "d1", 30.0), ("u3", "d2", 1.0)], "user string, day string, value double"
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    sync = StreamingAggSync(
        spark, str(tmp_path / "wh"), str(src), "agg.user_day", ("user", "day"), ("value",)
    )
    sync.run_once()
    b2.coalesce(1).write.mode("append").parquet(str(src))
    sync.run_once()
    got = {
        (r["user"], r["day"]): (r["sum_value"], r["n_rows"], r["avg_value"])
        for r in sync.read().collect()
    }
    full = {
        (r["user"], r["day"]): (r["sum_value"], r["n_rows"], r["avg_value"])
        for r in b1.unionByName(b2)
        .groupBy("user", "day")
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_rows"))
        .withColumn(
            "avg_value", F.round(F.try_divide(F.col("sum_value"), F.col("n_rows")), 6)
        )
        .collect()
    }
    assert got == full
    assert got[("u1", "d1")] == (40.0, 2, 20.0)
    sync.run_once()  # nothing new
    assert {
        (r["user"], r["day"]): r["sum_value"] for r in sync.read().collect()
    } == {k: v[0] for k, v in full.items()}


def test_streaming_distinct_sync_merges_sketches(spark, tmp_path):
    """StreamingDistinctSync: two drained micro-batches land the same
    sketch state as one-shot sketching of all facts; replays (rerun
    with nothing new) leave the rollup untouched; stored sketches
    regrain with no double counting."""
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingDistinctSync,
    )

    src = tmp_path / "facts"
    src.mkdir()
    b1 = spark.createDataFrame(
        [("click", "d1", 1), ("click", "d1", 2), ("view", "d1", 1)],
        "etype string, day string, uid long",
    )
    b2 = spark.createDataFrame(
        [("click", "d2", 2), ("click", "d2", 3), ("view", "d2", 1)],
        "etype string, day string, uid long",
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    sync = StreamingDistinctSync(
        spark, str(tmp_path / "wh"), str(src), "agg.hll", ("etype", "day"), "uid"
    )
    sync.run_once()
    b2.coalesce(1).write.mode("append").parquet(str(src))
    sync.run_once()
    per_day = {
        (r["etype"], r["day"]): r["distinct_est"] for r in sync.read().collect()
    }
    assert per_day == {
        ("click", "d1"): 2,
        ("click", "d2"): 2,
        ("view", "d1"): 1,
        ("view", "d2"): 1,
    }
    # regrain to etype: uid 2 clicked on BOTH days but counts once
    total = {r["etype"]: r["distinct_est"] for r in sync.estimate(["etype"]).collect()}
    assert total == {"click": 3, "view": 1}
    before = sorted(map(tuple, sync.read().collect()))
    sync.run_once()  # nothing new
    assert sorted(map(tuple, sync.read().collect())) == before


def test_streaming_hist_sync_merges_bins(spark, tmp_path):
    """StreamingHistSync: two drained micro-batches land the same
    histogram state as one-shot binning of all facts (bin addition is
    an exact semigroup); an empty re-drain is a no-op; stored bins
    regrain without double counting."""
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingHistSync,
    )

    src = tmp_path / "facts"
    src.mkdir()
    b1 = spark.createDataFrame(
        [("click", "d1", 5.0), ("click", "d1", 15.0), ("view", "d1", 95.0)],
        "etype string, day string, value double",
    )
    b2 = spark.createDataFrame(
        [("click", "d2", 25.0), ("click", "d2", 35.0), ("view", "d2", 5.0)],
        "etype string, day string, value double",
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    sync = StreamingHistSync(
        spark, str(tmp_path / "wh"), str(src), "agg.vh",
        ("etype", "day"), "value", lo=0.0, hi=100.0, n_bins=10,
    )
    sync.run_once()
    b2.coalesce(1).write.mode("append").parquet(str(src))
    sync.run_once()
    per_day = {
        (r["etype"], r["day"]): (r["n_values"], r["p50"])
        for r in sync.read().collect()
    }
    # 10-wide bins, interpolated within: [5,15] -> p50 in bin 0 (rank 1)
    assert per_day[("click", "d1")][0] == 2
    assert per_day[("view", "d2")] == (1, 5.0)
    # regrain to etype: element-wise sums across days
    total = {
        r["etype"]: r["n_values"]
        for r in sync.estimate(["etype"], ps=(0.5,)).collect()
    }
    assert total == {"click": 4, "view": 2}
    before = sorted(map(tuple, sync.read().collect()))
    sync.run_once()  # nothing new
    assert sorted(map(tuple, sync.read().collect())) == before
