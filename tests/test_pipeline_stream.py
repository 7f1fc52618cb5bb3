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
