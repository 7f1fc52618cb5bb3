"""Run-log observability (plans/runlog.py): per-step rows appended to
an ordinary warehouse table; failures logged AND re-raised; pipeline
integration records extract counts."""

from __future__ import annotations

import json

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse
from iot_elt_airflow_mongo_timescaledb_spark.plans.runlog import RunLog


def test_step_records_ok_and_rows(spark, tmp_path):
    log = RunLog(Warehouse(spark, str(tmp_path)))
    with log.step("run1", "extract.steps") as info:
        info["rows_out"] = 42
    with log.step("run1", "stage"):
        pass  # body chose not to count
    rows = {r["step"]: r for r in log.read().collect()}
    assert rows["extract.steps"]["status"] == "ok"
    assert rows["extract.steps"]["rows_out"] == 42
    assert rows["extract.steps"]["wall_s"] >= 0.0
    assert rows["stage"]["rows_out"] is None
    assert {r["run_id"] for r in rows.values()} == {"run1"}


def test_step_failure_is_logged_then_reraised(spark, tmp_path):
    log = RunLog(Warehouse(spark, str(tmp_path)))
    with pytest.raises(RuntimeError, match="boom"):
        with log.step("run1", "load"):
            raise RuntimeError("boom")
    row = log.read().collect()[0]
    assert row["status"] == "error"
    assert "RuntimeError: boom" in row["error"]


def test_pipeline_sync_records_extract_counts(spark, tmp_path):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        HealthPipeline,
    )

    src = tmp_path / "steps"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps(
            [
                {"_id": "d1", "created_at": 100, "metrics": [{"v": 1}]},
                {"_id": "d2", "created_at": 101, "metrics": [{"v": 2}]},
            ]
        )
    )
    pipe = HealthPipeline(spark, str(tmp_path / "wh"), run_log=True)
    pipe.sync({"steps": str(src)}, run_id="2024-01-01T00:00")
    row = pipe.run_log.read().collect()[0]
    assert row["step"] == "extract.steps"
    assert row["rows_out"] == 2
    assert row["status"] == "ok"
    assert row["run_id"] == "2024-01-01T00:00"
