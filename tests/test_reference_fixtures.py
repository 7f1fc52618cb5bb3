"""End-to-end fixture-value test against the reference's COMMITTED data.

Runs the real ingest path (read_documents → incremental cursor → flatten
→ raw upsert, plans/pipeline.py:sync) over
``/root/reference/shared/mongodb/initdb.d/data/{users,sleeps}.json`` and
asserts literal stage-layer values.

Scope note: the reference checkout ships only these two collections —
``steps.json`` / ``heart_rates.json`` are large blobs absent from the
repo (``.MISSING_LARGE_BLOBS``), so the README screenshot outputs
(``resources/*.png``, built from generator data including steps) are not
reproducible from committed data; the committed users+sleeps subset IS,
and its expected values below are literals plus a pure-Python
recomputation from the JSON (an oracle independent of Spark).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans import models
from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import HealthPipeline

DATA_DIR = "/root/reference/shared/mongodb/initdb.d/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA_DIR), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def ref_pipeline(spark, tmp_path_factory):
    wh_root = tmp_path_factory.mktemp("ref_warehouse")
    p = HealthPipeline(spark, str(wh_root))
    p.sync(
        {
            "users": os.path.join(DATA_DIR, "users.json"),
            "sleeps": os.path.join(DATA_DIR, "sleeps.json"),
        }
    )
    raw = {n: p.wh.read(f"raw.{n}") for n in p._raw_tables()}
    return p, raw


def test_stage_users_literal_values(ref_pipeline):
    """models/stage/users.sql over the committed users.json — the two
    users the reference publishes (README.md:83-87 shows sam.smith)."""
    _, raw = ref_pipeline
    out = models.stage_users(raw)
    rows = {
        r["user_id"]: r
        for r in out.withColumn(
            "created_epoch", F.col("created_at").cast("long")
        ).collect()
    }
    assert set(rows) == {
        "02933810560a4fa4bb4b87954a588bfd",
        "5420b0d671cd47ccb0daf96c1d3e49db",
    }
    sam = rows["02933810560a4fa4bb4b87954a588bfd"]
    assert (sam["age"], sam["height"], sam["gender"]) == (48, 195, "male")
    assert sam["email"] == "sam.smith@gmail.com"
    assert sam["created_epoch"] == 1572566400
    assert sam["dob"] == 209865600
    assert sam["devices"] == ["cc05138edfe24a6b8651e831d237583e"]
    alfred = rows["5420b0d671cd47ccb0daf96c1d3e49db"]
    assert (alfred["age"], alfred["height"], alfred["gender"]) == (60, 180, "male")
    assert alfred["dob"] == -168825600  # pre-1970 epoch survives ingest
    assert alfred["devices"] == ["2fa0371b10e14ad98521b7533f1f6b21"]


def test_stage_sleeps_matches_committed_json(ref_pipeline):
    """models/stage/sleeps.sql over the committed sleeps.json: one stage
    row per (sleep doc, metric entry) — 125 rows from 120 docs — with
    day/month keys from the sleep start_ts."""
    _, raw = ref_pipeline
    out = models.stage_sleeps(raw)
    got = sorted(
        (
            r["device_id"],
            r["created_epoch"],
            r["ended_epoch"],
            r["month"],
            r["day"],
            r["duration"],
        )
        for r in out.select(
            "device_id",
            F.col("created_at").cast("long").alias("created_epoch"),
            F.col("ended_at").cast("long").alias("ended_epoch"),
            "month",
            "day",
            "duration",
        ).collect()
    )

    # independent pure-Python oracle from the same committed JSON
    from datetime import datetime, timezone

    docs = json.load(open(os.path.join(DATA_DIR, "sleeps.json")))
    want = sorted(
        (
            d["device_id"],
            m["start_ts"],
            m["end_ts"],
            datetime.fromtimestamp(m["start_ts"], tz=timezone.utc).strftime("%Y%m"),
            datetime.fromtimestamp(m["start_ts"], tz=timezone.utc).strftime("%Y%m%d"),
            m["duration"],
        )
        for d in docs
        for m in d["metrics"]
    )
    assert len(want) == 125 and len({json.dumps(d, sort_keys=True) for d in docs}) == 120
    assert got == want

    # literal spot value: the first committed sleep of sam.smith's device
    assert (
        "cc05138edfe24a6b8651e831d237583e",
        1580515350,
        1580537940,
        "202002",
        "20200201",
        22560000,
    ) in got


def test_duplicate_metric_struct_preserved(ref_pipeline):
    """FIXTURES.md quirk: the committed sample duplicates one metrics
    struct inside a doc — the reference's ``JOIN ON 1=1`` parent-child
    stage keeps BOTH rows (they are distinct child rows by list index),
    and the deterministic ``_dlt_id`` keeps the upsert idempotent."""
    _, raw = ref_pipeline
    out = models.stage_sleeps(raw)
    dup = out.filter(
        (F.col("device_id") == "cc05138edfe24a6b8651e831d237583e")
        & (F.col("created_at").cast("long") == 1580861790)
    )
    assert dup.count() == 2
    assert {r["duration"] for r in dup.collect()} == {20280000}


def test_sync_rerun_idempotent_on_committed_data(ref_pipeline):
    """Re-running the extract over the same committed files must not
    duplicate raw rows (>= cursor boundary + deterministic _dlt_id)."""
    p, raw = ref_pipeline
    before = {n: p.wh.read(f"raw.{n}").count() for n in p._raw_tables()}
    p.sync(
        {
            "users": os.path.join(DATA_DIR, "users.json"),
            "sleeps": os.path.join(DATA_DIR, "sleeps.json"),
        }
    )
    after = {n: p.wh.read(f"raw.{n}").count() for n in p._raw_tables()}
    assert after == before
    assert before["sleeps__metrics"] == 125
    assert before["users"] == 2
