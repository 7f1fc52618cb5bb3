"""Flattener unit tests — the dlt normalize step (SURVEY S10, T8).

Reference shape evidence: /root/reference/dags/dbt_project/models/
sources.yml:10-18 (child tables users__devices, heart_rates__metrics, …)
and the ER diagram in dags/iot_dwh_stage_tranform.py:23-38.
"""

from __future__ import annotations

from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import parent_child_join
from iot_elt_airflow_mongo_timescaledb_spark.sources.flatten import (
    flatten_document_table,
)


def _heart_rates_df(spark):
    return spark.createDataFrame(
        [
            Row(
                _id="a1",
                device_id="d1",
                created_at=1580515200,
                metrics=[
                    Row(ts=1580515800, bpm=60, confidence=3),
                    Row(ts=1580516400, bpm=70, confidence=2),
                ],
            ),
            Row(_id="a2", device_id="d2", created_at=1580529600, metrics=[]),
        ]
    )


def test_array_of_struct_becomes_child_table(spark):
    out = flatten_document_table(_heart_rates_df(spark), "heart_rates")
    assert set(out) == {"heart_rates", "heart_rates__metrics"}
    parent = out["heart_rates"]
    child = out["heart_rates__metrics"]
    assert "metrics" not in parent.columns
    assert "_dlt_id" in parent.columns
    assert {"ts", "bpm", "confidence", "_dlt_parent_id", "_dlt_list_idx", "_dlt_id"} <= set(
        child.columns
    )
    assert parent.count() == 2  # empty-metrics parent kept
    assert child.count() == 2  # posexplode_outer null row filtered

    # reassembly (J1) recovers every event against its parent scalar cols
    joined = parent_child_join(parent, child)
    rows = {(r["device_id"], r["bpm"]) for r in joined.collect()}
    assert rows == {("d1", 60), ("d1", 70)}


def test_array_of_scalar_child_gets_value_column(spark):
    users = spark.createDataFrame(
        [
            Row(_id="u1", user_id="u1", devices=["d1", "d2"]),
            Row(_id="u2", user_id="u2", devices=[]),
        ]
    )
    out = flatten_document_table(users, "users")
    child = out["users__devices"]
    assert {"value", "_dlt_parent_id", "_dlt_list_idx"} <= set(child.columns)
    vals = sorted((r["value"], r["_dlt_list_idx"]) for r in child.collect())
    assert vals == [("d1", 0), ("d2", 1)]


def test_surrogate_keys_deterministic_across_runs(spark):
    df = _heart_rates_df(spark)
    a = flatten_document_table(df, "heart_rates")
    b = flatten_document_table(df, "heart_rates")
    ids_a = sorted(r["_dlt_id"] for r in a["heart_rates"].collect())
    ids_b = sorted(r["_dlt_id"] for r in b["heart_rates"].collect())
    assert ids_a == ids_b  # sha2(pk) — re-runs upsert cleanly on raw
    cids_a = sorted(r["_dlt_id"] for r in a["heart_rates__metrics"].collect())
    cids_b = sorted(r["_dlt_id"] for r in b["heart_rates__metrics"].collect())
    assert cids_a == cids_b


def test_duplicate_metric_structs_survive(spark):
    """T8 — the reference keeps exact-duplicate structs inside metrics
    (data/sleeps.json, device cc05… bucket 1580881500)."""
    sleeps = spark.createDataFrame(
        [
            Row(
                _id="s1",
                device_id="d1",
                metrics=[
                    Row(start_ts=1580515350, end_ts=1580537940, duration=22560000),
                    Row(start_ts=1580515350, end_ts=1580537940, duration=22560000),
                ],
            )
        ]
    )
    child = flatten_document_table(sleeps, "sleeps")["sleeps__metrics"]
    assert child.count() == 2
    # but their surrogate ids differ (position-chained), so no accidental dedup
    assert child.select("_dlt_id").distinct().count() == 2


def test_nested_plain_struct_flattens_into_parent(spark):
    df = spark.createDataFrame(
        [Row(_id="x", meta=Row(source="watch", fw=Row(major=2, minor=1)))]
    )
    out = flatten_document_table(df, "t")
    cols = set(out["t"].columns)
    assert {"meta__source", "meta__fw__major", "meta__fw__minor"} <= cols


def test_normalize_bson_epoch_columns(spark):
    """S8 — declared epoch-second columns become timestamps; negative
    epochs (pre-1970 dob, reference users.json) work."""
    from datetime import datetime

    from pyspark.sql import Row

    from iot_elt_airflow_mongo_timescaledb_spark.sources.ingest import normalize_bson

    df = spark.createDataFrame([Row(_id="u", created_at=1572566400, dob=-168825600)])
    out = normalize_bson(df, epoch_cols=("created_at", "dob", "missing_col"))
    row = out.collect()[0]
    assert row["created_at"] == datetime(2019, 11, 1, 0, 0)
    assert row["dob"] == datetime(1964, 8, 26, 0, 0)
