"""Join-operator unit tests: scale rewrites must be result-equivalent
to their literal forms, and the week bucket must align with the
reference's TimescaleDB origin."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.functions import week_bucket
from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import (
    array_membership_join,
    existence_filter_join,
)


def test_array_membership_rewrite_equals_literal(spark):
    """J5 explode→equi rewrite ≡ array_contains nested loop, including
    multi-membership double-count (SURVEY §2.9.6)."""
    facts = spark.createDataFrame(
        [Row(device_id="d1", v=1), Row(device_id="d2", v=2), Row(device_id="dx", v=3)]
    )
    users = spark.createDataFrame(
        [
            Row(user_id="u1", devices=["d1", "d2"]),
            Row(user_id="u2", devices=["d1"]),  # d1 matches two users
            Row(user_id="u3", devices=[]),
        ]
    )
    literal = facts.join(
        users, F.array_contains(users.devices, facts.device_id), "inner"
    ).select("device_id", "v", "user_id")
    rewritten = array_membership_join(
        facts, users, "devices", "device_id"
    ).select("device_id", "v", "user_id")
    lit_rows = sorted(tuple(r) for r in literal.collect())
    new_rows = sorted(tuple(r) for r in rewritten.collect())
    assert new_rows == lit_rows
    assert len(new_rows) == 3  # d1 double-counted across u1/u2, d2 once


def test_existence_filter_join_no_multiplication(spark):
    facts = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    filt = spark.createDataFrame([Row(k="a"), Row(k="a"), Row(k="a")])
    out = existence_filter_join(facts, filt, ["k"])
    assert [tuple(r) for r in out.collect()] == [("a", 1)]


def test_week_bucket_matches_timescaledb_origin(spark):
    """time_bucket('1 week', ts) origin 2000-01-03 is a Monday; Spark
    date_trunc('week') is ISO-Monday — identical buckets (SURVEY A6)."""
    df = spark.createDataFrame(
        [
            Row(ts=datetime(2000, 1, 3, 5, 0)),   # Monday (the origin itself)
            Row(ts=datetime(2020, 2, 2, 23, 59)),  # Sunday -> previous Monday
            Row(ts=datetime(2020, 2, 3, 0, 0)),    # Monday midnight boundary
        ]
    )
    got = [r["w"] for r in df.select(week_bucket("ts").alias("w")).collect()]
    assert got == [
        datetime(2000, 1, 3, 0, 0),
        datetime(2020, 1, 27, 0, 0),
        datetime(2020, 2, 3, 0, 0),
    ]
