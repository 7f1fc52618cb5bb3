"""TableFormat seam: Warehouse speaks to storage ONLY through the verbs.

The reference delegates storage transactionality to TimescaleDB
(docker-compose.yaml:307); this repo's parquet implementation hand-
builds it (staging + swap) behind the :class:`TableFormat` interface so
a Delta/Iceberg format can replace it where rename-is-a-copy or cross-
table atomicity matter.  These tests prove the seam is real: a format
injected into ``Warehouse`` sees every storage touch, and the parquet
implementation passes the same semantics through it unchanged
(tests/test_materialize.py is the full recovery matrix).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
    Warehouse,
    materialize_replace,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ParquetFormat,
    TableFormat,
)


class SpyFormat(ParquetFormat):
    """ParquetFormat that records which verbs Warehouse invokes."""

    VERBS = (
        "exists", "read", "recover", "write", "replace_atomic", "merge",
        "dynamic_partition_overwrite", "drop_partitions_below",
        "list_tables", "partition_columns", "partition_values",
        "table_bytes", "path",
    )

    def __init__(self, spark, root):
        super().__init__(spark, root)
        self.calls: list[str] = []

    def __getattribute__(self, item):
        if item in SpyFormat.VERBS:
            object.__getattribute__(self, "calls").append(item)
        return object.__getattribute__(self, item)


@pytest.fixture()
def wh(spark, tmp_path):
    fmt = SpyFormat(spark, str(tmp_path))
    return Warehouse(spark, str(tmp_path), table_format=fmt)


def test_warehouse_accepts_injected_format(wh):
    assert isinstance(wh.fmt, SpyFormat)
    assert isinstance(wh.fmt, TableFormat)


def test_upsert_routes_through_merge_verb(spark, wh):
    wh.materialize_upsert(
        "stage.users",
        spark.createDataFrame([Row(user_id="a", age=30), Row(user_id="b", age=40)]),
        "user_id",
    )
    wh.fmt.calls.clear()
    wh.materialize_upsert(
        "stage.users", spark.createDataFrame([Row(user_id="b", age=41)]), "user_id"
    )
    assert "merge" in wh.fmt.calls
    # the parquet merge lands via the atomic-replace verb (one write)
    assert "replace_atomic" in wh.fmt.calls
    rows = {(r["user_id"], r["age"]) for r in wh.read("stage.users").collect()}
    assert rows == {("a", 30), ("b", 41)}


def test_incremental_routes_through_write_verb(spark, wh):
    df = spark.createDataFrame([Row(day="20240101", v=1)])
    wh.materialize_incremental("stage.t", df, watermark_col="day")
    wh.fmt.calls.clear()
    wh.materialize_incremental(
        "stage.t", spark.createDataFrame([Row(day="20240102", v=2)]), "day"
    )
    assert "write" in wh.fmt.calls and "replace_atomic" not in wh.fmt.calls
    assert wh.read("stage.t").count() == 2


def test_snapshot_and_compact_route_through_replace_atomic(spark, wh):
    wh.materialize_snapshot(
        "snap.u", spark.createDataFrame([Row(k="a", v=1)]), "k", "2024-01-01"
    )
    assert "replace_atomic" in wh.fmt.calls
    wh.fmt.calls.clear()
    wh.compact("snap.u", target_files=1)
    assert "replace_atomic" in wh.fmt.calls


def test_retention_and_backfill_route_through_partition_verbs(spark, wh):
    df = spark.createDataFrame(
        [Row(day="20240101", v=1), Row(day="20240102", v=2)]
    )
    wh.materialize_incremental("stage.p", df, partition_by=("day",))
    wh.fmt.calls.clear()
    assert wh.retention_drop("stage.p", "day", "20240102") == 1
    assert "drop_partitions_below" in wh.fmt.calls
    wh.fmt.calls.clear()
    wh.backfill_partitions(
        "stage.p", spark.createDataFrame([Row(day="20240102", v=3)]), "day"
    )
    assert "dynamic_partition_overwrite" in wh.fmt.calls
    got = {(r["day"], r["v"]) for r in wh.read("stage.p").collect()}
    assert got == {("20240102", 3)}


def test_materialize_replace_routes_through_replace_atomic(spark, wh):
    materialize_replace(wh, "stage.r", spark.createDataFrame([Row(v=1)]))
    assert "replace_atomic" in wh.fmt.calls
    assert wh.read("stage.r").count() == 1


def test_replace_atomic_rejects_unknown_suffix(spark, tmp_path):
    fmt = ParquetFormat(spark, str(tmp_path))
    with pytest.raises(ValueError, match="staging suffix"):
        fmt.replace_atomic("a.b", spark.createDataFrame([Row(v=1)]), (), "__oops")


def test_format_interface_is_complete():
    """Every abstract verb has a parquet implementation; a new format
    must implement exactly this surface."""
    assert not getattr(ParquetFormat, "__abstractmethods__", None)
    abstract = TableFormat.__abstractmethods__
    assert {
        "path", "exists", "read", "recover", "list_tables",
        "partition_columns", "partition_values", "table_bytes",
        "write", "replace_atomic", "dynamic_partition_overwrite",
        "drop_partitions_below",
    } == set(abstract)
