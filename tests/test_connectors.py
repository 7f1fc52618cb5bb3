"""Connector option-building tests (no external services in CI —
the configured reader/writer is inspected, never connected)."""

from __future__ import annotations

from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.sources.connectors import (
    jdbc_reader_options,
    jdbc_writer,
    mongo_reader_options,
    read_mongo,
)


def test_mongo_options_mirror_reference_chunking():
    opts = mongo_reader_options("mongodb://h:27017", "iot", "heart_rates")
    assert opts["database"] == "iot"
    assert opts["collection"] == "heart_rates"
    # partition.size is MEGABYTES (connector contract): 10k docs x 1 KiB
    # default estimate = ~9 MB partitions ≈ dlt's 10k-doc batches
    assert opts["partitioner.options.partition.size"] == "9"
    assert (
        mongo_reader_options(
            "mongodb://h:27017", "iot", "hr", chunk_size=10_000,
            avg_doc_bytes=512,
        )["partitioner.options.partition.size"]
        == "4"
    )


def test_mongo_reader_builds_without_connecting(spark):
    reader = read_mongo(spark, "mongodb://h:27017", "iot", "steps")
    assert reader is not None  # no load() — jar absent in this image


def test_jdbc_partitioned_scan_options():
    opts = jdbc_reader_options(
        "jdbc:postgresql://h/dwh", "raw.heart_rates",
        partition_column="created_at", lower_bound=0, upper_bound=1_000_000,
    )
    assert opts["numPartitions"] == "5"  # reference extract workers (.env:29)
    assert opts["partitionColumn"] == "created_at"
    assert opts["fetchsize"] == "10000"


def test_jdbc_writer_bounds_connections(spark):
    df = spark.createDataFrame([Row(a=1)])
    writer = jdbc_writer(df, "jdbc:postgresql://h/dwh", "raw.users")
    assert writer is not None  # 20-way repartition ≈ reference load workers
