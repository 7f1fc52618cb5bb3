"""Live JDBC integration — S6 (partitioned parallel scan) and S11
(relational sink) exercised against the Derby embedded database that
ships in Spark's own jars (no external service, same JVM as local mode).

The reference's extract is a skip/limit parallel cursor scan (dlt
helpers.py:144-204) and its load runs 20 parallel Postgres workers
(.env:27-29); Spark-side both are JDBC DataSource contracts —
partitionColumn/bounds/numPartitions for the scan, repartition+batchsize
for the sink — and these tests prove the option builders produce plans
that actually scan in parallel, push predicates into the database, and
round-trip values, not just configurations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.sources.connectors import (
    jdbc_reader_options,
    jdbc_writer,
)

URL = "jdbc:derby:memory:sparkgraft_it;create=true"


def _seed(spark, table: str, n: int = 1000):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id").cast("double") / 3).alias("v"),
    )
    jdbc_writer(df, URL, table, mode="overwrite", num_partitions=5).save()
    return df


def test_sink_roundtrip_and_parallel_write(spark):
    """S11: the 20-worker load collapses to repartition + JDBC batch
    writes; every row must land exactly once."""
    df = _seed(spark, "t_sink")
    back = spark.read.format("jdbc").options(**jdbc_reader_options(URL, "t_sink")).load()
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_partitioned_parallel_scan(spark):
    """S6: partitionColumn/bounds/numPartitions is the skip/limit batch
    planner — the scan must arrive as num_partitions JDBC partitions
    with no row lost or duplicated at the stride boundaries."""
    _seed(spark, "t_scan")
    opts = jdbc_reader_options(
        URL, "t_scan", partition_column="id",
        lower_bound=0, upper_bound=999, num_partitions=5,
    )
    r = spark.read.format("jdbc").options(**opts).load()
    assert r.rdd.getNumPartitions() == 5
    assert r.count() == 1000
    assert r.select("id").distinct().count() == 1000


def test_predicate_pushdown_into_database(spark):
    """S2 on the JDBC path: a filter on the partition column must be
    pushed into the database query, not evaluated Spark-side over a
    full scan."""
    _seed(spark, "t_push")
    r = (
        spark.read.format("jdbc")
        .options(**jdbc_reader_options(URL, "t_push"))
        .load()
        .filter(F.col("k") == 3)
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan, plan
    assert r.count() == len([i for i in range(1000) if i % 7 == 3])


def test_write_dispositions_append_vs_overwrite(spark):
    """S12 dispositions on the relational sink: append accumulates,
    overwrite replaces (dlt write_disposition semantics)."""
    base = spark.range(10).select(F.col("id"), F.lit(1).alias("batch"))
    jdbc_writer(base, URL, "t_disp", mode="overwrite", num_partitions=2).save()
    jdbc_writer(
        spark.range(10, 15).select(F.col("id"), F.lit(2).alias("batch")),
        URL, "t_disp", mode="append", num_partitions=2,
    ).save()
    back = spark.read.format("jdbc").options(**jdbc_reader_options(URL, "t_disp")).load()
    assert back.count() == 15
    jdbc_writer(base, URL, "t_disp", mode="overwrite", num_partitions=2).save()
    back2 = spark.read.format("jdbc").options(**jdbc_reader_options(URL, "t_disp")).load()
    assert back2.count() == 10


def test_stage_model_loads_to_warehouse_sink(spark, pipeline):
    """End-to-end S11: a real stage model (users + devices array) loads
    into the relational warehouse.  Arrays aren't JDBC types (TimescaleDB
    has them, Derby doesn't) — the load projects them to a scalar form
    the same way dlt child tables do."""
    p, _paths = pipeline
    users = p.wh.read("stage.users").select(
        "user_id", "age", "gender", F.explode("devices").alias("device_id")
    )
    jdbc_writer(users, URL, "wh_users_devices", mode="overwrite", num_partitions=3).save()
    back = (
        spark.read.format("jdbc")
        .options(**jdbc_reader_options(URL, "wh_users_devices"))
        .load()
    )
    assert back.count() == users.count()
    assert set(back.columns) == {"user_id", "age", "gender", "device_id"}
