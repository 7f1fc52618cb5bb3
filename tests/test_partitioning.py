"""ensure_min_parallelism: widens starved inputs, never narrows wide ones."""

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.partitioning import (
    ensure_min_parallelism,
)


def test_widens_single_partition_input(spark):
    df = spark.range(100).coalesce(1)
    out = ensure_min_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_noop_when_already_wide(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = ensure_min_parallelism(df)
    # must return the input unchanged — no narrowing, no extra exchange
    assert out is df


def test_key_distribution_preserves_rows(spark):
    df = spark.range(1000).coalesce(1).withColumn("k", F.col("id") % 7)
    out = ensure_min_parallelism(df, "k")
    assert out.count() == 1000
    assert sorted(r["k"] for r in out.select("k").distinct().collect()) == list(
        range(7)
    )
