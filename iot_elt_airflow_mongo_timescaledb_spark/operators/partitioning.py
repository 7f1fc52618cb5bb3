"""Scan-parallelism guard shared by CPU-heavy operators.

A small or freshly-compacted parquet input (one row group) arrives as a
single split, which serializes any explode-, hash-, or Python-heavy
stage regardless of cluster size.  ``ensure_min_parallelism`` widens
such inputs to the cluster default, optionally hash-distributing by the
downstream aggregation key so the following groupBy is already
co-partitioned (the exchange moves up the plan rather than being
added).

At scale the guard is a no-op: a 100 TB corpus scans as thousands of
splits, the condition is false, and no raw-data shuffle is injected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df
