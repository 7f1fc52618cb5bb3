"""Query registry shared by ``__spark_entry__.py`` and the tests.

Each entry couples an idiomatic-PySpark builder with the ANSI-SQL oracle
DuckDB runs on the same parquet.  Column names are aliased identically on
both sides (the driver's compare sorts columns by name before hashing).

Float policy: aggregate doubles are rounded — ROUND(sum, 2) for monetary
sums, ROUND(avg, 4) for means — because double summation order differs
between engines (and between Spark partitions of the same query).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def spark_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects.  Read the raw int64 nanos and convert to
        # a microsecond timestamp (testdata is µs-aligned at gate SFs).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_analytics  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_traindata  # noqa: F401

    _LOADED = True
