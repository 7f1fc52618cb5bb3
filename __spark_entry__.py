"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) at sf0.001."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.queries_relational import (
        pricing_summary,
    )

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver records at most 50 rows, so this returns the curated
    gated set (every SURVEY §2 operator family + every LLM-pipeline
    component; at most GATE_CAP entries, enforced with a ValueError in
    the registry); operator-redundant variants stay registered with
    ``gate=False`` and are verified by the pytest oracle-parity suite
    (tests/test_oracle_parity.py) instead.
    """
    return spark_queries(gated_only=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return oracle_queries(gated_only=True)
