"""SparkSession factory + catalog bootstrap.

Reference parity: the reference delegates execution to TimescaleDB and
namespaces models into ``raw``/``stage``/``agg``/``examples`` schemas
(reference ``macros/generate_schema_name.sql:1-13``,
``dbt_project.yml:32-42``).  Here the SparkSession *is* the engine and
the schemas become catalog databases.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SCHEMAS = ("raw", "stage", "agg", "examples")


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny driver-side relation as a SINGLE-partition DataFrame.

    ``spark.createDataFrame(list, ...)`` parallelizes the list into
    ``defaultParallelism`` Python partitions; every evaluation of the
    frame then pays one Python-worker round trip PER partition — and a
    ``coalesce(1)`` (the 1-row cursor/meta write pattern) serializes
    all of them into one task: ~5 s per write at local[32], measured
    (OPTIMIZATION_r15.md §cursor-commit).  One slice = one round trip
    (~0.3 s), and downstream unions/joins stop dragging 32 empty
    Python partitions into every plan that embeds the frame."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def get_spark(app_name: str = "iot-elt-spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or fetch) the session.

    local[N] = one JVM; shuffle partitions sized to cores (the default 200
    over-parallelizes small local runs).  On a real cluster the same code
    runs unchanged — AQE coalesces post-shuffle partitions at runtime so
    the static setting only seeds the initial plan.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # warehouse tables partition by day-string keys ('20200201');
        # without this Spark would re-infer them as integers on read
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # catalog tables (bucketed layouts) land outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def bootstrap_catalog(spark: SparkSession) -> None:
    """M4 — the reference's schema namespaces as catalog databases
    (macros/generate_schema_name.sql:1-13, dbt_project.yml:32-42)."""
    for schema in SCHEMAS:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata parquet as a DataFrame (lazy scans)."""
    from .plans.registry import table

    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (SQL entry point)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
