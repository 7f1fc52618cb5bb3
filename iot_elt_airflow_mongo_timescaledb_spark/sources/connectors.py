"""External-system connectors — the reference's Mongo source and
Postgres warehouse sink, as Spark DataSource configurations.

The reference extracts with pymongo cursors (5 workers, 10k-doc chunks,
skip/limit parallel batches — dlt helpers.py:125-204) and loads through
20 parallel Postgres workers (.env:27-29).  Sparkside both collapse to
DataSource options: the Mongo Spark connector / JDBC handle partitioned
parallel scans, predicate pushdown, and batched writes natively.

This container ships no Mongo connector jar, so the Mongo builder
returns a *configured* reader without connecting.  The JDBC path IS
exercised live: Spark's own jars include embedded Derby, and
``tests/test_jdbc_integration.py`` proves the partitioned parallel scan
(S6), predicate pushdown into the database, the parallel batched sink
(S11), and the append/overwrite dispositions against a real JDBC
database — the same DataSource contract a Postgres/TimescaleDB
deployment points at via ``url``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def mongo_reader_options(
    uri: str,
    database: str,
    collection: str,
    chunk_size: int = 10_000,
    avg_doc_bytes: int = 1024,
) -> dict[str, str]:
    """Options for ``spark.read.format('mongodb')`` mirroring the
    reference's scan parameters (S1/S5/S6).

    The SamplePartitioner's ``partition.size`` option is in MEGABYTES
    (connector docs; default 64), not documents — so dlt's 10k-doc
    batch intent (dlt __init__.py:81) is converted via
    ``avg_doc_bytes``: partition ≈ chunk_size docs of the estimated
    size.  The connector plans a partitioned parallel scan like the
    skip/limit planner in helpers.py:144-204, and pushes ``$match``
    filters down (S2).
    """
    partition_mb = max(1, (chunk_size * avg_doc_bytes) // (1 << 20))
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
        "partitioner.options.partition.size": str(partition_mb),
    }


def read_mongo(
    spark: SparkSession, uri: str, database: str, collection: str, **kw
):
    """Configured (unconnected) reader for a Mongo collection."""
    reader = spark.read.format("mongodb")
    for k, v in mongo_reader_options(uri, database, collection, **kw).items():
        reader = reader.option(k, v)
    return reader


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 5,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """JDBC partitioned-scan options — the reference's skip/limit
    parallel batch planner (helpers.py:144-204) is exactly Spark's
    partitionColumn/bounds/numPartitions contract; ``num_partitions``
    defaults to the reference's 5 extract workers (.env:29)."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC source as the literal
            # 'None' and die with an opaque NumberFormatException at
            # load time, far from this call site
            raise ValueError(
                "partition_column requires both lower_bound and "
                "upper_bound (Spark's partitioned-JDBC contract)"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int = 20,
    batch_size: int = 10_000,
):
    """Configured (unsaved) JDBC writer — the warehouse load step (S11).

    ``num_partitions`` defaults to the reference's 20 load workers
    (.env:27): the write-side repartition bounds concurrent connections
    exactly like dlt's load-worker pool.
    """
    return (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
