"""Scan-parallelism guard shared by CPU-heavy operators.

A small or freshly-compacted parquet input (one row group) arrives as a
single split, which serializes any explode-, hash-, or Python-heavy
stage regardless of cluster size.  ``ensure_min_parallelism`` widens
such inputs to the cluster default, optionally hash-distributing by the
downstream aggregation key so the following groupBy is already
co-partitioned (the exchange moves up the plan rather than being
added).

The width check is metadata-only: ``df.inputFiles()`` (a catalog/file-
index listing Spark has already performed to plan the scan) plus the
same split-packing formula ``FilePartition.maxSplitBytes`` uses — NOT
``df.rdd.getNumPartitions()``, which converts the whole logical plan to
an RDD on the driver for every call.

At scale the guard is a no-op twice over: a 100 TB corpus scans as
thousands of splits, so the estimate clears the default parallelism and
no raw-data shuffle is injected; and non-file sources (in-memory
relations, streams) return unchanged — the guard is scan-oriented, and
callers with exotic sources size their own exchanges.

Known limit: for a DataFrame downstream of a shuffle (join/agg output)
the estimate still reads the LEAF scans, so it describes where the data
came from, not the width of the last exchange.  That errs toward a
redundant (cheap, AQE-coalesced) repartition on small inputs and toward
trusting the file layout on large ones — acceptable for a guard whose
job is "never let a tiny local scan serialize a CPU-heavy stage".
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

_SIZE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ("134217728b", "128m", "128MB")."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:  # noqa: BLE001 - unset conf
        return default
    m = re.fullmatch(r"(\d+)\s*([kmg]?)b?", raw)
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2)] if m else default


def _hadoop_file_size(spark: SparkSession, uri: str) -> int | None:
    """File length via the JVM Hadoop FileSystem API — the stat path for
    remote schemes (s3a/hdfs/abfs/...), where ``os.path.getsize`` cannot
    reach.  The URI goes through ``java.net.URI`` so the percent-encoding
    ``inputFiles()`` emits is interpreted once, exactly as Spark's own
    scan planning does.  None for genuinely unstat-able sources.
    """
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(jvm.java.net.URI.create(uri))
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getFileStatus(jpath).getLen())
    except Exception:  # noqa: BLE001 - missing file, bad scheme, no creds
        return None


def _file_size(spark: SparkSession, uri: str) -> int | None:
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        try:
            # inputFiles() returns percent-encoded URIs ("my%20dir");
            # plain os.stat is cheaper than a JVM round-trip per file
            return os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return _hadoop_file_size(spark, uri)


def estimated_scan_splits(spark: SparkSession, files: list[str]) -> int | None:
    """LOWER BOUND on how many input splits Spark packs the scan's files
    into, saturating at ``defaultParallelism``.

    Contract: the return value is exact (mirroring
    ``FilePartition.maxSplitBytes``) while it is below
    ``defaultParallelism``, and CAPPED at ``defaultParallelism`` once
    the input is provably at least that wide — the early exit stops
    stat'ing files at that point (a 50k-file S3 table would otherwise
    cost one HEAD per file at plan time).  Callers comparing against
    ``defaultParallelism`` (``ensure_min_parallelism``'s ``est >=
    target``) get an exact answer; do NOT use the value as a
    quantitative split count for wide scans.

        bytesPerCore = (totalBytes + openCost * nFiles) / defaultParallelism
        maxSplit     = min(maxPartitionBytes, max(openCost, bytesPerCore))
        splits       ≈ ceil(totalPadded / maxSplit)   # while < parallelism

    Local paths stat via ``os``; remote schemes stat via the Hadoop
    FileSystem API (a metadata call, same cost class as the listing
    Spark already did) — a small REMOTE scan must widen exactly like a
    local one, production data being remote is the norm not the
    exception.  Returns None only when a file genuinely cannot be
    stat'ed (no credentials, vanished file) — callers treat unknown as
    "wide enough" rather than injecting a speculative shuffle.
    """
    max_part = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    cores = max(1, spark.sparkContext.defaultParallelism)
    # Early exit: once padded bytes reach cores × maxPartitionBytes the
    # split count is guaranteed >= cores (max_split is capped at
    # max_part), i.e. already "wide enough" for any caller comparing
    # against defaultParallelism — so a LARGE remote table stats only
    # its first few files instead of one sequential FileSystem RPC per
    # file (50k S3 HEADs at plan time was the alternative).  Small
    # scans — the guard's actual target — still stat everything.
    wide = cores * max_part
    total = 0
    for uri in files:
        size = _file_size(spark, uri)
        if size is None:
            return None
        total += size + open_cost
        if total >= wide:
            return cores
    if total == 0:
        return 1
    max_split = min(max_part, max(open_cost, total // cores))
    return max(1, math.ceil(total / max_split))


def ensure_min_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df  # non-file source: no scan to widen
    est = estimated_scan_splits(spark, files)
    if est is None or est >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
