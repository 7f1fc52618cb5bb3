"""ensure_min_parallelism: widens starved file scans, never narrows wide
ones, and leaves non-file sources untouched — all without an RDD
conversion (the check is inputFiles() + the split-packing estimate)."""

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.partitioning import (
    ensure_min_parallelism,
    estimated_scan_splits,
)


def _small_parquet(spark, tmp_path, n=100, name="one"):
    p = str(tmp_path / name)
    spark.range(n).withColumn("k", F.col("id") % 7).coalesce(1).write.parquet(p)
    return spark.read.parquet(p)


def test_widens_single_file_scan(spark, tmp_path):
    df = _small_parquet(spark, tmp_path)
    out = ensure_min_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_noop_when_scan_already_wide(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide")
    spark.range(10_000).repartition(target * 2).write.parquet(p)
    df = spark.read.parquet(p)
    # many files → the packing estimate clears defaultParallelism
    assert estimated_scan_splits(spark, df.inputFiles()) >= target
    out = ensure_min_parallelism(df)
    # must return the input unchanged — no narrowing, no extra exchange
    assert out is df


def test_non_file_source_untouched(spark):
    df = spark.range(100).coalesce(1)
    assert df.inputFiles() == []
    assert ensure_min_parallelism(df) is df


def test_key_distribution_preserves_rows(spark, tmp_path):
    df = _small_parquet(spark, tmp_path, n=1000, name="keys")
    out = ensure_min_parallelism(df, "k")
    assert out.count() == 1000
    assert sorted(r["k"] for r in out.select("k").distinct().collect()) == list(
        range(7)
    )


def test_percent_encoded_paths_still_widen(spark, tmp_path):
    """inputFiles() percent-encodes URIs — a directory with a space must
    not silently disable the guard (OSError → treated as wide)."""
    d = tmp_path / "with space"
    df = _small_parquet(spark, d, name="enc")
    assert any("%20" in f for f in df.inputFiles())
    out = ensure_min_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_hadoop_stat_path_matches_os_stat(spark, sf_dir):
    """Remote-scheme URIs stat through the JVM Hadoop FileSystem API; a
    file:// URI driven through that same code path must agree with
    os.stat — proving the remote branch is live, not a permanent None
    (which would make the guard a no-op exactly where production data
    lives)."""
    import os

    from iot_elt_airflow_mongo_timescaledb_spark.operators.partitioning import (
        _hadoop_file_size,
    )

    p = os.path.join(sf_dir, "documents.parquet")
    assert _hadoop_file_size(spark, "file://" + p) == os.path.getsize(p)
    assert _hadoop_file_size(spark, "file://" + p + ".nope") is None
