"""End-to-end curation -> cleaning -> shard writing: the full
training-data landing path composed from the round-5 pieces."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
    chunk_dedup_clean,
    doc_chunks,
    exact_dup_keepers,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse


def test_curate_clean_shard_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kept = exact_dup_keepers(docs, "doc_id", "text")
    cleaned = chunk_dedup_clean(
        doc_chunks(kept, "doc_id", "text"), "doc_id"
    ).withColumnRenamed("clean_text", "text")

    wh = Warehouse(spark, str(tmp_path))
    out = wh.materialize_training_shards(
        "train.corpus", cleaned, "doc_id", n_shards=4
    )
    n_cleaned = cleaned.count()
    assert out.count() == n_cleaned > 0
    # shard layout holds for the real pipeline output
    dirs = glob.glob(os.path.join(str(tmp_path), "train", "corpus", "shard=*"))
    assert 1 <= len(dirs) <= 4
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # the written corpus is dedup'd: no two shard rows share content
    assert out.select("text").distinct().count() == n_cleaned
