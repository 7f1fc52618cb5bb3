"""Multimodal plumbing unit tests: shape stability, determinism, and
ANN recall sanity vs the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.multimodal import (
    attach_binary,
    extract_features,
    resize_features,
    resize_stub,
    sample_frames,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table


def test_resize_stub_shape_and_determinism():
    a = resize_stub(b"hello world, this is a blob", out_dim=8)
    b = resize_stub(b"hello world, this is a blob", out_dim=8)
    assert a == b and len(a) == 8
    assert resize_stub(b"", out_dim=4) == [0.0] * 4
    assert all(0.0 <= x <= 1.0 for x in a)


def test_resize_features_fixed_dim(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    out = resize_features(attach_binary(docs, "text", "doc_id"), out_dim=8)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["resized"]) == 8 for r in rows)


def test_frame_sample_covers_every_doc(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    out = sample_frames(attach_binary(docs, "text", "doc_id"), n_frames=3)
    assert out.count() == 30
    assert out.groupBy("id").count().filter(F.col("count") != 3).count() == 0


def test_extract_features_matches_checksum(spark, sf_dir):
    import hashlib

    docs = table(spark, sf_dir, "documents").limit(5)
    out = extract_features(attach_binary(docs, "text", "doc_id")).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert r["checksum"] == hashlib.md5(texts[r["id"]].encode()).hexdigest()


def test_ivf_recall_against_exact_baseline(spark, sf_dir):
    """ANN sanity: IVF scores can never beat the exact top-1, and its
    results must come from the probed cluster."""
    from iot_elt_airflow_mongo_timescaledb_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["rk"]): r["score"]
        for r in cosine_topk(e, q, k=1).collect()
    }
    approx = {
        (r["query_id"], r["rk"]): r["score"]
        for r in ivf_topk(e, q, k=1).collect()
    }
    assert set(approx) <= set(exact) or len(approx) > 0
    for key, score in approx.items():
        assert score <= exact[key] + 1e-9
