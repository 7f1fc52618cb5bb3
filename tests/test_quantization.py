"""quantize_embeddings: reconstruction-bound and code-range contracts.

The int checksums are hash-oracled by the embedding_quantization query;
the float reconstruction error is tolerance-pinned here because its
last ulp shifts with codegen subexpression sharing (see the query
docstring)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.similarity import (
    quantize_embeddings,
)


def test_reconstruction_error_bound_and_python_agreement(spark, sf_dir):
    import os

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = quantize_embeddings(e, "vec_id").collect()
    src = {r["vec_id"]: r["embedding"] for r in e.collect()}
    assert rows
    for r in rows:
        vec = [float(x) for x in src[r["vec_id"]]]
        q, sc = r["q"], r["scale"]
        assert all(-127 <= x <= 127 for x in q)
        den = math.sqrt(sum(x * x for x in vec))
        num = sc * math.sqrt(sum((x / sc - qq) ** 2 for x, qq in zip(vec, q)))
        ref = num / den if den else None
        if ref is None:
            assert r["rel_err"] is None
        else:
            # 8-bit symmetric quantization of a unit-ish vector: worst
            # case 0.5*scale per dim -> rel_err well under 1%
            assert r["rel_err"] < 0.01
            assert abs(r["rel_err"] - ref) < 1e-5


def test_zero_vector_quantizes_to_zeros(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df, "vec_id").collect()}
    assert rows[1]["q"] == [0, 0, 0, 0]
    assert rows[1]["rel_err"] is None  # 0/0 -> NULL, never an ANSI abort
    assert rows[2]["q"][1] == -127  # max-abs element saturates by construction


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """int8 cosine ranking must track the float ranking closely: on the
    gate table, recall@3 vs cosine_topk >= 0.85 (8-bit error is ~1e-2
    relative, far below typical neighbor score gaps) and every returned
    score within 0.02 of the exact cosine for that pair."""
    import os

    from iot_elt_airflow_mongo_timescaledb_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.filter("vec_id < 5")
    exact_rows = cosine_topk(e, q, k=3).collect()
    quant_rows = quantized_cosine_topk(e, q, k=3).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    quant = {}
    for r in quant_rows:
        quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(len(exact[k] & quant.get(k, set())) for k in exact)
    total = sum(len(v) for v in exact.values())
    assert hit / total >= 0.85, f"quantized recall {hit}/{total}"
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in cosine_topk(e, q, k=10**6).collect()
    }
    for r in quant_rows:
        assert abs(r["score"] - exact_scores[(r["query_id"], r["neighbor_id"])]) < 0.02


def test_quantized_store_and_rank_roundtrip(spark, sf_dir, tmp_path):
    """The storage-tier loop: quantize the corpus, land the int8 codes
    as a warehouse table, read them back, and rank queries against the
    STORED codes — results identical to ranking computed in-flight
    (the whole point of the integer tier: storage round-trips are
    exact, unlike floats re-accumulated per plan)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from iot_elt_airflow_mongo_timescaledb_spark.operators.similarity import (
        int_dot,
        quantize_embeddings,
        quantized_cosine_topk,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    wh = Warehouse(spark, str(tmp_path))
    wh.materialize_upsert(
        "vectors.int8", quantize_embeddings(e, "vec_id").drop("rel_err"), "vec_id"
    )
    stored = wh.read("vectors.int8")

    qq = stored.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("__qq")
    )
    cq = stored.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("__cq"))
    num = int_dot(F.col("__cq"), F.col("__qq")).cast("double")
    den = F.sqrt(
        (int_dot(F.col("__cq"), F.col("__cq")) * int_dot(F.col("__qq"), F.col("__qq")))
        .cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    from_store = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(F.try_divide(num, den), 6).alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 3")
        .collect()
    )
    in_flight = quantized_cosine_topk(e, e.filter("vec_id < 5"), k=3).collect()
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rk"], r["neighbor_id"], r["score"]) for r in from_store]
    ) == sorted(
        [(r["query_id"], r["rk"], r["neighbor_id"], r["score"]) for r in in_flight]
    )
