"""pack_sequences: per-shard contiguous-fill invariants hold for both an
explicitly pinned shard count (the gated oracle's 64) and the
parallelism-derived default (operators/packing.py)."""

from __future__ import annotations

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.operators.packing import pack_sequences

_BUDGET = 100


def _docs(spark, n=500):
    # token lengths cycle 1..97 so bins fill at varying rates
    return spark.createDataFrame(
        [(i, 1 + (i * 31) % 97) for i in range(n)], "doc_id long, n_tok long"
    )


def _assert_packing(rows, n_shards, budget):
    assert {r["shard"] for r in rows} <= set(range(n_shards))
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        running = 0
        for r in members:  # id-ordered within the shard
            assert r["bin_idx"] == running // budget
            running += r["n_tokens"]


@pytest.mark.parametrize("n_shards", [64, None])
def test_pack_sequences_both_shard_counts(spark, n_shards):
    out = pack_sequences(
        _docs(spark), "doc_id", "n_tok", budget=_BUDGET, n_shards=n_shards
    )
    rows = out.collect()
    assert len(rows) == 500
    effective = (
        n_shards
        if n_shards is not None
        else 4 * spark.sparkContext.defaultParallelism
    )
    _assert_packing(rows, effective, _BUDGET)


def test_pinned_shards_reproducible_across_parallelism(spark):
    """An explicit n_shards yields an identical packing regardless of
    cluster size — shard and order are content-derived."""
    a = pack_sequences(_docs(spark), "doc_id", "n_tok", budget=_BUDGET, n_shards=64)
    b = pack_sequences(
        _docs(spark).repartition(3), "doc_id", "n_tok", budget=_BUDGET, n_shards=64
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


# ---------------------------------------------------------------------------
# curriculum_shard (r7)
# ---------------------------------------------------------------------------


def test_curriculum_shard_global_order_without_global_sort(spark):
    from pyspark.sql import Row

    from iot_elt_airflow_mongo_timescaledb_spark.operators.packing import (
        curriculum_shard,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, score=float((i * 37) % 100)) for i in range(200)]
    )
    cur = curriculum_shard(df, "doc_id", "score", n_shards=4)
    rows = cur.collect()
    assert len(rows) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    # cross-shard contiguity: max(shard k) <= min(shard k+1)
    shards = sorted(by_shard)
    for a, b in zip(shards, shards[1:]):
        assert max(r["score"] for r in by_shard[a]) <= min(
            r["score"] for r in by_shard[b]
        )
    # within-shard: pos order == (score, id) order
    for rs in by_shard.values():
        ordered = sorted(rs, key=lambda r: r["pos"])
        assert ordered == sorted(rs, key=lambda r: (r["score"], r["doc_id"]))
    # descending curriculum flips the cross-shard direction
    desc = curriculum_shard(df, "doc_id", "score", n_shards=4, ascending=False)
    d = {}
    for r in desc.collect():
        d.setdefault(r["shard"], []).append(r["score"])
    ds = sorted(d)
    for a, b in zip(ds, ds[1:]):
        assert min(d[a]) >= max(d[b])


def test_curriculum_shard_rejects_null_scores(spark):
    import pytest as _p
    from pyspark.sql import Row

    from iot_elt_airflow_mongo_timescaledb_spark.operators.packing import (
        curriculum_shard,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, score=1.0), Row(doc_id=2, score=None)]
    )
    with _p.raises(ValueError, match="NULL"):
        curriculum_shard(df, "doc_id", "score", n_shards=2)


def test_materialize_curriculum_shards_one_ordered_file_per_shard(spark, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import Row

    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )

    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [Row(doc_id=i, score=float(i % 50), text=f"t{i}") for i in range(100)]
    )
    wh.materialize_curriculum_shards(
        "train.cur", df, "doc_id", "score", n_shards=3
    )
    root = os.path.join(str(tmp_path), "train", "cur")
    shard_dirs = sorted(d for d in os.listdir(root) if d.startswith("shard="))
    assert 1 <= len(shard_dirs) <= 3
    total = 0
    for d in shard_dirs:
        files = glob.glob(os.path.join(root, d, "*.parquet"))
        assert len(files) == 1  # one file per shard
        t = pq.read_table(files[0]).to_pydict()
        total += len(t["pos"])
        assert t["pos"] == sorted(t["pos"])  # file rows in pos order
        assert t["score"] == sorted(t["score"])  # == curriculum order
    assert total == 100
