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
