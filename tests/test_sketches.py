"""Mergeable HLL sketch rollups: the distinct-count maintenance tier
(`IncrementalDistinctSync`, `hll_rollup_distinct`).

Pins the properties the oracle hash cannot: union order-invariance,
merged-vs-direct near-equality, accuracy vs exact distinct, regrain
without double counting, and the exactly-once batch-id discipline
inherited from _RollupSyncBase."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
    IncrementalDistinctSync,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def _sync(spark, tmp_path, name="agg.hll", group=("event_type",)):
    return IncrementalDistinctSync(
        spark, str(tmp_path / "wh"), name, group, "user_id"
    )


def test_batched_sync_matches_one_shot(spark, sf_dir, tmp_path):
    e = _events(spark, sf_dir)
    batches = [
        e.filter(F.dayofmonth("ts") <= 10),
        e.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)),
        e.filter(F.dayofmonth("ts") > 20),
    ]
    inc = _sync(spark, tmp_path, "agg.inc")
    for b in batches:
        inc.sync(b)
    one = _sync(spark, tmp_path, "agg.one")
    one.sync(e)
    got = {r["event_type"]: r["distinct_est"] for r in inc.read().collect()}
    want = {r["event_type"]: r["distinct_est"] for r in one.read().collect()}
    # sketch union is register-wise max: merging three disjoint batches
    # must land on the same registers as one batch, estimates equal
    assert got == want


def test_sync_order_invariant(spark, sf_dir, tmp_path):
    e = _events(spark, sf_dir)
    b1 = e.filter(F.dayofmonth("ts") <= 15)
    b2 = e.filter(F.dayofmonth("ts") > 15)
    fwd = _sync(spark, tmp_path, "agg.fwd")
    fwd.sync(b1)
    fwd.sync(b2)
    rev = _sync(spark, tmp_path, "agg.rev")
    rev.sync(b2)
    rev.sync(b1)
    assert sorted(map(tuple, fwd.read().collect())) == sorted(
        map(tuple, rev.read().collect())
    )


def test_estimates_accurate_and_regrain_no_double_count(spark, sf_dir, tmp_path):
    e = _events(spark, sf_dir)
    inc = IncrementalDistinctSync(
        spark,
        str(tmp_path / "wh"),
        "agg.by_type_day",
        ("event_type", "day"),
        "user_id",
    )
    inc.sync(e.withColumn("day", F.date_format("ts", "yyyyMMdd")))
    # regrain: event_type-level distinct users from the stored
    # (event_type, day) sketches — no fact rescan
    regrained = {
        r["event_type"]: r["distinct_est"]
        for r in inc.estimate(["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(regrained[k] - n) <= max(1, 0.05 * n), (k, regrained[k], n)
        # a user active on many days must count once: the naive sum of
        # daily distincts would be many times the true cardinality
    daily_sum = (
        inc.read()
        .groupBy("event_type")
        .agg(F.sum("distinct_est").alias("s"))
        .collect()
    )
    assert all(r["s"] > 2 * exact[r["event_type"]] for r in daily_sum)


def test_replay_same_batch_id_is_noop(spark, sf_dir, tmp_path):
    e = _events(spark, sf_dir)
    inc = _sync(spark, tmp_path)
    inc.sync(e.limit(500), batch_id=0)
    before = sorted(map(tuple, inc.read().collect()))
    inc.sync(e.limit(500), batch_id=0)  # foreachBatch replay
    after = sorted(map(tuple, inc.read().collect()))
    assert before == after


def test_checkpoint_reset_raises(spark, sf_dir, tmp_path):
    e = _events(spark, sf_dir)
    inc = _sync(spark, tmp_path)
    inc.sync(e.limit(500), batch_id=5)
    with pytest.raises(ValueError, match="checkpoint was reset"):
        inc.sync(e.limit(500), batch_id=3)


def test_merged_vs_direct_sketch_near_equal(spark, sf_dir):
    """hll_rollup_distinct's documented bound: merging daily partials
    may differ from the direct whole-column sketch by mode-promotion
    noise, but stays within 1% of it."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyyMMdd").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("hll"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("est_m")
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "est_d"
        )
    )
    for r in merged.join(direct, "event_type").collect():
        assert abs(r["est_m"] - r["est_d"]) <= max(1, 0.01 * r["est_d"]), r
