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


# ---------------------------------------------------------------------------
# IncrementalHistSync — mergeable fixed-bin quantile rollup (r7)
# ---------------------------------------------------------------------------


def _hist_sync(spark, tmp_path, **kw):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalHistSync,
    )

    args = dict(
        table_name="agg.value_hist",
        group_cols=("event_type",),
        value_col="value",
        lo=0.0,
        hi=500.0,
        n_bins=50,
    )
    args.update(kw)
    return IncrementalHistSync(spark, str(tmp_path), **args)


def test_hist_sync_batches_equal_one_shot(spark, tmp_path, sf_dir):
    """Histogram addition is an exact semigroup: syncing three disjoint
    batches yields bin-for-bin the same stored state as histogramming
    everything at once."""
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table

    e = table(spark, sf_dir, "events").select("event_type", "value", "user_id")
    inc = _hist_sync(spark, tmp_path / "inc")
    for k in range(3):
        inc.sync(e.filter(F.col("user_id") % 3 == k))
    oneshot = _hist_sync(spark, tmp_path / "one")
    oneshot.sync(e)
    a = {r["event_type"]: r for r in inc.read().collect()}
    b = {r["event_type"]: r for r in oneshot.read().collect()}
    assert set(a) == set(b) and a  # non-vacuous
    for k in a:
        assert a[k]["n_values"] == b[k]["n_values"]
        assert a[k]["p50"] == b[k]["p50"]
        assert a[k]["p99"] == b[k]["p99"]


def test_hist_sync_quantiles_within_bin_width(spark, tmp_path, sf_dir):
    """Estimate contract: within one bin width of the ceil(p*n)-th
    ORDER STATISTIC (rank-based quantile).  Interpolating percentile()
    is deliberately NOT the yardstick — between two order statistics in
    a sparse tail the interpolated value can sit arbitrarily far from
    either, while the histogram always lands in the bin holding the
    rank-based one."""
    import math

    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table

    e = table(spark, sf_dir, "events").select("event_type", "value")
    lo, hi, n_bins = 0.0, 500.0, 50
    width = (hi - lo) / n_bins
    inside = e.filter((F.col("value") >= lo) & (F.col("value") <= hi))
    sync = _hist_sync(spark, tmp_path, lo=lo, hi=hi, n_bins=n_bins)
    sync.sync(inside)
    est = {r["event_type"]: r for r in sync.read().collect()}
    sorted_vals = {
        r["event_type"]: r["vs"]
        for r in inside.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vs"))
        .collect()
    }
    for k, vs in sorted_vals.items():
        for p, col in ((0.5, "p50"), (0.99, "p99")):
            rank_val = vs[max(math.ceil(p * len(vs)), 1) - 1]
            assert abs(est[k][col] - rank_val) <= width, (k, col)


def test_hist_sync_replay_and_regrain(spark, tmp_path, sf_dir):
    """Batch-id replay is a no-op; stored (event_type, day) histograms
    re-merge to event_type grain exactly (element-wise sums never
    double-count)."""
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table

    e = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_format("ts", "yyyyMMdd").alias("day"),
            "value",
        )
    )
    sync = _hist_sync(
        spark, tmp_path, group_cols=("event_type", "day")
    )
    sync.sync(e, batch_id=1)
    before = {
        (r["event_type"], r["day"]): r["n_values"]
        for r in sync.read().collect()
    }
    sync.sync(e, batch_id=1)  # replay: identical id -> skipped
    after = {
        (r["event_type"], r["day"]): r["n_values"]
        for r in sync.read().collect()
    }
    assert after == before
    # regrain to event_type == histogramming the facts at that grain
    coarse = {
        r["event_type"]: (r["n_values"], r["p90"])
        for r in sync.estimate(["event_type"], ps=(0.9,)).collect()
    }
    direct = _hist_sync(spark, tmp_path / "direct")
    direct.sync(e)
    want = {
        r["event_type"]: (r["n_values"], r["p90"])
        for r in direct.read().collect()
    }
    assert coarse == want


def test_hist_sync_rejects_bad_range(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hi > lo"):
        _hist_sync(spark, tmp_path, lo=5.0, hi=5.0)


# -- round-8: heavy-hitters (top-k) rollup ----------------------------------


def _topk(spark, tmp_path, sub, **kw):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalTopKSync,
    )

    return IncrementalTopKSync(
        spark, str(tmp_path / sub), "agg.topk", ("g",), "item", **kw
    )


def test_topk_exact_within_cap(spark, tmp_path):
    """While a group's distinct-item count stays within the cap, the
    maintained top-k equals the exact one-shot computation — merged by
    batches or not (the regime the other sketch members guarantee
    everywhere; here it is cap-bounded and pinned)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(8)
    rows = [
        (f"g{i % 3}", f"item{rng.randint(0, 19)}") for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, item string")
    one = _topk(spark, tmp_path, "one", k=5, cap=32)
    one.sync(df)
    split = _topk(spark, tmp_path, "split", k=5, cap=32)
    # three disjoint batches in a different order than the data
    parts = df.randomSplit([1.0, 1.0, 1.0], seed=3)
    for p in (parts[2], parts[0], parts[1]):
        split.sync(p)

    def as_rows(s):
        return sorted(
            (r["g"], r["rank"], r["item"], r["est_count"])
            for r in s.read().collect()
        )

    got = as_rows(split)
    assert got == as_rows(one)
    # exact ground truth via a plain window query
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("n"), F.asc("item"))
    exact = (
        df.groupBy("g", "item").agg(F.count("*").alias("n"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    want = sorted(
        (r["g"], r["rank"], r["item"], r["n"]) for r in exact.collect()
    )
    assert got == want


def test_topk_heavy_hitters_survive_cap_pressure(spark, tmp_path):
    """Beyond the cap light items may undercount, but heavy hitters
    with real margin must stay on top: 4 hot items against a long tail
    of one-off items across many batches."""
    tk = _topk(spark, tmp_path, "skew", k=4, cap=16)
    hot = {"h1": 400, "h2": 300, "h3": 200, "h4": 100}
    for b in range(5):
        rows = [("g", h) for h, n in hot.items() for _ in range(n // 5)]
        rows += [("g", f"tail{b}_{i}") for i in range(40)]  # churn tail
        tk.sync(spark.createDataFrame(rows, "g string, item string"))
    got = [
        (r["item"], r["est_count"])
        for r in sorted(tk.read().collect(), key=lambda r: r["rank"])
    ]
    assert [g[0] for g in got] == ["h1", "h2", "h3", "h4"]
    for (item, est) in got:
        assert est == hot[item]  # hot items never truncated -> exact
    # cap pressure is visible on the read surface
    assert all(r["n_tracked"] == 16 for r in tk.read().collect())


def test_topk_replay_same_batch_id_is_noop(spark, tmp_path):
    tk = _topk(spark, tmp_path, "replay", k=2, cap=8)
    df = spark.createDataFrame(
        [("g", "x")] * 3 + [("g", "y")], "g string, item string"
    )
    tk.sync(df, batch_id=1)
    tk.sync(df, batch_id=1)  # replay: must not double-count
    rows = {r["item"]: r["est_count"] for r in tk.read().collect()}
    assert rows == {"x": 3, "y": 1}


def test_topk_validates_params(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        _topk(spark, tmp_path, "bad1", k=0)
    with pytest.raises(ValueError, match="cap"):
        _topk(spark, tmp_path, "bad2", k=10, cap=5)


def test_streaming_topk_sync_twin(spark, tmp_path):
    """The foreachBatch twin: two fact files drained in two runs, state
    equal to the batch class over the union."""
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingTopKSync,
    )

    src = tmp_path / "facts"
    df1 = spark.createDataFrame(
        [("g", "x")] * 4 + [("g", "y")] * 2, "g string, item string"
    )
    df2 = spark.createDataFrame(
        [("g", "y")] * 3 + [("g", "z")], "g string, item string"
    )
    df1.coalesce(1).write.mode("append").parquet(str(src))
    sync = StreamingTopKSync(
        spark, str(tmp_path / "wh"), str(src), "agg.stk", ("g",), "item",
        k=2, cap=8,
    )
    sync.run_once()
    df2.coalesce(1).write.mode("append").parquet(str(src))
    sync.run_once()
    rows = {
        r["rank"]: (r["item"], r["est_count"]) for r in sync.read().collect()
    }
    assert rows == {1: ("y", 5), 2: ("x", 4)}


def test_sync_from_change_feed(spark, tmp_path):
    """Storage + rollup joined: the rollup maintained from the commit
    log's change feed equals the recompute after every append, the
    manifest version doubles as the exactly-once batch id, and a
    pre-feed compaction does not disturb the delta."""
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalAggSync,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path / "src"), auto_compact_dirs=None
    )
    agg = IncrementalAggSync(
        spark, str(tmp_path / "roll"), "agg.r", ("g",), ("v",)
    )

    def batch(rows):
        return spark.createDataFrame(rows, "g string, v long")

    def check():
        want = {
            (r["g"], r["sum_v"])
            for r in fmt.read("f.t").groupBy("g")
            .agg(F.sum("v").alias("sum_v")).collect()
        }
        got = {(r["g"], r["sum_v"]) for r in agg.read().collect()}
        assert got == want

    fmt.write("f.t", batch([("a", 1), ("b", 2)]), "overwrite")  # v1
    agg.sync_from_changes(fmt, "f.t")  # bootstrap
    check()
    fmt.write("f.t", batch([("a", 10)]), "append")  # v2
    fmt.write("f.t", batch([("c", 5)]), "append")  # v3
    agg.sync_from_changes(fmt, "f.t")  # two versions in one delta
    check()
    # idempotent when nothing new committed (and on a crash-retry the
    # same (applied, cur) pair re-reads the identical delta)
    agg.sync_from_changes(fmt, "f.t")
    check()
    # compaction of already-synced content is invisible to the feed
    fmt.auto_compact_dirs = 1
    assert fmt.maybe_compact("f.t") == 3  # v4: provenance-only change
    fmt.write("f.t", batch([("b", 7)]), "append")  # v5
    agg.sync_from_changes(fmt, "f.t")
    check()
    # a history rewrite cannot be absorbed additively: loud refusal
    fmt.replace_atomic("f.t", batch([("z", 1)]))
    import pytest

    with pytest.raises(ValueError, match="rewritten"):
        agg.sync_from_changes(fmt, "f.t")


def test_topk_retention_margin_property(spark, tmp_path):
    """Property pin for the beyond-cap regime (VERDICT r8 task 5).

    Reference model: the maintained map IS `truncate(merge(truncate(
    batch_counts)))` with (count desc, item asc) order — so the Spark
    pipeline must match a pure-Python replay EXACTLY for any batch
    order.  And the retention margin is provable from the model: an
    item forfeits accumulated mass only when a truncation drops it,
    and at that moment its count is <= the boundary (the cap-th
    retained count), so

        est_count >= true_count - B,   B = sum of boundaries over all
                                           truncation events

    hence every item with true_count > B survives to the final map.
    Three adversarial batch orders over a skewed corpus check both
    facts; the class docstring states the bound from this test."""
    import random
    from collections import Counter

    CAP, K = 12, 4

    def trunc(d, boundaries):
        items = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(items) > CAP:
            boundaries.append(items[CAP - 1][1])
        return dict(items[:CAP])

    def model(batches):
        boundaries = []
        state = None
        for rows in batches:
            part = trunc(Counter(rows), boundaries)
            if state is None:
                state = part
            else:
                merged = dict(state)
                for it, n in part.items():
                    merged[it] = merged.get(it, 0) + n
                state = trunc(merged, boundaries)
        return state, sum(boundaries)

    rng = random.Random(99)
    # skewed corpus: 5 hot items + churning tail
    corpus = []
    for i, n in enumerate((300, 200, 120, 80, 50)):
        corpus += [f"hot{i}"] * n
    corpus += [f"tail{j}" for j in range(150)]
    true = Counter(corpus)

    step = -(-len(corpus) // 4)  # ceil: batches must COVER the corpus
    orders = []
    shuffled = corpus[:]
    rng.shuffle(shuffled)
    orders.append([shuffled[i::4] for i in range(4)])  # interleaved
    tail_first = sorted(corpus, key=lambda s: not s.startswith("tail"))
    orders.append([tail_first[i * step : (i + 1) * step] for i in range(4)])
    hot_first = sorted(corpus, key=lambda s: s.startswith("tail"))
    orders.append([hot_first[i * step : (i + 1) * step] for i in range(4)])

    for oi, batches in enumerate(orders):
        batches = [b for b in batches if b]
        want_state, B = model(batches)
        tk = _topk(spark, tmp_path, f"prop{oi}", k=K, cap=CAP)
        for rows in batches:
            tk.sync(
                spark.createDataFrame([("g", it) for it in rows],
                                      "g string, item string")
            )
        got = [
            (r["item"], r["est_count"])
            for r in sorted(tk.read().collect(), key=lambda r: r["rank"])
        ]
        # 1) exact model replay (merged maps identical => same top-k)
        want_topk = sorted(
            want_state.items(), key=lambda kv: (-kv[1], kv[0])
        )[:K]
        assert got == want_topk, (oi, got, want_topk)
        # 2) retention margin: every item with true > B is tracked with
        #    undercount <= B (checked on the model state the pipeline
        #    just reproduced)
        survivors = {it for it, n in true.items() if n > B}
        assert survivors, f"order {oi}: margin B={B} degenerate"
        for it in survivors:
            assert it in want_state, (oi, it, B)
            assert true[it] - want_state[it] <= B
