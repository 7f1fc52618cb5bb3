"""Hypertable analytics (operators/timeseries.py) — edge semantics the
oracle-parity hash cannot see: LOCF leading gaps, exact interpolation
values, first/last tie determinism, histogram clamping, zero-width
rate intervals, single-sample time weights, and the LTTB contract
(spike retention, endpoints, subset/monotonicity, identity,
determinism under repartitioning)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
    bucket_gapfill,
    counter_rate,
    first_last_by,
    histogram_fixed,
    interpolate_linear,
    locf,
    lttb_downsample,
    time_weighted_sums,
)


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


def _series(spark, rows):
    return spark.createDataFrame(rows, "sid string, bucket timestamp, v double")


def test_gapfill_generates_dense_grid_with_nulls(spark):
    sparse = _series(
        spark, [("a", _ts(0), 1.0), ("a", _ts(3), 4.0), ("b", _ts(1), 9.0)]
    )
    bounds = spark.createDataFrame(
        [(_ts(0), _ts(3))], "lo timestamp, hi timestamp"
    )
    out = bucket_gapfill(sparse, "sid", "bucket", bounds).collect()
    assert len(out) == 8  # 2 series x 4 hourly buckets
    by_key = {(r["sid"], r["bucket"].hour): r["v"] for r in out}
    assert by_key[("a", 0)] == 1.0 and by_key[("a", 3)] == 4.0
    assert by_key[("a", 1)] is None and by_key[("a", 2)] is None
    assert by_key[("b", 1)] == 9.0 and by_key[("b", 0)] is None


def test_locf_carries_forward_but_not_backward(spark):
    filled = _series(
        spark,
        [
            ("a", _ts(0), None),  # leading gap: stays NULL
            ("a", _ts(1), 5.0),
            ("a", _ts(2), None),  # carried: 5.0
            ("a", _ts(3), None),  # carried: 5.0
            ("b", _ts(0), 2.0),
            ("b", _ts(1), None),  # carried within b only: 2.0
        ],
    )
    out = {
        (r["sid"], r["bucket"].hour): r["f"]
        for r in locf(filled, "sid", "bucket", "v", "f").collect()
    }
    assert out[("a", 0)] is None
    assert out[("a", 2)] == 5.0 and out[("a", 3)] == 5.0
    assert out[("b", 1)] == 2.0


def test_interpolate_exact_midpoints_and_edges(spark):
    filled = _series(
        spark,
        [
            ("a", _ts(0), None),  # before first obs: NULL
            ("a", _ts(1), 10.0),
            ("a", _ts(2), None),  # 1/3 of the way 10 -> 40
            ("a", _ts(3), None),  # 2/3 of the way
            ("a", _ts(4), 40.0),
            ("a", _ts(5), None),  # after last obs: NULL
        ],
    )
    out = {
        r["bucket"].hour: r["f"]
        for r in interpolate_linear(filled, "sid", "bucket", "v", "f").collect()
    }
    assert out[0] is None and out[5] is None
    assert out[1] == 10.0 and out[4] == 40.0
    assert abs(out[2] - 20.0) < 1e-12
    assert abs(out[3] - 30.0) < 1e-12


def test_first_last_tiebreak_is_deterministic(spark):
    # two rows share the minimal ts: the tiebreak column decides
    df = spark.createDataFrame(
        [
            ("g", _ts(1), 1, 111.0),
            ("g", _ts(1), 0, 222.0),
            ("g", _ts(2), 2, 333.0),
        ],
        "g string, ts timestamp, id long, v double",
    )
    row = first_last_by(df, ["g"], "v", ["ts", "id"]).collect()[0]
    assert row["first_value"] == 222.0  # (ts(1), id=0) wins the tie
    assert row["last_value"] == 333.0


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [("t", -5.0), ("t", 0.0), ("t", 99.9), ("t", 100.0), ("t", 250.0)],
        "g string, v double",
    )
    out = {
        r["bucket"]: r["n"]
        for r in histogram_fixed(df, "v", ["g"], 10, 0.0, 100.0).collect()
    }
    # below-range -> bucket 0; at/above hi -> clamped to n-1
    assert out[0] == 2  # -5.0 and 0.0
    assert out[9] == 3  # 99.9 (last bucket), 100.0 and 250.0 (clamped)


def test_counter_rate_zero_width_interval_is_null(spark):
    df = spark.createDataFrame(
        [
            ("u", _ts(0), 0, 10.0),
            ("u", _ts(0), 1, 99.0),  # same timestamp: dt == 0 -> NULL
            ("u", _ts(0, 0, 10), 2, 30.0),
        ],
        "u string, ts timestamp, id long, v double",
    )
    rates = [
        r["rate_per_s"]
        for r in counter_rate(df, "u", "ts", "v", "id")
        .orderBy("ts", "id")
        .collect()
    ]
    assert rates[0] is None  # first sample
    assert rates[1] is None  # zero-width interval
    assert abs(rates[2] - (30.0 - 99.0) / 10.0) < 1e-12


def test_time_weighted_avg_weights_by_interval(spark):
    # v=10 held for 30s, v=70 held for 10s, final sample unweighted
    df = spark.createDataFrame(
        [
            ("u", _ts(0, 0, 0), 0, 10.0),
            ("u", _ts(0, 0, 30), 1, 70.0),
            ("u", _ts(0, 0, 40), 2, 999.0),
            ("single", _ts(0), 0, 5.0),  # lone sample: no interval -> NULL
        ],
        "u string, ts timestamp, id long, v double",
    )
    out = {
        r["u"]: r["twa"]
        for r in time_weighted_sums(
            df, ["u"], "u", "ts", "v", "id"
        ).collect()
    }
    assert abs(out["u"] - (10.0 * 30 + 70.0 * 10) / 40) < 1e-9
    assert out["single"] is None


# ---------------------------------------------------------------------------
# LTTB contract
# ---------------------------------------------------------------------------


def _events(spark, sf_dir):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table

    return table(spark, sf_dir, "events")


def test_lttb_contract_on_events(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    n_out = 12
    out = lttb_downsample(e, "user_id", "ts", "value", n_out)
    rows = out.collect()
    src = {
        u: sorted(
            (r["ts"], r["value"])
            for r in e.filter(F.col("user_id") == u).collect()
        )
        for u in {r["user_id"] for r in rows}
    }
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    for u, pts in by_user.items():
        pts.sort()
        full = src[u]
        if len(full) <= n_out:
            assert pts == full  # identity for short series
            continue
        assert len(pts) == n_out
        assert pts[0] == full[0] and pts[-1] == full[-1]  # endpoints kept
        assert set(pts) <= set(full)  # subset of input
        ts_list = [p[0] for p in pts]
        assert ts_list == sorted(ts_list)


def test_lttb_deterministic_under_repartition(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    a = sorted(map(tuple, lttb_downsample(e, "user_id", "ts", "value", 10).collect()))
    b = sorted(
        map(
            tuple,
            lttb_downsample(
                e.repartition(13), "user_id", "ts", "value", 10
            ).collect(),
        )
    )
    assert a == b


def test_lttb_keeps_spikes(spark):
    # flat series with two huge spikes: LTTB's whole point is that the
    # spikes survive any downsampling that keeps their buckets
    rows = []
    for i in range(200):
        v = 1.0
        if i == 67:
            v = 500.0
        if i == 151:
            v = -400.0
        rows.append(("s", datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), v))
    df = spark.createDataFrame(rows, "sid string, ts timestamp, value double")
    out = lttb_downsample(df, "sid", "ts", "value", 20).collect()
    vals = {r["value"] for r in out}
    assert 500.0 in vals and -400.0 in vals
    assert len(out) == 20


def test_histogram_rejects_degenerate_bounds(spark):
    import pytest

    df = spark.createDataFrame([("t", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_fixed(df, "v", ["g"], 10, 5.0, 5.0)
    with pytest.raises(ValueError, match=">= 1 bucket"):
        histogram_fixed(df, "v", ["g"], 0, 0.0, 1.0)


def test_counter_increase_reset_semantics(spark):
    # counter: 10 -> 25 (+15), reset to 3 (counts 3), -> 10 (+7)
    df = spark.createDataFrame(
        [
            ("c", _ts(0), 0, 10.0),
            ("c", _ts(1), 1, 25.0),
            ("c", _ts(2), 2, 3.0),   # reset
            ("c", _ts(3), 3, 10.0),
        ],
        "u string, ts timestamp, id long, v double",
    )
    from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
        counter_increase,
    )

    row = counter_increase(df, ["u"], "u", "ts", "v", "id").collect()[0]
    assert row["total_increase"] == 15.0 + 3.0 + 7.0
    assert row["n_steps"] == 3  # first sample contributes nothing
    assert row["n_resets"] == 1


def test_hourly_profile_zero_fills_missing_hours(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
        hourly_profile,
    )

    df = spark.createDataFrame(
        [("s", _ts(3), 6.0), ("s", _ts(3, 30), 10.0), ("s", _ts(20), 2.0)],
        "sid string, ts timestamp, value double",
    )
    prof = hourly_profile(df, "sid", "ts", "value").collect()[0]["profile"]
    assert len(prof) == 24
    assert prof[3] == 8.0   # mean of the two hour-3 samples
    assert prof[20] == 2.0
    assert all(prof[h] == 0.0 for h in range(24) if h not in (3, 20))


def test_series_similarity_deterministic_and_self_excluded(spark, sf_dir):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
        series_similarity_topk,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table

    e = table(spark, sf_dir, "events")
    a = sorted(map(tuple, series_similarity_topk(
        e, "user_id", "ts", "value", F.col("user_id") < 3, k=3
    ).collect()))
    b = sorted(map(tuple, series_similarity_topk(
        e.repartition(11), "user_id", "ts", "value", F.col("user_id") < 3, k=3
    ).collect()))
    assert a == b  # bit-deterministic under repartitioning
    assert all(r[0] != r[1] for r in a)  # never its own neighbour
    assert {r[3] for r in a} <= {1, 2, 3}  # rk within k
