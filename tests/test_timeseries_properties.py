"""Property-based checks for the hypertable operators: LOCF, linear
interpolation, and time-weighted averages must agree with a brute-force
pure-Python reference on arbitrary generated series — coverage the
fixed-seed oracle data cannot give (runs of leading NULLs, all-NULL
series, single observations, adversarial gap placement)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
    interpolate_linear,
    locf,
    time_weighted_sums,
)

# one series: up to 12 hourly buckets, each observed (float) or a gap
_SERIES = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=12,
)


def _frame(spark, values):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", base + datetime.timedelta(hours=i), v)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "sid string, bucket timestamp, v double")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_SERIES)
def test_locf_matches_reference(spark, values):
    out = {
        r["bucket"]: r["f"]
        for r in locf(_frame(spark, values), "sid", "bucket", "v", "f").collect()
    }
    got = [out[datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)]
           for i in range(len(values))]
    ref, last = [], None
    for v in values:
        if v is not None:
            last = v
        ref.append(last)
    assert got == ref


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_SERIES)
def test_interpolate_matches_reference(spark, values):
    out = {
        r["bucket"]: r["f"]
        for r in interpolate_linear(
            _frame(spark, values), "sid", "bucket", "v", "f"
        ).collect()
    }
    got = [out[datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)]
           for i in range(len(values))]
    obs = [i for i, v in enumerate(values) if v is not None]
    for i, v in enumerate(values):
        if v is not None:
            assert got[i] == v
            continue
        prev = max((j for j in obs if j < i), default=None)
        nxt = min((j for j in obs if j > i), default=None)
        if prev is None or nxt is None:
            assert got[i] is None
        else:
            expect = values[prev] + (values[nxt] - values[prev]) * (
                (i - prev) / (nxt - prev)
            )
            assert got[i] is not None
            assert abs(got[i] - expect) <= 1e-9 * max(1.0, abs(expect))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=1,
        max_size=8,
    )
)
def test_time_weighted_avg_matches_reference(spark, values):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", base + datetime.timedelta(hours=i), i, v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "sid string, ts timestamp, id long, v double"
    )
    row = time_weighted_sums(df, ["sid"], "sid", "ts", "v", "id").collect()[0]
    if len(values) == 1:
        assert row["twa"] is None  # no interval to weight
    else:
        # equal hourly spacing: LOCF weights degenerate to the plain
        # mean of all but the last sample
        expect = sum(values[:-1]) / (len(values) - 1)
        assert abs(row["twa"] - expect) <= 1e-9 * max(1.0, abs(expect))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=1e3, allow_nan=False),
        min_size=1,
        max_size=10,
    )
)
def test_counter_increase_matches_reference(spark, values):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.timeseries import (
        counter_increase,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", base + datetime.timedelta(minutes=i), i, v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, id long, v double")
    row = counter_increase(df, ["u"], "u", "ts", "v", "id").collect()[0]
    inc, resets = 0.0, 0
    for prev, cur in zip(values, values[1:]):
        if cur >= prev:
            inc += cur - prev
        else:
            inc += cur
            resets += 1
    if len(values) == 1:
        assert row["total_increase"] is None and row["n_steps"] == 0
    else:
        # 0.011: both sides round to 2dp from float sums whose
        # accumulation order differs — a boundary value may flip one
        # rounding step
        assert abs(row["total_increase"] - round(inc, 2)) <= 0.011
        assert row["n_steps"] == len(values) - 1
    assert row["n_resets"] == resets


# ---------------------------------------------------------------------------
# Histogram quantile rollup (r7): property checks against a pure-Python
# reference — arbitrary values (clamping tails included), arbitrary
# batch splits, the semigroup law, and the one-bin-width bound.
# ---------------------------------------------------------------------------

_HIST_VALUES = st.lists(
    st.floats(min_value=-50.0, max_value=150.0, allow_nan=False,
              allow_infinity=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=_HIST_VALUES, split=st.integers(min_value=0, max_value=40))
def test_hist_sync_properties(spark, tmp_path_factory, values, split):
    """(1) merged-by-arbitrary-split == one-shot bin-for-bin; (2) the
    p50 readout lands within one bin width of the clamped ceil(p*n)-th
    order statistic, for any value mix including out-of-range tails."""
    import math

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalHistSync,
    )

    lo, hi, n_bins = 0.0, 100.0, 10
    width = (hi - lo) / n_bins
    split = min(split, len(values))

    def mk(root):
        return IncrementalHistSync(
            spark, str(root), "agg.h", ("g",), "v", lo, hi, n_bins
        )

    def frame(vs):
        return spark.createDataFrame([("a", v) for v in vs], "g string, v double")

    inc = mk(tmp_path_factory.mktemp("hp_inc"))
    for chunk in (values[:split], values[split:]):
        if chunk:
            inc.sync(frame(chunk))
    one = mk(tmp_path_factory.mktemp("hp_one"))
    one.sync(frame(values))
    got = inc.read().collect()[0]
    want = one.read().collect()[0]
    assert (got["n_values"], got["p50"], got["p99"]) == (
        want["n_values"], want["p50"], want["p99"],
    )
    assert got["n_values"] == len(values)  # clamped, never dropped
    # rank-based reference on CLAMPED values (estimator sees the clamp)
    clamped = sorted(min(max(v, lo), hi) for v in values)
    rank_val = clamped[max(math.ceil(0.5 * len(clamped)), 1) - 1]
    assert abs(got["p50"] - rank_val) <= width
