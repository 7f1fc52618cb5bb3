"""Chaos pass on the warm-trigger measurement harness (round-8 verdict
task 7): the harness is load-bearing for every steady-state streaming
perf claim, so its guard paths and its slice arithmetic get pinned like
product code.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table
from iot_elt_airflow_mongo_timescaledb_spark.streaming.micro_batch import (
    _event_time_slice_conds,
    _warm_trigger_seconds,
    session_rollup_agg,
)


def _write_events(spark, path, rows):
    """Minimal events.parquet the registry's table() probe accepts."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(path, "events.parquet"))


@pytest.mark.parametrize("n_chunks", [2, 10])
def test_slices_exactly_partition_the_corpus(spark, sf_dir, n_chunks):
    """Warmup + timed slices must PARTITION events: no row lost at a
    (lo, hi] quantile boundary, no row fed twice (a lost row silently
    shrinks the measured trigger; a duplicate breaks dedup semantics)."""
    ev = table(spark, sf_dir, "events")
    total = ev.count()
    conds = _event_time_slice_conds(ev, n_chunks)
    assert len(conds) == n_chunks  # distinct quantiles at this scale
    counts = [ev.filter(c).count() for c in conds]
    assert sum(counts) == total  # coverage (disjoint by construction)
    assert all(c > 0 for c in counts)
    # disjointness, checked directly: rows matching >= 2 conditions
    flags = sum(F.when(c, 1).otherwise(0) for c in conds)
    assert ev.filter(flags >= 2).count() == 0


def test_empty_events_raise(spark, tmp_path):
    _write_events(spark, str(tmp_path), [])
    with pytest.raises(ValueError, match="empty"):
        _warm_trigger_seconds(
            spark, str(tmp_path), lambda reader: session_rollup_agg(reader())
        )


def test_uniform_ts_raises_instead_of_measuring_nothing(spark, tmp_path):
    """All-identical event times collapse every quantile: one surviving
    slice means there is no warm state to measure against — the harness
    must refuse, not time an empty (or cold) trigger."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, t, i % 5, "view", 1.0, "{}") for i in range(100)]
    _write_events(spark, str(tmp_path), rows)
    with pytest.raises(ValueError, match="uniform"):
        _warm_trigger_seconds(
            spark, str(tmp_path), lambda reader: session_rollup_agg(reader())
        )


def test_degenerate_two_chunk_split_measures(spark, tmp_path):
    """n_chunks=2 (one warmup slice + the timed half) is the smallest
    legal split — it must produce a real measurement, not an edge-case
    crash."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # 45-min spacing: every gap exceeds the 30-min session gap, so
        # each event is its own session and the watermark (1 h behind
        # max ts) CLOSES all but the tail — append mode emits rows
        (i, base + dt.timedelta(minutes=45 * i), i % 3, "view", 1.0, "{}")
        for i in range(200)
    ]
    _write_events(spark, str(tmp_path), rows)
    warm = _warm_trigger_seconds(
        spark,
        str(tmp_path),
        lambda reader: session_rollup_agg(reader()),
        n_chunks=2,
        state_partitions=2,
    )
    assert warm > 0


def test_duplicate_heavy_ts_skips_empty_slices(spark, tmp_path):
    """A ts distribution with heavy ties collapses some quantiles; the
    surviving slices must still measure (empty slices are dropped by
    ROW count, not file presence — a zero-row part file must not become
    a nothing-trigger)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # 180 rows piled on ONE timestamp + a 20-row spread tail
    rows = [(i, base, i % 3, "view", 1.0, "{}") for i in range(180)] + [
        # 50-min tail spacing: separate sessions, closed by the final
        # watermark, so the drain emits rows
        (1000 + i, base + dt.timedelta(minutes=50 * (i + 1)), i % 3, "view",
         1.0, "{}")
        for i in range(20)
    ]
    _write_events(spark, str(tmp_path), rows)
    warm = _warm_trigger_seconds(
        spark,
        str(tmp_path),
        lambda reader: session_rollup_agg(reader()),
        n_chunks=10,
        state_partitions=2,
    )
    assert warm > 0
