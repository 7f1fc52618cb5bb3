"""SCD Type-2 snapshots (Warehouse.materialize_snapshot) — the dbt
snapshot materialization: version history per key with
valid_from/valid_to intervals, change detection by NULL-safe row
fingerprint, deterministic under re-runs."""

from __future__ import annotations

from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse


def _wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _rows(df):
    return {
        (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in df.collect()
    }


def test_snapshot_lifecycle(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    t1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    out = wh.materialize_snapshot("snap.t", t1, "k", "T1")
    assert _rows(out) == {("a", 1, "T1", None), ("b", 2, "T1", None)}

    # a changes, b unchanged, c new
    t2 = spark.createDataFrame(
        [("a", 10), ("b", 2), ("c", 3)], "k string, v long"
    )
    out = wh.materialize_snapshot("snap.t", t2, "k", "T2")
    assert _rows(out) == {
        ("a", 1, "T1", "T2"),   # closed old version
        ("a", 10, "T2", None),  # new current version
        ("b", 2, "T1", None),   # untouched (same values)
        ("c", 3, "T2", None),   # new key
    }

    # a key absent from the batch stays open (dbt default), and an
    # unchanged re-delivered key gains no version
    t3 = spark.createDataFrame([("a", 10)], "k string, v long")
    out = wh.materialize_snapshot("snap.t", t3, "k", "T3")
    assert _rows(out) == {
        ("a", 1, "T1", "T2"),
        ("a", 10, "T2", None),  # re-delivered unchanged: still T2-open
        ("b", 2, "T1", None),   # absent: stays open
        ("c", 3, "T2", None),   # absent: stays open
    }


def test_snapshot_rerun_same_batch_is_noop(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    t = spark.createDataFrame([("a", 1), ("b", None)], "k string, v long")
    wh.materialize_snapshot("snap.t", t, "k", "T1")
    before = _rows(wh.read("snap.t"))
    wh.materialize_snapshot("snap.t", t, "k", "T2")  # identical values
    assert _rows(wh.read("snap.t")) == before  # no version churn


def test_snapshot_null_transitions_are_changes(spark, tmp_path):
    """NULL -> value and value -> NULL are real changes (the NULL-safe
    fingerprint), not silently-equal rows."""
    wh = _wh(spark, tmp_path)
    wh.materialize_snapshot(
        "snap.t",
        spark.createDataFrame([("a", None)], "k string, v long"),
        "k",
        "T1",
    )
    out = wh.materialize_snapshot(
        "snap.t",
        spark.createDataFrame([("a", 5)], "k string, v long"),
        "k",
        "T2",
    )
    assert _rows(out) == {("a", None, "T1", "T2"), ("a", 5, "T2", None)}


def test_snapshot_three_version_chain(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    for i, ts in enumerate(["T1", "T2", "T3"], start=1):
        wh.materialize_snapshot(
            "snap.t",
            spark.createDataFrame([("a", i)], "k string, v long"),
            "k",
            ts,
        )
    assert _rows(wh.read("snap.t")) == {
        ("a", 1, "T1", "T2"),
        ("a", 2, "T2", "T3"),
        ("a", 3, "T3", None),
    }


def test_snapshot_schema_evolution_new_column(spark, tmp_path):
    """A batch that grows a column: the new column's arrival is a
    change (dbt check-all) — old versions close, new versions open
    carrying the column; history rows read back with NULL there."""
    wh = _wh(spark, tmp_path)
    wh.materialize_snapshot(
        "snap.t",
        spark.createDataFrame([("a", 1)], "k string, v long"),
        "k",
        "T1",
    )
    out = wh.materialize_snapshot(
        "snap.t",
        spark.createDataFrame([("a", 1, "x")], "k string, v long, extra string"),
        "k",
        "T2",
    )
    rows = {
        (r["k"], r["v"], r["extra"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        ("a", 1, None, "T1", "T2"),  # old version closed, extra=NULL
        ("a", 1, "x", "T2", None),   # new version carries the column
    }
    # and a re-delivery of the SAME widened row is then a no-op
    before = rows
    out2 = wh.materialize_snapshot(
        "snap.t",
        spark.createDataFrame([("a", 1, "x")], "k string, v long, extra string"),
        "k",
        "T3",
    )
    assert {
        (r["k"], r["v"], r["extra"], r["valid_from"], r["valid_to"])
        for r in out2.collect()
    } == before


def test_read_asof_point_in_time(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    for i, ts in enumerate(["T1", "T2", "T3"], start=1):
        wh.materialize_snapshot(
            "snap.t",
            spark.createDataFrame([("a", i), ("b", 0)], "k string, v long"),
            "k",
            ts,
        )
    # b never changes; a has three versions
    def at(ts):
        return {(r["k"], r["v"]) for r in wh.read_asof("snap.t", ts).collect()}

    assert at("T1") == {("a", 1), ("b", 0)}
    assert at("T2") == {("a", 2), ("b", 0)}
    assert at("T3") == {("a", 3), ("b", 0)}
    assert at("T9") == {("a", 3), ("b", 0)}  # open versions persist
    assert at("T0") == set()  # before history began


def test_snapshot_rejects_duplicate_batch_keys(spark, tmp_path):
    import pytest

    wh = _wh(spark, tmp_path)
    dup = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    with pytest.raises(ValueError, match="duplicate"):
        wh.materialize_snapshot("snap.t", dup, "k", "T1")


def test_snapshot_rejects_time_travel_backwards(spark, tmp_path):
    import pytest

    wh = _wh(spark, tmp_path)
    t = spark.createDataFrame([("a", 1)], "k string, v long")
    wh.materialize_snapshot("snap.t", t, "k", "T5")
    with pytest.raises(ValueError, match="precedes"):
        wh.materialize_snapshot(
            "snap.t",
            spark.createDataFrame([("a", 2)], "k string, v long"),
            "k",
            "T3",
        )


def test_snapshot_random_batch_sequences_match_reference(spark, tmp_path):
    """Property: any sequence of batches produces exactly the interval
    table a pure-Python SCD-2 simulator predicts — covering branch
    interactions (change-then-revert, absent-then-return, NULL flips)
    the hand-written cases cannot enumerate."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = ["a", "b", "c"]
    # one batch: per key, either absent or carrying a small value/NULL
    batch_st = st.dictionaries(
        st.sampled_from(keys),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        max_size=3,
    )
    counter = itertools.count()

    @settings(
        max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(batches=st.lists(batch_st, min_size=1, max_size=4))
    def run(batches):
        name = f"snap.prop_{next(counter)}"
        wh = _wh(spark, tmp_path)
        # reference simulator: history list + open dict
        hist: list = []
        open_rows: dict = {}
        for i, b in enumerate(batches):
            ts = f"T{i + 1}"
            rows = [(k, v) for k, v in sorted(b.items())]
            if not rows:
                continue  # empty frame has no schema; skip like a no-op run
            df = spark.createDataFrame(rows, "k string, v long")
            wh.materialize_snapshot(name, df, "k", ts)
            for k, v in rows:
                if k not in open_rows:
                    open_rows[k] = (v, ts)
                elif open_rows[k][0] != v:
                    ov, ofrom = open_rows.pop(k)
                    hist.append((k, ov, ofrom, ts))
                    open_rows[k] = (v, ts)
        if not wh.exists(name):
            return
        expect = set(hist) | {
            (k, v, ts, None) for k, (v, ts) in open_rows.items()
        }
        got = _rows(wh.read(name))
        assert got == expect, (batches, got, expect)

    run()
