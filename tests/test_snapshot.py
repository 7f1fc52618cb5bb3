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
