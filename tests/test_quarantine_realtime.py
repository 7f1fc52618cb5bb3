"""Dead-letter routing (quarantine_split) and real-time continuous
aggregates (read_realtime) — the contract-enforcement and
fresh-between-refreshes surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.quality_checks import (
    quarantine_split,
    tag_violations,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
    IncrementalAggSync,
    IncrementalDistinctSync,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import table


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 500.0, "a"),   # fails range rule
            (3, 20.0, None),   # NULL category: un-evaluatable -> quarantined
            (4, 900.0, "zz"),  # fails BOTH rules
        ],
        "id long, v double, cat string",
    )


def _rules():
    return {
        "v_in_range": F.col("v") <= 400,
        "known_cat": F.col("cat").isin("a", "b"),
    }


def test_tag_violations_reasons_and_null_semantics(spark):
    tagged = {
        r["id"]: list(r["__violations"])
        for r in tag_violations(_df(spark), _rules()).collect()
    }
    assert tagged[1] == []
    assert tagged[2] == ["v_in_range"]
    assert tagged[3] == ["known_cat"]  # NULL rule result counts as violation
    assert tagged[4] == ["v_in_range", "known_cat"]  # rule order preserved


def test_quarantine_split_partitions_input(spark):
    df = _df(spark)
    good, bad = quarantine_split(df, _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3, 4]
    assert "__violations" not in good.columns
    assert "__violations" in bad.columns
    assert good.count() + bad.count() == df.count()


def test_quarantine_deadletter_roundtrip(spark, tmp_path):
    """bad rows land in a quarantine table via the ordinary incremental
    path and read back with their reasons intact."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )

    wh = Warehouse(spark, str(tmp_path))
    _, bad = quarantine_split(_df(spark), _rules())
    wh.materialize_incremental("quarantine.events", bad)
    back = wh.read("quarantine.events")
    assert back.count() == 3
    reasons = {
        r["id"]: list(r["__violations"]) for r in back.collect()
    }
    assert reasons[4] == ["v_in_range", "known_cat"]


def test_agg_read_realtime_equals_sync_then_read(spark, sf_dir, tmp_path):
    e = table(spark, sf_dir, "events")
    head = e.filter(F.dayofmonth("ts") <= 15)
    tail = e.filter(F.dayofmonth("ts") > 15)
    a = IncrementalAggSync(
        spark, str(tmp_path / "a"), "agg.rt", ("event_type",), ("value",)
    )
    a.sync(head)
    rt = sorted(map(tuple, a.read_realtime(tail).collect()))
    b = IncrementalAggSync(
        spark, str(tmp_path / "b"), "agg.rt", ("event_type",), ("value",)
    )
    b.sync(head)
    b.sync(tail)
    assert rt == sorted(map(tuple, b.read().collect()))
    # and the real-time read wrote nothing: a's stored rollup still
    # matches a head-only sync
    head_only = IncrementalAggSync(
        spark, str(tmp_path / "c"), "agg.rt", ("event_type",), ("value",)
    )
    head_only.sync(head)
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, head_only.read().collect())
    )


def test_agg_read_realtime_tail_only_and_stored_only_groups(spark, tmp_path):
    facts1 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0)], "g string, v double"
    )
    facts2 = spark.createDataFrame([("b", 10.0)], "g string, v double")
    s = IncrementalAggSync(spark, str(tmp_path), "agg.g", ("g",), ("v",))
    s.sync(facts1)
    out = {r["g"]: (r["sum_v"], r["n_rows"]) for r in s.read_realtime(facts2).collect()}
    # stored-only group 'a' passes through; tail-only group 'b' appears
    assert out == {"a": (4.0, 2), "b": (10.0, 1)}


def test_distinct_read_realtime_equals_sync_then_read(spark, sf_dir, tmp_path):
    e = table(spark, sf_dir, "events")
    head = e.filter(F.dayofmonth("ts") <= 15)
    tail = e.filter(F.dayofmonth("ts") > 15)
    a = IncrementalDistinctSync(
        spark, str(tmp_path / "a"), "agg.hll", ("event_type",), "user_id"
    )
    a.sync(head)
    rt = sorted(map(tuple, a.read_realtime(tail).collect()))
    b = IncrementalDistinctSync(
        spark, str(tmp_path / "b"), "agg.hll", ("event_type",), "user_id"
    )
    b.sync(head)
    b.sync(tail)
    assert rt == sorted(map(tuple, b.read().collect()))


def test_read_realtime_auto_from_materialized_watermark(spark, sf_dir, tmp_path):
    """watermark_col tracking: sync records the max event time inside
    the same atomic swap; read_realtime_auto derives the tail from it
    (strict >) — handing it the FULL fact table double-counts nothing
    and equals sync-then-read."""
    e = table(spark, sf_dir, "events")
    head = e.filter(F.dayofmonth("ts") <= 15)
    a = IncrementalAggSync(
        spark, str(tmp_path / "a"), "agg.rt", ("event_type",), ("value",),
        watermark_col="ts",
    )
    a.sync(head)
    assert a.materialized_watermark() is not None
    rt = sorted(map(tuple, a.read_realtime_auto(e).collect()))
    b = IncrementalAggSync(
        spark, str(tmp_path / "b"), "agg.rt", ("event_type",), ("value",),
        watermark_col="ts",
    )
    b.sync(head)
    b.sync(e.filter(F.dayofmonth("ts") > 15))
    assert rt == sorted(map(tuple, b.read().collect()))
    # fully-materialized facts: the auto tail is empty, read == realtime
    assert sorted(map(tuple, b.read_realtime_auto(e).collect())) == sorted(
        map(tuple, b.read().collect())
    )


def test_read_realtime_auto_requires_tracking(spark, sf_dir, tmp_path):
    import pytest

    e = table(spark, sf_dir, "events")
    s = IncrementalAggSync(
        spark, str(tmp_path), "agg.rt", ("event_type",), ("value",)
    )
    s.sync(e.limit(100))
    with pytest.raises(ValueError, match="watermark_col"):
        s.read_realtime_auto(e)


def test_watermark_tracking_rejects_numeric_columns(spark, tmp_path):
    """Numeric watermark columns would mis-order as strings ("9" >
    "10") — sync refuses rather than silently mis-filtering the tail."""
    import pytest

    facts = spark.createDataFrame([("a", 9, 1.0)], "g string, seq long, v double")
    s = IncrementalAggSync(
        spark, str(tmp_path), "agg.n", ("g",), ("v",), watermark_col="seq"
    )
    with pytest.raises(ValueError, match="timestamp/date/string"):
        s.sync(facts)
