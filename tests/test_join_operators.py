"""Join-operator unit tests: scale rewrites must be result-equivalent
to their literal forms, and the week bucket must align with the
reference's TimescaleDB origin."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.functions import week_bucket
from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import (
    array_membership_join,
    existence_filter_join,
)


def test_array_membership_rewrite_equals_literal(spark):
    """J5 explode→equi rewrite ≡ array_contains nested loop, including
    multi-membership double-count (SURVEY §2.9.6)."""
    facts = spark.createDataFrame(
        [Row(device_id="d1", v=1), Row(device_id="d2", v=2), Row(device_id="dx", v=3)]
    )
    users = spark.createDataFrame(
        [
            Row(user_id="u1", devices=["d1", "d2"]),
            Row(user_id="u2", devices=["d1"]),  # d1 matches two users
            Row(user_id="u3", devices=[]),
        ]
    )
    literal = facts.join(
        users, F.array_contains(users.devices, facts.device_id), "inner"
    ).select("device_id", "v", "user_id")
    rewritten = array_membership_join(
        facts, users, "devices", "device_id"
    ).select("device_id", "v", "user_id")
    lit_rows = sorted(tuple(r) for r in literal.collect())
    new_rows = sorted(tuple(r) for r in rewritten.collect())
    assert new_rows == lit_rows
    assert len(new_rows) == 3  # d1 double-counted across u1/u2, d2 once


def test_existence_filter_join_no_multiplication(spark):
    facts = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    filt = spark.createDataFrame([Row(k="a"), Row(k="a"), Row(k="a")])
    out = existence_filter_join(facts, filt, ["k"])
    assert [tuple(r) for r in out.collect()] == [("a", 1)]


def test_week_bucket_matches_timescaledb_origin(spark):
    """time_bucket('1 week', ts) origin 2000-01-03 is a Monday; Spark
    date_trunc('week') is ISO-Monday — identical buckets (SURVEY A6)."""
    df = spark.createDataFrame(
        [
            Row(ts=datetime(2000, 1, 3, 5, 0)),   # Monday (the origin itself)
            Row(ts=datetime(2020, 2, 2, 23, 59)),  # Sunday -> previous Monday
            Row(ts=datetime(2020, 2, 3, 0, 0)),    # Monday midnight boundary
        ]
    )
    got = [r["w"] for r in df.select(week_bucket("ts").alias("w")).collect()]
    assert got == [
        datetime(2000, 1, 3, 0, 0),
        datetime(2020, 1, 27, 0, 0),
        datetime(2020, 2, 3, 0, 0),
    ]


# ---------------------------------------------------------------------------
# as-of join edge semantics (operators/asof.py)
# ---------------------------------------------------------------------------


def _asof_fixture(spark):
    from pyspark.sql import types as T

    left_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("lts", T.LongType()),
        ]
    )
    right_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("rts", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    left = spark.createDataFrame(
        [("u1", 5), ("u1", 25), ("u1", 30), ("u2", 100)], left_schema
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 1.0, "a"),
            ("u1", 20, None, "b"),   # NULL value AT the match point
            ("u1", 30, 5.0, "c"),    # duplicate-ts pair …
            ("u1", 30, 7.0, "d"),    # … tie must resolve to largest tuple
        ],
        right_schema,
    )
    return left, right


def test_asof_null_at_match_point_stays_null(spark):
    """A genuinely-NULL value on the matched row must be attached as
    NULL — not skipped in favor of a stale older reading (the failure
    mode of a per-column last(value, ignorenulls) fill)."""
    from iot_elt_airflow_mongo_timescaledb_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["value", "tag"],
    )
    rows = {(r["k"], r["lts"]): (r["value_asof"], r["tag_asof"]) for r in out.collect()}
    assert rows[("u1", 25)] == (None, "b")   # matched row b, NULL kept
    assert rows[("u1", 5)] == (None, None)   # no prior right row
    assert rows[("u2", 100)] == (None, None)


def test_asof_duplicate_ts_tiebreak_deterministic(spark):
    """Equal-ts right rows resolve toward the largest value tuple —
    pinned, run-stable semantics instead of partition-order luck."""
    from iot_elt_airflow_mongo_timescaledb_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    for _ in range(3):  # run-to-run determinism
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["value", "tag"],
        )
        rows = {(r["k"], r["lts"]): (r["value_asof"], r["tag_asof"]) for r in out.collect()}
        assert rows[("u1", 30)] == (7.0, "d")  # inclusive + max tuple


def test_asof_matches_duckdb_asof_join(spark):
    """Tie-free portion matches DuckDB ASOF LEFT JOIN exactly."""
    import duckdb

    from iot_elt_airflow_mongo_timescaledb_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    right_nodup = right.filter(F.col("rts") != 30)
    out = asof_join(
        left, right_nodup, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["value"],
    ).select("k", "lts", "value_asof")
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(k VARCHAR, lts BIGINT); "
        "CREATE TABLE r(k VARCHAR, rts BIGINT, value DOUBLE)"
    )
    con.executemany("INSERT INTO l VALUES (?, ?)", [tuple(r) for r in left.collect()])
    con.executemany(
        "INSERT INTO r VALUES (?, ?, ?)",
        [(r["k"], r["rts"], r["value"]) for r in right_nodup.collect()],
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT l.k, l.lts, r.value FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )
    assert got == want


def test_asof_map_valued_payload_attaches(spark):
    """Non-orderable value columns (maps) must ride along in the payload
    without entering the window ORDER BY (Spark cannot order maps)."""
    from pyspark.sql import types as T

    from iot_elt_airflow_mongo_timescaledb_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u1", 25)], "k string, lts long")
    right_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("rts", T.LongType()),
            T.StructField("props", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    right = spark.createDataFrame([("u1", 10, {"src": "web"})], right_schema)
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["props"],
    ).collect()
    assert out[0]["props_asof"] == {"src": "web"}


def test_asof_map_only_payload_tiebreak_deterministic(spark):
    """r5: a payload with NO orderable column (map-typed) must still
    resolve equal-ts ties identically across repartitions — the content
    hash tiebreak replaces the old documented input-order fallback."""
    from pyspark.sql import types as T

    from iot_elt_airflow_mongo_timescaledb_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u1", 40)], ["k", "lts"])
    right_schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("rts", T.LongType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
    ])
    rows = [("u1", 30, {"x": i}) for i in range(8)]  # 8-way equal-ts tie
    results = set()
    for n_parts in (1, 3, 7):
        right = spark.createDataFrame(rows, right_schema).repartition(n_parts)
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["attrs"],
        )
        got = [(r["k"], r["lts"], dict(r["attrs_asof"])) for r in out.collect()]
        assert len(got) == 1
        results.add(str(sorted(got)))
    assert len(results) == 1, results  # identical across layouts


def test_table_diff_classifies_all_statuses(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import table_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", None)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["status"] for r in table_diff(a, b, "k").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_table_diff_rejects_schema_mismatch(spark):
    import pytest

    from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import table_diff

    a = spark.createDataFrame([(1, "x")], "k long, s string")
    b = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="matching schemas"):
        table_diff(a, b, "k")
