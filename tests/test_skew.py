"""Salting operators must be result-invariant: salt changes placement,
never matches."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _facts(spark):
    # hot key: 'h' holds 80% of rows
    rows = [Row(k="h", v=i) for i in range(80)] + [
        Row(k=c, v=i) for i, c in enumerate("abcd" * 5)
    ]
    return spark.createDataFrame(rows)


def test_salted_join_equals_plain_join(spark):
    facts = _facts(spark)
    dim = spark.createDataFrame(
        [Row(k="h", name="hot"), Row(k="a", name="ay"), Row(k="z", name="none")]
    )
    plain = {(r["k"], r["v"], r["name"]) for r in facts.join(dim, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(facts, dim, "k", salt_from=["v"], n_salts=4).collect()
    }
    assert salted == plain


def test_salted_aggregate_equals_plain_groupby(spark):
    facts = _facts(spark)
    plain = {
        (r["k"], r["n"], r["total"], r["mx"])
        for r in facts.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"], r["n"], r["total"], r["mx"])
        for r in salted_aggregate(
            facts,
            keys=["k"],
            salt_from=["v"],
            aggs={
                "n": ("sum", F.count("*")),
                "total": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == plain
