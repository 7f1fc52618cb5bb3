"""Data-quality check operators + pipeline gate + catalog bootstrap."""

from __future__ import annotations

from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.operators.quality_checks import (
    check_accepted_values,
    check_not_null,
    check_relationship,
    check_unique,
    run_checks,
)


def test_not_null_and_unique(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=2), Row(k=None, v=3)]
    )
    assert check_not_null(df, ["k"]).count() == 1
    dups = check_unique(df, ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in dups] == [("a", 2)]


def test_accepted_values(spark):
    df = spark.createDataFrame([Row(g="male"), Row(g="female"), Row(g="robot")])
    bad = check_accepted_values(df, "g", ["male", "female"]).collect()
    assert [(r["g"], r["n_rows"]) for r in bad] == [("robot", 1)]


def test_relationship(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2), Row(fk=99)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    orphans = check_relationship(child, "fk", parent, "pk").collect()
    assert [r["fk"] for r in orphans] == [99]


def test_pipeline_quality_gate_clean(pipeline):
    """The fixture pipeline's stage layer passes every dbt-style check."""
    p, _ = pipeline
    counts = p.check_quality()
    assert counts == {name: 0 for name in counts}


def test_run_checks_reports_counts(spark):
    df = spark.createDataFrame([(None,)], "k string")
    assert run_checks({"c": check_not_null(df, ["k"])}) == {"c": 1}


def test_bootstrap_catalog_creates_schemas(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.session import (
        SCHEMAS,
        bootstrap_catalog,
    )

    bootstrap_catalog(spark)
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert set(SCHEMAS) <= dbs
