"""Shared fixtures: one SparkSession + one DuckDB oracle per test run.

Tests default to sf0.001 (~6k lineitem rows) for speed; set
SPARK_GRAFT_TEST_SF to point elsewhere.  The driver's own gate runs the
same comparisons at sf0.01.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    # 8 threads keeps small-fixture tests snappy (32 threads of task
    # overhead dominates at this scale); prod sizing lives in session.py.
    spark = get_spark("tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", 8))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tools.parity import duck_connection

    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def pipeline(spark, tmp_path_factory):
    """Reference-shaped fixture pipeline, built once per test run
    (fixture data lives in test_pipeline.py)."""
    import json

    import test_pipeline as tp

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import HealthPipeline

    src = tmp_path_factory.mktemp("mongo_fixture")
    for name, docs in (
        ("users", tp.USERS), ("heart_rates", tp.HEART_RATES),
        ("sleeps", tp.SLEEPS), ("steps", tp.STEPS),
    ):
        (src / f"{name}.json").write_text(json.dumps(docs))
    wh_root = tmp_path_factory.mktemp("warehouse")
    p = HealthPipeline(spark, str(wh_root))
    paths = {n: str(src / f"{n}.json") for n in ("users", "heart_rates", "sleeps", "steps")}
    p.run_all(paths)
    return p, paths
