"""Per-method time attribution for lifecycle queries (r15 optimization).

Monkey-patches timing wrappers onto the hot engine entry points
(commit path, stats attach, rollup sync, streaming batch apply, SQL
front-end) and runs one registered query, printing cumulative seconds
and call counts per method — answering "where does a 12-second
lifecycle row actually spend its time" without the Spark UI.

Usage:  python tools/phase_profile.py <query_name> [sf_dir]
"""

from __future__ import annotations

import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import spark_queries
from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

TOTALS: dict[str, float] = defaultdict(float)
COUNTS: dict[str, int] = defaultdict(int)
DEPTH = {"n": 0}  # only attribute top-of-stack time to avoid double counts


def _wrap(obj, name: str, label: str) -> None:
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.perf_counter()
        DEPTH["n"] += 1
        try:
            return fn(*a, **kw)
        finally:
            DEPTH["n"] -= 1
            dt = time.perf_counter() - t0
            TOTALS[label] += dt
            COUNTS[label] += 1

    setattr(obj, name, timed)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from iot_elt_airflow_mongo_timescaledb_spark.plans import (
        materialize,
        pipeline,
        table_format,
    )

    MF = table_format.ManifestFormat
    for meth in (
        "write",
        "merge",
        "delete_where",
        "update_where",
        "read",
        "read_changes",
        "_commit",
        "_attach_stats",
        "_manifest",
        "_latest_version",
    ):
        if hasattr(MF, meth):
            _wrap(MF, meth, f"ManifestFormat.{meth}")
    RS = pipeline._RollupSyncBase
    for meth in ("sync", "_partial", "_applied_batch_id", "sync_from_changes"):
        if hasattr(RS, meth):
            _wrap(RS, meth, f"RollupSync.{meth}")
    if hasattr(materialize, "Warehouse"):
        for meth in ("write", "read"):
            if hasattr(materialize.Warehouse, meth):
                _wrap(materialize.Warehouse, meth, f"Warehouse.{meth}")
    try:
        from iot_elt_airflow_mongo_timescaledb_spark.plans import sql_frontend

        _wrap(sql_frontend.SqlFrontend, "sql", "SqlFrontend.sql")
    except Exception:
        pass
    try:
        from iot_elt_airflow_mongo_timescaledb_spark.plans import ann_index

        for meth in (
            "train",
            "train_from_table",
            "sync",
            "sync_from_changes",
            "sync_from_cdf",
            "_apply_net_cdf",
            "topk",
            "topk_realtime",
            "retrain",
            "check_drift",
        ):
            if hasattr(ann_index.IncrementalANNSync, meth):
                _wrap(ann_index.IncrementalANNSync, meth, f"Ann.{meth}")
    except Exception:
        pass
    try:
        from iot_elt_airflow_mongo_timescaledb_spark.plans import matview

        for meth in ("create", "refresh"):
            if hasattr(matview.MatviewManager, meth):
                _wrap(matview.MatviewManager, meth, f"Matview.{meth}")
    except Exception:
        pass
    try:
        from iot_elt_airflow_mongo_timescaledb_spark.plans import pipeline as pl

        _wrap(pl.HealthPipeline, "sync", "HealthPipeline.sync")
        _wrap(pl.HealthPipeline, "_sync_one", "HealthPipeline._sync_one")
        for fname in ("read_documents", "dedup_by_pk", "reconcile_schema_drift"):
            if hasattr(pl, fname):
                _wrap(pl, fname, f"ingest.{fname}")
        if hasattr(pl, "flatten_document_table"):
            _wrap(pl, "flatten_document_table", "flatten_document_table")
        if hasattr(pl, "root_key_merge"):
            _wrap(pl, "root_key_merge", "root_key_merge")
        if hasattr(pl, "IncrementalCursor"):
            for meth in ("last_value", "filter", "commit"):
                if hasattr(pl.IncrementalCursor, meth):
                    _wrap(pl.IncrementalCursor, meth, f"Cursor.{meth}")
        if hasattr(materialize.Warehouse, "materialize_upsert"):
            _wrap(
                materialize.Warehouse,
                "materialize_upsert",
                "Warehouse.materialize_upsert",
            )
        if hasattr(pl, "list_raw_tables"):
            _wrap(pl, "list_raw_tables", "list_raw_tables")
    except Exception:
        pass

    spark = get_spark("phase-profile")
    queries = spark_queries()
    # warm-up so JVM/codegen cost doesn't pollute attribution
    queries["pricing_summary"](spark, sf_dir).collect()

    def n_jobs() -> int:
        # cumulative Spark job count — deterministic under host noise
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())

    j0 = n_jobs()
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).collect()
    total = time.perf_counter() - t0
    jobs = n_jobs() - j0

    print(f"\n== {name} @ {sf_dir}: {total:.2f}s total, {jobs} Spark jobs ==")
    for label, secs in sorted(TOTALS.items(), key=lambda kv: -kv[1]):
        print(f"  {secs:7.2f}s  x{COUNTS[label]:<4d} {label}")


if __name__ == "__main__":
    main()
