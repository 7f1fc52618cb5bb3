"""Per-method Spark-JOB-COUNT attribution (r16 optimization round).

Same monkey-patch skeleton as phase_profile.py, but each wrapper
records the DAGScheduler job-count delta across the call — job counts
are deterministic under co-tenant load where wall time is not (the
r15 lesson).  Nested calls double-count by design (a parent's delta
includes its children); the per-method call counts disambiguate.

Usage:  python tools/job_profile.py <query_name> [sf_dir]
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

JOBS: dict[str, int] = defaultdict(int)      # inclusive
EXCL: dict[str, int] = defaultdict(int)      # exclusive of wrapped children
COUNTS: dict[str, int] = defaultdict(int)
SECS: dict[str, float] = defaultdict(float)
_N_JOBS = {"fn": None}
_STACK: list[list] = []  # [label, children_jobs]


def _wrap(obj, name: str, label: str) -> None:
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def counted(*a, **kw):
        j0 = _N_JOBS["fn"]()
        t0 = time.perf_counter()
        frame = [label, 0]
        _STACK.append(frame)
        try:
            return fn(*a, **kw)
        finally:
            _STACK.pop()
            SECS[label] += time.perf_counter() - t0
            delta = _N_JOBS["fn"]() - j0
            JOBS[label] += delta
            EXCL[label] += delta - frame[1]
            if _STACK:
                _STACK[-1][1] += delta
            COUNTS[label] += 1

    setattr(obj, name, counted)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from iot_elt_airflow_mongo_timescaledb_spark.plans import (
        ann_index,
        materialize,
        matview,
        pipeline,
        sql_frontend,
        table_format,
    )

    MF = table_format.ManifestFormat
    for meth in (
        "write", "merge", "merge_mor", "delete_where", "update_where",
        "read", "read_changes", "read_changes_cdf", "_commit",
        "_attach_stats", "_read_entries", "_new_data_dir",
        "_read_with_dv", "_enforce_constraints", "_merge_cdc",
        "_land_cdc", "replace_atomic", "_enforce_append_schema",
        "_manifest", "_latest_version",
    ):
        if hasattr(MF, meth):
            _wrap(MF, meth, f"ManifestFormat.{meth}")
    RS = pipeline._RollupSyncBase
    for meth in (
        "sync", "_partial", "_meta_state", "sync_from_changes",
        "sync_from_cdf", "_apply_stream_batch", "read",
    ):
        if hasattr(RS, meth):
            _wrap(RS, meth, f"RollupSync.{meth}")
    for meth in ("write", "read", "materialize_upsert", "exists"):
        if hasattr(materialize.Warehouse, meth):
            _wrap(materialize.Warehouse, meth, f"Warehouse.{meth}")
    _wrap(sql_frontend.SqlFrontend, "sql", "SqlFrontend.sql")
    for meth in (
        "train_from_table", "sync_from_changes", "sync_from_cdf",
        "_apply_net_cdf", "topk", "maintain_stream",
    ):
        if hasattr(ann_index.IncrementalANNSync, meth):
            _wrap(ann_index.IncrementalANNSync, meth, f"Ann.{meth}")
    for meth in ("refresh", "read", "_project"):
        if hasattr(matview._MatviewAggSync, meth):
            _wrap(matview._MatviewAggSync, meth, f"Matview.{meth}")
    if hasattr(pipeline, "IncrementalCursor"):
        for meth in ("last_value", "commit"):
            _wrap(pipeline.IncrementalCursor, meth, f"Cursor.{meth}")
    _wrap(pipeline.HealthPipeline, "_sync_one", "HealthPipeline._sync_one")

    spark = get_spark("job-profile")
    queries = spark_queries()
    queries["pricing_summary"](spark, sf_dir).collect()  # warm-up

    def n_jobs() -> int:
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())

    _N_JOBS["fn"] = n_jobs
    j0 = n_jobs()
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).collect()
    total = time.perf_counter() - t0
    jobs = n_jobs() - j0

    print(f"\n== {name} @ {sf_dir}: {total:.2f}s total, {jobs} Spark jobs ==")
    print(f"  {'jobs':>5} {'excl':>5} {'calls':>5} {'secs':>7}  method")
    for label, j in sorted(JOBS.items(), key=lambda kv: -kv[1]):
        print(
            f"  {j:5d} {EXCL[label]:5d} {COUNTS[label]:5d} "
            f"{SECS[label]:7.2f}  {label}"
        )


if __name__ == "__main__":
    main()
