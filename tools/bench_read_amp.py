"""Read-amplification curve for ManifestFormat append accumulation.

Measures full-scan time of one table materialized as N immutable data
dirs (N appends, no compaction) — the evidence behind the
``auto_compact_dirs`` default: each dir costs the reader a footer
listing plus a union branch, so scan latency grows with dir count even
at constant data volume.

Usage: python tools/bench_read_amp.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_elt_airflow_mongo_timescaledb_spark.fs import scratch_dir
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)
from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_read_amp")
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    total = events.count()

    results: dict[str, float] = {}
    for n_dirs in (1, 8, 16, 32, 64, 96):
        root = scratch_dir(spark, f"readamp_{n_dirs}_")
        try:
            fmt = ManifestFormat(spark, root, auto_compact_dirs=None)
            # constant data volume, split across n_dirs appends
            slices = events.randomSplit([1.0] * n_dirs, seed=7)
            for i, sl in enumerate(slices):
                fmt.write("s.t", sl, "append" if i else "overwrite")
            # warm listing caches once, then best-of-3 full scans
            fmt.read("s.t").count()
            best = min(
                _timed(lambda: fmt.read("s.t").count()) for _ in range(3)
            )
            results[str(n_dirs)] = round(best, 3)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "manifest_scan_sec_by_dir_count",
                "rows": total,
                "results": results,
            }
        )
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
