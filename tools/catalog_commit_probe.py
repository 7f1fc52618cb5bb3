"""Catalog pointer-commit cost vs warehouse table count (VERDICT r8
task 7).

Every ``CatalogManifestFormat`` commit rewrites the FULL table->version
map into a fresh ``c*.json`` and lists the ``_catalog`` dir to find the
head — so two growth axes could hurt at scale: the number of TABLES
(map size per flip) and the number of retained catalog FILES (listing
cost per flip; bounded by ``vacuum_catalog``).  This probe measures
single-pointer flip latency at 10/100/500 tables, before and after
letting the catalog log grow to ~200 files, and after a
``vacuum_catalog``.  Pure metadata timing — no Spark jobs run besides
session startup.

Usage: ``python tools/catalog_commit_probe.py [n_flips]`` → one JSON
line for PERF_NOTES.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    n_flips = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spark = get_spark("catalog_probe")
    out = {}
    for n_tables in (10, 100, 500):
        root = tempfile.mkdtemp(prefix=f"catprobe_{n_tables}_")
        fmt = CatalogManifestFormat(spark, root)
        # register n_tables pointers in bulk (one flip: the map is what
        # costs, not how it got there)
        fmt._flip_catalog({f"s.t{i}": 1 for i in range(n_tables)})

        def flip_times(k: int) -> list[float]:
            ts = []
            for j in range(k):
                t0 = time.perf_counter()
                fmt._flip_catalog({f"s.t{j % n_tables}": 2 + j})
                ts.append((time.perf_counter() - t0) * 1000)
            return ts

        fresh = flip_times(n_flips)
        # grow the catalog log to ~200 files (no vacuum), re-measure
        for j in range(200):
            fmt._flip_catalog({f"s.t{j % n_tables}": 1000 + j})
        grown = flip_times(n_flips)
        fmt.vacuum_catalog(keep_last=8)
        vacuumed = flip_times(n_flips)
        out[f"tables_{n_tables}"] = {
            "fresh_ms": round(statistics.median(fresh), 3),
            "grown200_ms": round(statistics.median(grown), 3),
            "post_vacuum_ms": round(statistics.median(vacuumed), 3),
        }
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "catalog_commit", "n_flips": n_flips, **out}))


if __name__ == "__main__":
    main()
