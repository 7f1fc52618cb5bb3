"""Manifest ENTRY-count cost probe — the honest bound for very large
tables (r9).

Union depth at read time is bounded by the DIR count (auto-compaction
holds it ~threshold), but the manifest JSON itself grows with ENTRIES:
per-file stats from ``cluster``/``cluster_zorder`` and per-partition
leaves on partitioned tables.  Every commit rewrites the full entry
list and every read/prune parses it, so this probe measures, per entry
count N in {1k, 10k, 100k}:

- commit: JSON-serialize + create-exclusive write of an N-entry
  manifest (the CAS write path, real filesystem);
- resolve: read_text + json.loads of that manifest (every read's
  metadata step);
- prune: one ``prune_entries`` pass with a 1%%-selective range.

Usage: ``python tools/manifest_scale_probe.py`` → one JSON line for
PERF_NOTES.
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
        ManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    spark = get_spark("manifest_probe")
    out = {}
    for n in (1_000, 10_000, 100_000):
        root = tempfile.mkdtemp(prefix=f"mprobe_{n}_")
        fmt = ManifestFormat(spark, root)
        entries = [
            {
                "dir": "d-0",
                "rel": f"part-{i:08d}.parquet",
                "partitions": None,
                "stats": {"v": [i * 10, i * 10 + 9]},
            }
            for i in range(n)
        ]
        commit_ms, resolve_ms, prune_ms = [], [], []
        for rep in range(5):
            t0 = time.perf_counter()
            assert fmt._try_write_manifest("s.t", rep + 1, entries, [])
            commit_ms.append((time.perf_counter() - t0) * 1000)
            t0 = time.perf_counter()
            m = fmt._manifest("s.t")
            resolve_ms.append((time.perf_counter() - t0) * 1000)
            lo = (n * 10) // 2
            t0 = time.perf_counter()
            kept, _ = fmt.prune_entries("s.t", "v", lo, lo + n // 10)
            prune_ms.append((time.perf_counter() - t0) * 1000)
            assert 0 < len(kept) < n
        size_kb = len(json.dumps(m)) / 1024
        out[f"entries_{n}"] = {
            "commit_ms": round(statistics.median(commit_ms), 2),
            "resolve_ms": round(statistics.median(resolve_ms), 2),
            "prune_ms": round(statistics.median(prune_ms), 2),
            "manifest_kb": round(size_kb, 1),
        }
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "manifest_entries", **out}))


if __name__ == "__main__":
    main()
