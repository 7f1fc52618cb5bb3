"""Conflict-protocol metadata-cost probe (r13, VERDICT r12 task 1).

The optimistic-concurrency happy path is one create-exclusive CAS —
zero extra cost.  This probe measures the LOST-RACE path at large
entry counts: with a segmented table of N entries, a writer computes a
row-level edit against the base, a concurrent append lands first, and
the edit's commit must (a) re-resolve the head, (b) classify the delta
(`_classify_conflict` — object-identity fast path over shared segment
entries, key math only on the inline tails), and (c) rebase + CAS.

Reported per N in {10k, 100k}: median wall of the full lost-race
commit (resolve + classify + rebase + CAS) and of the classification
alone, plus the same measured with the identity fast path DISABLED
(tails forced to the full entry lists) to show what the fast path
buys.  Driver-side only — no Spark jobs.

Usage: ``python tools/conflict_scale_probe.py`` → one JSON line for
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

    spark = get_spark("conflict_probe")
    out = {}
    for n in (10_000, 100_000):
        root = tempfile.mkdtemp(prefix=f"cprobe_{n}_")
        fmt = ManifestFormat(spark, root, segment_entries=1_000)
        entries = [
            {
                "dir": "d-0",
                "rel": f"part-{i:08d}.parquet",
                "partitions": None,
                "stats": {"v": [i * 10, i * 10 + 9]},
            }
            for i in range(n)
        ]
        fmt._commit_edit("s.t", lambda head: (entries, []))

        lost_ms, classify_ms, classify_slow_ms = [], [], []
        for rep in range(5):
            base = fmt._manifest("s.t")
            # the row-level edit: rewrite ONE entry (stats-bounded DML)
            victim = base["entries"][n // 2]
            vkey = fmt._entry_key(victim)
            produced = [
                {
                    "dir": f"d-new-{rep}",
                    "partitions": None,
                    "stats": {"v": victim["stats"]["v"]},
                }
            ]
            kept = [
                e for e in base["entries"] if fmt._entry_key(e) != vkey
            ]
            # concurrent DISJOINT append lands first (stats outside
            # every predicate this edit reads)
            extra = {
                "dir": f"d-conc-{rep}",
                "partitions": None,
                "stats": {"v": [n * 100 + rep, n * 100 + rep]},
            }
            fmt._commit_edit("s.t", lambda head: (head["entries"] + [extra], []))
            conflict = {
                "base": base,
                "touched": {vkey},
                "removed": {vkey},
                "produced": produced,
                "reads": fmt._bounds_reads(
                    {"v": (victim["stats"]["v"][0], victim["stats"]["v"][1])}
                ),
            }
            # classification alone (against the head the concurrent
            # append created), fast path vs forced-slow
            head = fmt._manifest("s.t")
            t0 = time.perf_counter()
            fmt._classify_conflict("s.t", base, head, conflict)
            classify_ms.append((time.perf_counter() - t0) * 1000)
            # forced-slow: copy the entry dicts so no object identity
            # is shared — the classifier degrades to full key math
            base_slow = {**base, "entries": [dict(e) for e in base["entries"]]}
            t0 = time.perf_counter()
            fmt._classify_conflict("s.t", base_slow, head, conflict)
            classify_slow_ms.append((time.perf_counter() - t0) * 1000)

            t0 = time.perf_counter()
            fmt._commit(
                "s.t", kept + produced, [], base["version"],
                conflict=conflict,
            )
            lost_ms.append((time.perf_counter() - t0) * 1000)

        out[f"entries_{n}"] = {
            "lost_race_commit_ms": round(statistics.median(lost_ms), 2),
            "classify_ms": round(statistics.median(classify_ms), 2),
            "classify_no_identity_ms": round(
                statistics.median(classify_slow_ms), 2
            ),
        }
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "conflict_scale", **out}))


if __name__ == "__main__":
    main()
