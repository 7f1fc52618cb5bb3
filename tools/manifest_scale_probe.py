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

A second sweep measures the SEGMENTED log (``segment_entries``, the
hierarchical-metadata tier) at the same entry counts: steady-state
append commit (carried segment refs + bounded inline tail, via the
real ``_commit_edit`` path) and warm resolve (cached immutable
segments) — the numbers that should stay FLAT in table size.

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

    # -- segmented log: the same entry counts, commit+resolve bounded
    # by CHANGE size (one appended entry per commit at steady state)
    for n in (1_000, 10_000, 100_000):
        root = tempfile.mkdtemp(prefix=f"sprobe_{n}_")
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
        # seed the table: one bulk commit segments the backlog
        def seed(head):
            return entries, []

        fmt._commit_edit("s.t", seed)
        commit_ms, resolve_ms = [], []
        for rep in range(5):
            extra = {
                "dir": "d-1",
                "rel": f"part-extra-{rep}.parquet",
                "partitions": None,
                "stats": {"v": [0, 1]},
            }

            def add(head):
                return head["entries"] + [extra], []

            t0 = time.perf_counter()
            assert fmt._commit_edit("s.t", add)
            commit_ms.append((time.perf_counter() - t0) * 1000)
            t0 = time.perf_counter()
            m = fmt._manifest("s.t")
            resolve_ms.append((time.perf_counter() - t0) * 1000)
            assert len(m["entries"]) == n + rep + 1
        raw = json.loads(
            fmt.fs.read_text(
                os.path.join(
                    fmt._log_path("s.t"),
                    sorted(
                        f
                        for f in fmt.fs.list_files(fmt._log_path("s.t"))
                        if f.startswith("v")
                    )[-1],
                )
            )
        )
        # narrow read_where METADATA cost: a 1%-selective range on a
        # COLD handle (fresh segment cache) — two-tier pruning should
        # parse only the segments whose rolled-up stats intersect,
        # vs the flat log parsing all N entries every time
        prune_cold_ms, segs_parsed = [], []
        for rep in range(5):
            cold = ManifestFormat(spark, root, segment_entries=1_000)
            lo = (n * 10) // 2
            t0 = time.perf_counter()
            m_raw = cold._manifest("s.t", resolve=False)
            kept = cold._prune_two_tier(
                "s.t", m_raw, {"v": (lo, lo + n // 10)}
            )
            prune_cold_ms.append((time.perf_counter() - t0) * 1000)
            assert 0 < len(kept) < n
            segs_parsed.append(len(cold._seg_cache))
        out[f"seg_entries_{n}"] = {
            "append_commit_ms": round(statistics.median(commit_ms), 2),
            "warm_resolve_ms": round(statistics.median(resolve_ms), 2),
            "cold_prune_ms": round(statistics.median(prune_cold_ms), 2),
            "segs_parsed_of": [segs_parsed[0], len(raw["segments"])],
            "version_file_kb": round(len(json.dumps(raw)) / 1024, 1),
            "inline": len(raw["entries"]),
            "segments": len(raw["segments"]),
        }
        shutil.rmtree(root, ignore_errors=True)

    # -- partition edits on the segmented log (r10, VERDICT r9 task 6):
    # drop_partitions_below must parse ONLY the segments whose recorded
    # partition range intersects the drop — commit cost flat in table
    # entry count, scaling with the dropped tail
    for n in (10_000, 100_000, 1_000_000):
        root = tempfile.mkdtemp(prefix=f"pprobe_{n}_")
        fmt = ManifestFormat(spark, root, segment_entries=1_000)
        per_day = n // 100
        entries = [
            {
                "dir": f"d-{i // per_day:03d}",
                "rel": f"part-{i:08d}.parquet",
                "partitions": {"day": f"d{i // per_day:03d}"},
            }
            for i in range(n)
        ]

        def seed(head):
            return entries, ["day"]

        fmt._commit_edit("s.t", seed)
        drop_ms, segs_parsed = [], []
        for rep in range(5):
            cold = ManifestFormat(spark, root, segment_entries=1_000)
            cutoff = f"d{rep + 1:03d}"  # drops exactly one more day
            t0 = time.perf_counter()
            dropped = cold.drop_partitions_below("s.t", "day", cutoff)
            drop_ms.append((time.perf_counter() - t0) * 1000)
            assert dropped == 1, dropped
            segs_parsed.append(len(cold._seg_cache))
        raw = json.loads(
            fmt.fs.read_text(
                os.path.join(
                    fmt._log_path("s.t"),
                    sorted(
                        f
                        for f in fmt.fs.list_files(fmt._log_path("s.t"))
                        if f.startswith("v")
                    )[-1],
                )
            )
        )
        spooled = [s for s in raw["segments"] if "list" in s]
        out[f"pedit_entries_{n}"] = {
            "drop_partition_ms": round(statistics.median(drop_ms), 2),
            "segs_parsed_of": [
                segs_parsed[0],
                sum(s.get("refs", 1) for s in raw["segments"]),
            ],
            # round-11 third tier: the version file stays
            # O(lists + inline tail) as the ref count grows
            "version_file_kb": round(len(json.dumps(raw)) / 1024, 1),
            "ref_lists": len(spooled),
            "inline_refs": len(raw["segments"]) - len(spooled),
        }
        shutil.rmtree(root, ignore_errors=True)

    # -- tier-3 (segl list) pruning on a COLD selective read (r12,
    # VERDICT r11 task 1): with lazy list resolution a narrow
    # read_where must parse only the segl-*.json list files whose
    # rolled stats intersect the range — the excluded lists' member
    # segments are never touched either.  1M entries / 250-entry
    # segments -> 4000 refs -> 16 list files of 250 refs; a
    # 1%-selective range should open ~1 of the 16.
    for n in (1_000_000,):
        root = tempfile.mkdtemp(prefix=f"t3probe_{n}_")
        fmt = ManifestFormat(spark, root, segment_entries=250)
        entries = [
            {
                "dir": "d-0",
                "rel": f"part-{i:08d}.parquet",
                "partitions": None,
                "stats": {"v": [i * 10, i * 10 + 9]},
            }
            for i in range(n)
        ]

        def seed(head):
            return entries, []

        fmt._commit_edit("s.t", seed)
        # steady-state append commit stays flat in ref count
        commit_ms = []
        for rep in range(5):
            extra = {
                "dir": "d-1",
                "rel": f"part-extra-{rep}.parquet",
                "partitions": None,
                "stats": {"v": [0, 1]},
            }

            def add(head):
                return head["entries"] + [extra], []

            t0 = time.perf_counter()
            assert fmt._commit_edit("s.t", add)
            commit_ms.append((time.perf_counter() - t0) * 1000)
        prune_ms, segl_parsed, segs_parsed = [], [], []
        for rep in range(5):
            cold = ManifestFormat(spark, root, segment_entries=250)
            lo = (n * 10) // 2
            t0 = time.perf_counter()
            m_raw = cold._manifest("s.t", resolve=False, expand_lists=False)
            kept = cold._prune_two_tier(
                "s.t", m_raw, {"v": (lo, lo + n // 100)}
            )
            prune_ms.append((time.perf_counter() - t0) * 1000)
            assert 0 < len(kept) < n
            opened = [os.path.basename(p) for p in cold._seg_cache]
            segl_parsed.append(
                sum(1 for f in opened if f.startswith("segl-"))
            )
            segs_parsed.append(
                sum(1 for f in opened if f.startswith("seg-"))
            )
        raw = json.loads(
            fmt.fs.read_text(
                os.path.join(
                    fmt._log_path("s.t"),
                    sorted(
                        f
                        for f in fmt.fs.list_files(fmt._log_path("s.t"))
                        if f.startswith("v")
                    )[-1],
                )
            )
        )
        n_lists = sum(1 for s in raw["segments"] if "list" in s)
        out[f"tier3_entries_{n}"] = {
            "append_commit_ms": round(statistics.median(commit_ms), 2),
            "cold_prune_ms": round(statistics.median(prune_ms), 2),
            "segl_parsed_of": [segl_parsed[0], n_lists],
            "segs_parsed": segs_parsed[0],
        }
        shutil.rmtree(root, ignore_errors=True)
    # -- VERSION-count axis (r14, VERDICT r13 task 4): the log dir
    # grows one v*.json per commit forever; the advisory _head.json
    # hint (Delta's _last_checkpoint analog) makes head resolution
    # O(1) in retained version count, vs the listing fallback that
    # pages the whole dir.  Measures cold _latest_version + full
    # head resolve with the hint present vs deleted.
    for n in (1_000, 10_000, 50_000):
        root = tempfile.mkdtemp(prefix=f"vprobe_{n}_")
        fmt = ManifestFormat(spark, root)
        entry = [{"dir": "d-0", "rel": "p.parquet", "partitions": None}]
        for v in range(1, n + 1):
            assert fmt._try_write_manifest("s.t", v, entry, [])
        hint_ms, glob_ms = [], []
        for rep in range(5):
            cold = ManifestFormat(spark, root)
            t0 = time.perf_counter()
            assert cold._latest_version("s.t") == n
            assert cold._manifest("s.t")["version"] == n
            hint_ms.append((time.perf_counter() - t0) * 1000)
        hint_path = os.path.join(fmt._log_path("s.t"), fmt.HEAD_HINT)
        fmt.fs.delete(hint_path)
        for rep in range(5):
            cold = ManifestFormat(spark, root)
            t0 = time.perf_counter()
            assert cold._latest_version("s.t") == n
            glob_ms.append((time.perf_counter() - t0) * 1000)
        out[f"versions_{n}"] = {
            "cold_resolve_hint_ms": round(statistics.median(hint_ms), 2),
            "latest_version_fallback_ms": round(
                statistics.median(glob_ms), 2
            ),
        }
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({"probe": "manifest_entries", **out}))


if __name__ == "__main__":
    main()
