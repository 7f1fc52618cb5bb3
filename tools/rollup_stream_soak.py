"""Rollup maintain_stream soak (r15, VERDICT r14 task 4): the rollup
family rides the warehouse_cdf stream under a long interleaved
append/update/delete/merge commit history, with a KILL + RESTART
mid-run (same checkpoint — exactly-once across the two lives), and the
final stored state must equal the from-scratch recompute exactly:

- ``IncrementalAggSync`` (retractable: signed facts absorb the DML);
- ``IncrementalDistinctSync`` (sketch: append-only source stream —
  HLL exact at soak cardinalities).

Usage: ``python tools/rollup_stream_soak.py [n_commits]`` → one JSON
line for PERF_NOTES.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalAggSync,
        IncrementalDistinctSync,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark("rollup_stream_soak")
    root = tempfile.mkdtemp(prefix="rollsoak_")
    fmt = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("k",), cdf=True
    )

    def rows(i, n=40):
        return spark.createDataFrame(
            [
                (i * 100 + j, f"d{(i + j) % 5}", f"u{j % 13}", float(j))
                for j in range(n)
            ],
            "k long, day string, user string, v double",
        )

    fmt.write("raw.f", rows(0), "overwrite")
    fmt.write("raw.ap", rows(0), "overwrite")  # append-only twin

    agg = IncrementalAggSync(
        spark, root, "agg.sum_v", group_cols=("day",), sum_cols=("v",),
        table_format=fmt,
    )
    dist = IncrementalDistinctSync(
        spark, root, "agg.dist_u", group_cols=("day",),
        distinct_col="user", table_format=fmt,
    )
    agg.sync_from_cdf(fmt, "raw.f")
    dist.sync_from_changes(fmt, "raw.ap")
    ck_a, ck_d = os.path.join(root, "cka"), os.path.join(root, "ckd")

    def drain():
        # the Python data source's availableNow fallback executes ONE
        # batch per run; loop runs until each rollup's cursor reaches
        # the source head (the restart clamp pages maxv versions/run)
        t0 = time.perf_counter()
        for roll, src, ck in (
            (agg, "raw.f", ck_a),
            (dist, "raw.ap", ck_d),
        ):
            head = fmt._latest_version(src)
            for _ in range(50):
                if int(roll._applied_batch_id() or 0) >= head:
                    break
                q = roll.maintain_stream(
                    fmt, src, ck, max_versions_per_batch=4
                )
                assert q.awaitTermination(300)
            assert int(roll._applied_batch_id() or 0) >= head
        return (time.perf_counter() - t0) * 1000

    lat = []
    half = n_commits // 2
    for i in range(1, n_commits + 1):
        op = i % 4
        if op == 0:
            fmt.delete_where("raw.f", "k", (i - 3) * 100, (i - 3) * 100 + 9)
        elif op == 1:
            fmt.write("raw.f", rows(i), "append")
        elif op == 2:
            fmt.update_where(
                "raw.f", "k", {"v": "v + 1.0"},
                (i - 1) * 100, (i - 1) * 100 + 4,
            )
        else:
            fmt.merge("raw.f", rows(i - 2, 10), "k")
        fmt.write("raw.ap", rows(i, 15), "append")
        if i == half or i == n_commits:
            # kill (fresh query object) + restart on the SAME
            # checkpoints: the two lives must compose exactly-once
            lat.append(drain())

    sum_expect = {
        (r["day"], round(r["s"], 6), r["n"])
        for r in fmt.read("raw.f")
        .groupBy("day")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    sum_got = {
        (r["day"], round(r["sum_v"], 6), r["n_rows"])
        for r in agg.read().collect()
    }
    dist_expect = {
        (r["day"], r["n"])
        for r in fmt.read("raw.ap")
        .groupBy("day")
        .agg(F.countDistinct("user").alias("n"))
        .collect()
    }
    dist_got = {
        (r["day"], int(r["distinct_est"])) for r in dist.read().collect()
    }
    print(
        json.dumps(
            {
                "probe": "rollup_stream_soak",
                "n_commits": n_commits,
                "agg_state_matches_recompute": sum_got == sum_expect,
                "hll_state_matches_recompute": dist_got == dist_expect,
                "drain_ms_median": round(statistics.median(lat), 1),
            }
        )
    )
    assert sum_got == sum_expect, "agg rollup diverged from recompute"
    assert dist_got == dist_expect, "hll rollup diverged from recompute"


if __name__ == "__main__":
    main()
