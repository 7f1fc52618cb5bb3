"""Steady-state latency probe for the warehouse_cdf streaming source
(round 14): per-trigger latency of a CONTINUOUSLY-RUNNING stream
consuming small commits, versus the batch-poll baseline
(`read_changes_cdf` once per commit).  The number that matters for a
15-minute-cadence maintenance family moving onto the stream: how much
of each cadence the feed itself costs.

Usage: ``python tools/cdf_stream_probe.py [n_commits]`` → one JSON
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
    from pyspark.sql import functions as F  # noqa: F401

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.cdf_source import (
        register_cdf_source,
    )

    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("cdf_stream_probe")
    register_cdf_source(spark)
    root = tempfile.mkdtemp(prefix="cdfprobe_")
    fmt = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("k",), cdf=True
    )

    def rows(i):
        return spark.createDataFrame(
            [(i * 10 + j, f"v{i}", float(j)) for j in range(100)],
            "k long, val string, x double",
        )

    fmt.write("s.t", rows(0), "overwrite")

    lat: list[float] = []
    counts: list[int] = []

    def sink(b, _i):
        t0 = time.perf_counter()
        n = b.count()
        if n:
            lat.append(time.perf_counter() - t0)
            counts.append(n)

    q = (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", "s.t")
        .load()
        .writeStream.trigger(processingTime="0 seconds")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(root, "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        lat.clear()
        counts.clear()
        # steady state: one small commit per trigger (append + a DML
        # every third commit so cdc steps are in the mix)
        trigger_ms = []
        for i in range(1, n_commits + 1):
            fmt.write("s.t", rows(i), "append")
            if i % 3 == 0:
                fmt.update_where(
                    "s.t", "k", {"val": "'u'"}, i * 10, i * 10 + 4
                )
            t0 = time.perf_counter()
            q.processAllAvailable()
            trigger_ms.append((time.perf_counter() - t0) * 1000)
    finally:
        q.stop()

    # batch-poll baseline: same commits consumed via read_changes_cdf
    fmt2 = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("k",), cdf=True
    )
    head = fmt2._manifest("s.t")["version"]
    poll_ms = []
    applied = 1
    for v in range(2, head + 1):
        t0 = time.perf_counter()
        fmt2.read_changes_cdf("s.t", applied, v).count()
        poll_ms.append((time.perf_counter() - t0) * 1000)
        applied = v

    print(
        json.dumps(
            {
                "probe": "cdf_stream",
                "n_commits": n_commits,
                "stream_trigger_ms_median": round(
                    statistics.median(trigger_ms), 1
                ),
                "stream_trigger_ms_p90": round(
                    sorted(trigger_ms)[int(0.9 * len(trigger_ms))], 1
                ),
                "poll_step_ms_median": round(
                    statistics.median(poll_ms), 1
                ),
                "rows_per_batch_median": int(
                    statistics.median(counts)
                ) if counts else 0,
            }
        )
    )


if __name__ == "__main__":
    main()
