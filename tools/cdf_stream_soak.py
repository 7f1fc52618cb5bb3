"""CDF-stream soak: a continuously-running warehouse_cdf stream
mirrors a table that is being written CONCURRENTLY (appends + updates
+ deletes + merges), and at the end the mirror's NETTED state must
equal the source exactly — no gap, no duplicate, no stale image —
while per-trigger latency stays flat over the run.

Usage: ``python tools/cdf_stream_soak.py [n_commits]`` → one JSON
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.cdf_source import (
        register_cdf_source,
    )

    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spark = get_spark("cdf_stream_soak")
    register_cdf_source(spark)
    root = tempfile.mkdtemp(prefix="cdfsoak_")
    fmt = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("k",), cdf=True
    )
    sink = ManifestFormat(spark, root, auto_compact_dirs=None)

    def rows(i, n=50):
        return spark.createDataFrame(
            [(i * 100 + j, f"v{i}", float(j)) for j in range(n)],
            "k long, val string, x double",
        )

    fmt.write("s.src", rows(0), "overwrite")

    def mirror(batch_df, batch_id):
        sink.write_streaming_batch(
            "s.mirror", batch_df, int(batch_id), app_id="soak"
        )

    q = (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", "s.src")
        .load()
        .writeStream.trigger(processingTime="0 seconds")
        .foreachBatch(mirror)
        .option("checkpointLocation", os.path.join(root, "ck"))
        .start()
    )
    lat = []
    try:
        q.processAllAvailable()
        for i in range(1, n_commits + 1):
            op = i % 4
            if op == 0:
                fmt.delete_where("s.src", "k", (i - 3) * 100, (i - 3) * 100 + 9)
            elif op == 1:
                fmt.write("s.src", rows(i), "append")
            elif op == 2:
                fmt.update_where(
                    "s.src", "k", {"val": f"'u{i}'"},
                    (i - 1) * 100, (i - 1) * 100 + 4,
                )
            else:
                fmt.merge("s.src", rows(i - 2, 10), "k")
            t0 = time.perf_counter()
            q.processAllAvailable()
            lat.append((time.perf_counter() - t0) * 1000)
    finally:
        q.stop()

    # NET the mirror (last change per key wins) and compare to source
    feed = sink.read("s.mirror")
    is_post = F.col("_change_type").isin("insert", "update_postimage")
    w = Window.partitionBy("k").orderBy(
        F.col("_commit_version").desc(), is_post.cast("int").desc()
    )
    net = (
        feed.withColumn("__alive", is_post)
        .withColumn("__rk", F.row_number().over(w))
        .filter("__rk = 1 AND __alive")
        .select("k", "val", "x")
    )
    src = fmt.read("s.src").select("k", "val", "x")
    n_src = src.count()
    diff = (
        src.exceptAll(net).count() + net.exceptAll(src).count()
    )
    print(
        json.dumps(
            {
                "probe": "cdf_stream_soak",
                "n_commits": n_commits,
                "src_rows": n_src,
                "mirror_net_diff_rows": diff,
                "trigger_ms_median": round(statistics.median(lat), 1),
                "trigger_ms_p90": round(
                    sorted(lat)[int(0.9 * len(lat))], 1
                ),
                "trigger_ms_last5_median": round(
                    statistics.median(lat[-5:]), 1
                ),
            }
        )
    )
    assert diff == 0, "mirror diverged from source"


if __name__ == "__main__":
    main()
