"""Materialized-view refresh cost vs the reference's recompute shape
(round 15): as source history grows, ``REFRESH MATERIALIZED VIEW``
should stay FLAT (O(delta + touched groups) — it reads only the
commits since the applied cursor) while the full GROUP BY recompute
(the reference's aggregate-DAG cadence,
dags/iot_dwh_agg_transform_daily.py:75) grows with accumulated
history.

Usage: ``python tools/matview_probe.py [n_rounds] [rows_per_round]``
→ per-round JSON lines plus one summary line for PERF_NOTES.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.sql_frontend import (
        SqlFrontend,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("matview_probe")
    root = tempfile.mkdtemp(prefix="mvprobe_")
    fmt = CatalogManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("k",), cdf=True
    )
    wh = Warehouse(spark, root, table_format=fmt)
    sq = SqlFrontend(wh)

    def batch(i: int):
        # ~1k groups per batch (dev x day), deterministic
        return (
            spark.range(i * per_round, (i + 1) * per_round)
            .withColumnRenamed("id", "k")
            .withColumn("dev", F.concat(F.lit("d"), F.col("k") % 40))
            .withColumn(
                "day",
                F.date_add(F.lit("2024-01-01"), (F.col("k") % 25).cast("int")),
            )
            .withColumn("ts", F.col("day").cast("timestamp"))
            .drop("day")
            .withColumn("v", (F.col("k") % 1000).cast("double"))
        )

    fmt.write("s.facts", batch(0), "overwrite")
    sq.sql(
        "CREATE MATERIALIZED VIEW agg.daily AS "
        "SELECT dev, DATE_TRUNC('day', ts) AS day, SUM(v) AS total, "
        "COUNT(*) AS n FROM s.facts GROUP BY dev, day"
    )

    refresh_s, recompute_s = [], []
    for i in range(1, n_rounds + 1):
        fmt.write("s.facts", batch(i), "append")
        t0 = time.perf_counter()
        sq.sql("REFRESH MATERIALIZED VIEW agg.daily")
        dt_refresh = time.perf_counter() - t0
        t0 = time.perf_counter()
        # the reference shape: re-aggregate the WHOLE source and
        # REWRITE the aggregate table (dbt table materialization —
        # the recompute is a write job too, not a bare read)
        fmt.write(
            "agg.recompute",
            fmt.read("s.facts")
            .groupBy("dev", F.date_trunc("day", "ts").alias("day"))
            .agg(F.sum("v").alias("total"), F.count("*").alias("n")),
            "overwrite",
        )
        dt_recompute = time.perf_counter() - t0
        refresh_s.append(round(dt_refresh, 3))
        recompute_s.append(round(dt_recompute, 3))
        print(
            json.dumps(
                {
                    "round": i,
                    "history_rows": (i + 1) * per_round,
                    "refresh_s": refresh_s[-1],
                    "recompute_s": recompute_s[-1],
                }
            ),
            flush=True,
        )

    half = max(1, n_rounds // 2)
    print(
        json.dumps(
            {
                "probe": "matview_refresh_vs_recompute",
                "rows_per_round": per_round,
                "n_rounds": n_rounds,
                "refresh_first_half_mean_s": round(
                    sum(refresh_s[:half]) / half, 3
                ),
                "refresh_second_half_mean_s": round(
                    sum(refresh_s[-half:]) / half, 3
                ),
                "recompute_first_half_mean_s": round(
                    sum(recompute_s[:half]) / half, 3
                ),
                "recompute_second_half_mean_s": round(
                    sum(recompute_s[-half:]) / half, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
