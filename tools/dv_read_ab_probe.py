"""Positional-vs-equality deletion-vector READ A/B (r12, VERDICT r11
task 2's acceptance).

The scenario where the forms diverge: a WIDE table (many dirs, all
may-match on the merge key because appends can't cluster a random
key), a MERGE whose matched keys live in ONE dir.

- equality form: the key mask applies-scopes to EVERY may-match dir —
  the whole table pays the key-file anti-join at read time;
- positional form: the mask names (file, row-index) pairs, so applies
  scopes to the files that actually contain deleted rows — every other
  dir reads clean.

Measured (median of 5, full-scan count):
- clean: the table before any MOR merge;
- eq_masked: after an equality-form merge_mor;
- pos_masked: after the identical positional-form merge_mor.

Acceptance: pos_masked within ~10% of clean while eq_masked pays the
join; both forms byte-identical row sets.

Usage: python tools/dv_read_ab_probe.py  (one JSON line; uses
$SPARK_GRAFT_SF_DIR events as the row source, default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_elt_airflow_mongo_timescaledb_spark.fs import scratch_dir
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)
from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark


def _timed(fn, reps=5) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3)


def main() -> None:
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dv_read_ab")
    # 8x-replicated lineitem (distinct keys per copy): big enough that
    # per-row scan/join cost dominates the fixed per-rep planning cost
    # of the union+join shape — the regime a real table lives in
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ev = (
        li.crossJoin(spark.range(8).select(F.col("id").alias("__copy")))
        .withColumn(
            "k",
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey"),
                    F.col("l_linenumber"),
                    F.col("__copy"),
                )
            ),
        )
        .drop("__copy")
    )
    n_dirs = 16
    root = scratch_dir(spark, "dvab_")
    fmts = {
        "clean": ManifestFormat(spark, root + "/c", auto_compact_dirs=None),
        "equality": ManifestFormat(
            spark, root + "/e", auto_compact_dirs=None, dv_form="equality"
        ),
        "positional": ManifestFormat(
            spark, root + "/p", auto_compact_dirs=None, dv_form="positional"
        ),
    }
    try:
        # identical 16-dir seed in all three warehouses: md5-scrambled
        # keys, every dir's [min, max] spans the key space (all
        # may-match on any merge)
        for i in range(n_dirs):
            chunk = ev.filter(F.pmod(F.xxhash64("k"), n_dirs) == i)
            for fmt in fmts.values():
                fmt.write("ab.t", chunk, "append" if i else "overwrite")
        # the merge: matched keys all live in ONE dir (slice 3); the
        # clean twin never merges — it is the no-debt baseline
        batch = (
            ev.filter(F.pmod(F.xxhash64("k"), n_dirs) == 3)
            .limit(2000)
            .withColumn("l_comment", F.lit("upserted"))
        )
        fmts["equality"].merge_mor("ab.t", batch, "k")
        fmts["positional"].merge_mor("ab.t", batch, "k")

        # a REAL scan workload (count() short-circuits to footer counts)
        def scan(fmt):
            return (
                fmt.read("ab.t")
                .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
                .collect()
            )

        for fmt in fmts.values():  # untimed warm-up of every plan shape
            scan(fmt)
        # INTERLEAVED timing: round-robin across the three tables so
        # JVM/page-cache warmth cannot bias one form's baseline
        walls = {k: [] for k in fmts}
        for _rep in range(7):
            for k, fmt in fmts.items():
                t0 = time.perf_counter()
                scan(fmt)
                walls[k].append(time.perf_counter() - t0)
        med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
        out = {"clean_s": med["clean"]}
        for form in ("equality", "positional"):
            m = fmts[form]._manifest("ab.t")
            out[form] = {
                "masked_s": med[form],
                "masked_over_clean": round(med[form] / med["clean"], 3),
                "dv_applies_entries": len(m["dv"][-1]["applies"]),
                "total_entries": len(m["entries"]),
            }
        rows = {
            form: fmts[form].read("ab.t").count()
            for form in ("equality", "positional")
        }
        out["rows_identical"] = rows["equality"] == rows["positional"]
        print(json.dumps({"probe": "dv_read_ab", **out}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
