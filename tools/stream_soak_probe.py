"""FULL streaming production-path soak (r12, VERDICT r11 task 7).

The pieces existed separately (StreamingUpsertSink ingest, maintained
rollup ``IncrementalAggSync.sync_from_cdf``, maintained ANN
``IncrementalANNSync.sync_from_cdf``); this drives them as ONE chain
on a catalog warehouse for N triggers:

  landing dir  --readStream-->  foreachBatch MERGE into raw.vecs
               --CDF-->         maintained additive rollup
               --CDF-->         maintained ANN index (MOR retractions,
                                auto-purged dv debt)

with a KILL + REPLAY in the middle:

- at cycle N/2 a crash-after-commit-before-checkpoint is simulated by
  re-invoking the sink's foreachBatch body with the PREVIOUS batch
  (the at-least-once replay Structured Streaming delivers on restart),
- then every Python object is discarded and rebuilt from the same
  warehouse root + checkpoints (the restart), and the soak continues.

Verified at the end (the exactly-once invariants, through the kill):
- raw table == the driver-tracked expected upsert state;
- rollup == recompute from the final raw table;
- ANN membership == raw key set AND index-served top-k ==
  recompute-served top-k against the same codebook.

Per-cycle walls print as JSON lines; the verdict criterion is
FLATNESS (last-third averages vs first-third) plus all invariants.

Usage: ``python tools/stream_soak_probe.py [n_cycles] [batch_rows]``
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16


def _key(i: int) -> str:
    return hashlib.md5(f"vec-{i}".encode()).hexdigest()[:16]


def _vec(i: int, salt: int) -> list[float]:
    # deterministic pseudo-embedding; salt shifts updates' values
    h = hashlib.md5(f"v-{i}-{salt}".encode()).digest()
    return [float(b % 97) / 97.0 for b in h[:DIM]]


def main() -> None:
    from pyspark.sql import functions as F

    from iot_elt_airflow_mongo_timescaledb_spark.plans.ann_index import (
        IncrementalANNSync,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalAggSync,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingUpsertSink,
    )

    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("stream_soak")
    root = tempfile.mkdtemp(prefix="stream_soak_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)

    def mk_fmt():
        return CatalogManifestFormat(
            spark, os.path.join(root, "wh"),
            stats_cols=("vec_id",), cdf=True, auto_compact_dirs=16,
            auto_purge_dvs=8,
        )

    def mk_chain(fmt):
        sink = StreamingUpsertSink(
            spark, os.path.join(root, "wh"), landing, "raw.vecs",
            "vec_id", table_format=fmt,
        )
        agg = IncrementalAggSync(
            spark, os.path.join(root, "wh"), "agg.by_group",
            group_cols=("grp",), sum_cols=("value",),
            table_format=fmt,
        )
        ann = IncrementalANNSync(
            spark, os.path.join(root, "wh"), "agg.ann", table_format=fmt
        )
        return sink, agg, ann

    def batch_df(cycle: int):
        # 70% new keys, 30% updates of the previous cycle's keys
        new_lo = cycle * batch_rows
        rows = []
        for j in range(int(batch_rows * 0.7)):
            i = new_lo + j
            rows.append((_key(i), _vec(i, 0), i % 8, (i % 1000)))
        if cycle > 0:
            upd_lo = (cycle - 1) * batch_rows
            for j in range(int(batch_rows * 0.3)):
                i = upd_lo + j
                rows.append(
                    (_key(i), _vec(i, cycle), i % 8, (i % 1000) + cycle)
                )
        return spark.createDataFrame(
            rows,
            "vec_id string, embedding array<float>, grp int, value long",
        )

    def land(df, cycle):
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"batch-{cycle:04d}")
        )
        # one flat file per trigger: the file stream tracks files, so
        # move the part file up (dir-per-batch keeps writes atomic)
        d = os.path.join(landing, f"batch-{cycle:04d}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.move(
                    os.path.join(d, f),
                    os.path.join(landing, f"batch-{cycle:04d}.parquet"),
                )
        shutil.rmtree(d)

    fmt = mk_fmt()
    # seed + train the codebook on cycle 0's content
    seed = batch_df(0)
    land(seed, 0)
    sink, agg, ann = mk_chain(fmt)
    t0 = time.perf_counter()
    sink.run_once()
    ann.train_from_table(fmt, "raw.vecs", cluster_col="grp")
    agg.sync_from_cdf(fmt, "raw.vecs")
    print(json.dumps({"cycle": 0, "wall_s": round(time.perf_counter() - t0, 2),
                      "phase": "seed+train"}))

    kill_at = n_cycles // 2
    walls = []
    prev_batch = None
    for cycle in range(1, n_cycles):
        if cycle == kill_at and prev_batch is not None:
            # the KILL: crash fell between the previous trigger's table
            # commit and its checkpoint commit.  On restart Structured
            # Streaming re-delivers that batch (same data, same id)
            # BEFORE any later file — simulate exactly that order:
            # replay, resync the consumers, rebuild every object from
            # the same warehouse + checkpoints, then continue.
            sink._process_batch(prev_batch, cycle - 1)
            agg.sync_from_cdf(fmt, "raw.vecs")
            ann.sync_from_cdf(fmt, "raw.vecs", mor=True)
            fmt = mk_fmt()
            sink, agg, ann = mk_chain(fmt)
            print(json.dumps({"cycle": cycle, "phase": "kill+replay"}),
                  flush=True)
        b = batch_df(cycle)
        land(b, cycle)
        t0 = time.perf_counter()
        sink.run_once()
        t_ingest = time.perf_counter() - t0
        t0 = time.perf_counter()
        agg.sync_from_cdf(fmt, "raw.vecs")
        t_agg = time.perf_counter() - t0
        t0 = time.perf_counter()
        ann.sync_from_cdf(fmt, "raw.vecs", mor=True)
        t_ann = time.perf_counter() - t0
        walls.append((t_ingest, t_agg, t_ann))
        print(json.dumps({
            "cycle": cycle,
            "ingest_s": round(t_ingest, 2),
            "agg_sync_s": round(t_agg, 2),
            "ann_sync_s": round(t_ann, 2),
        }), flush=True)
        prev_batch = b

    # -- invariants ---------------------------------------------------------
    raw = fmt.read("raw.vecs")
    got_state = {
        r["vec_id"]: r["value"]
        for r in raw.select("vec_id", "value").collect()
    }
    # the driver-tracked expected upsert state, replayed from the
    # same generation rule (update wins over the insert it replaces)
    exp_state = {}
    for cycle in range(0, n_cycles):
        new_lo = cycle * batch_rows
        for j in range(int(batch_rows * 0.7)):
            i = new_lo + j
            exp_state[_key(i)] = i % 1000
        if cycle > 0:
            upd_lo = (cycle - 1) * batch_rows
            for j in range(int(batch_rows * 0.3)):
                i = upd_lo + j
                exp_state[_key(i)] = (i % 1000) + cycle
    raw_ok = got_state == exp_state

    stored = agg.read().select("grp", "sum_value", "n_rows")
    recomputed = raw.groupBy("grp").agg(
        F.sum("value").alias("sum_value"), F.count("*").alias("n_rows")
    )
    agg_ok = (
        stored.exceptAll(recomputed).isEmpty()
        and recomputed.exceptAll(stored).isEmpty()
    )

    members = {
        r["vec_id"]
        for r in ann.wh.read(ann.assign_table).select("vec_id").collect()
    }
    ann_member_ok = members == set(exp_state)
    queries = raw.filter(F.col("grp") == 3).limit(5).select(
        "vec_id", "embedding"
    )
    served = ann.topk(queries, k=3, n_probe=2)
    recomp = ann.recompute_topk(raw, queries, k=3, n_probe=2)
    def rows(df):
        return {
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in df.collect()
        }
    ann_serve_ok = rows(served) == rows(recomp)

    third = max(1, len(walls) // 3)
    first = walls[:third]
    last = walls[-third:]
    def avg(ws, i):
        return round(sum(w[i] for w in ws) / len(ws), 2)
    summary = {
        "probe": "stream_soak",
        "n_cycles": n_cycles,
        "batch_rows": batch_rows,
        "raw_state_ok": raw_ok,
        "rollup_eq_recompute": agg_ok,
        "ann_membership_eq_corpus": ann_member_ok,
        "ann_served_eq_recompute": ann_serve_ok,
        "first_third_avg": {
            "ingest_s": avg(first, 0), "agg_s": avg(first, 1),
            "ann_s": avg(first, 2),
        },
        "last_third_avg": {
            "ingest_s": avg(last, 0), "agg_s": avg(last, 1),
            "ann_s": avg(last, 2),
        },
    }
    print(json.dumps(summary), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    ok = raw_ok and agg_ok and ann_member_ok and ann_serve_ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
