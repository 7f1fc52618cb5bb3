"""Scale-probe data amplifier — builds an sf1-equivalent dataset from sf0.1.

The driver-provided testdata stops at sf0.1 (~17 MB).  To check that no
headline query scales super-linearly (VERDICT r3 task #7) we need one
larger measurement point.  This tool amplifies ``/root/testdata/sf0.1``
by an integer factor (default 10) into ``/root/repo/.scale/sf1``:

- ``region``/``nation`` are dimension tables and copy through unchanged
  (TPC-H itself holds them constant across scale factors).
- Every fact table gets ``factor`` replicas with its surrogate keys
  offset by ``replica * KEY_OFFSET`` so referential integrity survives:
  customer<->orders<->lineitem keep matching, part/supplier FKs remap
  consistently, events keep their time range (more users in the same
  window — row-per-group grows, group count per time bucket does not,
  which is how real traffic scales).
- ``documents.text`` gets a per-replica suffix for replicas > 0 so the
  *duplicate rate stays constant* as the corpus grows: each replica
  reproduces sf0.1's intra-replica dup families, but replicas don't
  collapse into one giant exact-dup family (which would let the O(k)
  dup guard hide the corpus growth from the LSH chain).
- ``embeddings`` vectors are kept verbatim (timing is dominated by the
  dot-product volume, not tie structure).

Usage:

    python tools/scale_probe.py [--factor 10] [--out /root/repo/.scale/sf1]

then:

    SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf1 python bench.py

The output dir is gitignored; it is a bench artifact, not test input —
correctness tests keep running against the driver-provided parquet.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

# Larger than any surrogate key at sf0.1 (max observed ~1.5e6 at sf1
# lineitem scale); replicas never collide.
KEY_OFFSET = 1_000_000_000

DIM_TABLES = ("region", "nation")

# table -> columns that carry surrogate keys needing per-replica offsets.
KEY_COLUMNS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def amplify_table(df: DataFrame, table: str, factor: int) -> DataFrame:
    """``factor`` unioned replicas with keys offset per replica."""
    replicas = []
    for r in range(factor):
        rep = df
        for col in KEY_COLUMNS[table]:
            rep = rep.withColumn(col, F.col(col) + F.lit(r * KEY_OFFSET))
        if table == "documents" and r > 0:
            # Keep dup families intra-replica only: constant dup *rate*.
            rep = rep.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" r{r}"))
            ).withColumn("n_chars", F.length("text").cast("long"))
        replicas.append(rep)
    out = replicas[0]
    for rep in replicas[1:]:
        out = out.unionByName(rep)
    return out


def build(src: str, out: str, factor: int, spark: SparkSession) -> None:
    os.makedirs(out, exist_ok=True)
    for table in DIM_TABLES:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    for table in KEY_COLUMNS:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        amplified = amplify_table(df, table, factor)
        if table == "events":
            # The streaming readers select the events input with
            # pathGlobFilter('events.parquet'), which matches leaf FILE
            # names — the driver ships events.parquet as a single file,
            # so the amplified copy must be one too or the sf1 streaming
            # bench would silently process an empty stream.
            stage = os.path.join(out, "__events_stage")
            amplified.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(
                f for f in os.listdir(stage)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            dest = os.path.join(out, "events.parquet")
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            elif os.path.exists(dest):
                os.remove(dest)
            shutil.move(os.path.join(stage, part), dest)
            shutil.rmtree(stage)
            continue
        # Spread write across the pool: one output split per replica at
        # minimum so the downstream scan parallelizes.
        amplified.repartition(max(factor, spark.sparkContext.defaultParallelism)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{table}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    spark = get_spark("scale-probe")
    build(args.src, args.out, args.factor, spark)
    for table in list(DIM_TABLES) + list(KEY_COLUMNS):
        n = spark.read.parquet(os.path.join(args.out, f"{table}.parquet")).count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
