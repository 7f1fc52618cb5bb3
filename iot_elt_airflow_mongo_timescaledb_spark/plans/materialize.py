"""Incremental materialization — the dbt layer's physical operators.

Reference semantics reproduced exactly (SURVEY §2.6):

- M1 incremental append: first run = CREATE TABLE AS; later runs render
  the high-watermark predicate ``col > MAX(col in target)`` (strictly
  greater — quirk §2.9.8: late rows sharing the max are dropped) with
  the COALESCE defaults of macros/get_max_insert_timestamp.sql:6-11.
- M2 incremental upsert on a unique key (models/stage/users.sql:2-5):
  Delta MERGE semantics emulated on plain parquet via anti-join + union
  rewrite (no Delta jars in this image).
- M3 view materialization (examples models, dbt_project.yml:40-42).
- M4 schema namespaces -> path prefixes ``<root>/<schema>/<table>``.

Scale notes: appends are plain parquet dir appends partitioned by the
watermark key when it is a date-string (partition pruning for readers +
the MAX lookup only lists partition values); the upsert rewrite is the
one operation that would use Delta/Iceberg MERGE on a real deployment —
called out in the docstring rather than hidden.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import DEFAULT_DATESTRING_WATERMARK, DEFAULT_EPOCH_WATERMARK


class Warehouse:
    """Parquet-backed warehouse with ``schema.table`` namespacing (M4)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, name: str) -> str:
        schema, _, tbl = name.rpartition(".")
        return os.path.join(self.root, schema or "default", tbl)

    def exists(self, name: str) -> bool:
        """True iff the target holds data.  Walks into partition
        subdirectories — a day-partitioned table has no parquet files at
        its root, and missing them would silently turn every incremental
        append into a full overwrite."""
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        for _root, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, name: str) -> DataFrame:
        # a committed staging copy facing an uncommitted target (a dead
        # two-phase rewrite, whichever method ran it) is restored before
        # reading — never hand out a half-written table
        self._recover_staging(name)
        # mergeSchema: batches may have evolved (documents grow fields);
        # appended files with new columns must still read as one table
        return self.spark.read.option("mergeSchema", "true").parquet(self.path(name))

    # every two-phase rewrite suffix — recovery must check them ALL, not
    # just the calling method's own: a compact() phase-2 death must be
    # recovered by the next upsert()/read() too, or they would silently
    # merge against the half-written target
    _STAGING_SUFFIXES = ("__staging", "__compact")

    def _recover_staging(self, name: str) -> None:
        for suf in self._STAGING_SUFFIXES:
            self._recover_or_clear_staging(name, self.path(name) + suf)

    def _recover_or_clear_staging(self, name: str, tmp: str) -> None:
        """Resolve a staging dir left by a previous two-phase rewrite.

        If that run died mid phase 2 the target is partial (no _SUCCESS
        commit marker) and staging is the sole intact copy — deleting it
        here and then lazily reading the half-written target would
        silently rebuild the table from partial data.  So: a committed
        staging copy facing an uncommitted target is RESTORED to the
        target; only a staging dir whose target did commit (or which
        itself never committed — a phase-1 death leaves the target
        untouched) is deleted as stale.
        """
        if not os.path.isdir(tmp):
            return
        staging_committed = os.path.exists(os.path.join(tmp, "_SUCCESS"))
        target_committed = os.path.exists(
            os.path.join(self.path(name), "_SUCCESS")
        )
        if staging_committed and not target_committed:
            shutil.rmtree(self.path(name), ignore_errors=True)
            shutil.move(tmp, self.path(name))
        else:
            shutil.rmtree(tmp, ignore_errors=True)

    # ------------------------------------------------------------------
    # M1 — incremental append with strict > watermark
    # ------------------------------------------------------------------

    def materialize_incremental(
        self,
        name: str,
        df: DataFrame,
        watermark_col: str | None = None,
        watermark_default=None,
        partition_by: tuple[str, ...] = (),
        sort_within: str | None = None,
    ) -> DataFrame:
        """First run writes everything; later runs append only rows with
        ``watermark_col`` strictly above the target's max (A4 lookup +
        P4 filter + P8 coalesce default).

        ``sort_within`` clusters rows inside each output file (O3 — the
        reference's dbt-timescaledb ``order_by='device_id'`` physical
        hint, stage/*.sql:3): parquet min/max page stats then let
        readers skip row groups on that column."""
        if sort_within is not None:
            df = df.sortWithinPartitions(sort_within)
        if self.exists(name):
            if watermark_col is not None:
                target = self.read(name)
                default = watermark_default
                if default is None:
                    default = _default_for(target.schema[watermark_col].dataType)
                row = target.agg(
                    F.coalesce(F.max(watermark_col), F.lit(default)).alias("wm")
                ).first()
                df = df.filter(F.col(watermark_col) > F.lit(row["wm"]))
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.path(name))
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.path(name))
        return self.read(name)

    # ------------------------------------------------------------------
    # M2 — upsert by unique key (MERGE emulation on plain parquet)
    # ------------------------------------------------------------------

    def materialize_upsert(self, name: str, df: DataFrame, unique_key: str) -> DataFrame:
        """Reference: ``unique_key='user_id'`` on stage users — incoming
        rows replace target rows with the same key.  On Delta/Iceberg
        this is MERGE INTO; on plain parquet we rewrite: keep target
        rows whose key is absent from the batch (left anti), union the
        batch, overwrite."""
        # resolve any staging dir from a previous failed run FIRST —
        # whichever method left it: it may be the sole intact copy of
        # the table (phase-2 death), in which case it is restored, not
        # deleted — see _recover_or_clear_staging
        tmp = self.path(name) + "__staging"
        self._recover_staging(name)
        if self.exists(name):
            target = self.read(name)
            target, df = align_schemas(target, df)
            keep = target.join(
                df.select(unique_key).distinct(), unique_key, "left_anti"
            )
            merged = keep.unionByName(df, allowMissingColumns=True)
        else:
            merged = df
        # two-phase write: the source of the overwrite is the target itself.
        # The staging copy is removed ONLY after the target rewrite lands —
        # if phase 2 dies mid-overwrite the target is partial and the
        # staging dir is the sole intact copy, so a finally-cleanup here
        # would destroy the data it exists to protect.  (A failed run
        # leaves the dir; the NEXT call restores or clears it above —
        # never deletes the only committed copy.)
        # Partition layout survives the rewrite: the merged frame carries
        # partition values as plain columns, so without re-applying
        # partitionBy the upsert would silently flatten a day-partitioned
        # table and readers would lose pruning (compact() restores the
        # layout the same way).
        part_cols = _partition_columns(self.path(name)) if self.exists(name) else []
        w = merged.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(tmp)
        w2 = self.spark.read.parquet(tmp).write.mode("overwrite")
        if part_cols:
            w2 = w2.partitionBy(*part_cols)
        w2.parquet(self.path(name))
        shutil.rmtree(tmp, ignore_errors=True)
        return self.read(name)

    def compact(self, name: str, target_files: int = 1) -> DataFrame:
        """Small-file compaction.  A 15-minute incremental append writes
        ~96 files/day/partition; scans degrade with file count (driver
        listing + per-file open cost), so periodic compaction rewrites
        the table into ``target_files`` per partition.

        Plain-parquet version of OPTIMIZE on Delta/Iceberg; the two-phase
        staging write keeps the read-own-overwrite safe.  Partition
        columns are restored on rewrite (coalesce only bounds files per
        partition directory).
        """
        tmp = self.path(name) + "__compact"
        self._recover_staging(name)  # may restore the target, any suffix
        df = self.read(name)
        part_cols = _partition_columns(self.path(name))
        writer = df.coalesce(max(1, target_files)) if not part_cols else df.repartition(
            max(1, target_files), *part_cols
        )
        w = writer.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(tmp)
        out = self.spark.read.parquet(tmp)
        w2 = out.write.mode("overwrite")
        if part_cols:
            w2 = w2.partitionBy(*part_cols)
        w2.parquet(self.path(name))
        # removed only after the target rewrite succeeded — see upsert
        shutil.rmtree(tmp, ignore_errors=True)
        return self.read(name)

    # ------------------------------------------------------------------
    # M3 — view materialization
    # ------------------------------------------------------------------

    def materialize_view(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name.replace(".", "__"))
        return df


def align_schemas(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema evolution (the dlt normalizer's type contract, SURVEY §7
    "hard parts"): shared columns are cast to the widened common type
    (int -> long -> double; anything incompatible -> string), columns
    present on only one side are filled via unionByName(allowMissing).
    """
    from pyspark.sql import types as T

    def widen(t1, t2):
        # nullability-insensitive equality: array<string> with different
        # containsNull flags is the SAME type, not a string-cast conflict
        if t1.simpleString() == t2.simpleString():
            return t1
        num_rank = {
            T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2,
            T.LongType(): 3, T.FloatType(): 4, T.DoubleType(): 5,
        }
        if t1 in num_rank and t2 in num_rank:
            return t1 if num_rank[t1] >= num_rank[t2] else t2
        return T.StringType()

    for name in set(a.columns) & set(b.columns):
        ta, tb = a.schema[name].dataType, b.schema[name].dataType
        if ta.simpleString() != tb.simpleString():
            w = widen(ta, tb)
            if ta.simpleString() != w.simpleString():
                a = a.withColumn(name, F.col(name).cast(w))
            if tb.simpleString() != w.simpleString():
                b = b.withColumn(name, F.col(name).cast(w))
    return a, b


def _partition_columns(path: str) -> list[str]:
    """Partition column names from the hive-style directory layout."""
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d for d in (os.listdir(cur) if os.path.isdir(cur) else [])
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subdirs:
            return cols
        col = subdirs[0].split("=", 1)[0]
        cols.append(col)
        cur = os.path.join(cur, subdirs[0])


def _default_for(dtype) -> object:
    """P8 — the reference's empty-target watermark defaults."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.TimestampType):
        import datetime

        return datetime.datetime.fromtimestamp(
            DEFAULT_EPOCH_WATERMARK, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return DEFAULT_EPOCH_WATERMARK
    return DEFAULT_DATESTRING_WATERMARK


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> DataFrame:
    """Bucketed catalog table — the co-located-join layout (SURVEY §4 /
    O3).

    Writing both sides of a recurring join bucketed (and optionally
    sorted) on the join key lets Spark plan the join with ZERO Exchange
    nodes: each bucket pairs with its counterpart directly.  This is the
    parquet equivalent of the reference's dbt-timescaledb
    ``order_by='device_id'`` physical hint (stage/*.sql:3) plus its
    hypertable chunking, and the standard answer to "this join runs
    every 15 minutes on 100 TB — stop shuffling it".

    Requires a catalog table (``saveAsTable``); plain ``.parquet(path)``
    writes cannot carry bucket metadata.
    """
    # drop any previous incarnation — a fresh in-memory catalog does not
    # know about a leftover managed-table directory from an earlier
    # session, and saveAsTable refuses to reuse the location
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        table_name.lower(),
    )
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def materialize_replace(
    wh: "Warehouse", name: str, df: DataFrame, partition_by: tuple[str, ...] = ()
) -> DataFrame:
    """S12 'replace' write disposition — full refresh (dlt
    write_disposition='replace', dlt_sources/mongodb/__init__.py:61-67):
    drop whatever the target holds and rewrite it from this batch.

    Staged like upsert/compact: the batch lands in ``__staging`` first,
    then swaps in.  A death mid-swap leaves a committed staging copy
    next to a missing/uncommitted target, which ``_recover_staging``
    (run by every read) restores — an in-place overwrite would instead
    leave a silently readable half-table."""
    tmp = wh.path(name) + "__staging"
    wh._recover_staging(name)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    shutil.rmtree(wh.path(name), ignore_errors=True)
    shutil.move(tmp, wh.path(name))
    return wh.read(name)
