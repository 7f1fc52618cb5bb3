"""The full ELT sync as a Structured Streaming query (T1/T2/T7).

Reference lifecycle: the master DAG fires every 15 minutes and runs
extract → normalize → load → stage transforms with dlt's persisted
cursor (iot_master_dag.py:42-71).  Spark-native equivalent: a file
stream over each source collection's directory, with ``foreachBatch``
running the same flatten → raw-upsert body the batch pipeline uses; the
streaming *checkpoint* replaces the cursor table (exactly-once file
tracking, so the ``>=`` re-read + pk-dedup dance of the batch path is
not even needed), and ``trigger(availableNow=True)`` gives the
drain-then-stop semantics of one Airflow run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..plans.materialize import Warehouse
from ..sources.flatten import flatten_document_table
from ..sources.ingest import dedup_by_pk


class DocumentStreamSync:
    """Streams one document collection directory into the raw layer."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        collection: str,
        source_dir: str,
        checkpoint_root: str | None = None,
    ):
        self.spark = spark
        self.wh = Warehouse(spark, warehouse_root)
        self.collection = collection
        self.source_dir = source_dir
        self.checkpoint = os.path.join(
            checkpoint_root or os.path.join(warehouse_root, "_checkpoints"),
            collection,
        )
        # file streams need a declared schema: infer once from the files
        # present at setup (schema evolution would re-infer per deploy,
        # like dlt's generate-schema-through-code-generation)
        self.schema = spark.read.option("multiLine", "true").json(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        fresh = dedup_by_pk(batch_df, pk="_id")
        tables = flatten_document_table(fresh, self.collection, primary_key="_id")
        # root-key merge, same semantics as HealthPipeline.sync: child
        # deletes come from the PARENT batch's ids (an array shrunk to
        # empty emits no child rows, so child-batch keys can't drive the
        # delete), and warehouse child tables absent from this batch
        # still owe deletes for re-extracted parents
        parent_keys = (
            tables[self.collection]
            .select(F.col("_dlt_id").alias("_dlt_root_id"))
            .distinct()
        )
        for name, df in tables.items():
            if name == self.collection:
                self.wh.materialize_upsert(f"raw.{name}", df, "_dlt_id")
            else:
                self.wh.materialize_upsert(
                    f"raw.{name}", df, "_dlt_root_id", delete_keys=parent_keys
                )
        from ..fs import join_uri
        from ..plans.materialize import Warehouse

        for raw_name in self.wh.fs.list_subdirs(join_uri(self.wh.root, "raw")):
            if (
                raw_name.startswith(f"{self.collection}__")
                and raw_name not in tables
                and not raw_name.endswith(Warehouse._STAGING_SUFFIXES)
            ):
                self.wh.materialize_delete(
                    f"raw.{raw_name}", parent_keys, "_dlt_root_id"
                )

    def run_once(self) -> None:
        """One micro-batch drain (≈ one 15-minute Airflow run): process
        every not-yet-checkpointed file, then stop."""
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("multiLine", "true")
            .json(self.source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class StreamingDedupSync:
    """Streaming near-dup gate: every ingest micro-batch is LSH-checked
    against the warehouse-persisted corpus signature table BEFORE its
    own signatures join the corpus (``IncrementalDedupSync`` inside
    ``foreachBatch``), and the candidate pairs land in a warehouse
    table.

    The streaming twin of the batch dedup sync: the checkpoint replaces
    the ingest cursor (exactly-once file tracking), per-micro-batch
    work is O(batch × bucket occupancy) — the corpus never self-joins —
    and both state tables (signatures, candidates) are ordinary
    warehouse incrementals, so a 100 TB corpus's signature table lives
    wherever the warehouse root points (hdfs://s3a:).
    """

    PAIRS_TABLE = "dedup.candidates"

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        checkpoint_root: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        from ..plans.pipeline import IncrementalDedupSync

        self.spark = spark
        self.dedup = IncrementalDedupSync(spark, warehouse_root)
        self.wh = self.dedup.wh
        self.source_dir = source_dir
        self.id_col = id_col
        self.text_col = text_col
        self.checkpoint = os.path.join(
            checkpoint_root or os.path.join(warehouse_root, "_checkpoints"),
            "dedup_sync",
        )
        self.schema = spark.read.option("multiLine", "true").json(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        docs = batch_df.select(self.id_col, self.text_col)
        if docs.isEmpty():  # no new files this trigger — no state change
            return
        pairs = self.dedup.sync(docs, self.id_col, self.text_col)
        # Replay semantics: if a run dies between sync()'s signature
        # append and the checkpoint commit, the replayed batch hits the
        # overlapping-id guard in incremental_lsh_candidates and ABORTS
        # loudly — at-least-once with a loud duplicate trip, never a
        # silent double-count of the same ids in the corpus state.
        self.wh.materialize_incremental(self.PAIRS_TABLE, pairs)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed ingest file, then stop."""
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("multiLine", "true")
            .json(self.source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class StreamingAggSync:
    """Streaming rollup maintenance: each micro-batch's partial sums
    merge into the warehouse aggregate (``IncrementalAggSync`` inside
    ``foreachBatch``) — the stored rollup is always current and is
    NEVER recomputed from fact history.

    The streaming checkpoint supplies the disjoint-batch contract the
    merge requires (each fact file processed exactly once), closing the
    loop the batch class documents: checkpoint/cursor upstream, additive
    merge downstream.  State is an ordinary warehouse table, so the
    15-minute reference cadence becomes "rollup lag = one trigger" at
    any corpus size.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        group_cols: tuple[str, ...],
        sum_cols: tuple[str, ...],
        checkpoint_root: str | None = None,
    ):
        from ..plans.pipeline import IncrementalAggSync

        self.spark = spark
        self.agg = IncrementalAggSync(
            spark, warehouse_root, table_name, group_cols, sum_cols
        )
        self.source_dir = source_dir
        self.checkpoint = os.path.join(
            checkpoint_root or os.path.join(warehouse_root, "_checkpoints"),
            f"agg_sync_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.agg.sync(batch_df)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed fact file, then stop."""
        stream = self.spark.readStream.schema(self.schema).parquet(self.source_dir)
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def read(self):
        return self.agg.read()
