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

from pyspark.sql import SparkSession

from ..fs import join_uri
from ..plans.materialize import Warehouse
from ..sources.flatten import flatten_document_table
from ..sources.ingest import dedup_by_pk


def _drain_once(spark, schema, source_dir, checkpoint, process_batch, fmt="json"):
    """Shared drain-then-stop runner (≈ one 15-minute Airflow run):
    ``foreachBatch`` over every not-yet-checkpointed source file with
    ``trigger(availableNow=True)``.  One implementation so the sync
    classes cannot drift on checkpoint/trigger semantics."""
    reader = spark.readStream.schema(schema)
    stream = (
        reader.option("multiLine", "true").json(source_dir)
        if fmt == "json"
        else reader.parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            collection,
        )
        # file streams need a declared schema: infer once from the files
        # present at setup (schema evolution would re-infer per deploy,
        # like dlt's generate-schema-through-code-generation)
        self.schema = spark.read.option("multiLine", "true").json(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        from ..plans.pipeline import root_key_merge

        fresh = dedup_by_pk(batch_df, pk="_id")
        tables = flatten_document_table(fresh, self.collection, primary_key="_id")
        # ONE root-key merge implementation, shared with
        # HealthPipeline.sync — the batch and streaming paths cannot
        # diverge on delete-set semantics
        root_key_merge(self.wh, self.collection, tables)

    def run_once(self) -> None:
        """One micro-batch drain: process every not-yet-checkpointed
        file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch,
        )


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
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            "dedup_sync",
        )
        self.schema = spark.read.option("multiLine", "true").json(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        docs = batch_df.select(self.id_col, self.text_col)
        if docs.isEmpty():  # no new files this trigger — no state change
            return
        # Replay semantics (foreachBatch is at-least-once): sync runs in
        # "recover" mode — a replayed batch whose signatures already
        # landed excludes its own ids from the corpus side and
        # recomputes exactly its original candidate pairs — and pairs
        # already present in the candidates table are anti-joined away
        # before an APPEND-ONLY write, so re-landing is idempotent at
        # O(batch) write cost (an upsert here would rewrite the whole
        # accumulated pair table every 15-minute trigger).  The key is
        # md5 over length-prefixed components: ids containing the
        # separator cannot collide distinct pairs.
        pairs = self.dedup.sync(
            docs, self.id_col, self.text_col, on_redelivery="recover"
        )

        def enc(c):
            s = F.col(c).cast("string")
            return F.concat(F.length(s).cast("string"), F.lit(":"), s)

        keyed = pairs.withColumn(
            "__pair_key", F.md5(F.concat_ws("|", enc("id_a"), enc("id_b")))
        )
        if self.wh.exists(self.PAIRS_TABLE):
            keyed = keyed.join(
                self.wh.read(self.PAIRS_TABLE).select("__pair_key"),
                "__pair_key",
                "left_anti",
            ).localCheckpoint()  # pin: the append lists the table it reads
        self.wh.materialize_incremental(self.PAIRS_TABLE, keyed)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed ingest file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch,
        )


class StreamingAggSync:
    """Streaming rollup maintenance: each micro-batch's partial sums
    merge into the warehouse aggregate (``IncrementalAggSync`` inside
    ``foreachBatch``) — the stored rollup is always current and is
    NEVER recomputed from fact history.

    foreachBatch is AT-LEAST-once (a crash between the sink write and
    the streaming commit replays the batch), so the micro-batch id is
    passed into ``IncrementalAggSync.sync`` and committed inside the
    same atomic table swap as the merged sums — a replayed batch is
    detected there and skipped, making the additive merge exactly-once
    end to end.  State is an ordinary warehouse table, so the
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
        watermark_col: str | None = None,
    ):
        from ..plans.pipeline import IncrementalAggSync

        self.spark = spark
        self.agg = IncrementalAggSync(
            spark, warehouse_root, table_name, group_cols, sum_cols,
            watermark_col=watermark_col,
        )
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"agg_sync_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.agg.sync(batch_df, batch_id=batch_id)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed fact file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.agg.read()


class StreamingDistinctSync:
    """Streaming distinct-count maintenance: each micro-batch's partial
    HLL sketches merge into the warehouse sketch rollup
    (``IncrementalDistinctSync`` inside ``foreachBatch``) — the twin of
    ``StreamingAggSync`` for the one metric that is not an additive
    semigroup.  The micro-batch id rides the same atomic swap as the
    merged sketches, so at-least-once replays are exactly-once on the
    stored state; stored sketches regrain to any coarser level at read
    time with no fact rescan."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        group_cols: tuple[str, ...],
        distinct_col: str,
        lgk: int = 12,
        checkpoint_root: str | None = None,
        watermark_col: str | None = None,
    ):
        from ..plans.pipeline import IncrementalDistinctSync

        self.spark = spark
        self.agg = IncrementalDistinctSync(
            spark, warehouse_root, table_name, group_cols, distinct_col, lgk,
            watermark_col=watermark_col,
        )
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"hll_sync_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.agg.sync(batch_df, batch_id=batch_id)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed fact file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.agg.read()

    def estimate(self, to_grain: list[str]):
        return self.agg.estimate(to_grain)


class StreamingHistSync:
    """Streaming quantile maintenance: each micro-batch's partial bin
    counts merge element-wise into the warehouse histogram rollup
    (``IncrementalHistSync`` inside ``foreachBatch``) — the sketch-
    family twin next to ``StreamingAggSync`` (sums) and
    ``StreamingDistinctSync`` (HLL).  Same delivery contract: the
    micro-batch id rides the same atomic swap as the merged bins, so
    at-least-once replays are exactly-once on the stored state, and the
    p50/p90/p99 readouts stay one trigger behind the stream at any
    corpus size."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        group_cols: tuple[str, ...],
        value_col: str,
        lo: float,
        hi: float,
        n_bins: int = 64,
        checkpoint_root: str | None = None,
        watermark_col: str | None = None,
    ):
        from ..plans.pipeline import IncrementalHistSync

        self.spark = spark
        self.agg = IncrementalHistSync(
            spark, warehouse_root, table_name, group_cols, value_col,
            lo, hi, n_bins, watermark_col=watermark_col,
        )
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"hist_sync_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.agg.sync(batch_df, batch_id=batch_id)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed fact file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.agg.read()

    def estimate(self, to_grain: list[str], ps=(0.5, 0.9, 0.99)):
        return self.agg.estimate(to_grain, ps)


class StreamingTopKSync:
    """Streaming heavy-hitters maintenance: each micro-batch's truncated
    per-group count map merges into the warehouse top-k rollup
    (``IncrementalTopKSync`` inside ``foreachBatch``) — the fourth
    sync twin beside sums, HLL and histograms.  Same delivery
    contract: the micro-batch id rides the same atomic swap as the
    merged maps, so at-least-once replays are exactly-once on the
    stored state.  Accuracy inherits the batch class's cap contract
    (exact while a group's item count stays within ``cap``; heavy
    hitters with margin beyond it)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        group_cols: tuple[str, ...],
        item_col: str,
        k: int = 10,
        cap: int | None = None,
        checkpoint_root: str | None = None,
        watermark_col: str | None = None,
    ):
        from ..plans.pipeline import IncrementalTopKSync

        self.spark = spark
        self.agg = IncrementalTopKSync(
            spark, warehouse_root, table_name, group_cols, item_col,
            k=k, cap=cap, watermark_col=watermark_col,
        )
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"topk_sync_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.agg.sync(batch_df, batch_id=batch_id)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed fact file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.agg.read()


class StreamingANNSync:
    """Streaming ANN-index maintenance: each micro-batch of new
    vectors assigns to the frozen codebook and appends to the
    warehouse assignments table (``IncrementalANNSync.sync`` inside
    ``foreachBatch``) — the index is always ~one trigger behind the
    vector stream and is never rebuilt from history.

    Exactly-once: the micro-batch id rides the manifest's
    idempotent-writer watermark under a DEDICATED app id
    (``ann_stream``) so foreachBatch replays no-op, and the id stream
    never collides with the change-feed cursor ``sync_from_changes``
    keeps under its own app id.  Requires a manifest-format warehouse
    (on plain parquet the appends are at-least-once).  ``train`` must
    have run before the first trigger — assignment needs a codebook.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        name: str,
        checkpoint_root: str | None = None,
        table_format=None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        bits: int = 8,
    ):
        from ..plans.ann_index import IncrementalANNSync

        self.spark = spark
        self.idx = IncrementalANNSync(
            spark, warehouse_root, name, table_format=table_format,
            bits=bits,
        )
        self.id_col, self.vec_col = id_col, vec_col
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"ann_sync_{name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.idx.sync(
            batch_df, batch_id=batch_id, id_col=self.id_col,
            vec_col=self.vec_col, app_id="ann_stream",
        )

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed vector file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def topk(self, queries, k: int = 3, n_probe: int = 1):
        return self.idx.topk(
            queries, self.id_col, self.vec_col, k=k, n_probe=n_probe
        )


class StreamingManifestSink:
    """Structured Streaming into the transactional commit-log table:
    each micro-batch lands as ONE manifest commit via
    ``ManifestFormat.write_streaming_batch`` — the foreachBatch id is
    recorded in the manifest's per-app txn watermark inside the same
    CAS commit as the data, so at-least-once replays are exactly-once
    on the table (Delta's idempotent-writes design).  Downstream
    consumers then read the table mid-stream (every commit atomic) or
    tail it incrementally via ``read_changes`` /
    ``sync_from_changes`` — the full streaming -> transactional
    storage -> incremental rollup chain with no side cursor anywhere."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        table_format=None,
        checkpoint_root: str | None = None,
        app_id: str = "stream",
    ):
        from ..plans.table_format import ManifestFormat

        self.spark = spark
        self.fmt = table_format or ManifestFormat(spark, warehouse_root)
        self.table_name = table_name
        self.source_dir = source_dir
        self.app_id = app_id
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"manifest_sink_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self.fmt.write_streaming_batch(
            self.table_name, batch_df, batch_id, self.app_id
        )

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed source file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.fmt.read(self.table_name)


class StreamingUpsertSink:
    """Structured Streaming UPSERT ingest into the commit-log table:
    each micro-batch MERGEs on the primary key (``foreachBatch`` →
    ``fmt.merge``) — the production shape when the source re-delivers
    updated documents (dlt's merge write-disposition, as a stream,
    where :class:`StreamingManifestSink` is the append shape).

    Replay safety differs from the append sink: MERGE carries no
    per-batch watermark, but an upsert of the SAME batch is idempotent
    BY CONTENT (matched keys re-land identical rows), so an
    at-least-once replay converges to the same table state; the CDF
    records the replay as one more commit whose SIGNED net change is
    zero, which retraction-aware consumers (``sync_from_cdf`` on the
    rollups and the ANN index) absorb exactly — the full-chain
    invariant the stream soak pins (tools/stream_soak_probe.py).
    Batch-internal duplicates collapse via ``dedup_by_pk`` first
    (last-write-wins is undefined INSIDE one micro-batch — dlt's
    posture)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        source_dir: str,
        table_name: str,
        unique_key: str,
        table_format=None,
        checkpoint_root: str | None = None,
    ):
        from ..plans.table_format import ManifestFormat

        self.spark = spark
        self.fmt = table_format or ManifestFormat(spark, warehouse_root)
        self.table_name = table_name
        self.unique_key = unique_key
        self.source_dir = source_dir
        self.checkpoint = join_uri(
            checkpoint_root or join_uri(warehouse_root, "_checkpoints"),
            f"upsert_sink_{table_name.replace('.', '_')}",
        )
        self.schema = spark.read.parquet(source_dir).schema

    def _process_batch(self, batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fresh = dedup_by_pk(batch_df, pk=self.unique_key)
        self.fmt.merge(self.table_name, fresh, self.unique_key)

    def run_once(self) -> None:
        """Drain every not-yet-checkpointed source file, then stop."""
        _drain_once(
            self.spark, self.schema, self.source_dir, self.checkpoint,
            self._process_batch, fmt="parquet",
        )

    def read(self):
        return self.fmt.read(self.table_name)
