"""Structured Streaming wrapper — the 15-minute sync as a real stream.

Reference: master DAG cron ``*/15 * * * *`` with ``max_active_runs=1``
(iot_master_dag.py:42-48) and the dlt incremental cursor as persisted
state (T7).  Spark-native: ``readStream`` + event-time watermark +
windowed aggregation; the checkpoint directory replaces the cursor
table; ``availableNow``/``processAllAvailable`` gives the batch-drain
semantics the Airflow catchup loop approximates."""

from __future__ import annotations

import atexit
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as int64
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# State-partition sizing policy
# ---------------------------------------------------------------------------

#: target state rows per partition; the knob behind ``sized_state_partitions``
STATE_ROWS_PER_PARTITION = 100_000
#: session-conf escape hatch: a fixed partition count overriding the policy
STATE_PARTITIONS_CONF = (
    "spark.iot_elt_airflow_mongo_timescaledb.streaming.statePartitions"
)


def sized_state_partitions(
    spark: SparkSession,
    est_state_rows: int,
    rows_per_partition: int = STATE_ROWS_PER_PARTITION,
    floor: int = 4,
    cap: int = 4096,
) -> int:
    """``spark.sql.shuffle.partitions`` for a NEW stateful streaming
    query, sized to STATE VOLUME instead of inherited from the session.

    Why this exists (measured, PERF_NOTES "Warm streaming A/B"): every
    trigger commits EVERY state store regardless of how much data
    arrived — the stream-stream join runs four stores per partition —
    so steady-state trigger latency is O(partitions), ~0.25 s/partition
    on local disk at this fixture scale (8.8 s @ 32 partitions vs
    1.8 s @ 8, identical input).  The session default (sized to cores
    for batch shuffles) is therefore exactly wrong for a low-volume
    stream, and the count FREEZES into the checkpoint at first start —
    it cannot be fixed later without discarding state.  Policy:

        partitions = clamp(ceil(est_state_rows / rows_per_partition),
                           floor, cap)

    ``floor`` keeps scan/commit parallelism for small state; ``cap``
    bounds the per-trigger commit bill for huge-key-space streams (at
    the cap, state rows per partition grow instead — the right trade,
    since per-row cost is tiny next to per-store commit cost).  Setting
    ``spark.…streaming.statePartitions`` overrides the estimate
    entirely (the production knob when key cardinality is known)."""
    override = spark.conf.get(STATE_PARTITIONS_CONF, None)
    if override is not None:
        return int(override)
    import math

    return min(cap, max(floor, math.ceil(est_state_rows / rows_per_partition)))


def _est_state_keys(spark: SparkSession, sf_dir: str) -> int:
    """State-key cardinality proxy for the events builders: approximate
    distinct ``user_id`` — one aggregate scan at query start, amortized
    over the stream's lifetime (sessions hold one open window per user;
    the stream-stream join holds the in-watermark-window rows, keyed by
    user).  Workloads whose in-window row volume dominates key count
    should set the conf override instead."""
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return int(df.agg(F.approx_count_distinct("user_id")).first()[0])


class _state_sized:
    """Context manager: pin ``spark.sql.shuffle.partitions`` for a
    query START (the count freezes into the checkpoint), restore after."""

    def __init__(self, spark: SparkSession, n_partitions: int | None):
        self.spark = spark
        self.n = n_partitions

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Footer probe for ``events.parquet`` that sets the legacy NANOS
    flag ONLY when the footer requires it (a TIMESTAMP(NANOS) footer is
    unreadable without it; the flag must then stay set while any lazy
    frame over the file is alive, so it is session-scoped by necessity
    — VERDICT r8 nit 2: never mutate the session conf for the common
    MICROS shape)."""
    path = os.path.join(sf_dir, "events.parquet")
    try:
        return spark.read.parquet(path).schema
    except Exception as first_err:
        # retry only the TIMESTAMP(NANOS) unsupported-type failure —
        # any other read error must not mutate the session conf on its
        # way to re-raising (ADVICE r9 #5)
        if "nanos" not in str(first_err).lower():
            raise
        flag = "spark.sql.legacy.parquet.nanosAsLong"
        prev_flag = spark.conf.get(flag, None)
        spark.conf.set(flag, "true")
        try:
            return spark.read.parquet(path).schema
        except Exception:
            # restore, never unset: an earlier NANOS read's lazy frame
            # still consults the conf at execution
            if prev_flag is None:
                spark.conf.unset(flag)
            else:
                spark.conf.set(flag, prev_flag)
            raise


def events_stream(
    spark: SparkSession, sf_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """Streaming read of ``events.parquet`` with ``ts`` normalized to a
    session-tz (UTC) microsecond timestamp, whatever the file's physical
    type — the driver's testdata has shipped both int64 TIMESTAMP(NANOS)
    (streamed as long under ``nanosAsLong``, divided down) and plain
    TIMESTAMP(MICROS).  The batch footer probe costs one metadata read;
    callers opening several streams over the same dir (the stream-stream
    join) probe once and pass ``schema``.  FileStreamSource needs a
    directory, so the parent dir is streamed with a glob filter
    selecting just the events file."""
    if schema is None:
        schema = _events_schema(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def session_rollup_agg(stream: DataFrame) -> DataFrame:
    """Watermark + 30-min-gap session-window aggregation — ONE builder
    shared by the complete-mode drain, the append-mode drain, and the
    warm-trigger bench twin, so the benchmark can never silently measure
    a different plan than the production query."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def purchase_view_join(stream_factory, how: str) -> DataFrame:
    """Purchases joined to the same user's views from the preceding hour
    — the watermarked stream-stream range join, shared by the inner and
    left-outer drains and the warm-trigger bench twin (same
    single-builder rationale as ``session_rollup_agg``).

    ``stream_factory`` returns a FRESH events stream per call — a
    stream-stream join needs two independent readers over the same
    source.  Both sides are event-time streams with watermarks; the
    range condition bounds join state (views drop from state once the
    purchase-side watermark passes ts + 1h)."""

    def side(event_type: str, p: str) -> DataFrame:
        return (
            stream_factory()
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{p}_user"),
                F.col("ts").alias(f"{p}_ts"),
                F.col("value").alias(f"{p}_value"),
            )
            .withWatermark(f"{p}_ts", "1 hour")
        )

    return (
        side("purchase", "p")
        .join(
            side("view", "v"),
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            how,
        )
        .select(
            F.col("p_user").alias("user_id"),
            F.col("p_ts").alias("purchase_ts"),
            F.col("v_ts").alias("view_ts"),
            F.col("p_value").alias("purchase_value"),
            F.col("v_value").alias("view_value"),
        )
    )


def hourly_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed count/sum per event_type, driven as a
    stream over the events parquet and drained to completion.

    Complete output mode so every window lands in the sink (append mode
    would hold back windows the final watermark never closes).
    """
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total",
        )
    )
    return _drain_to_memory(spark, agg, "hourly_rollup", "complete")


def session_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization via the built-in ``session_window``
    state operator: per-user 30-min-gap sessions with count/sum,
    merging windows as events arrive — the streaming twin of the batch
    gaps-and-islands query (same output, same oracle).

    State is one open window per (user, session); the watermark closes
    and evicts sessions once event time passes last_event + gap +
    delay.  Complete output mode for the drain (append would hold back
    sessions the final watermark never closes — the same choice as the
    hourly rollup); the result is a bounded aggregate table, inside
    the memory-sink contract."""
    agg = session_rollup_agg(events_stream(spark, sf_dir))
    return _drain_to_memory(spark, agg, "session_rollup", "complete")


def session_rollup_stream_append(
    spark: SparkSession, sf_dir: str, sink_dir: str | None = None
) -> DataFrame:
    """APPEND-mode streaming sessionization — the production shape
    (unlike the complete-mode drain, which restates every session per
    trigger): only sessions CLOSED by the watermark emit, exactly once,
    through the executor-side file sink; open sessions stay in state.
    At drain end the emitted set is precisely the batch sessions whose
    ``session_end <= max(ts) - delay`` (the final watermark) — pinned
    by the registry oracle.  State partitions auto-size to the user-key
    cardinality (``sized_state_partitions``) — the production default
    the round-7 A/B measured, instead of inheriting the batch-shuffle
    session conf."""
    agg = session_rollup_agg(events_stream(spark, sf_dir))
    n = sized_state_partitions(spark, _est_state_keys(spark, sf_dir))
    return _drain_to_files(
        spark, agg, "session_append", sink_dir=sink_dir, state_partitions=n
    )


def enriched_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join: the event stream joins a static
    dimension table (customer segment) per micro-batch — stateless (no
    watermark bookkeeping, no join state store), the dimension is just
    re-planned into each batch, broadcast when it fits.  This is the
    standard streaming-enrichment shape; only stream-STREAM joins need
    the watermarked state machinery of ``stream_join_stream``."""
    import os

    stream = events_stream(spark, sf_dir)
    dim = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
    )
    agg = (
        stream.join(dim, "user_id")  # inner: events without a dim row drop
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    return _drain_to_memory(spark, agg, "enriched_counts", "complete")


def dedup_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (T8 as a stream): per-key dedup whose
    state is ACTUALLY bounded by the event-time watermark, then a
    per-type count.  This is the reference's ``primary_key='_id'``
    merge-dedup expressed as Structured Streaming state.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    the load-bearing choice: with the key set not containing the event
    time, plain ``dropDuplicates`` NEVER evicts state — on a long-running
    100 TB stream the state store grows with every distinct key until the
    job OOMs.  The WithinWatermark variant expires a key once the
    watermark passes its event time + delay, so state is bounded by the
    keys seen per watermark window; duplicates are guaranteed dropped
    when they arrive within the delay of each other (the reference's
    boundary re-reads arrive back-to-back, well inside it).  Eviction is
    asserted by tests/test_streaming_state.py.
    """
    stream = events_stream(spark, sf_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_unique"))
    return _drain_to_memory(spark, agg, "dedup_counts", "complete")


def _drain_to_memory(
    spark: SparkSession, df: DataFrame, name: str, mode: str
) -> DataFrame:
    """Memory-sink drain — ONLY for cardinality-bounded complete-mode
    aggregates (hourly windows, per-type counts): the sink materializes
    the whole result on the driver, which is fine when the result is a
    small aggregate table and a driver OOM when it is not.  Unbounded
    append output (e.g. stream-stream join matches) must go through
    ``_drain_to_files`` instead."""
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.outputMode(mode).format("memory").queryName(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink)


def _drain_to_files(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    sink_dir: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Append-mode drain through a parquet file sink + batch read-back.

    Every micro-batch lands executor-side as parquet; the driver only
    tracks the sink's file log.  The returned DataFrame is a plain
    parquet scan of the sink directory, so downstream consumption is
    distributed (and at cluster scale ``sink_dir`` points at shared
    storage instead of the local default).  The explicit read schema
    covers the zero-output case, where the sink directory has no
    footers to infer from.
    """
    from ..fs import join_uri, scratch_dir

    if sink_dir is None:
        # default local sink dirs are per-process scratch (rooted at
        # spark.local.dir when configured): register them for
        # interpreter-exit cleanup so repeated gate/bench runs don't
        # accumulate full result copies in /tmp.  An EXPLICIT sink_dir is
        # the durable-output path (shared storage at cluster scale —
        # scheme-qualified URIs like hdfs://s3a: work: the sink, its
        # checkpoint, and the read-back all resolve through Hadoop) and
        # is never auto-deleted.
        out = scratch_dir(spark, f"{name}_sink_")
        atexit.register(shutil.rmtree, out, True)
    else:
        out = sink_dir
    data = join_uri(out, "data")
    # the shuffle-partition count freezes into the checkpoint at START —
    # apply the state sizing policy exactly there (restored right after)
    with _state_sized(spark, state_partitions):
        q = (
            df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", data)
            .option("checkpointLocation", join_uri(out, "_checkpoint"))
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.schema(df.schema).parquet(data)


def view_purchase_join_stream(
    spark: SparkSession, sf_dir: str, sink_dir: str | None = None
) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    views from the preceding hour.

    Both sides are event-time streams with watermarks; the range
    condition bounds join state (views are dropped from state once the
    purchase-side watermark passes ts + 1h).  Inner matches emit as they
    are found, so an availableNow-style drain yields the complete result
    — equal to the batch interval join.

    Unlike the windowed aggregates, the join's append output is NOT
    cardinality-bounded — it grows with the data — so it drains through
    the parquet file sink (``_drain_to_files``), never the memory sink:
    results stay executor-side and the returned DataFrame is a
    distributed scan of the sink directory.
    """
    # one footer probe shared by both stream readers
    file_schema = _events_schema(spark, sf_dir)

    joined = purchase_view_join(
        lambda: events_stream(spark, sf_dir, schema=file_schema), "inner"
    )
    n = sized_state_partitions(spark, _est_state_keys(spark, sf_dir))
    return _drain_to_files(
        spark, joined, "view_purchase_join", sink_dir, state_partitions=n
    )


def view_purchase_left_join_stream(
    spark: SparkSession, sf_dir: str, sink_dir: str | None = None
) -> DataFrame:
    """LEFT OUTER stream-stream range join — the abandoned-conversion
    detector: every purchase joined to the user's prior-hour views,
    and purchases with NO qualifying view emit a NULL-view row once the
    global watermark (min of both sides, Spark's default
    multipleWatermarkPolicy) passes their event time — state-bounded
    like the inner join, but the unmatched rows are first-class
    output, not silence.  Same file-sink drain as the inner variant."""
    file_schema = _events_schema(spark, sf_dir)

    joined = purchase_view_join(
        lambda: events_stream(spark, sf_dir, schema=file_schema), "left_outer"
    )
    n = sized_state_partitions(spark, _est_state_keys(spark, sf_dir))
    return _drain_to_files(
        spark, joined, "view_purchase_left_join", sink_dir, state_partitions=n
    )


# --------------------------------------------------------------------------
# Warm per-trigger measurement (bench methodology, not a query)
# --------------------------------------------------------------------------


def _event_time_slice_conds(ev: DataFrame, n_chunks: int) -> list:
    """Quantile-cut event-time slice conditions for the warm harness.

    Cuts are ``n_chunks``-quantiles of ``unix_micros(ts)``; slices are
    ``(lo, hi]`` with open outer ends, so the conditions PARTITION the
    corpus exactly — every row matches exactly one slice (adjacent
    slices share an edge; ties at a cut all land in the lower slice;
    the open ends catch the extremes).  Pinned by
    tests/test_warm_harness.py.  Collapsed quantiles (skewed/uniform
    ts) dedupe — the caller decides whether the surviving slice count
    is enough to measure."""
    qs = [i / n_chunks for i in range(1, n_chunks)]
    cuts = ev.agg(
        F.percentile_approx(
            F.unix_micros("ts"),
            F.array(*[F.lit(q) for q in qs]),
            F.lit(10_000),
        ).alias("c")
    ).first()["c"]
    # dedupe: a skewed/uniform ts distribution can collapse adjacent
    # quantiles; equal boundaries would make empty slices
    bounds = sorted(set(cuts or []))
    if not bounds:
        raise ValueError(
            "warm split: events table is empty — nothing to measure"
        )
    edges = [None, *bounds, None]  # (lo, hi] slices; open at the ends
    conds = []
    for i in range(len(edges) - 1):
        lo, hi = edges[i], edges[i + 1]
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.unix_micros("ts") > lo)
        if hi is not None:
            cond = cond & (F.unix_micros("ts") <= hi)
        conds.append(cond)
    return conds


def _warm_trigger_seconds(
    spark, sf_dir, transform, n_chunks: int = 10,
    state_partitions: int | None = None,
) -> float:
    """Steady-state micro-batch latency for a streaming pipeline.

    The one-shot drains above measure cold-start + full-history drain —
    the wrong number for a long-running 15-minute sync, whose cost per
    trigger is what matters.  (The first cut of this helper split at the
    MEDIAN, so the "warm" trigger still processed half the corpus and
    landed within 2% of the cold number — it measured a half-drain, not
    steady state.)  Now: events are split into ``n_chunks`` event-time
    slices on approximate-quantile boundaries; slices ``0..n-2`` are fed
    first and drained as warmup (query start, codegen, state-store
    bootstrap, state FILL), then ONLY the final 1/n-sized trigger is
    timed — the closest local analogue of the production 15-minute batch
    arriving against warm state.  Time-ordered feeding keeps each
    slice's rows above the previous watermark, so nothing is
    late-dropped and state transitions are the production ones (sessions
    spanning a boundary merge in state; join state carries over).

    ``transform`` maps the watched-directory streaming reader factory to
    the output streaming DataFrame; the factory returns a fresh stream
    per call so stream-stream joins can open two readers over the same
    watched directory.

    ``state_partitions`` overrides ``spark.sql.shuffle.partitions`` for
    this query (restored after); ``None`` (the default) applies the
    production sizing policy (``sized_state_partitions`` on the
    user-key estimate) — the same count the production builders start
    with.  Stateful per-trigger cost is O(state partitions), NOT data:
    every trigger commits every state store (the stream-stream join
    runs four per partition), so 32 partitions is ~5x the trigger
    latency of 8 at identical input (measured A/B in PERF_NOTES).  In
    production the count is frozen into the checkpoint at first run —
    size it to state volume, not to core count.
    """
    import glob as globmod
    import shutil as sh

    from ..fs import scratch_dir
    from ..plans.registry import table

    if state_partitions is None:
        state_partitions = sized_state_partitions(
            spark, _est_state_keys(spark, sf_dir)
        )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    root = scratch_dir(spark, "warm_trigger_")
    try:
        watch = os.path.join(root, "src")
        os.makedirs(watch)
        ev = table(spark, sf_dir, "events")
        staged: list[str] = []
        for i, cond in enumerate(_event_time_slice_conds(ev, n_chunks)):
            stage = os.path.join(root, f"stage{i}")
            ev.filter(cond).coalesce(1).write.parquet(stage)
            parts = globmod.glob(os.path.join(stage, "part-*.parquet"))
            # an EMPTY slice (duplicate-heavy ts collapsing a quantile)
            # still writes a zero-row part file — feeding it would make
            # a trigger that measures nothing, so check rows, not files
            if parts and spark.read.parquet(stage).limit(1).count() > 0:
                staged.append(parts[0])
        if len(staged) < 2:
            raise ValueError(
                "warm split: events ts distribution too small/uniform for "
                f"a {n_chunks}-way event-time split — need at least one "
                "warmup slice plus the timed slice"
            )

        schema = ev.schema

        def reader() -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "*.parquet")
                .parquet(watch)
            )

        q = (
            transform(reader)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(root, "data"))
            .option("checkpointLocation", os.path.join(root, "_checkpoint"))
            .start()
        )
        try:
            # warmup: all slices but the last, in event-time order — one
            # file per trigger so the state store sees a trigger cadence,
            # not one giant backfill batch
            for i, part in enumerate(staged[:-1]):
                os.replace(part, os.path.join(watch, f"chunk{i:03d}.parquet"))
                q.processAllAvailable()
            os.replace(
                staged[-1],
                os.path.join(watch, f"chunk{len(staged) - 1:03d}.parquet"),
            )
            t0 = time.perf_counter()
            q.processAllAvailable()  # exactly the final 1/n micro-batch
            warm = time.perf_counter() - t0
        finally:
            q.stop()
        # outside the timed window: a measurement over a silently-empty
        # sink would be meaningless (bare assert strips under -O, so an
        # explicit raise)
        if spark.read.parquet(os.path.join(root, "data")).count() == 0:
            raise RuntimeError(
                "warm-trigger drain emitted zero rows — the measured "
                "latency would be meaningless"
            )
        return warm
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        sh.rmtree(root, ignore_errors=True)


def warm_session_rollup_trigger(
    spark: SparkSession, sf_dir: str, state_partitions: int | None = None
) -> float:
    """Warm per-trigger latency of the append-mode session rollup —
    the SAME plan as ``session_rollup_stream_append`` by construction
    (shared ``session_rollup_agg`` builder)."""
    return _warm_trigger_seconds(
        spark,
        sf_dir,
        lambda reader: session_rollup_agg(reader()),
        state_partitions=state_partitions,
    )


def warm_stream_left_join_trigger(
    spark: SparkSession, sf_dir: str, state_partitions: int | None = None
) -> float:
    """Warm per-trigger latency of the left-outer stream-stream join —
    the SAME plan as ``view_purchase_left_join_stream`` by construction
    (shared ``purchase_view_join`` builder)."""
    return _warm_trigger_seconds(
        spark,
        sf_dir,
        lambda reader: purchase_view_join(reader, "left_outer"),
        state_partitions=state_partitions,
    )
