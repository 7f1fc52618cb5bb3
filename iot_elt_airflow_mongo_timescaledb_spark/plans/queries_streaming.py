"""Streaming queries exposed through the driver contract.

The streaming result is deterministic (drained to completion), so it
gets a full SQL oracle: the windowed rollup must equal the equivalent
batch aggregation."""

from __future__ import annotations

from ..streaming.micro_batch import dedup_counts_stream, hourly_rollup_stream
from .registry import query


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rollup(spark, sf_dir):
    """T1/T7 — Structured Streaming tumbling-window rollup, drained with
    processAllAvailable (the micro-batch sync as a real stream)."""
    return hourly_rollup_stream(spark, sf_dir)


@query(
    "streaming_session_rollup",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM numbered GROUP BY user_id, session_no
    """,
    gate=False,  # driver row via batch session_windows (same semantics)
)
def streaming_session_rollup(spark, sf_dir):
    """Streaming session_window state operator — merges per-user
    sessions as events arrive, watermark-evicted; equals the batch
    gaps-and-islands oracle row for row."""
    from ..streaming.micro_batch import session_rollup_stream

    return session_rollup_stream(spark, sf_dir)


@query(
    "streaming_session_rollup_append",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    numbered AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    sess AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
      FROM numbered GROUP BY user_id, session_no)
    SELECT * FROM sess
    WHERE session_end <= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
    """,
    gate=False,  # family row: batch session_windows
)
def streaming_session_rollup_append(spark, sf_dir):
    """APPEND-mode streaming sessionization (the production emission
    shape): only watermark-CLOSED sessions emit, exactly once, through
    the executor-side file sink — the oracle is the batch
    gaps-and-islands result restricted to sessions ending at or before
    the final watermark (max event time − 1h delay)."""
    from ..streaming.micro_batch import session_rollup_stream_append

    return session_rollup_stream_append(spark, sf_dir)


@query(
    "streaming_enriched_counts",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n, ROUND(SUM(e.value), 2) AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    gate=False,  # stream-join family row: streaming_stream_join
)
def streaming_enriched_counts(spark, sf_dir):
    """Stream-static enrichment: the event stream joins the customer
    dimension per micro-batch (stateless, broadcast-size dim) and rolls
    up per segment — equals the batch join oracle."""
    from ..streaming.micro_batch import enriched_counts_stream

    return enriched_counts_stream(spark, sf_dir)


@query(
    "streaming_dedup_counts",
    # round-10 gate rotation: streaming family keeps hourly_rollup (T1)
    # and stream_join gated; this row stays pytest-oracle-verified
    gate=False,
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY 1
    """,
)
def streaming_dedup_counts(spark, sf_dir):
    """T8 — stateful streaming dropDuplicates on the primary key, then a
    per-type count; equals the batch COUNT(DISTINCT pk)."""
    return dedup_counts_stream(spark, sf_dir)


@query(
    "streaming_user_activity",
    oracle="""
    WITH gaps AS (
      SELECT user_id, value,
             epoch(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_s
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(COALESCE(MAX(gap_s), 0.0), 3) AS max_gap_s
    FROM gaps GROUP BY 1
    """,
    gate=False,  # stream-agg family: streaming_hourly_rollup carries the T1
    # gate; stateful-v2 parity stays pinned in tests/test_stateful_v2.py
    # (r9 rotation)
)
def streaming_user_activity(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running count / sum / max inter-event gap; converged state equals
    the batch gaps-and-aggregates oracle."""
    from ..streaming.stateful import user_activity_stream

    return user_activity_stream(spark, sf_dir)


@query(
    "streaming_stream_join",
    oracle="""
    SELECT p.user_id AS user_id, p.ts AS purchase_ts, v.ts AS view_ts,
           p.value AS purchase_value, v.value AS view_value
    FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
    """,
)
def streaming_stream_join(spark, sf_dir):
    """Stream-stream inner join with watermarked range state — each
    purchase joined to the user's views from the preceding hour; equals
    the batch interval join."""
    from ..streaming.micro_batch import view_purchase_join_stream

    return view_purchase_join_stream(spark, sf_dir)


@query(
    "streaming_stream_left_join",
    oracle="""
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
    gw AS (
        SELECT LEAST((SELECT MAX(ts) FROM p), (SELECT MAX(ts) FROM v))
               - INTERVAL 1 HOUR AS wm
    )
    SELECT p.user_id AS user_id, p.ts AS purchase_ts, v.ts AS view_ts,
           p.value AS purchase_value, v.value AS view_value
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
    UNION ALL
    SELECT p.user_id, p.ts, NULL, p.value, NULL
    FROM p, gw
    WHERE p.ts < gw.wm
      AND NOT EXISTS (
        SELECT 1 FROM v WHERE v.user_id = p.user_id
          AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR)
    """,
    gate=False,  # stream-join family row: streaming_stream_join
)
def streaming_stream_left_join(spark, sf_dir):
    """LEFT OUTER stream-stream range join: matched rows equal the
    batch interval join; unmatched purchases emit NULL-view rows
    exactly when the global (min-of-both-sides) watermark passed their
    event time — the oracle reproduces both halves, including the
    watermark cutoff for the NULL side."""
    from ..streaming.micro_batch import view_purchase_left_join_stream

    return view_purchase_left_join_stream(spark, sf_dir)


@query(
    "streaming_cdf_source",
    oracle="""
    WITH mx AS (SELECT MAX(c_custkey) AS m FROM customer),
    cls AS (
        SELECT c.c_custkey, c.c_acctbal, mx.m,
               c_custkey > m // 2 AS upper_half,
               c_custkey > m // 10 AND c_custkey <= m // 5 AS deleted,
               c_custkey > m * 3 // 10 AND c_custkey <= m * 2 // 5
                   AS updated
        FROM customer c, mx
    ),
    feed AS (
        SELECT 'insert' AS _change_type, c_custkey, c_acctbal
        FROM cls WHERE upper_half
        UNION ALL
        SELECT 'delete', c_custkey, c_acctbal FROM cls WHERE deleted
        UNION ALL
        SELECT 'update_preimage', c_custkey, c_acctbal
        FROM cls WHERE updated
        UNION ALL
        SELECT 'update_postimage', c_custkey,
               ROUND(c_acctbal + 100.0, 2)
        FROM cls WHERE updated
    )
    SELECT _change_type,
           COUNT(*) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           ROUND(SUM(c_acctbal), 2) AS bal_sum
    FROM feed
    GROUP BY _change_type
    """,
    # r14 rotation (VERDICT task 2): the STREAMING twin of
    # manifest_cdf_feed carries the gate — same committed history
    # (append / delete / update), consumed through the warehouse_cdf
    # readStream source and mirrored into a second warehouse table via
    # the idempotent-writer sink, so the gate row covers commit-log
    # CDF recording, the Python DataSource stream reader, AND the
    # exactly-once sink in one oracle-checked pass.
)
def streaming_cdf_source(spark, sf_dir):
    """Row-level change feed as a STREAM (round 14): build the same
    versioned history as ``manifest_cdf_feed`` (v1/v2 halves, v3
    range delete, v4 range update), then consume it with
    ``readStream.format("warehouse_cdf")`` from starting_version=1,
    landing each micro-batch in a mirror table through
    ``write_streaming_batch``; the aggregate over the mirror must
    equal the batch feed's oracle exactly."""
    import os

    from pyspark.sql import functions as F

    from ..fs import scratch_dir
    from ..streaming.cdf_source import register_cdf_source
    from .registry import table
    from .table_format import ManifestFormat

    root = scratch_dir(spark, "cdfstream_", cleanup_atexit=True)
    fmt = ManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("c_custkey",),
        cdf=True,
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    m = int(c.agg(F.max("c_custkey")).first()[0])
    fmt.write("cdf.cust", c.filter(F.col("c_custkey") <= m // 2), "overwrite")
    fmt.write("cdf.cust", c.filter(F.col("c_custkey") > m // 2), "append")
    fmt.delete_where("cdf.cust", "c_custkey", m // 10 + 1, m // 5)
    fmt.update_where(
        "cdf.cust",
        "c_custkey",
        {"c_acctbal": "round(c_acctbal + 100.0, 2)"},
        m * 3 // 10 + 1,
        m * 2 // 5,
    )

    register_cdf_source(spark)
    sink = ManifestFormat(spark, root, auto_compact_dirs=None)

    def mirror(batch_df, batch_id):
        sink.write_streaming_batch(
            "cdf.mirror", batch_df, int(batch_id), app_id="cdf-gate"
        )

    q = (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", "cdf.cust")
        .option("starting_version", "1")
        .load()
        .writeStream.trigger(availableNow=True)
        .foreachBatch(mirror)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .start()
    )
    # a hung/slow drain must surface as a NAMED timeout, not as a
    # confusing oracle hash mismatch over a partially-mirrored table
    # (ADVICE r14 #5)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming_cdf_source: availableNow drain did not finish "
            "within 300 s — cdf.mirror is partial; not reading it"
        )
    return (
        sink.read("cdf.mirror")
        .groupBy("_change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c_custkey").alias("key_sum"),
            F.round(F.sum("c_acctbal"), 2).alias("bal_sum"),
        )
    )


@query(
    "rollup_stream_hist",
    oracle="""
    SELECT event_type, COUNT(*) AS n_values, TRUE AS p50_ok, TRUE AS p99_ok
    FROM events WHERE value BETWEEN 0 AND 500 GROUP BY 1
    """,
    # r15 rotation (VERDICT r14 tasks 4+8): the STREAMING twin of
    # hist_rollup_quantiles carries the gate — the sketch-rollup family
    # now rides maintain_stream (warehouse_cdf readStream + the shared
    # source-version cursor), so this row covers the semigroup
    # histogram merge AND the streaming maintenance path in one
    # oracle-checked pass; the batch row demoted to gate=False stays
    # covered by the pytest oracle suite.
)
def rollup_stream_hist(spark, sf_dir):
    """CONTINUOUS percentile maintenance at 100 TB shape (r15): an
    events-derived fact table takes one bootstrap commit plus three
    appends; ``IncrementalHistSync`` bootstraps its cursor with the
    batch ``sync_from_changes``, then drains the remaining commits
    through ``maintain_stream`` (``warehouse_cdf`` readStream, one
    version per micro-batch).  The streamed fixed-bin histogram's
    p50/p99 must land within one bin width of ``percentile_disc`` —
    the exact ceil(p*n)-th order statistic, the estimator's contract
    (same deterministic-verdict pattern as the batch row).
    TimescaleDB twin: uddsketch continuous aggregate under the
    15-minute ingest cadence (reference dags/iot_master_dag.py:42-71)."""
    import os

    from pyspark.sql import functions as F

    from ..fs import scratch_dir
    from .pipeline import IncrementalHistSync
    from .registry import table
    from .table_format import ManifestFormat

    lo, hi, n_bins = 0.0, 500.0, 50
    width = (hi - lo) / n_bins
    root = scratch_dir(spark, "histstream_", cleanup_atexit=True)
    fmt = ManifestFormat(spark, root, auto_compact_dirs=None, cdf=True)
    e = (
        table(spark, sf_dir, "events")
        .filter((F.col("value") >= lo) & (F.col("value") <= hi))
        .select("event_type", "value", "user_id")
    )
    fmt.write("raw.ev", e.filter(F.col("user_id") % 4 == 0), "overwrite")
    sync = IncrementalHistSync(
        spark,
        root,
        "agg.value_hist",
        group_cols=("event_type",),
        value_col="value",
        lo=lo,
        hi=hi,
        n_bins=n_bins,
        table_format=fmt,
    )
    sync.sync_from_changes(fmt, "raw.ev")  # bootstrap anchors the cursor
    for r in (1, 2, 3):
        fmt.write("raw.ev", e.filter(F.col("user_id") % 4 == r), "append")
    q = sync.maintain_stream(
        fmt,
        "raw.ev",
        os.path.join(root, "_ck_hist"),
        max_versions_per_batch=1,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "rollup_stream_hist: availableNow drain did not finish "
            "within 300 s — agg.value_hist is partial; not reading it"
        )
    exact = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "x50"
        ),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias(
            "x99"
        ),
    )
    return sync.read().join(exact, "event_type").select(
        "event_type",
        "n_values",
        (F.abs(F.col("p50") - F.col("x50")) <= width).alias("p50_ok"),
        (F.abs(F.col("p99") - F.col("x99")) <= width).alias("p99_ok"),
    )
