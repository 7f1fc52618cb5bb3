"""Hypertable analytics queries — the TimescaleDB hyperfunction family.

The reference's warehouse is TimescaleDB (docker-compose.yaml:307), so
its users run these against the same staged tables this engine writes:
``time_bucket_gapfill`` + ``locf``/``interpolate``, ``first``/``last``
ordered aggregates, ``histogram``, counter ``rate``, time-weighted
averages, and the toolkit ``lttb`` downsampler.  Each query pairs the
Spark plan (operators/timeseries.py) with a DuckDB oracle computing the
identical arithmetic in the identical expression order, so the
order-insensitive value hash matches bit-for-bit.

``gapfill_locf`` is the family's driver-gated representative (the gate
holds one row per operator family at its 50-row cap); the other
entries register gate=False and are verified by the pytest
oracle-parity suite at sf0.001 and the parity CLI at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.timeseries import (
    bucket_gapfill,
    counter_rate,
    first_last_by,
    histogram_fixed,
    lttb_downsample,
    time_weighted_sums,
)
from .registry import query, table

# One gapfill week keeps the dense grid at series x 168 buckets —
# the Timescale shape where the WHERE clause bounds the gapfill range.
_GAPFILL_HOURS = 167

_GAPFILL_ORACLE_PREFIX = f"""
    WITH b AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               round(avg(value), 4) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', min(ts)) + INTERVAL {_GAPFILL_HOURS} HOUR AS hi
        FROM events
    ),
    grid AS (
        SELECT u.user_id, g.bucket
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
        ) g
    ),
    j AS (
        SELECT grid.user_id, grid.bucket, b.v
        FROM grid LEFT JOIN b USING (user_id, bucket)
    )
"""


def _gapfilled_hourly(spark, sf_dir):
    """Shared sparse-hourly-agg -> dense weekly grid (series x bucket)."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.avg("value"), 4).alias("v"))
    bounds = e.agg(F.date_trunc("hour", F.min("ts")).alias("lo")).withColumn(
        "hi", F.col("lo") + F.expr(f"INTERVAL {_GAPFILL_HOURS} HOURS")
    )
    return bucket_gapfill(b, "user_id", "bucket", bounds)


@query(
    "gapfill_locf",
    oracle=_GAPFILL_ORACLE_PREFIX
    + """
    SELECT user_id, bucket, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_locf
    FROM j
    """,
    # gated since the round-5 continuation: the hypertable-analytics
    # family's driver-visible representative
)
def gapfill_locf(spark, sf_dir):
    """time_bucket_gapfill + locf: dense per-user hourly grid over the
    first week, missing buckets carry the last observed hourly average
    forward (leading gaps stay NULL).  Grid generated distributively
    (explode(sequence)); LOCF is one window pass per series."""
    from ..operators.timeseries import locf

    return locf(_gapfilled_hourly(spark, sf_dir), "user_id", "bucket", "v", "v_locf")


@query(
    "gapfill_interpolate",
    oracle=_GAPFILL_ORACLE_PREFIX
    + """
    SELECT user_id, bucket, v,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    prev_v + (next_v - prev_v) * (
                        CAST(t_us - prev_t AS DOUBLE)
                        / CAST(next_t - prev_t AS DOUBLE))
           END AS v_interp
    FROM (
        SELECT user_id, bucket, v, epoch_us(bucket) AS t_us,
               last_value(v IGNORE NULLS) OVER w1 AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END
                          IGNORE NULLS) OVER w1 AS prev_t,
               first_value(v IGNORE NULLS) OVER w2 AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END
                           IGNORE NULLS) OVER w2 AS next_t
        FROM j
        WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ) s
    """,
    gate=False,
)
def gapfill_interpolate(spark, sf_dir):
    """time_bucket_gapfill + interpolate: NULL buckets between two
    observations get the linear interpolant at their timestamp; edges
    stay NULL.  Integer-microsecond arithmetic in a fixed expression
    order makes the doubles reproduce exactly in the oracle."""
    from ..operators.timeseries import interpolate_linear

    return interpolate_linear(
        _gapfilled_hourly(spark, sf_dir), "user_id", "bucket", "v", "v_interp"
    )


@query(
    "first_last_daily",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day,
           first(value ORDER BY epoch_us(ts), event_id) AS first_value,
           last(value ORDER BY epoch_us(ts), event_id) AS last_value
    FROM events GROUP BY 1, 2
    """,
    gate=False,
)
def first_last_daily(spark, sf_dir):
    """Timescale first(value, ts) / last(value, ts) per user-day as ONE
    aggregate (min_by/max_by over a (ts, event_id) struct) — no
    row_number window; partial extrema combine map-side, so the shuffle
    is one row per group.  event_id is the deterministic tiebreak."""
    e = table(spark, sf_dir, "events")
    return first_last_by(
        e.withColumn("day", F.to_date(F.col("ts"))),
        ["user_id", "day"],
        "value",
        ["ts", "event_id"],
    )


@query(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(GREATEST(LEAST(FLOOR((value - 0.0) / (500.0 - 0.0) * 20),
                               19), 0) AS INT) AS bucket,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    gate=False,
)
def value_histogram(spark, sf_dir):
    """Timescale histogram(value, 0, 500, 20) per event_type — explicit
    clamped fixed-width bucket formula (identical double arithmetic in
    both engines), pure codegen + one hash agg."""
    e = table(spark, sf_dir, "events")
    return histogram_fixed(e, "value", ["event_type"], 20, 0.0, 500.0)


@query(
    "counter_rate_stats",
    oracle="""
    WITH r AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w = 0 THEN NULL
                    ELSE (value - lag(value) OVER w) * 1000000.0
                         / CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                AS DOUBLE)
               END AS rate_per_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, round(avg(rate_per_s), 4) + 0.0 AS avg_rate,
           count(rate_per_s) AS n_samples
    FROM r GROUP BY 1
    """,
    gate=False,
)
def counter_rate_stats(spark, sf_dir):
    """Per-sample instantaneous rate (counter-agg rate shape): lag
    deltas on integer microseconds within each user series, NULL on
    zero-width intervals, then a per-user average.  One shuffle on the
    series key; the window sort rides it."""
    e = table(spark, sf_dir, "events")
    rated = counter_rate(e, "user_id", "ts", "value", "event_id")
    return rated.groupBy("user_id").agg(
        # + 0.0 canonicalizes IEEE signed zero: round can yield -0.0,
        # and the engines disagree on its sign bit rendering
        (F.round(F.avg("rate_per_s"), 4) + F.lit(0.0)).alias("avg_rate"),
        F.count("rate_per_s").alias("n_samples"),
    )


@query(
    "counter_total_increase",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    ),
    st AS (
        SELECT user_id,
               CASE WHEN prev IS NULL THEN NULL
                    WHEN value >= prev THEN value - prev
                    ELSE value END AS inc,
               CASE WHEN prev IS NOT NULL AND value < prev
                    THEN 1 ELSE 0 END AS reset
        FROM s
    )
    SELECT user_id, ROUND(SUM(inc), 2) AS total_increase,
           COUNT(inc) AS n_steps,
           CAST(SUM(reset) AS BIGINT) AS n_resets
    FROM st GROUP BY 1
    """,
    gate=False,
)
def counter_total_increase(spark, sf_dir):
    """Timescale counter_agg / increase with RESET handling: a sample
    below its predecessor means the counter restarted, so that step
    contributes the new reading, not a negative delta.  The events
    `value` column is not monotone, so resets fire constantly here —
    which is exactly what makes the reset path oracle-verifiable."""
    from ..operators.timeseries import counter_increase

    e = table(spark, sf_dir, "events")
    return counter_increase(
        e, ["user_id"], "user_id", "ts", "value", "event_id"
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               CAST(lead(epoch_us(ts)) OVER w - epoch_us(ts) AS DOUBLE) AS dt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id,
           CASE WHEN sum(dt) = 0 THEN NULL
                ELSE round(sum(value * dt) / sum(dt), 4) END AS twa
    FROM s GROUP BY 1
    """,
    gate=False,
)
def time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user (time_weight('LOCF') -> average):
    each sample weighted by the interval to the NEXT sample of its
    series; the final sample carries no weight.  lead window + one hash
    agg; try_divide mirrors the oracle's zero-width NULL."""
    e = table(spark, sf_dir, "events")
    out = time_weighted_sums(
        e, ["user_id"], "user_id", "ts", "value", "event_id"
    )
    return out.select("user_id", F.round(F.col("twa"), 4).alias("twa"))


@query(
    "ohlc_bars",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day,
           first(value ORDER BY epoch_us(ts), event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY epoch_us(ts), event_id) AS close,
           count(*) AS n_samples
    FROM events GROUP BY 1, 2
    """,
    gate=False,
)
def ohlc_bars(spark, sf_dir):
    """Timescale ``candlestick_agg`` / OHLC bars per user-day: open and
    close via the same min_by/max_by ordered-aggregate shape as
    first_last_daily, high/low/count riding the SAME single aggregate —
    one partial-combined pass, one row per bar on the shuffle."""
    e = table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id", "day").agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_samples"),
    )


@query(
    "threshold_alerts",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    )
    SELECT user_id, event_id, value
    FROM w WHERE prev < 400 AND value >= 400
    """,
    gate=False,
)
def threshold_alerts(spark, sf_dir):
    """Monitoring threshold-crossing detection: emit a row exactly when
    a series crosses INTO the alert band (prev < 400 <= current) — not
    for every sample above it.  One lag window per series; a series
    whose first sample is already above the threshold raises no alert
    (no prior state), matching alerting-engine semantics."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        e.withColumn("prev", prev)
        .filter((F.col("prev") < 400) & (F.col("value") >= 400))
        .select("user_id", "event_id", "value")
    )


@query("lttb_downsample", oracle=None, gate=False)
def lttb_downsample_q(spark, sf_dir):
    """Toolkit lttb(ts, value, 20) per user series — sequential by
    definition, so Arrow-batched NumPy behind one partition-streaming
    mapInPandas (see operators/timeseries.py for why not grouped-map);
    no SQL oracle exists, correctness is pinned by the contract tests in
    tests/test_timeseries.py (spike retention, endpoints, subset and
    monotonicity, identity for short series, determinism under
    repartitioning)."""
    e = table(spark, sf_dir, "events")
    return lttb_downsample(e, "user_id", "ts", "value", 20)


@query(
    "series_similarity_topk",
    oracle="""
    WITH prof AS (
        SELECT user_id, extract(hour FROM ts) AS h,
               round(avg(value), 4) AS m
        FROM events GROUP BY 1, 2
    ),
    hours AS (SELECT unnest(range(0, 24)) AS h),
    grid AS (
        SELECT u.user_id, hours.h
        FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN hours
    ),
    dense AS (
        SELECT g.user_id,
               array_agg(coalesce(p.m, 0.0) ORDER BY g.h) AS prof
        FROM grid g LEFT JOIN prof p ON p.user_id = g.user_id AND p.h = g.h
        GROUP BY 1
    ),
    q AS (SELECT user_id AS query_id, prof AS qp FROM dense
          WHERE user_id < 5),
    scored AS (
        SELECT q.query_id, c.user_id AS neighbor_id,
               ROUND(
                 (24.0 * list_dot_product(q.qp, c.prof)
                  - list_sum(q.qp) * list_sum(c.prof))
                 / sqrt((24.0 * list_dot_product(q.qp, q.qp)
                         - list_sum(q.qp) * list_sum(q.qp))
                        * (24.0 * list_dot_product(c.prof, c.prof)
                           - list_sum(c.prof) * list_sum(c.prof))), 6)
                 AS corr
        FROM q CROSS JOIN dense c WHERE c.user_id <> q.query_id
    )
    SELECT query_id, neighbor_id, corr, rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY corr DESC NULLS LAST,
                                              neighbor_id ASC) AS rk
        FROM scored) r
    WHERE rk <= 3
    """,
    gate=False,
)
def series_similarity_topk_q(spark, sf_dir):
    """Time-series similarity search: which users' value series behave
    like this one?  Pearson correlation of dense 24-slot hour-of-day
    profiles, top-3 per probe series — profiles are rounded means in
    fixed-order arrays and every Pearson component is a sequential
    fold, so the whole ranking is bit-deterministic and hash-oracled
    (operators/timeseries.py:series_similarity_topk)."""
    from ..operators.timeseries import series_similarity_topk

    e = table(spark, sf_dir, "events")
    return series_similarity_topk(
        e, "user_id", "ts", "value", F.col("user_id") < 5, k=3
    )
