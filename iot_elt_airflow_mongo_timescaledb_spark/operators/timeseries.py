"""Hypertable analytics — the TimescaleDB hyperfunction surface.

The reference's warehouse IS TimescaleDB (docker-compose.yaml:307;
models use ``time_bucket``, dags/dbt_project/models/agg/weekly_steps.sql:9),
so its users run the Timescale hyperfunction family against the very
tables this engine materializes: ``time_bucket_gapfill`` + ``locf`` /
``interpolate``, ``first()``/``last()`` ordered aggregates,
``histogram()``, counter ``rate``, time-weighted averages, and the
toolkit's ``lttb`` downsampler.  This module re-expresses each as an
idiomatic Spark plan:

- gapfill: the bucket grid is GENERATED distributively (per-series
  ``explode(sequence(lo, hi, step))``) and left-joined to the bucketed
  aggregate — one hash join, no driver loop; the [lo, hi] range is a
  1-row scalar frame cross-joined in (broadcast by construction), the
  Spark analogue of Timescale's WHERE-clause gapfill range.
- locf / interpolate: per-series window functions (``last(ignorenulls)``
  forward, ``first(ignorenulls)`` backward) — exactly one shuffle on the
  series key, sort within partition; at 100 TB a series key (device) is
  the natural partitioner and the sort rides the shuffle.
- first/last: ``min_by``/``max_by`` over a (ts, tiebreak) struct — a
  single hash aggregate with map-side combine, NOT a row_number window
  (no per-group sort materialization; at scale this is one shuffle of
  partial extrema, the same reason Timescale implements first/last as
  an aggregate).
- histogram: two-phase — scalar min/max probe (1 row to the driver,
  mirroring the watermark-macro shape) then a pure-codegen bucket
  expression + hash agg.
- rate / time-weighted avg: lag/lead windows on integer microseconds —
  deterministic arithmetic, NULL on zero-width intervals.
- lttb: the only per-row sequential algorithm here — one shuffle on the
  series key, then a single ``mapInPandas`` stream over sorted
  partitions (NOT per-group applyInPandas: its ~5 ms/group harness
  overhead dwarfs the O(n) math on short device series); requires each
  single series to fit one task (Timescale's own per-chunk assumption).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_gapfill(
    df_buckets: DataFrame,
    series_col: str,
    bucket_col: str,
    bounds: DataFrame,
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Dense (series x bucket) grid left-joined with the sparse bucketed
    aggregate — Timescale ``time_bucket_gapfill`` (missing buckets appear
    with NULL values).

    ``bounds`` is a 1-row frame with ``lo``/``hi`` timestamp columns —
    the Spark analogue of Timescale's WHERE-clause gapfill range; it is
    broadcast into a crossJoin (1 row by construction, never a shuffle).
    The grid is produced by ``explode(sequence(lo, hi, step))`` per
    distinct series — generated inside the executors, O(series x
    buckets) rows but never materialized on the driver.
    """
    series = df_buckets.select(series_col).distinct()
    grid = series.crossJoin(F.broadcast(bounds)).select(
        series_col,
        F.explode(F.sequence("lo", "hi", F.expr(step))).alias(bucket_col),
    )
    return grid.join(df_buckets, [series_col, bucket_col], "left")


def locf(
    df: DataFrame, series_col: str, bucket_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Last-observation-carried-forward over a gapfilled frame
    (Timescale ``locf()``): NULL buckets take the most recent non-NULL
    value of their series; leading NULLs (no prior observation) stay
    NULL, matching Timescale without a ``prev`` argument."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def interpolate_linear(
    df: DataFrame, series_col: str, bucket_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Linear interpolation over a gapfilled frame (Timescale
    ``interpolate()``): a NULL bucket between two observed buckets gets
    the line through them, evaluated at its timestamp; NULLs before the
    first / after the last observation remain NULL.

    All arithmetic is on integer microseconds + doubles in a fixed
    expression order so an external SQL oracle computing the same
    formula reproduces the bits exactly.
    """
    fwd = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    t_us = F.unix_micros(F.col(bucket_col))
    obs_t = F.when(v.isNotNull(), t_us)
    prev_v = F.last(v, ignorenulls=True).over(fwd)
    prev_t = F.last(obs_t, ignorenulls=True).over(fwd)
    next_v = F.first(v, ignorenulls=True).over(bwd)
    next_t = F.first(obs_t, ignorenulls=True).over(bwd)
    interp = prev_v + (next_v - prev_v) * (
        (t_us - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    return df.withColumn(
        out_col,
        F.when(v.isNotNull(), v).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        ),
    )


def first_last_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_cols: list[str],
    first_name: str = "first_value",
    last_name: str = "last_value",
) -> DataFrame:
    """Timescale ``first(value, time)`` / ``last(value, time)`` as ONE
    aggregate: ``min_by``/``max_by`` over a struct of the order columns
    (append a unique id as the final order column to make ties
    deterministic).  Not a row_number window: partial extrema combine
    map-side, so the one shuffle carries a single row per group — the
    reason Timescale implements first/last as an aggregate.  (The
    struct ordering key is not a fixed-width buffer, so Spark plans
    SortAggregate rather than HashAggregate; the map-side sort is on
    the group key only and the shuffle volume is unchanged.)"""
    key = F.struct(*[F.col(c) for c in order_cols])
    return df.groupBy(*group_cols).agg(
        F.min_by(value_col, key).alias(first_name),
        F.max_by(value_col, key).alias(last_name),
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_buckets: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Timescale ``histogram(value, lo, hi, n)`` — fixed-width bucket
    counts per group.  The bucket index is the explicit formula
    ``least(floor((v - lo) / (hi - lo) * n), n - 1)`` (clamped top edge,
    values below ``lo`` land in bucket 0) rather than ``width_bucket``
    so any ANSI oracle reproduces the identical double arithmetic.
    Pure codegen + one hash agg."""
    if not hi > lo:
        raise ValueError(f"histogram bounds must satisfy lo < hi, got [{lo}, {hi}]")
    if n_buckets < 1:
        raise ValueError(f"histogram needs >= 1 bucket, got {n_buckets}")
    v = F.col(value_col)
    span = F.lit(float(hi)) - F.lit(float(lo))
    idx = F.least(
        F.floor((v - F.lit(float(lo))) / span * n_buckets), F.lit(n_buckets - 1)
    )
    bucket = F.greatest(idx, F.lit(0)).cast("int").alias("bucket")
    return (
        df.groupBy(*group_cols, bucket)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def counter_rate(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-sample instantaneous rate (Timescale counter-agg ``rate``
    shape): ``(v - lag(v)) / seconds_elapsed`` within each series,
    ordered by (ts, tiebreak).  Zero-width intervals yield NULL
    (try_divide), first sample of a series yields NULL.  Returns the
    input plus a ``rate_per_s`` column; aggregate downstream."""
    w = Window.partitionBy(series_col).orderBy(ts_col, order_tiebreak)
    t_us = F.unix_micros(F.col(ts_col))
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt_us = t_us - F.lag(t_us).over(w)
    return df.withColumn(
        "rate_per_s", F.try_divide(dv * F.lit(1000000.0), dt_us.cast("double"))
    )


def counter_increase(
    df: DataFrame,
    group_cols: list[str],
    series_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Monotonic-counter total increase WITH reset handling — the core
    of Timescale ``counter_agg``/``increase``: a sample below its
    predecessor means the counter reset (process restart), so that
    step contributes the new reading itself, not the (negative) delta.
    ``sum(delta >= 0 ? delta : current)`` per group; the first sample
    of a series contributes nothing (no predecessor).  One lag window
    per series + one hash agg."""
    w = Window.partitionBy(series_col).orderBy(ts_col, order_tiebreak)
    v = F.col(value_col)
    prev = F.lag(value_col).over(w)
    stepped = df.withColumn(
        "_inc",
        F.when(prev.isNull(), F.lit(None)).otherwise(
            F.when(v >= prev, v - prev).otherwise(v)
        ),
    ).withColumn("_reset", (prev.isNotNull() & (v < prev)).cast("long"))
    return stepped.groupBy(*group_cols).agg(
        F.round(F.sum("_inc"), 2).alias("total_increase"),
        F.count("_inc").alias("n_steps"),
        F.sum("_reset").alias("n_resets"),
    )


def time_weighted_sums(
    df: DataFrame,
    group_cols: list[str],
    series_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-group time-weighted average building blocks (Timescale
    ``time_weight('LOCF', ...)`` -> ``average()``): each sample is
    weighted by the interval until the NEXT sample of its series (the
    LOCF step function); the series' last sample carries no weight.
    Returns ``twa = sum(v * dt) / sum(dt)`` per group, NULL when the
    group holds only zero-width intervals."""
    w = Window.partitionBy(series_col).orderBy(ts_col, order_tiebreak)
    t_us = F.unix_micros(F.col(ts_col))
    dt_us = (F.lead(t_us).over(w) - t_us).cast("double")
    stepped = df.withColumn("_dt", dt_us)
    return stepped.groupBy(*group_cols).agg(
        F.try_divide(
            F.sum(F.col(value_col) * F.col("_dt")), F.sum("_dt")
        ).alias("twa")
    )


def lttb_downsample(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series (the
    Timescale toolkit ``lttb()`` hyperfunction): keep ``n_out`` visually
    representative points — always the first and last, and per bucket
    the point maximizing the triangle area against the previously kept
    point and the next bucket's centroid.

    Sequential per series, but NOT one Arrow round-trip per series:
    grouped-map ``applyInPandas`` costs ~5 ms of harness overhead per
    group, which at millions of short device series dwarfs the O(n)
    algorithm (measured 7.7 s for a NOOP grouped-map vs 1.3 s for this
    shape at sf0.1).  Instead the frame is hash-repartitioned on the
    series key, sorted within partitions by (series, ts, value), and
    streamed through ONE ``mapInPandas`` pass that groups
    consecutive rows in plain pandas — a series split across Arrow
    batch boundaries is carried into the next batch, so each series is
    always processed whole.  Deterministic under repartitioning (the
    in-partition sort fixes point order; area ties keep the earliest
    point).  A single series must fit one task — the same per-chunk
    bound Timescale itself has.
    """
    from pyspark.sql import functions as F

    out_fields = df.select(series_col, ts_col, value_col).schema
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    )
    cols = [series_col, ts_col, value_col]

    def _lttb_one(pdf):
        # pdf: ONE series, already (ts, value)-sorted by the partition sort
        import numpy as np

        n = len(pdf)
        if n <= n_out:
            return pdf
        t = pdf[ts_col].astype("int64").to_numpy().astype("float64")
        v = pdf[value_col].to_numpy().astype("float64")
        # bucket boundaries: first and last points are their own buckets
        edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
        keep = [0]
        prev = 0
        for b in range(n_out - 2):
            s, e = edges[b], edges[b + 1]
            if s >= e:
                continue
            ns, ne = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            ne = max(ne, ns + 1)  # tiny series: int-cast edges can collide
            cx, cy = t[ns:ne].mean(), v[ns:ne].mean()
            area = np.abs(
                (t[prev] - cx) * (v[s:e] - v[prev])
                - (t[prev] - t[s:e]) * (cy - v[prev])
            )
            prev = s + int(np.argmax(area))
            keep.append(prev)
        keep.append(n - 1)
        return pdf.iloc[sorted(set(keep))]

    def _run(batches):
        import pandas as pd

        def downsample_complete(pdf):
            outs = [
                _lttb_one(g) for _, g in pdf.groupby(series_col, sort=False)
            ]
            return pd.concat(outs, ignore_index=True)

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # the partition-final series may continue in the next Arrow
            # batch: hold it back until the stream ends
            last_sid = pdf[series_col].iloc[-1]
            tail_mask = pdf[series_col] == last_sid
            carry = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield downsample_complete(done)
        if carry is not None and len(carry):
            yield downsample_complete(carry)

    return (
        df.select(*cols)
        .repartition(F.col(series_col))
        .sortWithinPartitions(*cols)
        .mapInPandas(_run, schema=schema)
    )


def hourly_profile(
    df: DataFrame, series_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Dense 24-slot hour-of-day profile per series: slot = rounded mean
    value for that hour, missing hours 0.0 — the fixed-length feature
    vector that makes series comparable by plain array arithmetic.  One
    hash agg + a map rebuild; the rounding pins the (order-dependent)
    float means so every downstream fold is deterministic."""
    prof = df.groupBy(
        series_col, F.hour(F.col(ts_col)).alias("__h")
    ).agg(F.round(F.avg(value_col), 4).alias("__m"))
    return prof.groupBy(series_col).agg(
        F.map_from_entries(F.collect_list(F.struct("__h", "__m"))).alias("__mm")
    ).select(
        series_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda h: F.coalesce(F.element_at(F.col("__mm"), h), F.lit(0.0)),
        ).alias("profile"),
    )


def series_similarity_topk(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    query_filter,
    k: int = 3,
) -> DataFrame:
    """Distributed time-series similarity search (the EDBT'19 streaming
    similarity-search shape): which series behave like this one?
    Pearson correlation between dense hour-of-day profiles, ranked
    top-k per query series.

    Determinism by construction: profiles are rounded means in FIXED
    24-slot arrays, and every Pearson component (sums, dots) is a
    sequential left fold over that fixed order — no partition-dependent
    float accumulation, so the query carries a full hash oracle.  Scale
    shape: profile table is one row per series; the query side
    broadcasts (few probe series against the fleet), so the compare is
    a broadcast nested-loop over ROWS-per-series, not events.
    """
    profiles = hourly_profile(df, series_col, ts_col, value_col)
    q = profiles.filter(query_filter).select(
        F.col(series_col).alias("query_id"), F.col("profile").alias("__qp")
    )
    c = profiles.select(
        F.col(series_col).alias("neighbor_id"), F.col("profile").alias("__cp")
    )

    def fsum(a):
        return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)

    def fdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    n = F.lit(24.0)
    sx, sy = fsum(F.col("__qp")), fsum(F.col("__cp"))
    sxy = fdot(F.col("__qp"), F.col("__cp"))
    sxx = fdot(F.col("__qp"), F.col("__qp"))
    syy = fdot(F.col("__cp"), F.col("__cp"))
    corr = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(corr, 6).alias("corr"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("corr").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
