"""Beyond-reference analytics operators — set ops, multi-dim aggregates,
pivot, distinct/approx/percentile aggregates, as-of + range joins, and
sliding/session event-time windows.

The reference surface has none of these (SURVEY §2.4/§2.5 "not present"
lists); they complete the engine for the workloads a TimescaleDB user
would bring: latest-reading-before-t lookups (as-of), session analysis,
sliding rollups, and OLAP subtotal grids.  Every query keeps the same
DuckDB-oracle contract as the core suite.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof import asof_join
from .registry import query, table

# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


@query(
    "union_active_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    gate=False,  # driver row via the merged set_ops_users below
)
def union_active_users(spark, sf_dir):
    """UNION (distinct) of two projections."""
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@query(
    "intersect_buyers_viewers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    gate=False,  # driver row via the merged set_ops_users below
)
def intersect_buyers_viewers(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "view").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@query(
    "except_silent_customers",
    oracle="""
    SELECT c_custkey AS user_id FROM customer WHERE c_custkey <= 150
    EXCEPT
    SELECT user_id FROM events
    """,
    gate=False,  # driver row via the merged set_ops_users below
)
def except_silent_customers(spark, sf_dir):
    """EXCEPT — customers (in the events id range) with no events at all."""
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    return (
        c.filter(F.col("c_custkey") <= 150)
        .select(F.col("c_custkey").alias("user_id"))
        .exceptAll(e.select("user_id"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Multi-dimensional aggregates: ROLLUP / CUBE / PIVOT
# ---------------------------------------------------------------------------


@query(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS revenue, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    gate=False,  # driver row via the merged multidim_aggregates below
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP subtotal grid — partial aggregates reuse the same shuffle
    (Spark plans a single Expand + hash aggregate)."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    gate=False,  # driver row via the merged multidim_aggregates below
)
def cube_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count("*").alias("n"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_daily_event_values",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS day,
           """
    + ",\n           ".join(
        f"ROUND(SUM(value) FILTER (WHERE event_type = '{t}'), 2) AS {t}"
        for t in _EVENT_TYPES
    )
    + """
    FROM events GROUP BY 1
    """,
    gate=False,  # conditional-agg reshape — pytest-verified; the gated
    # multidim_aggregates row covers the Expand-based aggregate family
)
def pivot_daily_event_values(spark, sf_dir):
    """PIVOT as single-pass conditional aggregation: one shuffle, one
    hash-agg.  (``df.pivot(col, values)`` plans a second aggregate on
    top of the first — this form is the plan .pivot should produce and
    what a 100 TB run wants.)"""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.date_format("ts", "yyyyMMdd").alias("day")).agg(
        *[
            F.round(
                F.sum(F.when(F.col("event_type") == t, F.col("value"))), 2
            ).alias(t)
            for t in _EVENT_TYPES
        ]
    )


# ---------------------------------------------------------------------------
# Distinct / approximate / percentile aggregates
# ---------------------------------------------------------------------------


@query(
    "distinct_users_daily",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
    gate=False,  # exact countDistinct also asserted inside gated
    # approx_distinct_users (its exact_users column)
)
def distinct_users_daily(spark, sf_dir):
    """Exact distinct aggregate (two-phase: partial distinct per
    partition, then merge — Spark plans Expand + two aggregates)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.date_format("ts", "yyyyMMdd").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol,
           CAST(0 AS BIGINT) AS err_tol_buckets
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB path where the
    exact distinct's per-key dedup shuffle is the bottleneck.

    HLL sketches are engine-specific, so the estimate itself can't be
    hash-compared; instead the query emits a deterministic verdict —
    ``within_tol`` = |estimate − exact| ≤ 5% of exact — which the oracle
    asserts as TRUE, plus ``err_tol_buckets`` = floor(|err| / 5% of
    exact) so a future failure is diagnosable by magnitude (bucket 0 =
    within tolerance, 1 = within 2×, …) instead of an opaque hash
    mismatch.  The 5% margin is ~2.5σ for rsd=0.02 and is SF-dependent:
    smaller groups estimate exactly (HLL++ sparse mode), larger groups
    concentrate further — re-derive the margin if the gate SF changes."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users"))
    tol = 0.05 * F.col("exact_users")
    return agg.select(
        "event_type",
        "exact_users",
        (err <= tol).alias("within_tol"),
        F.when(err <= tol, F.lit(0))
        .otherwise(F.floor(err / tol))
        .cast("long")
        .alias("err_tol_buckets"),
    )


@query(
    "hll_rollup_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol,
           CAST(0 AS BIGINT) AS err_tol_buckets
    FROM events GROUP BY 1
    """,
    gate=False,  # family represented in the gate by approx_distinct_users
)
def hll_rollup_distinct(spark, sf_dir):
    """Mergeable-sketch distinct rollup — the 100 TB count-distinct
    MAINTENANCE shape: per-(event_type, day) DataSketches HLL partials
    (``hll_sketch_agg``, one hash agg, map-side combined) are re-merged
    to event_type grain with ``hll_union_agg`` and estimated — the fact
    table is scanned once to build the daily partials and NEVER again
    for any coarser grain, and sketch union never double-counts a user
    appearing on many days (register-wise max, unlike summing daily
    distinct counts).

    Same deterministic-verdict oracle as ``approx_distinct_users``:
    the estimate itself is engine-specific, so the query emits
    ``within_tol`` (merged estimate within 5% of exact) + an error
    bucket, which the oracle pins as TRUE/0.  Note merged-daily and
    direct-whole-column sketches can differ by a few counts at larger
    SFs (sparse->dense mode promotion during union), which is why the
    verdict is a tolerance, not equality — the near-equality bound is
    pinned in tests/test_sketches.py.  ``IncrementalDistinctSync``
    (plans/pipeline.py) is this query's maintenance twin: the daily
    sketches live in a warehouse table that fact batches merge into.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyyMMdd").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("hll"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("est_m")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    err = F.abs(F.col("est_m") - F.col("exact_users"))
    tol = 0.05 * F.col("exact_users")
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        (err <= tol).alias("within_tol"),
        F.when(err <= tol, F.lit(0))
        .otherwise(F.floor(err / tol))
        .cast("long")
        .alias("err_tol_buckets"),
    )


@query(
    "hist_rollup_quantiles",
    oracle="""
    SELECT event_type, COUNT(*) AS n_values, TRUE AS p50_ok, TRUE AS p99_ok
    FROM events WHERE value BETWEEN 0 AND 500 GROUP BY 1
    """,
    # promoted to the gate in round 8 (rotation: the driver had never
    # exercised the round-7 flagships; minhash/simhash signature rows
    # demoted — their family stays covered by lsh_candidate_pairs /
    # dedup_clusters and the pytest oracle suite).  r15 rotation: the
    # STREAMING twin rollup_stream_hist carries the gate (same
    # semigroup merge, plus the maintain_stream path); this batch row
    # stays green in the pytest oracle suite.
    gate=False,
)
def hist_rollup_quantiles(spark, sf_dir):
    """Mergeable-histogram quantile rollup — the 100 TB percentile
    MAINTENANCE shape (``IncrementalHistSync``, plans/pipeline.py): two
    disjoint half-batches merge element-wise into one stored fixed-bin
    histogram per event_type (exercising the semigroup merge inside the
    gate query itself), and the p50/p99 readouts must land within one
    bin width of ``percentile_disc`` — the exact ceil(p*n)-th order
    statistic, which is precisely the estimator's contract.  The oracle
    pins the verdict (TRUE/TRUE) plus the exact clamp-free row count,
    the same deterministic-verdict pattern as ``hll_rollup_distinct``.
    TimescaleDB twin: uddsketch/tdigest continuous aggregates."""
    from ..fs import scratch_dir
    from .pipeline import IncrementalHistSync

    lo, hi, n_bins = 0.0, 500.0, 50
    width = (hi - lo) / n_bins
    e = table(spark, sf_dir, "events").filter(
        (F.col("value") >= lo) & (F.col("value") <= hi)
    )
    sync = IncrementalHistSync(
        spark,
        scratch_dir(spark, "hist_", cleanup_atexit=True),
        "agg.value_hist",
        ("event_type",),
        "value",
        lo,
        hi,
        n_bins,
    )
    sync.sync(e.filter(F.col("user_id") % 2 == 0))
    sync.sync(e.filter(F.col("user_id") % 2 == 1))
    exact = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("x50"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("x99"),
    )
    return sync.read().join(exact, "event_type").select(
        "event_type",
        "n_values",
        (F.abs(F.col("p50") - F.col("x50")) <= width).alias("p50_ok"),
        (F.abs(F.col("p99") - F.col("x99")) <= width).alias("p99_ok"),
    )


@query(
    "value_percentiles_approx",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           TRUE AS w50, TRUE AS w90, TRUE AS w99
    FROM events GROUP BY 1
    """,
    gate=False,  # family row: stats_summary (exact percentiles)
)
def value_percentiles_approx(spark, sf_dir):
    """percentile_approx (KLL-style sketch) — the 100 TB quantile path
    where the exact percentile's full per-group sort is the bottleneck.

    Sketch values are engine-specific, so the deterministic verdict
    (approx_distinct_users pattern) pins a RANK tolerance instead: the
    approximate p-quantile must land between the exact (p-0.01)- and
    (p+0.01)-quantiles.  accuracy=1000 bounds rank error at 0.001, ten
    times tighter than the asserted window, so the verdict is stable
    across data refreshes; both quantile families are interpolation-
    compatible with the oracle engine (see value_percentiles)."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(1000)
        ).alias("ap"),
        F.expr("percentile(value, array(0.49, 0.89, 0.98))").alias("lo"),
        F.expr("percentile(value, array(0.51, 0.91, 1.0))").alias("hi"),
    )

    def w(i):
        return (F.col("ap")[i] >= F.col("lo")[i]) & (
            F.col("ap")[i] <= F.col("hi")[i]
        )

    return agg.select(
        "event_type",
        "n",
        w(0).alias("w50"),
        w(1).alias("w90"),
        w(2).alias("w99"),
    )


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY 1
    """,
    gate=False,  # driver row via the merged stats_summary below
)
def value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles — Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` (both linear interpolation).  The approximate
    t-digest variant (percentile_approx) is the scale path."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# As-of join + range join
# ---------------------------------------------------------------------------


@query(
    "asof_last_view_before_purchase",
    oracle="""
    SELECT p.user_id AS user_id, p.ts AS purchase_ts,
           p.value AS purchase_value, v.value AS view_value_asof
    FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts, MAX(value) AS value FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts) v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_last_view_before_purchase(spark, sf_dir):
    """As-of join: each purchase gets the latest prior view reading of
    the same user (union + running last-ignorenulls; operators/asof.py).

    Tie determinism: the DuckDB oracle's ASOF JOIN leaves equal-ts tie
    order unspecified, so its view side is pre-reduced to ONE row per
    (user_id, ts) with MAX(value).  The Spark side needs NO such
    pre-reduce (and no second shuffle): the operator's greatest-tuple
    tiebreak (operators/asof.py:98-103) already resolves equal-ts right
    rows to the greatest ``value`` inside the ONE window shuffle, which
    with ``value_cols=["value"]`` is exactly MAX(value).  Both sides are
    therefore deterministic and equal under ANY engine tie behavior,
    and the operator keeps its single-shuffle plan
    (test_asof_join_single_shuffle_no_join_node)."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value")
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="purchase_ts", right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "user_id", "purchase_ts", "purchase_value",
        F.col("value_asof").alias("view_value_asof"),
    )


@query(
    "range_join_ship_lag",
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y%m') AS month,
           COUNT(*) AS n_late_items,
           ROUND(SUM(l.l_extendedprice), 2) AS late_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def range_join_ship_lag(spark, sf_dir):
    """Equi + range predicate join — the range condition rides the hash
    join on l_orderkey (no nested loop), then a month rollup."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return joined.groupBy(F.date_format("o_orderdate", "yyyyMM").alias("month")).agg(
        F.count("*").alias("n_late_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("late_revenue"),
    )


# ---------------------------------------------------------------------------
# Event-time windows: sliding + session (absent from the reference, which
# only has tumbling buckets — SURVEY §2.7 note)
# ---------------------------------------------------------------------------


@query(
    "sliding_window_rollup",
    oracle="""
    SELECT ws AS window_start, event_type, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                         date_trunc('hour', ts)]) AS ws,
                 event_type, value
          FROM events)
    GROUP BY 1, 2
    """,
    gate=False,  # windowing family's gated row is session_windows (the
    # harder semantics); sliding Expand-plan verified by pytest
)
def sliding_window_rollup(spark, sf_dir):
    """Sliding window (2h length, 1h slide): each event lands in two
    windows — Spark plans one Expand (×2 rows), not a self-join."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


@query(
    "session_windows",
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
)
def session_windows(spark, sf_dir):
    """Session windows (30-min inactivity gap) per user.  Spark's
    session_window end = last event + gap; the oracle reproduces it with
    the gaps-and-islands idiom (a new session starts when the gap >= 30
    min, matching Spark's half-open [start, last+gap) semantics)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Rolling window analytics (lag/lead/moving average)
# ---------------------------------------------------------------------------


@query(
    "rolling_avg_user_value",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS avg3,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta
    FROM events
    """,
    gate=False,  # driver row via the merged window_frames_user_value below
)
def rolling_avg_user_value(spark, sf_dir):
    """Moving average over the last 3 readings + delta vs previous —
    the per-device trend query every IoT dashboard runs."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("avg3"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "embedding_near_dup",
    # round-10 gate rotation: ann_lsh_topk gates the hyperplane-LSH
    # machinery; this row stays pytest-oracle-verified
    gate=False,
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) > 0.4
    """,
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup: exact all-pairs baseline with the
    upper-triangle predicate (demo threshold 0.4 — the testdata vectors
    are random so 0.95-style real thresholds match nothing).  Scale
    path: block the join through the IVF/LSH bucketing in
    operators/similarity.py instead of the cross product."""
    from ..operators.similarity import as_double, dot, l2_norm

    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        as_double(F.col("embedding")).alias("e"),
        l2_norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    # try_divide: zero-norm rows score NULL (fails the > 0.4 filter in
    # BOTH engines) instead of NaN-passing it / ANSI-aborting — same
    # guard as operators/similarity.py
    cos = F.try_divide(
        dot(F.col("a.e"), F.col("b.e")), F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
            cos.alias("__raw"),
        )
        .filter(F.col("__raw") > 0.4)
        .drop("__raw")
    )


# ---------------------------------------------------------------------------
# typed semi-structured extraction: props JSON -> struct column
# ---------------------------------------------------------------------------


@query(
    "typed_props_daily",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS day,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    gate=False,  # JSON-extraction family pytest-verified (with
    # json_props_stats); SURVEY §2's S13 row is test-covered by design
)
def typed_props_daily(spark, sf_dir):
    """Semi-structured depth: parse the props payload once with
    ``from_json`` into a typed struct (not per-path string extraction),
    then aggregate on the typed field."""
    from pyspark.sql import types as T

    e = table(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    typed = e.withColumn("p", F.from_json("props", props_schema))
    return typed.groupBy(
        F.date_format("ts", "yyyyMMdd").alias("day"),
        (F.col("p.k") % 10).alias("k_bucket"),
    ).agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))


# ---------------------------------------------------------------------------
# SQL-string interface — the spark.sql entry point over registered views
# ---------------------------------------------------------------------------


@query(
    "sql_interface_revenue",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    # r14 rotation: sql_dml_roundtrip carries the gate — its final
    # SELECT exercises this row's passthrough plus the DML dispatch
    gate=False,
)
def sql_interface_revenue(spark, sf_dir):
    """The SQL entry point (the reference's users query TimescaleDB in
    raw SQL, README.md:46): register views, run spark.sql — same
    Catalyst plan as the DataFrame API."""
    from ..session import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


# ---------------------------------------------------------------------------
# scalar + correlated subqueries
# ---------------------------------------------------------------------------


@query(
    "orders_above_global_avg",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_big,
           ROUND(AVG(o_totalprice), 4) AS avg_big
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY 1
    """,
    gate=False,  # driver row via the merged subquery_filters below
)
def orders_above_global_avg(spark, sf_dir):
    """Uncorrelated scalar subquery in a filter — Catalyst plans the
    subquery once (ReusedSubquery) and broadcasts the scalar; no
    driver-side pre-query needed (contrast A4's explicit macro form)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_big,
               ROUND(AVG(o_totalprice), 4) AS avg_big
        FROM __orders_sq
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM __orders_sq)
        GROUP BY o_orderpriority
        """
    )


@query(
    "customers_above_nation_avg",
    oracle="""
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS n_rich
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY 1
    """,
    gate=False,  # driver row via the merged subquery_filters below
)
def customers_above_nation_avg(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates into an
    aggregate + join (the rewrite Postgres does for the reference's
    warehouse queries); expressed here with the DataFrame API as the
    same agg+join to show the equivalence."""
    c = table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_rich"))
    )


# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------


@query(
    "value_statistics",
    oracle="""
    SELECT event_type,
           ROUND(stddev_samp(value), 6) AS sd,
           ROUND(var_samp(value), 6) AS var,
           ROUND(corr(value, CAST(epoch_ns(ts) // 1000000000 AS DOUBLE)), 6) AS corr_ts,
           ROUND(covar_samp(value, user_id), 6) AS covar_user
    FROM events GROUP BY 1
    """,
    gate=False,  # driver row via the merged stats_summary below
)
def value_statistics(spark, sf_dir):
    """Second-moment aggregates (stddev/variance/correlation/covariance)
    — single-pass algebraic aggregates, map-side combinable like SUM."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr("value", F.unix_timestamp("ts").cast("double")), 6).alias("corr_ts"),
        F.round(F.covar_samp("value", F.col("user_id").cast("double")), 6).alias("covar_user"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS + time-range window frame
# ---------------------------------------------------------------------------


@query(
    "grouping_sets_activity",
    oracle="""
    SELECT event_type, strftime(ts, '%Y%m%d') AS day,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
    """,
    gate=False,  # driver row via the merged multidim_aggregates below
)
def grouping_sets_activity(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): three aggregation
    grains in ONE shuffle via a single Expand."""
    e = table(spark, sf_dir, "events")
    e.select(
        "event_type", F.date_format("ts", "yyyyMMdd").alias("day"), "value"
    ).createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT event_type, day, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM __gs_events
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
        """
    )


@query(
    "trailing_hour_user_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
             AS avg_1h
    FROM events
    """,
    gate=False,  # driver row via the merged window_frames_user_value below
)
def trailing_hour_user_avg(spark, sf_dir):
    """Time-RANGE window frame — the trailing-hour moving average every
    monitoring dashboard wants.  Spark range frames need a numeric
    ordering, so the frame runs over epoch seconds (µs-exact cast)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
    )


# ---------------------------------------------------------------------------
# Merged gate queries — the driver records at most 50 CORRECTNESS rows, so
# closely-related operator families share one tagged row each; the
# standalone variants above register with gate=False and stay fully
# verified by tests/test_oracle_parity.py.
# ---------------------------------------------------------------------------


@query(
    "set_ops_users",
    oracle="""
    SELECT 'union' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION
      SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'intersect' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'view'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'except' AS op, user_id FROM (
      SELECT c_custkey AS user_id FROM customer WHERE c_custkey <= 150
      EXCEPT
      SELECT user_id FROM events)
    """,
    # r15 rotation: demoted for sql_txn_views (plain Spark-SQL set
    # operations — no engine code of our own in the path; stays green
    # in the pytest oracle suite)
    gate=False,
)
def set_ops_users(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT in one gated row (tagged union of the
    three standalone set-op queries)."""
    parts = [
        union_active_users(spark, sf_dir).select(
            F.lit("union").alias("op"), "user_id"
        ),
        intersect_buyers_viewers(spark, sf_dir).select(
            F.lit("intersect").alias("op"), "user_id"
        ),
        except_silent_customers(spark, sf_dir).select(
            F.lit("except").alias("op"), "user_id"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "multidim_aggregates",
    oracle="""
    SELECT 'rollup' AS op, l_returnflag AS k1, l_linestatus AS k2,
           ROUND(SUM(l_extendedprice), 2) AS metric, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
           ROUND(SUM(o_totalprice), 2) AS metric, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS op, event_type AS k1, strftime(ts, '%Y%m%d') AS k2,
           ROUND(SUM(value), 2) AS metric, COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (k2), (event_type, k2))
    """,
    # r15 late rotation: demoted for sql_matview_refresh — plain Spark
    # SQL ROLLUP/CUBE/GROUPING SETS with no engine code of our own in
    # the path (same rationale as set_ops_users); stays green in the
    # pytest oracle suite.
    gate=False,
)
def multidim_aggregates(spark, sf_dir):
    """ROLLUP + CUBE + GROUPING SETS in one gated row — each branch is
    the standalone query's Expand + single-shuffle hash aggregate,
    reshaped to the common (op, k1, k2, metric, n) schema."""
    rollup = rollup_revenue(spark, sf_dir).select(
        F.lit("rollup").alias("op"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("revenue").alias("metric"),
        "n",
    )
    cube = cube_orders(spark, sf_dir).select(
        F.lit("cube").alias("op"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        F.col("total").alias("metric"),
        "n",
    )
    gsets = grouping_sets_activity(spark, sf_dir).select(
        F.lit("gsets").alias("op"),
        F.col("event_type").alias("k1"),
        F.col("day").alias("k2"),
        F.col("total").alias("metric"),
        "n",
    )
    return rollup.unionByName(cube).unionByName(gsets)


@query(
    "stats_summary",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           ROUND(stddev_samp(value), 6) AS sd,
           ROUND(var_samp(value), 6) AS var,
           ROUND(corr(value, CAST(epoch_ns(ts) // 1000000000 AS DOUBLE)), 6) AS corr_ts,
           ROUND(covar_samp(value, user_id), 6) AS covar_user
    FROM events GROUP BY 1
    """,
    # r15 rotation: demoted for ingest_schema_drift (fused built-in
    # aggregate family — exact percentiles/moments stay covered by
    # value_percentiles / value_statistics and the pytest oracle suite)
    gate=False,
)
def stats_summary(spark, sf_dir):
    """Percentiles + second-moment statistics in one gated row (one
    shuffle, one hash aggregate — the same plan the standalone
    value_percentiles / value_statistics queries produce, fused)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(
            F.corr("value", F.unix_timestamp("ts").cast("double")), 6
        ).alias("corr_ts"),
        F.round(
            F.covar_samp("value", F.col("user_id").cast("double")), 6
        ).alias("covar_user"),
    )


@query(
    "window_frames_user_value",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS avg3,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
             AS avg_1h
    FROM events
    """,
)
def window_frames_user_value(spark, sf_dir):
    """ROWS frame + LAG + time-RANGE frame in one gated row — all three
    window expressions share the per-user sort (one shuffle + one sort;
    Catalyst plans one Window for the rows/lag pair and one for the
    range frame over the same partitioning)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("avg3"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.round(F.avg("value").over(w_range), 6).alias("avg_1h"),
    )


@query(
    "ranking_functions",
    oracle="""
    WITH t AS (
        SELECT event_type, user_id, ROUND(SUM(value), 2) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, user_id, total,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY total DESC, user_id) AS rn,
           NTILE(4) OVER (PARTITION BY event_type
                          ORDER BY total DESC, user_id) AS quartile,
           RANK() OVER (PARTITION BY event_type ORDER BY total DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY event_type
                              ORDER BY total DESC) AS drnk,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                      ORDER BY total DESC), 6) AS prnk,
           ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                   ORDER BY total DESC), 6) AS cdist
    FROM t
    """,
    gate=False,  # driver row via window_frames_user_value (window family)
)
def ranking_functions(spark, sf_dir):
    """The full SQL ranking surface in one pass: row_number + ntile on
    the fully-tiebroken order (deterministic positions), rank /
    dense_rank / percent_rank / cume_dist on the value order alone
    (tie-AWARE — equal totals share ranks, which is deterministic
    without a tiebreak).  Both orderings share one partitioning, so
    Catalyst plans a single shuffle on event_type with two Window
    nodes riding the same sort prefix."""
    e = table(spark, sf_dir, "events")
    t = e.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    pos = Window.partitionBy("event_type").orderBy(
        F.col("total").desc(), "user_id"
    )
    ties = Window.partitionBy("event_type").orderBy(F.col("total").desc())
    return t.select(
        "event_type",
        "user_id",
        "total",
        F.row_number().over(pos).alias("rn"),
        F.ntile(4).over(pos).alias("quartile"),
        F.rank().over(ties).alias("rnk"),
        F.dense_rank().over(ties).alias("drnk"),
        F.round(F.percent_rank().over(ties), 6).alias("prnk"),
        F.round(F.cume_dist().over(ties), 6).alias("cdist"),
    )


@query(
    "unpivot_event_metrics",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
        FROM events GROUP BY 1
    )
    SELECT user_id, 'clicks' AS metric, clicks AS n FROM wide
    UNION ALL
    SELECT user_id, 'views' AS metric, views AS n FROM wide
    UNION ALL
    SELECT user_id, 'purchases' AS metric, purchases AS n FROM wide
    """,
    gate=False,  # driver row via pivot_daily_event_values (reshape family)
)
def unpivot_event_metrics(spark, sf_dir):
    """Wide -> long reshape (`DataFrame.unpivot`, the inverse of the
    gated pivot): conditional-count columns melt into (metric, n)
    rows.  Unpivot is a zero-shuffle Expand node — each input row fans
    to k output rows map-side, so the only shuffle is the upstream
    aggregate's."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "purchases"
        ),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["clicks", "views", "purchases"],
        variableColumnName="metric",
        valueColumnName="n",
    )


@query(
    "null_safe_join_counts",
    oracle="""
    WITH a AS (
        SELECT NULLIF(event_type, 'error') AS k, COUNT(*) AS n_a
        FROM events WHERE value >= 100 GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(event_type, 'error') AS k, COUNT(*) AS n_b
        FROM events WHERE value < 100 GROUP BY 1
    )
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    gate=False,  # driver row via semi_anti_join_counts (join family)
)
def null_safe_join_counts(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantics SQL
    users reach for when a nullable dimension key must still join.
    Spark plans EqualNullSafe keys as an ordinary hash join (keys are
    coalesced into a null-distinguishing struct), NOT a nested-loop —
    same shuffle economics as a plain equi join."""
    e = table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error")).alias("k")
    a = e.filter(F.col("value") >= 100).select(k).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = e.filter(F.col("value") < 100).select(k).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    return a.join(b, a["k"].eqNullSafe(b["k"]), "inner").select(
        a["k"].alias("k"), "n_a", "n_b"
    )


@query(
    "subquery_filters",
    oracle="""
    SELECT 'scalar' AS op, o_orderpriority AS key, COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS metric
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY 2
    UNION ALL
    SELECT 'correlated' AS op, CAST(c.c_nationkey AS VARCHAR) AS key,
           COUNT(*) AS n, CAST(NULL AS DOUBLE) AS metric
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY 2
    """,
)
def subquery_filters(spark, sf_dir):
    """Uncorrelated scalar subquery + correlated subquery (decorrelated
    agg+join) in one gated row, tagged and unioned."""
    scalar = orders_above_global_avg(spark, sf_dir).select(
        F.lit("scalar").alias("op"),
        F.col("o_orderpriority").alias("key"),
        F.col("n_big").alias("n"),
        F.col("avg_big").alias("metric"),
    )
    correlated = customers_above_nation_avg(spark, sf_dir).select(
        F.lit("correlated").alias("op"),
        F.col("nationkey").cast("string").alias("key"),
        F.col("n_rich").alias("n"),
        F.lit(None).cast("double").alias("metric"),
    )
    return scalar.unionByName(correlated)


# ---------------------------------------------------------------------------
# Semi-structured props extraction (round 4)
# ---------------------------------------------------------------------------


@query(
    "quarantine_stats",
    oracle="""
    SELECT 'value_le_400' AS reason,
           COUNT(*) FILTER (WHERE NOT coalesce(value <= 400, FALSE)) AS n
    FROM events
    UNION ALL
    SELECT 'k_le_90' AS reason,
           COUNT(*) FILTER (WHERE NOT coalesce(
               CAST(json_extract_string(props, '$.k') AS BIGINT) <= 90,
               FALSE)) AS n
    FROM events
    UNION ALL
    SELECT 'clean' AS reason,
           COUNT(*) FILTER (WHERE
               coalesce(value <= 400, FALSE)
               AND coalesce(
                   CAST(json_extract_string(props, '$.k') AS BIGINT) <= 90,
                   FALSE)) AS n
    FROM events
    """,
    gate=False,
)
def quarantine_stats(spark, sf_dir):
    """Contract-enforcement census over the dead-letter router
    (operators/quality_checks.py tag_violations): per-rule violation
    counts plus the clean count, as ONE hash-free aggregate unpivoted
    to (reason, n) rows — every reason always present, even at zero,
    so the dashboard the quarantine feeds never loses a series.  Rules
    evaluating NULL (malformed payload) count as violations by
    contract."""
    from ..operators.quality_checks import tag_violations

    e = table(spark, sf_dir, "events")
    rules = {
        "value_le_400": F.col("value") <= 400,
        "k_le_90": F.get_json_object(F.col("props"), "$.k").cast("long")
        <= 90,
    }
    tagged = tag_violations(e, rules)
    agg = tagged.agg(
        F.sum(
            F.array_contains("__violations", "value_le_400").cast("long")
        ).alias("value_le_400"),
        F.sum(F.array_contains("__violations", "k_le_90").cast("long")).alias(
            "k_le_90"
        ),
        F.sum((F.size("__violations") == 0).cast("long")).alias("clean"),
    )
    return agg.unpivot(
        ids=[],
        values=["value_le_400", "k_le_90", "clean"],
        variableColumnName="reason",
        valueColumnName="n",
    )


@query(
    "props_json_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS avg_k
    FROM events GROUP BY event_type
    """,
    gate=False,
)
def props_json_stats(spark, sf_dir):
    """Semi-structured payload extraction: pull ``$.k`` out of the JSON
    ``props`` string per event and aggregate per type — the Spark-native
    answer to the reference's BSON normalization (SURVEY §2.1 S8,
    `dags/dlt_sources/mongodb/helpers.py:258-285`) when the payload
    stays semi-structured instead of being flattened at load.
    ``get_json_object`` is a JVM codegen expression — the 100 TB shape
    is scan → narrow map → one map-side-combinable hash-agg; no UDF,
    no extra shuffle."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


_PROFILE_COLS = ["event_id", "user_id", "event_type", "props"]


@query(
    "table_profile",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
            COUNT(*) - COUNT({c}) AS n_nulls,
            COUNT(DISTINCT {c}) AS n_distinct,
            MIN(CAST({c} AS VARCHAR)) AS min_value,
            MAX(CAST({c} AS VARCHAR)) AS max_value
            FROM events"""
        for c in _PROFILE_COLS
    ),
    gate=False,
)
def table_profile(spark, sf_dir):
    """Post-load table profiling (the ANALYZE surface): per-column null
    / distinct / min / max in ONE scan — all columns' metrics ride a
    single expand + hash-agg pass, unpivoted with ``stack``; the SQL
    oracle spells it as per-column scans because DuckDB optimizes that
    freely at test scale (operators/quality_checks.py:profile_columns)."""
    from ..operators.quality_checks import profile_columns

    return profile_columns(table(spark, sf_dir, "events"), _PROFILE_COLS)


@query(
    "conversion_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        GROUP BY 1
    )
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
    gate=False,  # event-sequence family; asof/session queries gated
)
def conversion_funnel(spark, sf_dir):
    """Ordered event-sequence funnel (the product-analytics staple):
    users whose first view precedes a later click precedes a later
    purchase — each stage is one aggregate + one equi-join back to the
    events of the next type, so the plan is three hash-agg/join rounds
    on the user key, never a per-user Python loop or a sort of the
    whole event log."""
    e = table(spark, sf_dir, "events")

    def first_after(etype, prev, prev_ts_col, out_col):
        ev = e.filter(F.col("event_type") == etype)
        if prev is None:
            return ev.groupBy("user_id").agg(F.min("ts").alias(out_col))
        return (
            ev.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    v = first_after("view", None, None, "t_view")
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")
    rows = [
        ("view", v),
        ("view>click", c),
        ("view>click>purchase", p),
    ]
    out = None
    for label, frame in rows:
        one = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT e.user_id, CAST(f.cohort AS DATE) AS cohort_week,
               date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7
                 AS weeks_since
        FROM events e JOIN first f ON f.user_id = e.user_id
    )
    SELECT cohort_week, weeks_since, COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
    gate=False,  # event-sequence family; session/asof queries gated
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix (the other product-analytics staple):
    users grouped by first-activity week, counted once per subsequent
    active week — one first-touch aggregate, one equi-join back to the
    events, a distinct, and one hash agg; the week arithmetic is plain
    day-diff integer division so both engines agree exactly."""
    e = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            F.col("cohort").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(wk.cast("date"), F.col("cohort").cast("date")) / 7
            ).alias("weeks_since"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "topk_rollup_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS user_id, COUNT(*) AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, user_id, n,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY n DESC, user_id ASC
             ) AS rank,
             COUNT(*) OVER (PARTITION BY event_type) AS n_tracked
      FROM c
    )
    SELECT event_type, CAST(rank AS INT) AS rank, user_id,
           n AS est_count, CAST(n_tracked AS INT) AS n_tracked
    FROM r WHERE rank <= 5
    """,
    # r9 gate rotation (VERDICT r8 task 2): the round-8 flagship takes a
    # driver row; doc_fingerprints demoted in exchange
)
def topk_rollup_heavy_hitters(spark, sf_dir):
    """Heavy-hitters rollup end-to-end (``IncrementalTopKSync``, the
    fourth sketch-family member): top-5 users per event_type maintained
    as a capped per-group count map, built by merging two disjoint
    half-batches (event_id parity) — the hash covers the partial-count
    truncation, the map merge, and the ranked read surface.  The cap
    (4096) exceeds the per-type user cardinality at every driver scale,
    so the maintained result is EXACT here and the oracle is the plain
    window query; past the cap the class degrades to heavy-hitters-
    with-margin (pinned separately in tests/test_sketches.py)."""
    from ..fs import scratch_dir
    from .pipeline import IncrementalTopKSync

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    root = scratch_dir(spark, "topk_", cleanup_atexit=True)
    tk = IncrementalTopKSync(
        spark, root, "agg.hh", ("event_type",), "user_id", k=5, cap=4096
    )
    tk.sync(ev.filter(F.col("event_id") % 2 == 0))
    return tk.sync(ev.filter(F.col("event_id") % 2 == 1))


@query(
    "agg_rollup_regrain",
    oracle="""
    SELECT strftime(ts, '%Y%m') AS month, user_id,
           ROUND(SUM(value), 2) AS total, COUNT(*) AS n_rows
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
    """,
    gate=False,  # rollup-maintenance family; hist/topk rollups carry the gate
)
def agg_rollup_regrain(spark, sf_dir):
    """Additive-rollup REGRAIN end-to-end (``IncrementalAggSync
    .regrain``): a (day, user) sum rollup built from two disjoint
    half-batches is re-aggregated to (month, user) purely from its
    STORED groups — no fact rescan — and must hash-match the direct
    month-grain recompute.  This is how the pipeline serves the
    reference's weekly/monthly steps cadences from one maintained
    daily rollup (HealthPipeline.weekly/monthly_steps_rollup)."""
    from ..fs import scratch_dir
    from .pipeline import IncrementalAggSync

    root = scratch_dir(spark, "regrain_", cleanup_atexit=True)
    roll = IncrementalAggSync(
        spark, root, "agg.du", ("day", "user_id"), ("value",)
    )
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            F.date_format("ts", "yyyyMMdd").alias("day"),
            "user_id",
            "value",
        )
    )
    roll.sync(ev.filter(F.col("event_id") % 2 == 0))
    roll.sync(ev.filter(F.col("event_id") % 2 == 1))
    out = roll.regrain(
        {"month": F.substring("day", 1, 6), "user_id": F.col("user_id")}
    )
    return out.select(
        "month",
        "user_id",
        F.round(F.col("sum_value"), 2).alias("total"),
        "n_rows",
    )


@query(
    "sql_dml_roundtrip",
    oracle="""
    WITH mx AS (SELECT MAX(c_custkey) AS m FROM customer),
    base AS (
        SELECT c_custkey AS k, c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS balance, mx.m
        FROM customer, mx
    ),
    upd AS (  -- UPDATE +50 on [m//10, m//5]
        SELECT k, seg,
               CASE WHEN k BETWEEN m // 10 AND m // 5
                    THEN ROUND(balance + 50.0, 2) ELSE balance END
                   AS balance, m
        FROM base
    ),
    del AS (  -- DELETE (m//2, m//2 + m//20]
        SELECT * FROM upd
        WHERE NOT (k > m // 2 AND k <= m // 2 + m // 20)
    ),
    merged AS (  -- MERGE: double balances for k <= m//20, insert ghosts
        SELECT k, seg,
               CASE WHEN k <= m // 20
                    THEN ROUND(ROUND(c2.c_acctbal, 2) * 2, 2)
                    ELSE balance END AS balance
        FROM del LEFT JOIN customer c2 ON del.k = c2.c_custkey
        UNION ALL
        SELECT c_custkey + 2 * m AS k, c_mktsegment AS seg,
               ROUND(c_acctbal, 2) AS balance
        FROM customer, mx WHERE c_custkey <= m // 50
    )
    SELECT seg, COUNT(*) AS n, ROUND(SUM(balance), 2) AS bal_sum
    FROM merged GROUP BY seg
    """,
    # r14 rotation (VERDICT r13 task 6): the SQL DML/DDL front-end
    # drives a gate row — INSERT / UPDATE / DELETE / MERGE / ALTER
    # TABLE RENAME COLUMN as SQL text dispatching to the warehouse
    # verbs, final SELECT through the passthrough.  Replaces
    # sql_interface_revenue (pure SELECT passthrough, a strict subset
    # of this row's read path).
)
def sql_dml_roundtrip(spark, sf_dir):
    """The SQL front-end end-to-end (``plans/sql_frontend.py``): a
    warehouse table is seeded, appended (INSERT), range-updated
    (UPDATE), range-deleted (DELETE), upserted (MERGE with a temp-view
    source), and column-renamed (ALTER TABLE) — all as SQL text — and
    the final grouped aggregate is read back through the SELECT
    passthrough under the renamed column.  Every statement dispatches
    to the same verbs the Python API exposes, so this row gates the
    parser AND the verbs."""
    from ..fs import scratch_dir
    from ..session import register_views
    from .materialize import Warehouse
    from .sql_frontend import SqlFrontend
    from .table_format import ManifestFormat

    register_views(spark, sf_dir)
    root = scratch_dir(spark, "sqldml_", cleanup_atexit=True)
    wh = Warehouse(
        spark,
        root,
        table_format=ManifestFormat(
            spark, root, auto_compact_dirs=None, stats_cols=("k",)
        ),
    )
    sq = SqlFrontend(wh)
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    m = int(c.agg(F.max("c_custkey")).first()[0])

    seed = spark.sql(
        "SELECT c_custkey AS k, c_mktsegment AS seg, "
        "ROUND(c_acctbal, 2) AS bal FROM customer "
        f"WHERE c_custkey <= {m // 2}"
    )
    wh.fmt.write("ex.cust", seed, "overwrite")
    sq.sql(
        "INSERT INTO ex.cust SELECT c_custkey, c_mktsegment, "
        f"ROUND(c_acctbal, 2) FROM customer WHERE c_custkey > {m // 2}"
    )
    sq.sql(
        "UPDATE ex.cust SET bal = round(bal + 50.0, 2) "
        f"WHERE k BETWEEN {m // 10} AND {m // 5}"
    )
    sq.sql(
        f"DELETE FROM ex.cust WHERE k >= {m // 2 + 1} "
        f"AND k <= {m // 2 + m // 20}"
    )
    spark.sql(
        "SELECT c_custkey AS k, c_mktsegment AS seg, "
        "ROUND(ROUND(c_acctbal, 2) * 2, 2) AS bal "
        f"FROM customer WHERE c_custkey <= {m // 20} "
        "UNION ALL "
        f"SELECT c_custkey + {2 * m} AS k, c_mktsegment AS seg, "
        "ROUND(c_acctbal, 2) AS bal "
        f"FROM customer WHERE c_custkey <= {m // 50}"
    ).createOrReplaceTempView("mergesrc")
    sq.sql(
        "MERGE INTO ex.cust t USING mergesrc s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    sq.sql("ALTER TABLE ex.cust RENAME COLUMN bal TO balance")
    return sq.sql(
        "SELECT seg, COUNT(*) AS n, ROUND(SUM(balance), 2) AS bal_sum "
        "FROM ex.cust GROUP BY seg"
    )


@query(
    "sql_txn_views",
    oracle="""
    SELECT c.c_mktsegment AS seg,
           COUNT(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS price_sum
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY 1
    """,
    # r15 rotation (VERDICT r14 tasks 2+7+8): SQL multi-statement
    # transactions (BEGIN / INSERT x2 / COMMIT at ONE catalog flip)
    # and catalog-persisted views (CREATE VIEW over a two-table join,
    # re-resolved per statement) take a gate row; set_ops_users
    # demoted — plain Spark-SQL set operations, fully covered by the
    # pytest oracle suite.
)
def sql_txn_views(spark, sf_dir):
    """SQL transactions + persisted views end-to-end (r15): customer
    and orders halves seed two warehouse tables; the second halves
    land inside ONE ``BEGIN``/``COMMIT`` transaction (the reference's
    parent+child atomicity — both tables publish at a single catalog
    flip, so the view below can never see a custkey-skewed join);
    ``CREATE VIEW examples.cust_ord`` stores the two-table join in the
    catalog log (the reference's ``examples`` dbt layer,
    dbt_project.yml:40-42), and the final grouped aggregate reads
    through the view — parser, txn verbs, view persistence, and the
    SELECT passthrough in one oracle-checked pass."""
    from ..fs import scratch_dir
    from ..session import register_views
    from .materialize import Warehouse
    from .registry import table
    from .sql_frontend import SqlFrontend
    from .table_format import CatalogManifestFormat

    register_views(spark, sf_dir)
    root = scratch_dir(spark, "sqltxn_", cleanup_atexit=True)
    fmt = CatalogManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("ck",)
    )
    wh = Warehouse(spark, root, table_format=fmt)
    sq = SqlFrontend(wh)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    m = int(c.agg(F.max("c_custkey")).first()[0])

    wh.fmt.write(
        "ex.cust",
        spark.sql(
            "SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer "
            f"WHERE c_custkey <= {m // 2}"
        ),
        "overwrite",
    )
    wh.fmt.write(
        "ex.ord",
        spark.sql(
            "SELECT o_orderkey AS ok, o_custkey AS ck, "
            "o_orderstatus AS status, o_totalprice AS price FROM orders "
            f"WHERE o_custkey <= {m // 2}"
        ),
        "overwrite",
    )
    sq.sql("BEGIN")
    sq.sql(
        "INSERT INTO ex.cust SELECT c_custkey, c_mktsegment FROM customer "
        f"WHERE c_custkey > {m // 2}"
    )
    sq.sql(
        "INSERT INTO ex.ord SELECT o_orderkey, o_custkey, o_orderstatus, "
        f"o_totalprice FROM orders WHERE o_custkey > {m // 2}"
    )
    sq.sql("COMMIT")
    sq.sql(
        "CREATE OR REPLACE VIEW examples.cust_ord AS "
        "SELECT c.seg AS seg, o.price AS price "
        "FROM ex.cust c JOIN ex.ord o ON o.ck = c.ck "
        "WHERE o.status = 'O'"
    )
    return sq.sql(
        "SELECT seg, COUNT(*) AS n, ROUND(SUM(price), 2) AS price_sum "
        "FROM examples.cust_ord GROUP BY seg"
    )


@query(
    "sql_matview_refresh",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
    final AS (
        SELECT o_orderstatus AS status,
               CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS day,
               o_totalprice AS price
        FROM orders, mx
        WHERE NOT (o_orderkey BETWEEN m // 4 AND m // 3)
    )
    SELECT status, day, ROUND(SUM(price), 2) AS total, COUNT(*) AS n
    FROM final GROUP BY status, day
    """,
    # r15 late rotation: PROMOTED to the gate — materialized views are
    # the reference's core warehouse feature (TimescaleDB continuous
    # aggregates) re-expressed, so the driver should exercise the full
    # CREATE/REFRESH lifecycle; multidim_aggregates demoted in
    # exchange (plain Spark SQL ROLLUP/CUBE, pytest-covered).
)
def sql_matview_refresh(spark, sf_dir):
    """TimescaleDB continuous aggregates as SQL (r15 tail,
    ``plans/matview.py``): a warehouse fact table seeds half of
    ``orders``; ``CREATE MATERIALIZED VIEW`` bootstraps a
    day-bucketed additive rollup (DATE_TRUNC key + SUM/COUNT state,
    ``IncrementalAggSync`` underneath); an INSERT of the second half
    and a range DELETE each land as source commits that ``REFRESH
    MATERIALIZED VIEW`` merges incrementally — the append feed for
    the insert, signed CDF facts for the delete — never a recompute
    from history.  The final read comes through the mv name's derived
    presentation; the oracle recomputes from the parquet."""
    from ..fs import scratch_dir
    from ..session import register_views
    from .materialize import Warehouse
    from .registry import table
    from .sql_frontend import SqlFrontend
    from .table_format import CatalogManifestFormat

    register_views(spark, sf_dir)
    root = scratch_dir(spark, "sqlmv_", cleanup_atexit=True)
    fmt = CatalogManifestFormat(
        spark, root, auto_compact_dirs=None, stats_cols=("ok",), cdf=True
    )
    wh = Warehouse(spark, root, table_format=fmt)
    sq = SqlFrontend(wh)
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    m = int(o.agg(F.max("o_orderkey")).first()[0])

    wh.fmt.write(
        "ex.ord",
        spark.sql(
            "SELECT o_orderkey AS ok, o_orderstatus AS status, "
            "o_totalprice AS price, o_orderdate AS odate FROM orders "
            f"WHERE o_orderkey <= {m // 2}"
        ),
        "overwrite",
    )
    sq.sql(
        "CREATE MATERIALIZED VIEW agg.ord_daily AS "
        "SELECT status, DATE_TRUNC('day', odate) AS day, "
        "SUM(price) AS total, COUNT(*) AS n "
        "FROM ex.ord GROUP BY status, day"
    )
    sq.sql(
        "INSERT INTO ex.ord SELECT o_orderkey, o_orderstatus, "
        f"o_totalprice, o_orderdate FROM orders WHERE o_orderkey > {m // 2}"
    )
    sq.sql("REFRESH MATERIALIZED VIEW agg.ord_daily")
    sq.sql(f"DELETE FROM ex.ord WHERE ok BETWEEN {m // 4} AND {m // 3}")
    sq.sql("REFRESH MATERIALIZED VIEW agg.ord_daily")
    return sq.sql(
        "SELECT status, day, ROUND(total, 2) AS total, n "
        "FROM agg.ord_daily"
    )
