"""The reference's 13 dbt models + 3 example views as DataFrame builders.

Each builder is a pure function ``f(tables: dict[str, DataFrame]) ->
DataFrame`` over the raw/stage/agg namespaces, reproducing the cited
reference SQL's semantics — including its quirks where SURVEY §2.9
decided to keep them (weekly_sleeps averaging all readings, inner-join
summaries dropping one-sided days, unweighted avg-of-avg in the
examples) and fixing the ones it decided were bugs (day/month derived
from the event timestamp for steps, §2.9.1; week-bucket watermarks for
the weekly models, §2.9.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import age_group, day_key, epoch_to_ts, month_key, week_bucket
from ..operators.joins import parent_child_join

# ---------------------------------------------------------------------------
# stage layer (reference models/stage/*.sql)
# ---------------------------------------------------------------------------


def stage_users(t: dict[str, DataFrame]) -> DataFrame:
    """models/stage/users.sql:8-27 — reassemble users + devices array.

    LEFT JOIN keeps device-less users; ARRAY_AGG ≈ sorted collect_list
    (reference order is nondeterministic; empty array instead of [NULL],
    J2 caveat in SURVEY §2.3).
    """
    users = t["users"]
    devices = t["users__devices"]
    joined = users.join(
        devices.select("value", "_dlt_parent_id"),
        users["_dlt_id"] == devices["_dlt_parent_id"],
        "left",
    )
    return (
        joined.groupBy(
            "user_id", "created_at", "age", "height", "gender", "email", "dob"
        )
        .agg(F.sort_array(F.collect_list("value")).alias("devices"))
        .select(
            "user_id",
            epoch_to_ts("created_at").alias("created_at"),
            "age",
            "height",
            "gender",
            "email",
            "dob",
            "devices",
        )
    )


def _stage_metrics(
    t: dict[str, DataFrame], name: str, metric_cols: list, ts_col: str
) -> DataFrame:
    parent = t[name]
    child = t[f"{name}__metrics"]
    joined = parent_child_join(parent, child)
    ts = epoch_to_ts(ts_col)
    return joined.select(
        F.col("device_id"),
        ts.alias("created_at"),
        month_key(ts).alias("month"),
        day_key(ts).alias("day"),
        *metric_cols,
    )


def stage_heart_rates(t: dict[str, DataFrame]) -> DataFrame:
    """models/stage/heart_rates.sql:8-22 — metrics join + event-ts keys."""
    return _stage_metrics(
        t, "heart_rates", [F.col("bpm"), F.col("confidence")], "ts"
    )


def stage_steps(t: dict[str, DataFrame]) -> DataFrame:
    """models/stage/steps.sql:8-21.  Quirk §2.9.1 resolved to intended
    semantics: day/month from the event ``ts``, not the 4h-bucket start
    (the reference accidentally uses the parent's created_at)."""
    return _stage_metrics(t, "steps", [F.col("steps").alias("step_count")], "ts")


def stage_sleeps(t: dict[str, DataFrame]) -> DataFrame:
    """models/stage/sleeps.sql:8-22 — keys from sleep start_ts."""
    parent = t["sleeps"]
    child = t["sleeps__metrics"]
    joined = parent_child_join(parent, child)
    start = epoch_to_ts("start_ts")
    end = epoch_to_ts("end_ts")
    return joined.select(
        F.col("device_id"),
        start.alias("created_at"),
        end.alias("ended_at"),
        month_key(start).alias("month"),
        day_key(start).alias("day"),
        F.col("duration"),
    )


# ---------------------------------------------------------------------------
# agg layer (reference models/agg/*.sql)
# ---------------------------------------------------------------------------


def _steps_rollup(t: dict[str, DataFrame], bucket_col, bucket_name: str) -> DataFrame:
    s = t["stage.steps"]
    return (
        s.groupBy(bucket_col.alias(bucket_name), "device_id")
        .agg(F.sum("step_count").alias("step_count"))
        .orderBy(F.col(bucket_name).desc(), F.col("device_id").desc())
    )


def agg_daily_steps(t):
    """models/agg/daily_steps.sql:7-18."""
    return _steps_rollup(t, F.col("day"), "day")


def agg_weekly_steps(t):
    """models/agg/weekly_steps.sql:7-17 (time_bucket('1 week'))."""
    return _steps_rollup(t, week_bucket("created_at"), "week")


def agg_monthly_steps(t):
    """models/agg/monthly_steps.sql:7-17."""
    return _steps_rollup(t, F.col("month"), "month")


def _sleeps_rollup(t, bucket_col, bucket_name: str, existence_join: bool) -> DataFrame:
    hr = t["stage.heart_rates"]
    cols = [bucket_col.alias(bucket_name), "device_id", "bpm"]
    if bucket_name != "day":
        cols.insert(2, F.col("day"))
    out = hr.select(*cols)
    if existence_join:
        sl = t["stage.sleeps"].select("device_id", "day")
        out = out.join(sl, ["device_id", "day"], "inner")
    return (
        out.groupBy(bucket_name, "device_id")
        .agg(F.avg("bpm").alias("avg_sleep_bpm"))
        .orderBy(F.col(bucket_name).desc(), F.col("device_id").desc())
    )


def agg_daily_sleeps(t):
    """models/agg/daily_sleeps.sql:7-21 — sleeps join as existence filter
    (J3); inner-join row multiplication is invisible to AVG."""
    return _sleeps_rollup(t, F.col("day"), "day", existence_join=True)


def agg_weekly_sleeps(t):
    """models/agg/weekly_sleeps.sql:7-17 — quirk §2.9.3 preserved: NO
    sleeps join; 'avg_sleep_bpm' is really avg-all-bpm weekly."""
    return _sleeps_rollup(t, week_bucket("created_at"), "week", existence_join=False)


def agg_monthly_sleeps(t):
    """models/agg/monthly_sleeps.sql:7-21 — same shape as daily."""
    return _sleeps_rollup(t, F.col("month"), "month", existence_join=True)


def _summary(t, freq: str, bucket_name: str) -> DataFrame:
    sleeps = t[f"agg.{freq}_sleeps"]
    steps = t[f"agg.{freq}_steps"]
    return (
        sleeps.join(steps, [bucket_name, "device_id"], "inner")
        .select(bucket_name, "device_id", "avg_sleep_bpm", "step_count")
        .orderBy(F.col(bucket_name).desc(), F.col("device_id").desc())
    )


def agg_daily_summary(t):
    """models/agg/daily_summary.sql:7-21 — inner join drops one-sided
    (device, day) rows (quirk §2.9.5, preserved)."""
    return _summary(t, "daily", "day")


def agg_weekly_summary(t):
    return _summary(t, "weekly", "week")


def agg_monthly_summary(t):
    return _summary(t, "monthly", "month")


# ---------------------------------------------------------------------------
# examples layer (views; reference models/examples/*.sql)
# ---------------------------------------------------------------------------


def _health_metrics_per_age_grp(t, bucket_name: str) -> DataFrame:
    """examples/{daily,monthly}_health_metrics_per_age_grp.sql:1-27 —
    CASE age buckets (P6), BETWEEN filter (P5), array-membership join
    (J5), unweighted avg-of-avg (quirk §2.9.4 preserved)."""
    users = t["stage.users"]
    summary = t[f"agg.{ 'daily' if bucket_name == 'day' else 'monthly' }_summary"]
    age_grps = users.filter(F.col("age").between(5, 130)).select(
        age_group("age").alias("age_group"), F.explode("devices").alias("device_id")
    )
    return (
        summary.join(age_grps, "device_id")
        .groupBy(bucket_name, "age_group")
        .agg(
            F.avg("avg_sleep_bpm").alias("avg_sleep_bpm"),
            F.avg("step_count").alias("avg_step_count"),
        )
        .orderBy(F.col(bucket_name).desc(), F.col("age_group").desc())
    )


def examples_daily_health_metrics_per_age_grp(t):
    return _health_metrics_per_age_grp(t, "day")


def examples_monthly_health_metrics_per_age_grp(t):
    return _health_metrics_per_age_grp(t, "month")


def examples_daily_user_steps_for_last_month(t):
    """examples/daily_user_steps_for_last_month.sql:1-33 — per-user daily
    steps restricted to the latest month.  Quirk §2.9.2 resolved to the
    intended filter: month key of the day = MAX(month)."""
    users = t["stage.users"]
    steps = t["agg.daily_steps"]
    user_steps = steps.join(
        users.select(
            "user_id", "email", "age", "gender", F.explode("devices").alias("device_id")
        ),
        "device_id",
    )
    max_month = user_steps.agg(
        F.max(F.substring("day", 1, 6)).alias("m")
    ).first()["m"]
    return (
        user_steps.filter(F.substring("day", 1, 6) == F.lit(max_month))
        .groupBy("day", "user_id", "email", "age", "gender")
        .agg(
            F.sort_array(F.collect_list("device_id")).alias("devices"),
            F.sum("step_count").alias("step_count"),
        )
        .orderBy(F.col("day").desc())
    )


STAGE_MODELS = {
    "stage.users": (stage_users, {"mode": "upsert", "unique_key": "user_id"}),
    # day-partitioned (readers partition-prune ≈ hypertable day chunks)
    # + device-sorted within files (the reference's order_by='device_id'
    # physical hint, stage/*.sql:3 — parquet row-group stats make device
    # lookups skip pages)
    "stage.heart_rates": (stage_heart_rates, {"watermark": "created_at", "partition_by": ("day",), "sort_within": "device_id"}),
    "stage.steps": (stage_steps, {"watermark": "created_at", "partition_by": ("day",), "sort_within": "device_id"}),
    "stage.sleeps": (stage_sleeps, {"watermark": "created_at", "partition_by": ("day",), "sort_within": "device_id"}),
}

AGG_MODELS = {
    "daily": {
        "agg.daily_sleeps": (agg_daily_sleeps, {"watermark": "day"}),
        "agg.daily_steps": (agg_daily_steps, {"watermark": "day"}),
        "agg.daily_summary": (agg_daily_summary, {"watermark": "day"}),
    },
    "weekly": {
        "agg.weekly_sleeps": (agg_weekly_sleeps, {"watermark": "week"}),
        "agg.weekly_steps": (agg_weekly_steps, {"watermark": "week"}),
        "agg.weekly_summary": (agg_weekly_summary, {"watermark": "week"}),
    },
    "monthly": {
        "agg.monthly_sleeps": (agg_monthly_sleeps, {"watermark": "month"}),
        "agg.monthly_steps": (agg_monthly_steps, {"watermark": "month"}),
        "agg.monthly_summary": (agg_monthly_summary, {"watermark": "month"}),
    },
}

EXAMPLE_VIEWS = {
    "examples.daily_health_metrics_per_age_grp": examples_daily_health_metrics_per_age_grp,
    "examples.monthly_health_metrics_per_age_grp": examples_monthly_health_metrics_per_age_grp,
    "examples.daily_user_steps_for_last_month": examples_daily_user_steps_for_last_month,
}
