"""Scalar expression helpers — reference operators P1-P8 (SURVEY §2.2).

All built-in ``pyspark.sql.functions`` compositions: JVM-side, codegen'd,
no Python in the hot path.  Each helper cites the reference construct it
reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# TimescaleDB's time_bucket('1 week', ts) origin is 2000-01-03, a Monday
# (reference models/agg/weekly_steps.sql:9).  Spark's date_trunc('week')
# is ISO Monday-aligned, so the two coincide for every post-1970 ts.
WEEK_ORIGIN = "2000-01-03"

# Watermark defaults when the incremental target is empty (reference
# macros/get_max_insert_timestamp.sql:10 / get_max_insert_date_string.sql:10).
DEFAULT_EPOCH_WATERMARK = 1522434600  # 2018-03-30
DEFAULT_DATESTRING_WATERMARK = "1970-01-01"


def epoch_to_ts(col: Column | str) -> Column:
    """P2 — ``TO_TIMESTAMP(epoch_int)`` (models/stage/users.sql:10)."""
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def day_key(ts: Column | str) -> Column:
    """P3 — ``TO_CHAR(ts, 'YYYYMMDD')`` (models/stage/heart_rates.sql:12)."""
    return F.date_format(ts, "yyyyMMdd")


def month_key(ts: Column | str) -> Column:
    """P3 — ``TO_CHAR(ts, 'YYYYMM')`` (models/stage/heart_rates.sql:11)."""
    return F.date_format(ts, "yyyyMM")


def week_bucket(ts: Column | str) -> Column:
    """A6 — ``time_bucket('1 week', ts)`` (models/agg/weekly_steps.sql:9).

    Monday-aligned tumbling week; see WEEK_ORIGIN note.
    """
    return F.date_trunc("week", ts)


def ts_to_epoch(ts: Column | str) -> Column:
    """P7 — ``EXTRACT(EPOCH FROM ts)::integer``
    (macros/get_max_insert_timestamp.sql:8)."""
    return F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)


def age_group(age: Column | str) -> Column:
    """P6 — the 7-bucket CASE WHEN age classifier
    (examples/daily_health_metrics_per_age_grp.sql:5-13).

    No ``otherwise`` branch: ages outside every bucket yield NULL,
    exactly like the reference SQL.
    """
    a = F.col(age) if isinstance(age, str) else age
    return (
        F.when(a < 18, "<18")
        .when((a >= 18) & (a <= 24), "18-24")
        .when((a >= 25) & (a <= 34), "25-34")
        .when((a >= 35) & (a <= 44), "35-44")
        .when((a >= 45) & (a <= 54), "45-54")
        .when((a >= 55) & (a <= 64), "55-64")
        .when(a > 64, ">64")
    )


def coalesce_watermark(col: Column, default) -> Column:
    """P8 — ``COALESCE(max_lookup, default)``
    (macros/get_max_insert_timestamp.sql:6-11)."""
    return F.coalesce(col, F.lit(default))
