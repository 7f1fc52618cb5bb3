"""As-of (time-series) join — a custom operator the reference lacks.

The reference's warehouse is TimescaleDB, whose users routinely write
LATERAL "latest reading before t" lookups; Spark has no built-in as-of
join, so this implements it as a *composition of built-in operators*
(SURVEY's custom-operator rule (a)): tag both sides, union, and take a
running ``last(value, ignorenulls=True)`` over a per-key window ordered
by (ts, side).

Scale notes: this is ONE shuffle on the join keys + a per-partition sort
— no range-explosion, no broadcast requirement, no skew beyond the key
distribution itself.  The naive alternative (non-equi theta join then
argmax) is O(n·m) per key and collapses at 100 TB; the union trick stays
O((n+m) log(n+m)) per key and AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row's value columns
    with ``right_ts <= left_ts`` (inclusive, matching DuckDB ASOF JOIN's
    ``ON l.ts >= r.ts``).  Left rows with no prior right row keep NULLs
    (ASOF LEFT JOIN semantics).
    """
    right_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    left_cols = left.columns
    left_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    # align: right side carries NULL for left payload columns
    for c in left_cols:
        if c not in on:
            right_tagged = right_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = right_tagged.select(left_tagged.columns).unionByName(left_tagged)

    # side 0 (right) sorts before side 1 (left) at equal ts → inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
