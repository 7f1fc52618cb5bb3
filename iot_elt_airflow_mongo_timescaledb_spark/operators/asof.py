"""As-of (time-series) join — a custom operator the reference lacks.

The reference's warehouse is TimescaleDB, whose users routinely write
LATERAL "latest reading before t" lookups; Spark has no built-in as-of
join, so this implements it as a *composition of built-in operators*
(SURVEY's custom-operator rule (a)): tag both sides, union, and carry
the most recent right ROW forward with a running
``last(struct, ignorenulls=True)`` over a per-key window ordered by
(ts, side, row-tiebreak).

Semantics (matching DuckDB ASOF LEFT JOIN, the oracle):

- the matched right row is the one with the greatest ``right_ts <=
  left_ts`` (inclusive);
- ALL of its value columns are attached as one unit — a genuinely-NULL
  value on the matched row stays NULL (the struct fill never skips back
  to a stale older row, which a per-column ``last(value, ignorenulls)``
  would);
- equal-``right_ts`` ties are broken deterministically toward the
  largest tuple of the ORDERABLE value columns (struct comparison;
  non-orderable columns — maps — are excluded from the struct but
  still attached), with a payload content hash as the final tiebreak —
  so even map-only payloads resolve identically across repartitions;
  engines leave tie order unspecified, so the operator pins it;
- left rows with no prior right row keep NULLs.

Scale notes: this is ONE shuffle on the join keys + a per-partition sort
— no range-explosion, no broadcast requirement, no skew beyond the key
distribution itself.  The naive alternative (non-equi theta join then
argmax) is O(n·m) per key and collapses at 100 TB; the union trick stays
O((n+m) log(n+m)) per key and AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _orderable(dtype: T.DataType) -> bool:
    """Spark ordering support: atomic types yes; arrays/structs iff their
    element/field types are; maps never."""
    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _orderable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_orderable(f.dataType) for f in dtype.fields)
    return True


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
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    right_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__payload"),
    )
    left_cols = left.columns
    left_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    # align: right side carries NULL for left payload columns
    for c in left_cols:
        if c not in on:
            right_tagged = right_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = right_tagged.select(left_tagged.columns).unionByName(left_tagged)

    # side 0 (right) sorts before side 1 (left) at equal ts → inclusive
    # match; among equal-ts right rows a struct of the ORDERABLE value
    # columns is the deterministic tiebreak (last == greatest tuple).
    # Maps are not orderable in Spark, so they ride along in the payload
    # but stay out of the struct ordering; a content hash of the WHOLE
    # payload (xxhash64 over its canonical JSON — to_json handles maps)
    # closes the residual ties: payloads identical on every orderable
    # column, and the no-orderable-columns-at-all case, both resolve by
    # payload content instead of partition-order luck, so the result is
    # identical across repartitions.  The left rows' NULL payload
    # hashes sort first, so they never outrank a right row.
    orderable = [c for c in value_cols if _orderable(right.schema[c].dataType)]
    order_cols = [F.col("__ts").asc(), F.col("__side").asc()]
    if orderable:
        order_cols.append(
            F.struct(*[F.col("__payload")[c] for c in orderable]).asc_nulls_first()
        )
    order_cols.append(
        F.xxhash64(F.to_json(F.col("__payload"))).asc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__side",
        F.last("__payload", ignorenulls=True).over(w).alias("__matched"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__matched.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
