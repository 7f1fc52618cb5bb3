"""Join idioms from the reference — J1-J6 (SURVEY §2.3).

Scale notes (100 TB target):
- Parent/child reassembly (J1) shuffles on the surrogate key unless the
  child was *derived* from the parent in the same job — then Catalyst
  keeps it colocated.  For stored layers, bucket both sides on the key.
- The array-membership join (J5) is a nested-loop in its literal form;
  ``array_membership_join`` rewrites it to explode+equi-join, which
  shuffles instead of broadcasting N×M — the only form that survives a
  large build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parent_child_join(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str = "_dlt_id",
    child_key: str = "_dlt_parent_id",
    how: str = "inner",
) -> DataFrame:
    """J1 — reassemble flattened documents.

    Reference: ``FROM raw.heart_rates r JOIN raw.heart_rates__metrics rm
    ON 1=1 AND r._dlt_id = rm._dlt_parent_id``
    (models/stage/heart_rates.sql:15-22).  The ``ON 1=1 AND`` idiom is a
    plain equi join; Catalyst plans broadcast-hash or sort-merge by size.
    """
    return parent.join(child, parent[parent_key] == child[child_key], how)


def left_collect_join(
    left: DataFrame,
    right: DataFrame,
    on,
    collect_col: str,
    alias: str,
    group_cols: list[str],
) -> DataFrame:
    """J2+A3 — LEFT JOIN then ARRAY_AGG per group
    (models/stage/users.sql:17-27).

    Postgres ARRAY_AGG keeps NULL elements (a device-less user gets
    ``[NULL]``); Spark ``collect_list`` drops them (→ ``[]``).  We keep
    the Spark semantics (empty array) and sort for determinism — the
    reference's array order is nondeterministic anyway.
    """
    joined = left.join(right, on, "left")
    aggs = [F.sort_array(F.collect_list(collect_col)).alias(alias)]
    return joined.groupBy(*group_cols).agg(*aggs)


def existence_filter_join(facts: DataFrame, filter_side: DataFrame, keys: list[str]) -> DataFrame:
    """J3 — the daily/monthly_sleeps idiom: join used purely as an
    existence filter before an AVG (models/agg/daily_sleeps.sql:11-20).

    The literal reference form is an inner join (row multiplication is
    invisible to AVG); the scalable form is a left-semi join — no
    multiplication, no wide shuffle of the filter side's payload.
    """
    return facts.join(filter_side.select(*keys).distinct(), keys, "left_semi")


def array_membership_join(
    facts: DataFrame,
    dims: DataFrame,
    array_col: str,
    member_col: str,
    how: str = "inner",
) -> DataFrame:
    """J5 — ``JOIN users u ON ds.device_id = ANY(u.devices)``
    (examples/daily_health_metrics_per_age_grp.sql:24-25).

    Literal Spark translation is ``F.array_contains`` →
    BroadcastNestedLoopJoin, which dies when neither side broadcasts.
    This rewrite explodes the array into (member, rest-of-dim) rows and
    equi-joins — a plain shuffled hash join that scales linearly.
    A user with N devices matches N fact streams (same multi-device
    double-count semantics as the reference, SURVEY §2.9.6).

    ``array_distinct`` first: ``= ANY(arr)`` matches a fact ONCE however
    many times the member repeats in the array, so a dirty duplicated
    entry (routine in ELT-flattened data) must not double-count facts.
    Only inner/left(_outer/semi/anti) rewrites are sound — a right/full
    explode drops empty-array dims instead of NULL-extending them — so
    other ``how`` values are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"how={how!r}: explode+equi rewrite cannot preserve "
            "right/full semantics (empty-array dims would vanish instead "
            "of NULL-extending) — use array_contains for those"
        )
    exploded = dims.withColumn(
        "__member", F.explode(F.array_distinct(F.col(array_col)))
    )
    return facts.join(exploded, facts[member_col] == exploded["__member"], how).drop("__member")


def table_diff(
    a: DataFrame, b: DataFrame, key_col: str
) -> DataFrame:
    """Keyed diff of two same-schema tables — the migration-validation
    tool: each key classifies as ``added`` (only in ``b``), ``removed``
    (only in ``a``), ``changed`` (both, any non-key column differs —
    NULL-safe fingerprint), or ``unchanged``.  One full-outer equi-join
    on the key with both sides pre-hashed to a single fingerprint
    column, so the shuffle carries (key, fp), not the payload — at
    100 TB this is the difference between diffing and re-reading both
    tables twice."""
    from pyspark.sql import functions as F

    from ..plans.materialize import row_fingerprint

    data_cols = sorted(c for c in a.columns if c != key_col)
    if data_cols != sorted(c for c in b.columns if c != key_col):
        raise ValueError(
            f"table_diff needs matching schemas; got {sorted(a.columns)} "
            f"vs {sorted(b.columns)}"
        )
    fa = a.select(
        F.col(key_col), row_fingerprint(data_cols).alias("__fp_a")
    )
    fb = b.select(
        F.col(key_col), row_fingerprint(data_cols).alias("__fp_b")
    )
    j = fa.join(fb, key_col, "full_outer")
    status = (
        F.when(F.col("__fp_a").isNull(), F.lit("added"))
        .when(F.col("__fp_b").isNull(), F.lit("removed"))
        .when(F.col("__fp_a") == F.col("__fp_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(key_col), status.alias("status"))
