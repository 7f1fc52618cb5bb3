"""Data-quality checks — the dbt-test surface the reference left empty.

The reference's dbt project has a tests/ directory with only .gitkeep
(SURVEY §5): the standard dbt checks (not_null, unique, accepted_values,
relationships) were never written.  A production deployment needs them,
so the engine ships them as DataFrame operators: each check returns a
DataFrame of VIOLATIONS (empty = pass), so checks compose into the
pipeline as cheap aggregates and scale like any other plan — no
driver-side row iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows where any of ``cols`` is NULL.  An empty column list (a
    table with no not_null tests in a config-driven suite) has no
    possible violations — empty result, not a filter(None) TypeError."""
    if not cols:
        return df.limit(0)
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups appearing more than once: (key cols..., n_rows)."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def check_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    """Distinct out-of-domain values with occurrence counts."""
    return (
        df.filter(~F.col(col).isin(values) | F.col(col).isNull())
        .groupBy(col)
        .agg(F.count("*").alias("n_rows"))
    )


def check_relationship(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential integrity: child keys with no parent (anti join)."""
    return (
        child.select(F.col(child_key))
        .distinct()
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )


def run_checks(checks: dict[str, DataFrame]) -> dict[str, int]:
    """Evaluate named checks; returns violation counts (all 0 = pass).

    Counts, not collects — at 100 TB a failing check reports its size
    without pulling rows to the driver.
    """
    return {name: df.count() for name, df in checks.items()}


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass table profile: per column, null count, distinct count,
    and min/max (as strings, for a uniform row shape) — the ANALYZE /
    data-profiling step a warehouse runs after each load to drive
    monitoring and join planning.

    All metrics for every column ride ONE aggregate node (Spark plans
    the multi-column COUNT DISTINCT as a single expand + hash-agg pass
    — one scan regardless of column count), then a ``stack`` unpivots
    the 1-row result into (column, metric...) rows driver-side-free.
    Distinct counts are exact to stay oracle-comparable; at 100 TB
    swap ``countDistinct`` for ``approx_count_distinct`` (HLL, one
    pass, no expand) — the shape is otherwise identical.
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    # internal aliases are INDEX-based and column names enter the stack
    # expression only as escaped string literals — a name with spaces,
    # dashes, quotes, or keyword spelling must not corrupt the
    # generated SQL (this is a generic post-load profiler)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{i}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{i}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{i}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __nulls_{i}, __nd_{i}, __min_{i}, __max_{i}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def tag_violations(df: DataFrame, rules: dict) -> DataFrame:
    """Row-level contract evaluation: ``rules`` maps a reason name to a
    boolean Column a row must satisfy; the returned frame carries a
    ``__violations`` array of every rule the row FAILS (empty = clean).
    A rule evaluating to NULL counts as a violation — a contract must
    affirmatively hold, so un-evaluatable (malformed payload) rows
    quarantine rather than slide through.  Pure codegen expressions:
    zero shuffles, evaluated inline with whatever scan feeds it."""
    tags = [
        F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
        for name, rule in rules.items()
    ]
    return df.withColumn("__violations", F.array_compact(F.array(*tags)))


def quarantine_split(df: DataFrame, rules: dict) -> tuple[DataFrame, DataFrame]:
    """Dead-letter routing: returns ``(good, bad)`` — clean rows with
    the marker column dropped, and quarantined rows carrying their
    ``__violations`` reasons for the dead-letter table.  The two frames
    partition the input exactly (pinned in tests); land ``bad`` with
    ``Warehouse.materialize_incremental`` to get the quarantine table
    every ELT deployment needs when a contract breaks at 3am."""
    tagged = tag_violations(df, rules)
    good = tagged.filter(F.size("__violations") == 0).drop("__violations")
    bad = tagged.filter(F.size("__violations") > 0)
    return good, bad
