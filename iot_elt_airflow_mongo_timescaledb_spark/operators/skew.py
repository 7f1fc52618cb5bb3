"""Skew-mitigation operators — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- **Low-cardinality aggregation**: ``GROUP BY event_type`` with 5
  distinct values uses 5 reducers no matter how many executors exist.
  ``salted_aggregate`` fans each key across N sub-keys (two-phase:
  partial agg on (key, salt), merge on key), restoring parallelism.
- **Hot-key join**: one key holding 10% of the fact table overwhelms a
  single reducer.  ``salted_join`` salts the fact side deterministically
  and replicates the dimension side across all salts, so the hot key
  spreads over N reducers.  The join result is identical — salt never
  changes matches, only placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``from_cols``
    (deterministic → retries/speculative tasks stay consistent; a random
    salt would also be correct but unreproducible)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*from_cols), F.lit(n_salts)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_from: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation over skewed/low-cardinality keys.

    ``aggs`` maps output name -> (merge_fn_name, partial_agg_column):
    the partial column is aggregated per (keys, salt), then merged per
    keys with the named function ('sum'|'min'|'max').  AVG callers
    decompose into sum+count and divide after the merge (the classic
    algebraic-aggregate split).
    """
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*keys, "__salt")
        .agg(*[col.alias(name) for name, (_, col) in aggs.items()])
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*keys).agg(
        *[merge[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi join: salt the fact side, replicate the dim side
    across every salt value, join on (key, salt).

    Dim-side blowup is n_salts× — use only when the dim side is small
    relative to the hot key's row count (else prefer AQE skew-join or a
    broadcast).

    Only fact-preserving ``how`` values are accepted: with the dim side
    replicated, a right/full join would emit one spurious NULL-extended
    row per UNMATCHED (dim, salt) replica — up to n_salts phantom rows
    per dim key that the unsalted join does not contain.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"how={how!r}: the replicated dim side makes right/full "
            "joins emit phantom NULL-extended rows per unmatched salt "
            "replica — salt the other side or use AQE skew-join instead"
        )
    salted_facts = with_salt(facts, salt_from, n_salts)
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(replicated, [key, "__salt"], how).drop("__salt")
