"""Nested-document normalizer — the dlt "normalize" step, Spark-native.

Reference behavior (S10, SURVEY §2.1): dlt turns each nested array in a
document into a child table ``<parent>__<field>`` linked by surrogate
keys ``_dlt_id`` / ``_dlt_parent_id`` with the element position in
``_dlt_list_idx``; array-of-scalar children get a single ``value``
column; nested (non-array) structs flatten into the parent with ``__``
path separators.  Evidence: dags/iot_mongo_extract_to_dwh.py:85-105,
models/sources.yml:10-18, ER diagram iot_dwh_stage_tranform.py:23-38.

Spark realization: one ``posexplode_outer`` per array column — a narrow
map-side transform, no shuffle; surrogate keys are content-derived
(sha2 of primary key / parent key + position) so re-runs are
deterministic and the pk-dedup of the incremental protocol works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_structs(df: DataFrame) -> DataFrame:
    """Flatten non-array struct columns into ``parent__field`` columns
    (recursively), leaving arrays in place for child extraction."""
    while True:
        struct_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in struct_cols:
                inner = f.dataType
                cols.extend(
                    F.col(f"{f.name}.{sub.name}").alias(f"{f.name}__{sub.name}")
                    for sub in inner.fields
                )
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)


def flatten_document_table(
    df: DataFrame,
    table_name: str,
    primary_key: str | None = "_id",
) -> dict[str, DataFrame]:
    """Normalize one document table into ``{name: DataFrame}`` —
    the parent plus one ``<table>__<field>`` child per array column.

    The parent ``_dlt_id`` is sha2(primary key) when a pk exists
    (deterministic, supports upsert/dedup), else sha2 of the whole row's
    JSON.  Child ``_dlt_id`` chains the parent id with the field name
    and list index.  Children holding arrays themselves recurse.
    """
    df = _flatten_structs(df)
    array_fields = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    if "_dlt_id" in df.columns:  # recursing into a child: id already chained
        parent = df
    else:
        if primary_key and primary_key in df.columns:
            dlt_id = F.sha2(F.col(primary_key).cast("string"), 256).substr(1, 32)
        else:
            dlt_id = F.sha2(F.to_json(F.struct(*df.columns)), 256).substr(1, 32)
        parent = df.withColumn("_dlt_id", dlt_id)

    out: dict[str, DataFrame] = {}
    scalar_cols = [c for c in parent.columns if c not in array_fields]
    out[table_name] = parent.select(*scalar_cols)

    for field in array_fields:
        elem = parent.schema[field].dataType.elementType
        exploded = parent.select(
            F.col("_dlt_id").alias("_dlt_parent_id"),
            F.posexplode_outer(F.col(field)).alias("_dlt_list_idx", "__elem"),
        ).filter(F.col("_dlt_list_idx").isNotNull())
        child_id = F.sha2(
            F.concat_ws(
                "/", F.col("_dlt_parent_id"), F.lit(field), F.col("_dlt_list_idx")
            ),
            256,
        ).substr(1, 32)
        if isinstance(elem, T.StructType):
            child = exploded.select(
                *[
                    F.col(f"__elem.{sub.name}").alias(sub.name)
                    for sub in elem.fields
                ],
                "_dlt_parent_id",
                "_dlt_list_idx",
            )
        else:
            child = exploded.select(
                F.col("__elem").alias("value"), "_dlt_parent_id", "_dlt_list_idx"
            )
        child = child.withColumn("_dlt_id", child_id)
        child_name = f"{table_name}__{field}"
        # nested arrays inside children recurse (rare; dlt supports it)
        nested = flatten_document_table(
            child, child_name, primary_key="_dlt_id"
        )
        out.update(nested)
    return out
