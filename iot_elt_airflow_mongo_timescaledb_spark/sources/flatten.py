"""Nested-document normalizer — the dlt "normalize" step, Spark-native.

Reference behavior (S10, SURVEY §2.1): dlt turns each nested array in a
document into a child table ``<parent>__<field>`` linked by surrogate
keys ``_dlt_id`` / ``_dlt_parent_id`` with the element position in
``_dlt_list_idx``; array-of-scalar children get a single ``value``
column; nested (non-array) structs flatten into the parent with ``__``
path separators.  Evidence: dags/iot_mongo_extract_to_dwh.py:85-105,
models/sources.yml:10-18, ER diagram iot_dwh_stage_tranform.py:23-38.

Child tables additionally carry ``_dlt_root_id`` — the ROOT document's
surrogate id — mirroring dlt's root-key propagation for merge loads:
re-extracting a document must replace ALL of its child rows (an array
that shrank from 3 to 2 elements would otherwise leave the stale third
row behind forever, since its own ``_dlt_id`` never reappears in a
batch).  ``HealthPipeline.sync`` upserts child tables on
``_dlt_root_id`` for exactly this delete-insert semantics.

Spark realization: one ``posexplode`` per array column — a narrow
map-side transform, no shuffle; surrogate keys are content-derived
(sha2 of primary key / parent key + position) so re-runs are
deterministic and the pk-dedup of the incremental protocol works.
Documents with a NULL primary key fall back to the whole-row hash
(a NULL pk would make the surrogate id NULL, break the upsert's
anti-join, and collide every such document's children).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_structs(df: DataFrame) -> DataFrame:
    """Flatten non-array struct columns into ``parent__field`` columns
    (recursively), leaving arrays in place for child extraction.

    Columns are addressed with ``df[name]`` / ``getField`` — a bare
    ``F.col("a.b")`` would parse a dotted COLUMN NAME (legal in JSON and
    Mongo 5+) as struct-field access and crash the sync."""
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
                    df[f.name].getField(sub.name).alias(f"{f.name}__{sub.name}")
                    for sub in inner.fields
                )
            else:
                cols.append(df[f.name])
        df = df.select(*cols)


def flatten_document_table(
    df: DataFrame,
    table_name: str,
    primary_key: str | None = "_id",
) -> dict[str, DataFrame]:
    """Normalize one document table into ``{name: DataFrame}`` —
    the parent plus one ``<table>__<field>`` child per array column.

    The parent ``_dlt_id`` is sha2(primary key) when a pk exists and is
    non-null (deterministic, supports upsert/dedup), else sha2 of the
    whole row's JSON.  Child ``_dlt_id`` chains the parent id with the
    field name and list index; every child row also carries the root
    document's id in ``_dlt_root_id`` (see module docstring).
    """
    df = _flatten_structs(df)
    array_fields = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    if "_dlt_id" in df.columns:  # recursing into a child: id already chained
        parent = df
    else:
        row_hash = F.sha2(F.to_json(F.struct(*df.columns)), 256)
        if primary_key and primary_key in df.columns:
            pk = df[primary_key].cast("string")
            dlt_id = F.when(
                pk.isNotNull(), F.sha2(pk, 256)
            ).otherwise(row_hash).substr(1, 32)
        else:
            dlt_id = row_hash.substr(1, 32)
        parent = df.withColumn("_dlt_id", dlt_id)

    out: dict[str, DataFrame] = {}
    scalar_cols = [c for c in parent.columns if c not in array_fields]
    out[table_name] = parent.select(*[parent[c] for c in scalar_cols])

    # the root document's id: at the top level that is this parent's own
    # _dlt_id; during recursion the child frame already carries the
    # propagated _dlt_root_id column
    root_col = (
        parent["_dlt_root_id"]
        if "_dlt_root_id" in parent.columns
        else parent["_dlt_id"]
    )
    for field in array_fields:
        elem = parent.schema[field].dataType.elementType
        exploded = parent.select(
            parent["_dlt_id"].alias("_dlt_parent_id"),
            root_col.alias("_dlt_root_id"),
            F.posexplode(parent[field]).alias("_dlt_list_idx", "__elem"),
        )
        child_id = F.sha2(
            F.concat_ws(
                "/", F.col("_dlt_parent_id"), F.lit(field), F.col("_dlt_list_idx")
            ),
            256,
        ).substr(1, 32)
        if isinstance(elem, T.StructType):
            child = exploded.select(
                *[
                    F.col("__elem").getField(sub.name).alias(sub.name)
                    for sub in elem.fields
                ],
                "_dlt_parent_id",
                "_dlt_root_id",
                "_dlt_list_idx",
            )
        else:
            child = exploded.select(
                F.col("__elem").alias("value"),
                "_dlt_parent_id",
                "_dlt_root_id",
                "_dlt_list_idx",
            )
        child = child.withColumn("_dlt_id", child_id)
        child_name = f"{table_name}__{field}"
        # nested arrays inside children recurse (rare; dlt supports it)
        nested = flatten_document_table(
            child, child_name, primary_key="_dlt_id"
        )
        out.update(nested)
    return out
