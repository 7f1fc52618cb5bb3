"""Property pins for schema-in-the-log merge + enforcement (hypothesis).

The enforcement path decides, from manifest metadata alone, whether an
append may land — a wrong "yes" silently coerces stored values at read
time (int file ∪ string file reads as string), a wrong "no" blocks a
legal additive evolution.  Pinned:

1. REFUSAL EXACTNESS — `_enforce_append_schema` raises iff some column
   name shared by the stored schema and the incoming frame carries a
   different type; additive and narrowing appends always pass, and the
   returned merged schema is exactly (stored fields, then new fields).
2. MERGE LAWS — `_merge_schema_json` is idempotent, head-biased
   (head's fields keep their slots and order), total on None, and its
   field-name set is the union.

Both run against the real methods with stub frames (only ``.schema``
is touched), so hundreds of examples run without Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)

TYPES = ["long", "double", "string", "boolean", "date"]

field = st.tuples(
    st.sampled_from(list("abcdefgh")), st.sampled_from(TYPES)
)
schema_fields = st.lists(
    field, min_size=1, max_size=6, unique_by=lambda f: f[0]
)


def _json(fields):
    return {
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True, "metadata": {}}
            for n, t in fields
        ],
    }


class _Frame:
    """Stub: _enforce_append_schema only reads ``.schema``."""

    def __init__(self, fields):
        from pyspark.sql.types import StructType

        self.schema = StructType.fromJson(_json(fields))


@settings(max_examples=300, deadline=None)
@given(stored=schema_fields, incoming=schema_fields)
def test_enforcement_refuses_exactly_type_conflicts(stored, incoming):
    fmt = ManifestFormat.__new__(ManifestFormat)  # no Spark needed
    prev = {"version": 1, "entries": [{}], "schema": _json(stored)}
    stored_types = dict(stored)
    conflict = any(
        n in stored_types and stored_types[n] != t for n, t in incoming
    )
    if conflict:
        with pytest.raises(TypeError, match="changes column type"):
            ManifestFormat._enforce_append_schema(
                fmt, "s.t", prev, _Frame(incoming)
            )
    else:
        merged = ManifestFormat._enforce_append_schema(
            fmt, "s.t", prev, _Frame(incoming)
        )
        names = [f["name"] for f in merged["fields"]]
        # stored fields first in their order, then new fields in
        # incoming order — the layout readers see
        assert names[: len(stored)] == [n for n, _ in stored]
        assert set(names) == {n for n, _ in stored} | {
            n for n, _ in incoming
        }
        assert len(names) == len(set(names))
        # merged types: stored wins its slots, incoming fills the rest
        types = {f["name"]: f["type"] for f in merged["fields"]}
        for n, t in stored:
            assert types[n] == t
        for n, t in incoming:
            if n not in stored_types:
                assert types[n] == t


@settings(max_examples=300, deadline=None)
@given(a=schema_fields, b=schema_fields, c=schema_fields)
def test_merge_schema_json_laws(a, b, c):
    m = ManifestFormat._merge_schema_json
    ja, jb, jc = _json(a), _json(b), _json(c)
    # idempotent
    assert m(ja, ja) == ja
    # total on None
    assert m(None, jb) == jb
    assert m(ja, None) == ja
    # head-biased: a's fields keep their slots and order
    ab = m(ja, jb)
    assert ab["fields"][: len(a)] == ja["fields"]
    # union of names, no duplicates
    names = [f["name"] for f in ab["fields"]]
    assert set(names) == {n for n, _ in a} | {n for n, _ in b}
    assert len(names) == len(set(names))
    # name-set associativity
    left = {f["name"] for f in m(m(ja, jb), jc)["fields"]}
    right = {f["name"] for f in m(ja, m(jb, jc))["fields"]}
    assert left == right
