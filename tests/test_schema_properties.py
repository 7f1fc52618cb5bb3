"""Property pins for schema-in-the-log merge + enforcement (hypothesis).

The enforcement path decides, from manifest metadata alone, whether an
append may land — a wrong "yes" silently coerces stored values at read
time (int file ∪ string file reads as string), a wrong "no" blocks a
legal additive evolution.  Pinned:

1. REFUSAL EXACTNESS — `_enforce_append_schema` raises iff some column
   name shared by the stored schema and the incoming frame carries a
   different type that the SAFE-PROMOTION lattice (r12: int chain,
   float→double, decimal precision at same scale — Iceberg's rules)
   cannot reconcile; additive appends, narrowing-within-the-lattice
   appends, and safe widenings always pass, and the returned merged
   schema is exactly (stored fields — each at the PROMOTED type where
   a widening landed — then new fields).
2. MERGE LAWS — `_merge_schema_json` is idempotent, head-biased up to
   promotion (head's fields keep their slots and order; a slot's type
   may only move UP the lattice), total on None, and its field-name
   set is the union.
3. LATTICE LAWS — `_promoted_type` is commutative, idempotent, and
   only ever returns one of its arguments (no invented types).

All run against the real methods with stub frames (only ``.schema``
is touched), so hundreds of examples run without Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)

TYPES = ["integer", "long", "float", "double", "string", "boolean", "date"]

# the safe-promotion lattice over TYPES (name-level twin of
# _promoted_type, used as the test's independent oracle)
_CHAINS = [["integer", "long"], ["float", "double"]]


def _promote_name(a, b):
    if a == b:
        return a
    for chain in _CHAINS:
        if a in chain and b in chain:
            return chain[max(chain.index(a), chain.index(b))]
    return None


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
def test_enforcement_refuses_exactly_unpromotable_conflicts(
    stored, incoming
):
    fmt = ManifestFormat.__new__(ManifestFormat)  # no Spark needed
    prev = {"version": 1, "entries": [{}], "schema": _json(stored)}
    stored_types = dict(stored)
    conflict = any(
        n in stored_types
        and stored_types[n] != t
        and _promote_name(stored_types[n], t) is None
        for n, t in incoming
    )
    if conflict:
        with pytest.raises(TypeError, match="changes column type"):
            ManifestFormat._enforce_append_schema(
                fmt, "s.t", prev, _Frame(incoming)
            )
        return
    merged = ManifestFormat._enforce_append_schema(
        fmt, "s.t", prev, _Frame(incoming)
    )
    names = [f["name"] for f in merged["fields"]]
    # stored fields first in their order, then new fields in
    # incoming order — the layout readers see
    assert names[: len(stored)] == [n for n, _ in stored]
    assert set(names) == {n for n, _ in stored} | {n for n, _ in incoming}
    assert len(names) == len(set(names))
    # merged types: stored wins its slot UNLESS a safe promotion
    # widened it; incoming fills the new slots
    types = {f["name"]: f["type"] for f in merged["fields"]}
    inc_types = dict(incoming)
    for n, t in stored:
        if n in inc_types and inc_types[n] != t:
            assert types[n] == _promote_name(t, inc_types[n])
        else:
            assert types[n] == t
    for n, t in incoming:
        if n not in stored_types:
            assert types[n] == t


@settings(max_examples=300, deadline=None)
@given(a=schema_fields, b=schema_fields)
def test_merge_schema_json_laws(a, b):
    m = ManifestFormat._merge_schema_json
    ja, jb = _json(a), _json(b)
    # idempotent
    assert m(ja, ja) == ja
    # total on None
    assert m(None, jb) == jb
    assert m(ja, None) == ja
    ab = m(ja, jb)
    # head-biased up to promotion: a's fields keep their slots and
    # order; each slot's type is a's type or the lattice promotion
    # with b's
    b_types = dict(b)
    for slot, (n, t) in zip(ab["fields"][: len(a)], a):
        assert slot["name"] == n
        if n in b_types and b_types[n] != t:
            w = _promote_name(t, b_types[n])
            assert slot["type"] == (w if w is not None else t)
        else:
            assert slot["type"] == t
    # union of names, no duplicates
    names = [f["name"] for f in ab["fields"]]
    assert set(names) == {n for n, _ in a} | {n for n, _ in b}
    assert len(names) == len(set(names))


def test_promoted_type_lattice_laws():
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    p = ManifestFormat._promoted_type
    every = [
        ByteType(), ShortType(), IntegerType(), LongType(),
        FloatType(), DoubleType(), StringType(),
        DecimalType(10, 2), DecimalType(20, 2), DecimalType(20, 5),
    ]
    for a in every:
        for b in every:
            w = p(a, b)
            assert w == p(b, a)  # commutative
            if w is not None:
                assert w in (a, b)  # never invents a type
        assert p(a, a) == a  # idempotent
    # the documented promotions
    assert p(IntegerType(), LongType()) == LongType()
    assert p(ByteType(), IntegerType()) == IntegerType()
    assert p(FloatType(), DoubleType()) == DoubleType()
    assert p(DecimalType(10, 2), DecimalType(20, 2)) == DecimalType(20, 2)
    # the documented refusals
    assert p(LongType(), DoubleType()) is None  # cross-family
    assert p(LongType(), StringType()) is None
    assert p(DecimalType(20, 2), DecimalType(20, 5)) is None  # scale
    assert p(IntegerType(), FloatType()) is None
