"""Ingest-side schema evolution (r15, VERDICT r14 task 3) — dlt's
headline behavior: document batches with INFERRED schemas that drift
land through ``HealthPipeline.sync`` instead of refusing.

Pins: (1) additive scalar / nested-struct / child-element fields
evolve on parent AND child tables consistently; (2) the JSON numeric
split (long stored vs double inferred, both directions) follows dlt's
variant-column semantics ROW-WISE — integral values demote to the
stored column, precision-losing values land in ``<col>__v_double`` /
``<col>__v_bigint``; (3) lattice widenings promote in the log;
(4) incompatible changes (string into a numeric column) refuse loudly
naming the column; (5) a seeded random drift sequence converges to
the Python-model expectation on BOTH commit-log formats."""

from __future__ import annotations

import json
import random

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import HealthPipeline
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)

_FMTS = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}


def _pipe(spark, tmp_path, kind):
    fmt = _FMTS[kind](spark, str(tmp_path), auto_compact_dirs=None)
    return HealthPipeline(spark, str(tmp_path), table_format=fmt), fmt


def _dump(tmp_path, name, docs):
    p = tmp_path / name
    p.write_text(json.dumps(docs))
    return str(p)


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_additive_nested_and_child_fields_evolve(spark, tmp_path, kind):
    pipe, fmt = _pipe(spark, tmp_path, kind)
    pipe.sync({"users": _dump(tmp_path, "b1.json", [
        {"_id": "a", "created_at": 100, "name": "x",
         "tags": [{"t": "p"}]},
    ])})
    # drift: new scalar, new nested struct field, new child-element
    # field, and a brand-new array -> new child table
    pipe.sync({"users": _dump(tmp_path, "b2.json", [
        {"_id": "b", "created_at": 200, "name": "y", "level": 3,
         "profile": {"age": 30},
         "tags": [{"t": "q", "w": 2}],
         "badges": [{"b": "gold"}]},
    ])})
    u = fmt.read("raw.users")
    assert {"level", "profile__age"} <= set(u.columns)
    rows = {r["_id"]: r for r in u.collect()}
    assert rows["a"]["level"] is None and rows["b"]["level"] == 3
    assert rows["b"]["profile__age"] == 30
    tags = fmt.read("raw.users__tags")
    assert "w" in tags.columns
    assert sorted((r["t"], r["w"]) for r in tags.collect()) == [
        ("p", None), ("q", 2),
    ]
    assert [r["b"] for r in fmt.read("raw.users__badges").collect()] == [
        "gold"
    ]


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_numeric_split_rowwise_both_directions(spark, tmp_path, kind):
    pipe, fmt = _pipe(spark, tmp_path, kind)
    big = (1 << 60) + 1  # not representable in float64
    # long first -> later doubles split row-wise
    pipe.sync({"users": _dump(tmp_path, "b1.json", [
        {"_id": "a", "created_at": 100, "score": 1},
    ])})
    pipe.sync({"users": _dump(tmp_path, "b2.json", [
        {"_id": "b", "created_at": 200, "score": 2.5},
        {"_id": "c", "created_at": 201, "score": 3.0},
    ])})
    got = {
        r["_id"]: (r["score"], r["score__v_double"])
        for r in fmt.read("raw.users").collect()
    }
    assert got == {"a": (1, None), "b": (None, 2.5), "c": (3, None)}
    # double first -> later longs coerce, >2^53 keeps exact bigint
    pipe.sync({"hr": _dump(tmp_path, "h1.json", [
        {"_id": "a", "created_at": 100, "bpm": 61.5},
    ])})
    pipe.sync({"hr": _dump(tmp_path, "h2.json", [
        {"_id": "b", "created_at": 200, "bpm": 70},
        {"_id": "c", "created_at": 201, "bpm": big},
    ])})
    got = {
        r["_id"]: (r["bpm"], r["bpm__v_bigint"])
        for r in fmt.read("raw.hr").collect()
    }
    assert got == {"a": (61.5, None), "b": (70.0, None), "c": (None, big)}


def test_numeric_split_saturating_cast_boundary(spark, tmp_path):
    """Spark's cast('long') SATURATES: 2^63 → Long.MaxValue → (back to
    double) 2^63, so the roundtrip check alone would demote a double
    the long column cannot hold, silently off by one; symmetrically
    Long.MaxValue's double rounds up to 2^63 and the saturating
    cast-back makes the lossy coercion look exact.  Both boundary
    values must take the VARIANT column with their exact payloads
    (review r15)."""
    pipe, fmt = _pipe(spark, tmp_path, "manifest")
    # stored long, incoming double == 2^63 exactly
    pipe.sync({"a": _dump(tmp_path, "a1.json", [
        {"_id": "x", "created_at": 100, "score": 1},
    ])})
    pipe.sync({"a": _dump(tmp_path, "a2.json", [
        {"_id": "y", "created_at": 200, "score": float(2**63)},
    ])})
    got = {
        r["_id"]: (r["score"], r["score__v_double"])
        for r in fmt.read("raw.a").collect()
    }
    assert got == {"x": (1, None), "y": (None, float(2**63))}
    # stored double, incoming long == Long.MaxValue
    big = (1 << 63) - 1
    pipe.sync({"b": _dump(tmp_path, "b1.json", [
        {"_id": "x", "created_at": 100, "bpm": 61.5},
    ])})
    pipe.sync({"b": _dump(tmp_path, "b2.json", [
        {"_id": "y", "created_at": 200, "bpm": big},
    ])})
    got = {
        r["_id"]: (r["bpm"], r["bpm__v_bigint"])
        for r in fmt.read("raw.b").collect()
    }
    assert got == {"x": (61.5, None), "y": (None, big)}


def test_child_drift_refusal_is_all_or_nothing(spark, tmp_path):
    """An incompatible CHILD drift must land NOTHING — including the
    (compatible) parent — on the non-transactional format too.  Unlike
    a crash, a refusing batch refuses on every retry, so a mid-loop
    refusal would otherwise leave parent/child skew PERMANENTLY
    (review r15: all tables reconcile before the first upsert)."""
    pipe, fmt = _pipe(spark, tmp_path, "manifest")
    pipe.sync({"users": _dump(tmp_path, "b1.json", [
        {"_id": "a", "created_at": 100, "name": "x",
         "tags": [{"w": 1}]},
    ])})
    with pytest.raises(ValueError, match="'w' from bigint to string"):
        pipe.sync({"users": _dump(tmp_path, "b2.json", [
            {"_id": "b", "created_at": 200, "name": "y",
             "tags": [{"w": "wide"}]},
        ])})
    assert fmt.read("raw.users").count() == 1  # parent did NOT land
    assert fmt.read("raw.users__tags").count() == 1


def test_incompatible_drift_refuses_naming_column(spark, tmp_path):
    pipe, fmt = _pipe(spark, tmp_path, "manifest")
    pipe.sync({"users": _dump(tmp_path, "b1.json", [
        {"_id": "a", "created_at": 100, "score": 1},
    ])})
    with pytest.raises(ValueError, match="'score' from bigint to string"):
        pipe.sync({"users": _dump(tmp_path, "b2.json", [
            {"_id": "b", "created_at": 200, "score": "high"},
        ])})
    # the refusing batch landed NOTHING (single-table case: the upsert
    # never ran)
    assert fmt.read("raw.users").count() == 1


def _expected_landing(stored_kind: str, v):
    """The Python model of the variant split: where does value ``v``
    land when the stored column is ``long`` / ``double``?  Returns
    (base_value, variant_value)."""
    if stored_kind == "long":
        if isinstance(v, int):
            return v, None
        return (int(v), None) if v == int(v) else (None, v)
    # stored double
    if isinstance(v, float):
        return v, None
    return (float(v), None) if float(v) == v else (None, v)


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
@pytest.mark.parametrize("seed", [7, 23])
def test_random_drift_sequence_matches_model(spark, tmp_path, kind, seed):
    """Seeded random add/widen drift over several syncs: every field
    ever seen is a column, every doc lands once, numeric values land
    exactly where the dlt-variant model puts them."""
    rng = random.Random(seed)
    pipe, fmt = _pipe(spark, tmp_path, kind)
    known_fields = ["m0"]
    stored_kind: dict = {}
    expect: dict = {}
    doc_i = 0
    for batch in range(5):
        if rng.random() < 0.6:
            known_fields.append(f"m{len(known_fields)}")  # additive
        docs = []
        for _ in range(rng.randint(1, 3)):
            doc_i += 1
            d = {"_id": f"d{doc_i}", "created_at": 100 + doc_i}
            fields = rng.sample(
                known_fields, rng.randint(1, len(known_fields))
            )
            for f in fields:
                v = (
                    rng.randint(0, 99)
                    if rng.random() < 0.5
                    else rng.choice([2.5, 4.0, 0.125])
                )
                d[f] = v
            docs.append(d)
        # column-level inference first (Spark infers per batch), then
        # the row-wise split against the stored kind
        for f in known_fields:
            vals = [d[f] for d in docs if f in d]
            if not vals:
                continue
            inferred = (
                "double" if any(isinstance(v, float) for v in vals)
                else "long"
            )
            if f not in stored_kind:
                stored_kind[f] = inferred
        for d in docs:
            exp_row = {}
            for f, v in d.items():
                if f in ("_id", "created_at"):
                    continue
                # a long-inferred batch column against a long stored
                # column never splits; mixed batches infer double
                batch_vals = [x[f] for x in docs if f in x]
                v_eff = (
                    float(v)
                    if any(isinstance(x, float) for x in batch_vals)
                    and isinstance(v, int)
                    and float(v) == v
                    else v
                )
                exp_row[f] = _expected_landing(stored_kind[f], v_eff)
            expect[d["_id"]] = exp_row
        pipe.sync(
            {"ev": _dump(tmp_path, f"s{batch}.json", docs)}
        )
    rows = {r["_id"]: r.asDict() for r in fmt.read("raw.ev").collect()}
    assert set(rows) == set(expect)
    for _id, exp_row in expect.items():
        for f, (base, variant) in exp_row.items():
            got_base = rows[_id].get(f)
            vcol = (
                f"{f}__v_double"
                if stored_kind[f] == "long"
                else f"{f}__v_bigint"
            )
            got_var = rows[_id].get(vcol)
            assert (got_base, got_var) == (base, variant), (
                _id, f, (got_base, got_var), (base, variant)
            )
