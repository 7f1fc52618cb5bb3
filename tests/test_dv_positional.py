"""Positional deletion vectors (round 12, VERDICT r11 task 2) — the
second MOR retraction form, behind the writer flag ``dv_form``.

``dv_form="equality"`` (default) is the round-10/11 behavior: stored
predicates for DELETE/UPDATE, equality-delete key files for MERGE
(Iceberg v2 equality deletes).  ``dv_form="positional"`` stores a
(file, row-index) MASK instead — Delta's deletion-vector design:

- the read masks via ONE anti-join on two machine columns (table-root-
  relative file path + parquet ``_metadata.row_index``), independent of
  any data column;
- the dv's ``applies`` set is scoped to the files that ACTUALLY contain
  deleted rows, not every may-match dir — untouched dirs read clean and
  stay eligible for threshold compaction;
- non-JSON-storable predicates work (nothing persists but positions).

These tests pin: form equivalence (same lifecycle, byte-identical
reads + CDC), finer applies scoping, point-in-time semantics,
materialize_deletes / vacuum / reader-feature behavior, and mixed
equality+positional dv lists on one table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _fmt(spark, root, kind="manifest", **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    kw.setdefault("cdf", True)
    kw.setdefault("dv_form", "positional")
    kw.setdefault("stats_cols", ("k",))
    return cls(spark, root, auto_compact_dirs=None, **kw)


def _rows(spark, *pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])


def _seed(spark, fmt, name="s.t", n=5, per=10):
    for i in range(n):
        chunk = _rows(spark, *[(i * per + j, 100 * i + j) for j in range(per)])
        fmt.write(name, chunk, "append" if i else "overwrite")
    return {(e["dir"], e.get("rel")) for e in fmt._manifest(name)["entries"]}


def test_dv_form_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="dv_form"):
        ManifestFormat(spark, str(tmp_path), dv_form="bitmap")


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_positional_delete_rewrites_nothing(spark, tmp_path, kind):
    """The positional twin of the equality suite's headline test: one
    manifest commit, zero data rewrites, exact reads, CDF classes."""
    fmt = _fmt(spark, str(tmp_path), kind)
    before = _seed(spark, fmt)
    base = fmt._manifest("s.t")["version"]
    assert fmt.delete_where_mor("s.t", "k", 21, 24) == 4
    m = fmt._manifest("s.t")
    after = {(e["dir"], e.get("rel")) for e in m["entries"]}
    assert after == before  # every entry carried: zero data rewrite
    assert len(m["dv"]) == 1
    d = m["dv"][0]
    assert "pos" in d and d["pos"]["n"] == 4 and "bounds" not in d
    got = {r["k"] for r in fmt.read("s.t").collect()}
    assert got == set(range(50)) - {21, 22, 23, 24}
    assert {
        r["k"] for r in fmt.read_where("s.t", "k", 20, 29).collect()
    } == {20, 25, 26, 27, 28, 29}
    assert fmt.read_version("s.t", base).count() == 50
    feed = fmt.read_changes_cdf("s.t", base).collect()
    assert {r["k"] for r in feed} == {21, 22, 23, 24}
    assert {r["_change_type"] for r in feed} == {"delete"}
    # the helper identity columns never leak into served schemas
    assert not [c for c in fmt.read("s.t").columns if c.startswith("__dv_")]


def test_forms_equivalent_lifecycle(spark, tmp_path):
    """The SAME delete/merge/update lifecycle through both forms lands
    identical table content and identical CDC classes."""
    results = {}
    for form in ("equality", "positional"):
        fmt = _fmt(spark, str(tmp_path / form), dv_form=form)
        _seed(spark, fmt)
        base = fmt._manifest("s.t")["version"]
        assert fmt.delete_where_mor("s.t", "k", 5, 8) == 4
        fmt.merge_mor("s.t", _rows(spark, (10, 999), (77, 770)), "k")
        assert fmt.update_where_mor("s.t", "k", {"v": "v + 1000"}, 30, 32) == 3
        results[form] = {
            "rows": sorted(
                (r["k"], r["v"]) for r in fmt.read("s.t").collect()
            ),
            "cdc": sorted(
                (r["k"], r["_change_type"], r["_commit_version"])
                for r in fmt.read_changes_cdf("s.t", base).collect()
            ),
        }
    assert results["equality"] == results["positional"]


def test_positional_applies_scoped_to_touched_files(spark, tmp_path):
    """The form's read-cost advantage: a merge whose matched keys live
    in ONE dir scopes its mask to that dir only — the equality twin
    scopes to every may-match entry.  Untouched dirs read clean and
    stay compactable."""
    eq = _fmt(spark, str(tmp_path / "eq"), dv_form="equality")
    po = _fmt(spark, str(tmp_path / "po"), dv_form="positional")
    for fmt in (eq, po):
        # 5 dirs, OVERLAPPING k stats (same range each) so min/max
        # pruning cannot narrow the may-match set
        for i in range(5):
            fmt.write(
                "s.t",
                _rows(spark, *[(j, i * 1000 + j) for j in range(10)]),
                "append" if i else "overwrite",
            )
    # matched key k=3: present in every dir — now delete by a predicate
    # only dir 0's rows satisfy (v < 10)
    assert eq.delete_where_mor("s.t", {"k": (3, 3), "v": (None, 9)}) == 1
    assert po.delete_where_mor("s.t", {"k": (3, 3), "v": (None, 9)}) == 1
    eq_applies = eq._manifest("s.t")["dv"][0]["applies"]
    po_applies = po._manifest("s.t")["dv"][0]["applies"]
    # equality form: all 5 may-match dirs pay the read-time filter and
    # leave compaction; positional: only the one file with the deleted
    # row
    assert len(eq_applies) == 5
    assert len(po_applies) == 1
    assert sorted(r["v"] for r in po.read("s.t").collect()) == sorted(
        r["v"] for r in eq.read("s.t").collect()
    )


def test_positional_point_in_time(spark, tmp_path):
    """Rows appended AFTER a positional delete are untouched even when
    they match the original predicate (per-file scoping, like Delta)."""
    fmt = _fmt(spark, str(tmp_path))
    _seed(spark, fmt, n=2)
    assert fmt.delete_where_mor("s.t", "k", 3, 4) == 2
    fmt.write("s.t", _rows(spark, (3, 33333), (4, 44444)), "append")
    got = sorted(
        (r["k"], r["v"]) for r in fmt.read_where("s.t", "k", 3, 4).collect()
    )
    assert got == [(3, 33333), (4, 44444)]


def test_materialize_deletes_clears_positional(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    _seed(spark, fmt)
    fmt.delete_where_mor("s.t", "k", 5, 8)
    fmt.merge_mor("s.t", _rows(spark, (10, 999)), "k")
    before = sorted((r["k"], r["v"]) for r in fmt.read("s.t").collect())
    rewrote = fmt.materialize_deletes("s.t")
    assert rewrote > 0
    m = fmt._manifest("s.t")
    assert not m.get("dv")
    assert (
        sorted((r["k"], r["v"]) for r in fmt.read("s.t").collect()) == before
    )
    # the purged masks' dirs die at the next vacuum
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    assert not [
        d for d in os.listdir(fmt.path("s.t")) if d.startswith("dvp-")
    ]


def test_vacuum_keeps_live_positional_masks(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    _seed(spark, fmt)
    fmt.delete_where_mor("s.t", "k", 5, 8)
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    live = [d for d in os.listdir(fmt.path("s.t")) if d.startswith("dvp-")]
    assert len(live) == 1  # referenced by the head: survives
    assert {r["k"] for r in fmt.read("s.t").collect()} == set(
        range(50)
    ) - {5, 6, 7, 8}


def test_old_reader_refuses_positional_masks(spark, tmp_path, monkeypatch):
    """reader_features contract: a build without 'dv-pos' must refuse
    the table loudly — ignoring masks would serve deleted rows."""
    fmt = _fmt(spark, str(tmp_path))
    _seed(spark, fmt)
    fmt.delete_where_mor("s.t", "k", 5, 8)
    old = ManifestFormat(spark, str(tmp_path))
    monkeypatch.setattr(
        ManifestFormat, "READER_FEATURES", frozenset({"dv", "dv-eq"})
    )
    with pytest.raises(RuntimeError, match="dv-pos"):
        old.read("s.t")


def test_mixed_dv_forms_on_one_table(spark, tmp_path):
    """Equality and positional dvs can coexist in one manifest (two
    writers with different settings): reads apply both."""
    po = _fmt(spark, str(tmp_path))
    eq = _fmt(spark, str(tmp_path), dv_form="equality")
    _seed(spark, po)
    po.delete_where_mor("s.t", "k", 5, 6)
    eq.merge_mor("s.t", _rows(spark, (10, 999)), "k")
    po.merge_mor("s.t", _rows(spark, (20, 888)), "k")
    m = po._manifest("s.t")
    kinds = sorted(
        next(k for k in ("pos", "keys", "bounds") if k in d)
        for d in m["dv"]
    )
    assert kinds == ["keys", "pos", "pos"]
    rows = {r["k"]: r["v"] for r in po.read("s.t").collect()}
    assert 5 not in rows and 6 not in rows
    assert rows[10] == 999 and rows[20] == 888
    assert len(rows) == 48


def test_positional_cow_delete_sheds_mask(spark, tmp_path):
    """A COW verb rewriting masked entries materializes positional
    deletes and sheds the dv — self-cleaning like the predicate form."""
    fmt = _fmt(spark, str(tmp_path))
    _seed(spark, fmt, n=2)
    fmt.delete_where_mor("s.t", "k", 3, 4)
    # COW delete over the same dir: rewrites it, mask must shed
    assert fmt.delete_where("s.t", "k", 7, 7) == 1
    m = fmt._manifest("s.t")
    assert not m.get("dv")
    assert {r["k"] for r in fmt.read("s.t").collect()} == set(
        range(20)
    ) - {3, 4, 7}


def test_positional_non_json_predicate_allowed(spark, tmp_path):
    """The equality form refuses non-JSON-storable bounds; positional
    needs no stored predicate, so it handles them."""
    import datetime

    fmt = _fmt(spark, str(tmp_path), stats_cols=("d",))
    df = spark.createDataFrame(
        [
            Row(k=i, d=datetime.datetime(2026, 1, 1 + i))
            for i in range(5)
        ]
    )
    fmt.write("s.t", df, "overwrite")
    n = fmt.delete_where_mor(
        "s.t",
        "d",
        datetime.datetime(2026, 1, 2),
        datetime.datetime(2026, 1, 3),
    )
    assert n == 2
    assert {r["k"] for r in fmt.read("s.t").collect()} == {0, 3, 4}
