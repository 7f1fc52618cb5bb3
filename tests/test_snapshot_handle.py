"""Pinned-snapshot multi-query reads (round 13, VERDICT task 5).

A long job that reads a table twice through the per-call verbs can
straddle a concurrent commit; ``fmt.snapshot()`` returns a handle whose
reads all serve ONE pinned version set.  Pins: a concurrent commit
between two reads of the same handle does not change results; the
catalog form is cross-table-consistent (one transaction frontier); the
skip-read works at the pin; vacuumed pins error loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _fmt(spark, root, kind="manifest", **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    kw.setdefault("auto_compact_dirs", None)
    kw.setdefault("stats_cols", ("k",))
    return cls(spark, root, **kw)


def _rows(spark, *pairs):
    return spark.createDataFrame([Row(k=int(k), v=int(v)) for k, v in pairs])


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_two_reads_agree_across_concurrent_commit(spark, tmp_path, kind):
    fmt = _fmt(spark, str(tmp_path), kind)
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    snap = fmt.snapshot()
    first = sorted((r["k"], r["v"]) for r in snap.read("s.t").collect())
    # concurrent commits land between the handle's two reads
    fmt.write("s.t", _rows(spark, (3, 30)), "append")
    fmt.delete_where("s.t", "k", 1, 1)
    second = sorted((r["k"], r["v"]) for r in snap.read("s.t").collect())
    assert first == second == [(1, 10), (2, 20)]
    # the per-call read sees the new head, as before
    head = sorted((r["k"], r["v"]) for r in fmt.read("s.t").collect())
    assert head == [(2, 20), (3, 30)]


def test_catalog_snapshot_is_cross_table_consistent(spark, tmp_path):
    """On the catalog format the pin is the CATALOG version: a
    transaction committing parent+child after the handle was created
    is invisible to BOTH reads — never a parent/child skew."""
    fmt = _fmt(spark, str(tmp_path), "catalog")
    with fmt.transaction():
        fmt.write("s.parent", _rows(spark, (1, 1)), "overwrite")
        fmt.write("s.child", _rows(spark, (1, 100)), "overwrite")
    snap = fmt.snapshot()
    with fmt.transaction():
        fmt.write("s.parent", _rows(spark, (2, 2)), "append")
        fmt.write("s.child", _rows(spark, (2, 200)), "append")
    # reading the CHILD first must not let the parent read slip to the
    # new frontier (lazy per-table pinning would)
    assert snap.read("s.child").count() == 1
    assert snap.read("s.parent").count() == 1
    assert fmt.read("s.child").count() == 2


def test_snapshot_read_where_prunes_at_pin(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    for i in range(3):
        fmt.write(
            "s.t",
            _rows(spark, *[(i * 10 + j, j) for j in range(10)]),
            "append" if i else "overwrite",
        )
    snap = fmt.snapshot()
    snap.version("s.t")  # plain manifest pins per table at first touch
    fmt.write("s.t", _rows(spark, (15, 999)), "append")  # in-range, post-pin
    got = sorted(r["k"] for r in snap.read_where("s.t", "k", 14, 16).collect())
    assert got == [14, 15, 16]  # the post-pin 15 is NOT served twice
    head = sorted(r["k"] for r in fmt.read_where("s.t", "k", 14, 16).collect())
    assert head == [14, 15, 15, 16]


def test_vacuumed_pin_errors_loudly(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    fmt.write("s.t", _rows(spark, (1, 10)), "overwrite")
    snap = fmt.snapshot()
    snap.version("s.t")  # pin v1
    fmt.replace_atomic("s.t", _rows(spark, (2, 20)), ())
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    with pytest.raises((ValueError, FileNotFoundError)):
        snap.read("s.t").collect()


def test_snapshot_exists_and_version(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    fmt.write("s.t", _rows(spark, (1, 10)), "overwrite")
    snap = fmt.snapshot()
    assert snap.exists("s.t") and not snap.exists("s.nope")
    v = snap.version("s.t")
    fmt.write("s.t", _rows(spark, (2, 20)), "append")
    assert snap.version("s.t") == v  # the pin never advances
