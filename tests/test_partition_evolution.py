"""Partition-spec evolution (round 14, VERDICT r13 task 7 — Iceberg's
partition evolution): ``set_partition_spec`` changes ``partition_by``
on an existing table metadata-only.  Pins: old entries keep their
leaves and VALUES (read fidelity in every direction — unpartitioned →
partitioned, partitioned → unpartitioned, spec → wider spec), new
writes land under the new spec, pruning stays sound across the
boundary (keep-by-default), refusals (unknown / retired columns,
no-op spec), composition with retention/backfill, and the append
layout guard racing a concurrent spec change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _fmt(spark, root, kind="manifest", **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    kw.setdefault("auto_compact_dirs", None)
    return cls(spark, root, **kw)


def _rows(spark, quads):
    return spark.createDataFrame(
        [(int(k), str(d), str(r), float(v)) for k, d, r, v in quads],
        "k long, day string, region string, v double",
    )


def _state(fmt, name="s.t"):
    return sorted(
        (r["k"], r["day"], r["region"], r["v"])
        for r in fmt.read(name).collect()
    )


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_unpartitioned_to_partitioned(spark, tmp_path, kind):
    fmt = _fmt(spark, str(tmp_path), kind)
    base = [(1, "d1", "eu", 1.0), (2, "d2", "us", 2.0)]
    fmt.write("s.t", _rows(spark, base), "overwrite")
    v = fmt.set_partition_spec("s.t", ("day",))
    assert v >= 2
    fmt.write("s.t", _rows(spark, [(3, "d3", "eu", 3.0)]), "append")
    # new entry landed under the new spec, old ones kept their layout
    m = fmt._manifest("s.t")
    assert m["partition_columns"] == ["day"]
    specs = {
        (e["partitions"] or {}).get("day") for e in m["entries"]
    }
    assert "d3" in specs and None in specs
    assert _state(fmt) == sorted(base + [(3, "d3", "eu", 3.0)])


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_partitioned_to_unpartitioned_values_survive(spark, tmp_path, kind):
    """The read must recover old hive leaves' partition VALUES through
    their own basePath even though the current spec is empty."""
    fmt = _fmt(spark, str(tmp_path), kind)
    base = [(1, "d1", "eu", 1.0), (2, "d2", "us", 2.0)]
    fmt.write("s.t", _rows(spark, base), "overwrite", partition_by=("day",))
    fmt.set_partition_spec("s.t", ())
    fmt.write("s.t", _rows(spark, [(3, "d3", "eu", 3.0)]), "append")
    assert _state(fmt) == sorted(base + [(3, "d3", "eu", 3.0)])


def test_spec_widening_and_pruning_sound(spark, tmp_path):
    """day → (day, region): reads spanning the boundary prune with
    keep-by-default — a range on `k` stats excludes only provable
    entries and results equal the unpruned filter."""
    fmt = _fmt(spark, str(tmp_path), stats_cols=("k",))
    a = [(i, f"d{i%2}", "eu", float(i)) for i in range(6)]
    fmt.write("s.t", _rows(spark, a), "overwrite", partition_by=("day",))
    fmt.set_partition_spec("s.t", ("day", "region"))
    b = [(i, f"d{i%2}", "us", float(i)) for i in range(10, 16)]
    fmt.write("s.t", _rows(spark, b), "append")
    got = sorted(
        r["k"] for r in fmt.read_where("s.t", "k", 4, 12).collect()
    )
    want = sorted(x[0] for x in a + b if 4 <= x[0] <= 12)
    assert got == want
    assert _state(fmt) == sorted(a + b)


def test_refusals(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    fmt.write("s.t", _rows(spark, [(1, "d1", "eu", 1.0)]), "overwrite")
    with pytest.raises(ValueError, match="no live column"):
        fmt.set_partition_spec("s.t", ("nope",))
    fmt.rename_column("s.t", "day", "dt")
    with pytest.raises(ValueError, match="retired"):
        fmt.set_partition_spec("s.t", ("day",))
    fmt.set_partition_spec("s.t", ("dt",))
    with pytest.raises(ValueError, match="already"):
        fmt.set_partition_spec("s.t", ("dt",))
    with pytest.raises(ValueError, match="duplicate"):
        fmt.set_partition_spec("s.t", ("dt", "dt"))


def test_retention_keeps_old_spec_entries(spark, tmp_path):
    """drop_partitions_below after evolution: attributable entries
    drop, old-spec entries KEEP (retention never over-drops)."""
    fmt = _fmt(spark, str(tmp_path))
    fmt.write("s.t", _rows(spark, [(1, "d0", "eu", 1.0)]), "overwrite")
    fmt.set_partition_spec("s.t", ("day",))
    fmt.write(
        "s.t",
        _rows(spark, [(2, "d1", "eu", 2.0), (3, "d2", "eu", 3.0)]),
        "append",
    )
    dropped = fmt.drop_partitions_below("s.t", "day", "d2")
    assert dropped == 1  # d1 attributable and below; d0 row unattributable, kept
    ks = sorted(r["k"] for r in fmt.read("s.t").collect())
    assert ks == [1, 3]


def test_backfill_refuses_unattributable_history(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path))
    fmt.write("s.t", _rows(spark, [(1, "d0", "eu", 1.0)]), "overwrite")
    fmt.set_partition_spec("s.t", ("day",))
    with pytest.raises(ValueError, match="no 'day' partition value"):
        fmt.dynamic_partition_overwrite(
            "s.t", _rows(spark, [(9, "d0", "eu", 9.0)]), "day"
        )


def test_append_racing_spec_change_refuses(spark, tmp_path, monkeypatch):
    """An append whose data dir landed under the OLD spec must refuse
    on rebase when a concurrent set_partition_spec changed the layout
    (the pair does not commute)."""
    fmt = _fmt(spark, str(tmp_path))
    other = fmt.writer_copy()
    fmt.write("s.t", _rows(spark, [(1, "d1", "eu", 1.0)]), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.set_partition_spec("s.t", ("day",))
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    with pytest.raises(RuntimeError, match="layout"):
        fmt.write("s.t", _rows(spark, [(2, "d2", "us", 2.0)]), "append")


def test_sql_alter_partition_by(spark, tmp_path):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.sql_frontend import (
        SqlFrontend,
    )

    fmt = _fmt(spark, str(tmp_path))
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)
    fmt.write("s.t", _rows(spark, [(1, "d1", "eu", 1.0)]), "overwrite")
    sq = SqlFrontend(wh)
    v = sq.sql("ALTER TABLE s.t PARTITION BY (day, region)")
    assert isinstance(v, int)
    assert fmt._manifest("s.t")["partition_columns"] == ["day", "region"]
