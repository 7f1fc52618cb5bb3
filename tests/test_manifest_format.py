"""ManifestFormat: the commit-log table format behind the seam.

Same Warehouse semantics as the parquet/staging format, different
physics: immutable data dirs + a versioned manifest, one small-file
rename per transaction, logical (metadata-only) partition retention.
The point of these tests is that `Warehouse(..., table_format=
ManifestFormat(...))` passes the SAME behavioral checks the staging
format passes in tests/test_materialize.py — proving the seam, not just
the default implementation.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(
        spark, str(tmp_path), table_format=ManifestFormat(spark, str(tmp_path))
    )


def _days(spark, *pairs):
    return spark.createDataFrame([Row(day=d, v=v) for d, v in pairs])


def test_incremental_append_with_watermark(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    # second batch: one old row (filtered by strict >), one new
    wh.materialize_incremental(
        "stage.t", _days(spark, ("20240101", 9), ("20240102", 2)), "day"
    )
    got = {(r["day"], r["v"]) for r in wh.read("stage.t").collect()}
    assert got == {("20240101", 1), ("20240102", 2)}


def test_upsert_and_partition_layout_survive(spark, wh):
    df = spark.createDataFrame(
        [Row(k="a", day="20240101", v=1), Row(k="b", day="20240102", v=2)]
    )
    wh.materialize_incremental("stage.u", df, partition_by=("day",))
    assert wh.fmt.partition_columns("stage.u") == ["day"]
    wh.materialize_upsert(
        "stage.u",
        spark.createDataFrame([Row(k="b", day="20240102", v=22)]),
        "k",
    )
    got = {(r["k"], r["v"]) for r in wh.read("stage.u").collect()}
    assert got == {("a", 1), ("b", 22)}
    # the merge rewrite preserved the partition layout in the manifest
    assert wh.fmt.partition_columns("stage.u") == ["day"]
    assert wh.fmt.partition_values("stage.u") == ["20240101", "20240102"]


def test_append_is_atomic_and_versioned(spark, wh, tmp_path):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_incremental("stage.t", _days(spark, ("20240102", 2)), "day")
    # two committed versions; reader sees the union
    assert wh.fmt._latest_version("stage.t") == 2
    assert wh.read("stage.t").count() == 2


def test_orphan_data_dir_is_invisible_and_vacuumed(spark, wh, tmp_path):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    # simulate a crash AFTER the data write but BEFORE the commit:
    # land a second data dir without a manifest referencing it
    orphan = wh.fmt._new_data_dir(
        "stage.t", _days(spark, ("20240909", 99)), ()
    )
    assert orphan  # wrote something
    assert wh.read("stage.t").count() == 1  # invisible to readers
    assert wh.fmt.vacuum("stage.t", writer_grace_s=0) == 1  # reclaimed
    assert wh.read("stage.t").count() == 1


def test_replace_atomic_leaves_single_dir_manifest(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.fmt.replace_atomic("stage.t", _days(spark, ("20240105", 5)))
    assert wh.read("stage.t").collect()[0]["day"] == "20240105"
    m = wh.fmt._manifest("stage.t")
    assert len({e["dir"] for e in m["entries"]}) == 1


def test_retention_is_a_manifest_edit(spark, wh):
    df = spark.createDataFrame(
        [Row(day=f"2024010{i}", v=i) for i in range(1, 5)]
    )
    wh.materialize_incremental("stage.p", df, partition_by=("day",))
    dropped = wh.retention_drop("stage.p", "day", "20240103")
    assert dropped == 2
    assert wh.fmt.partition_values("stage.p") == ["20240103", "20240104"]
    got = {r["day"] for r in wh.read("stage.p").collect()}
    assert got == {"20240103", "20240104"}
    # logical delete: the bytes are still on disk until vacuum — but in
    # this layout both live and dropped partitions share one data dir,
    # so vacuum keeps it (dir-granularity reclamation, like Delta before
    # OPTIMIZE rewrites)
    assert wh.fmt.vacuum("stage.p", writer_grace_s=0) == 0


def test_backfill_replaces_exactly_named_partitions(spark, wh):
    df = spark.createDataFrame(
        [Row(day="20240101", v=1), Row(day="20240102", v=2)]
    )
    wh.materialize_incremental("stage.p", df, partition_by=("day",))
    wh.backfill_partitions(
        "stage.p", spark.createDataFrame([Row(day="20240102", v=22)]), "day"
    )
    got = {(r["day"], r["v"]) for r in wh.read("stage.p").collect()}
    assert got == {("20240101", 1), ("20240102", 22)}


def test_snapshot_scd2_on_manifest_format(spark, wh):
    wh.materialize_snapshot(
        "snap.c", spark.createDataFrame([Row(k="a", bal=10.0)]), "k", "T1"
    )
    wh.materialize_snapshot(
        "snap.c", spark.createDataFrame([Row(k="a", bal=11.0)]), "k", "T2"
    )
    rows = {
        (r["bal"], r["valid_from"], r["valid_to"])
        for r in wh.read("snap.c").collect()
    }
    assert rows == {(10.0, "T1", "T2"), (11.0, "T2", None)}
    asof = wh.read_asof("snap.c", "T1").collect()
    assert [(r["k"], r["bal"]) for r in asof] == [("a", 10.0)]


def test_compact_collapses_append_dirs(spark, wh):
    for i in range(3):
        wh.materialize_incremental(
            "stage.t", _days(spark, (f"2024010{i + 1}", i)), "day"
        )
    assert len({e["dir"] for e in wh.fmt._manifest("stage.t")["entries"]}) == 3
    wh.compact("stage.t", target_files=1)
    assert len({e["dir"] for e in wh.fmt._manifest("stage.t")["entries"]}) == 1
    assert wh.read("stage.t").count() == 3
    # old dirs reclaimed
    assert wh.fmt.vacuum("stage.t", writer_grace_s=0) == 3


def test_schema_evolution_across_commits(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_incremental(
        "stage.t",
        spark.createDataFrame([Row(day="20240102", v=2, extra="x")]),
        "day",
    )
    rows = {
        (r["day"], r["extra"]) for r in wh.read("stage.t").collect()
    }
    assert rows == {("20240101", None), ("20240102", "x")}


def test_concurrent_commit_detected(spark, wh, monkeypatch):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    # a racing writer lands v2 between this writer's version read and
    # its rename: freeze this writer's version read at 1, then forge v2
    forged = os.path.join(
        wh.fmt._log_path("stage.t").replace("file:", ""), f"v{2:012d}.json"
    )
    with open(forged, "w") as fh:
        fh.write("{}")
    monkeypatch.setattr(wh.fmt, "_latest_version", lambda name: 1)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        wh.fmt._commit("stage.t", [], [])


def test_catalog_listing_and_info(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_incremental(
        "raw.r",
        spark.createDataFrame([Row(day="20240101", v=1)]),
        partition_by=("day",),
    )
    assert wh.tables() == ["raw.r", "stage.t"]
    info = wh.table_info("raw.r")
    assert info["partition_columns"] == ["day"]
    assert info["partitions"] == ["20240101"]
    assert info["bytes"] > 0


def test_time_travel_and_history(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_incremental("stage.t", _days(spark, ("20240102", 2)), "day")
    wh.fmt.replace_atomic("stage.t", _days(spark, ("20240105", 5)))
    # v1 = first day only, v2 = both, v3 = the replacement
    assert wh.fmt.read_version("stage.t", 1).count() == 1
    assert {r["day"] for r in wh.fmt.read_version("stage.t", 2).collect()} == {
        "20240101",
        "20240102",
    }
    assert wh.read("stage.t").collect()[0]["day"] == "20240105"
    hist = wh.fmt.history("stage.t")
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["n_data_dirs"] for h in hist] == [1, 2, 1]
    with pytest.raises(ValueError, match="no version"):
        wh.fmt.read_version("stage.t", 9)
    # vacuum keeps only the LATEST version's dirs: v1/v2 become
    # unreadable after reclamation (the documented tradeoff)
    assert wh.fmt.vacuum("stage.t", writer_grace_s=0) == 2


@pytest.mark.parametrize("fmt_name", ["manifest", "catalog", "catalog_prod"])
def test_full_pipeline_on_manifest_format(spark, tmp_path_factory, fmt_name):
    """System-level seam proof: the ENTIRE reference pipeline — extract,
    flatten, root-key merge, stage, aggregate DAGs, maintained rollup —
    runs on the commit-log format (and its transactional catalog
    variant, where every root-key merge commits parent+children in one
    catalog flip) and produces the same answers the parquet format
    produces in tests/test_pipeline.py.  ``catalog_prod`` is the
    documented production configuration (r10): _dlt key stats make
    every root-key merge stats-bounded, cluster_by converges the
    random hash keys via cluster-on-compact, and an aggressive
    compaction threshold exercises both on the fixture run."""
    import json

    import test_pipeline as tp

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        HealthPipeline,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )

    fmt_factories = {
        "manifest": ManifestFormat,
        "catalog": CatalogManifestFormat,
        "catalog_prod": lambda spark, root: CatalogManifestFormat(
            spark, root,
            stats_cols=("_dlt_id", "_dlt_root_id"), cluster_by="_dlt_id",
            auto_compact_dirs=2,
        ),
    }
    fmt_cls = fmt_factories[fmt_name]
    src = tmp_path_factory.mktemp("mf_src")
    for name, docs in (
        ("users", tp.USERS), ("heart_rates", tp.HEART_RATES),
        ("sleeps", tp.SLEEPS), ("steps", tp.STEPS),
    ):
        (src / f"{name}.json").write_text(json.dumps(docs))
    root = str(tmp_path_factory.mktemp("mf_wh"))
    p = HealthPipeline(
        spark,
        root,
        maintained_rollups=True,
        table_format=fmt_cls(spark, root),
    )
    paths = {
        n: str(src / f"{n}.json")
        for n in ("users", "heart_rates", "sleeps", "steps")
    }
    p.run_all(paths)
    assert isinstance(p.wh.fmt, ManifestFormat)
    # same hand-computed values test_pipeline pins on the parquet format
    steps = {
        (r["day"], r["device_id"]): r["step_count"]
        for r in p.wh.read("agg.daily_steps").collect()
    }
    assert steps[("20200201", "d1")] == 150
    assert steps[("20200202", "d2")] == 30
    users = {
        r["user_id"]: r["devices"] for r in p.wh.read("stage.users").collect()
    }
    assert users["u1"] == ["d1", "d2"]
    # maintained rollup rode the same format and matches the recompute
    roll = {
        (r["day"], r["device_id"]): r["step_count"]
        for r in p.daily_steps_rollup().collect()
    }
    assert roll == steps
    # idempotent re-run (boundary re-reads + replay sentinel) on the
    # manifest format too
    p.run_all(paths)
    assert {
        (r["day"], r["device_id"]): r["step_count"]
        for r in p.wh.read("agg.daily_steps").collect()
    } == steps


def test_vacuum_keep_last_preserves_recent_versions(spark, wh):
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.fmt.replace_atomic("stage.t", _days(spark, ("20240102", 2)))
    wh.fmt.replace_atomic("stage.t", _days(spark, ("20240103", 3)))
    # keep the last two versions: v2 stays readable, v1's dir goes
    assert wh.fmt.vacuum("stage.t", keep_last=2, writer_grace_s=0) == 1
    assert wh.fmt.read_version("stage.t", 2).collect()[0]["day"] == "20240102"
    with pytest.raises(ValueError, match="no version"):
        wh.fmt.read_version("stage.t", 1)  # manifest pruned with its dir
    import pytest as _p

    with _p.raises(ValueError, match="at least the current"):
        wh.fmt.vacuum("stage.t", keep_last=0)


def test_manifest_format_on_scheme_qualified_uri(spark, tmp_path):
    """Cluster-real storage: the commit log, data dirs, time travel and
    vacuum must all work when the root is a scheme-qualified URI (file:/
    standing in for hdfs://s3a:) — manifest IO goes through the same
    Hadoop FileSystem as the data."""
    import os

    root = f"file:{tmp_path}"
    wh = Warehouse(
        spark, root, table_format=ManifestFormat(spark, root)
    )
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_upsert(
        "stage.t", spark.createDataFrame([Row(day="20240101", v=9)]), "day"
    )
    assert {(r["day"], r["v"]) for r in wh.read("stage.t").collect()} == {
        ("20240101", 9)
    }
    assert wh.fmt.read_version("stage.t", 1).collect()[0]["v"] == 1
    assert wh.fmt.vacuum("stage.t", writer_grace_s=0) == 1
    # log + current data dir really live under the local path
    log_local = os.path.join(str(tmp_path), "stage", "t", "_log")
    visible = sorted(
        f for f in os.listdir(log_local) if not f.startswith(".")
    )
    # (.crc sidecars excluded; _head.json is the r14 advisory hint)
    assert visible == ["_head.json", "v000000000002.json"]


# ---------------------------------------------------------------------------
# CatalogManifestFormat — multi-table transactions (r7)
# ---------------------------------------------------------------------------


def _doc_tables(spark, tmp_path, doc):
    import json

    from iot_elt_airflow_mongo_timescaledb_spark.sources.flatten import (
        flatten_document_table,
    )

    p = tmp_path / f"doc_{doc['created_at']}.json"
    p.write_text(json.dumps([doc]))
    df = spark.read.option("multiLine", "true").json(str(p))
    return flatten_document_table(df, "steps", primary_key="_id")


@pytest.fixture()
def cat_wh(spark, tmp_path):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )

    return Warehouse(
        spark,
        str(tmp_path),
        table_format=CatalogManifestFormat(spark, str(tmp_path)),
    )


def test_catalog_format_passes_basic_warehouse_flows(spark, cat_wh):
    wh = cat_wh
    wh.materialize_incremental("stage.t", _days(spark, ("20240101", 1)), "day")
    wh.materialize_incremental("stage.t", _days(spark, ("20240102", 2)), "day")
    wh.materialize_upsert(
        "stage.t", spark.createDataFrame([Row(day="20240102", v=22)]), "day"
    )
    got = {(r["day"], r["v"]) for r in wh.read("stage.t").collect()}
    assert got == {("20240101", 1), ("20240102", 22)}
    assert wh.tables() == ["stage.t"]
    # per-table time travel still works against the manifest log
    assert wh.fmt.read_version("stage.t", 1).count() == 1


def test_transaction_is_read_your_writes_and_atomic(spark, cat_wh):
    wh = cat_wh
    wh.materialize_incremental("a.x", _days(spark, ("d1", 1)), None)
    with wh.fmt.transaction():
        wh.materialize_upsert("a.x", _days(spark, ("d1", 9)), "day")
        # read-your-writes inside the transaction
        assert wh.read("a.x").collect()[0]["v"] == 9
        wh.materialize_upsert("a.y", _days(spark, ("d9", 5)), "day")
    # both visible after one catalog flip
    assert wh.read("a.x").collect()[0]["v"] == 9
    assert wh.read("a.y").collect()[0]["v"] == 5

    # an aborted transaction discards BOTH staged tables
    with pytest.raises(RuntimeError, match="boom"):
        with wh.fmt.transaction():
            wh.materialize_upsert("a.x", _days(spark, ("d1", 100)), "day")
            raise RuntimeError("boom")
    assert wh.read("a.x").collect()[0]["v"] == 9  # unchanged
    # orphaned manifest + dirs reclaimed by vacuum
    assert wh.fmt.vacuum("a.x", writer_grace_s=0) >= 1


def test_root_key_merge_is_cross_table_atomic(spark, tmp_path, cat_wh, monkeypatch):
    """The gap two review rounds named: on the staging-swap format a
    crash between the parent and child upserts leaves reader-visible
    skew until the retry; on the catalog format the same crash leaves
    EVERY table at the old state (the catalog never flipped), and the
    retry lands the new state everywhere."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse as WH,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        root_key_merge,
    )

    v1 = _doc_tables(
        spark, tmp_path,
        {"_id": "d1", "created_at": 100,
         "metrics": [{"ts": 1, "v": 10}, {"ts": 2, "v": 20}]},
    )
    v2 = _doc_tables(
        spark, tmp_path,
        {"_id": "d1", "created_at": 200, "metrics": [{"ts": 9, "v": 90}]},
    )
    root_key_merge(cat_wh, "steps", v1)

    # crash AFTER the parent table committed its manifest, BEFORE the
    # children: fail the second materialize_upsert call
    calls = {"n": 0}
    orig = WH.materialize_upsert

    def crashing(self, name, df, unique_key, delete_keys=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-merge")
        return orig(self, name, df, unique_key, delete_keys)

    monkeypatch.setattr(WH, "materialize_upsert", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        root_key_merge(cat_wh, "steps", v2)
    monkeypatch.setattr(WH, "materialize_upsert", orig)

    # NO skew: both tables still show the v1 batch
    assert {r["v"] for r in cat_wh.read("raw.steps__metrics").collect()} == {10, 20}
    assert cat_wh.read("raw.steps").collect()[0]["created_at"] == 100

    # retry converges everywhere
    root_key_merge(cat_wh, "steps", v2)
    assert {r["v"] for r in cat_wh.read("raw.steps__metrics").collect()} == {90}
    assert cat_wh.read("raw.steps").collect()[0]["created_at"] == 200


def test_catalog_time_travel_is_cross_table_consistent(spark, tmp_path, cat_wh):
    """read_at(name, catalog_version): parent and child read at the same
    catalog version show exactly the state one transaction committed —
    even after later transactions moved both."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        root_key_merge,
    )

    v1 = _doc_tables(
        spark, tmp_path,
        {"_id": "d1", "created_at": 100,
         "metrics": [{"ts": 1, "v": 10}, {"ts": 2, "v": 20}]},
    )
    v2 = _doc_tables(
        spark, tmp_path,
        {"_id": "d1", "created_at": 200, "metrics": [{"ts": 9, "v": 90}]},
    )
    root_key_merge(cat_wh, "steps", v1)
    cv1 = cat_wh.fmt._catalog_version()
    root_key_merge(cat_wh, "steps", v2)

    # at cv1: the v1 pair, consistent across BOTH tables
    assert cat_wh.fmt.read_at("raw.steps", cv1).collect()[0]["created_at"] == 100
    assert {
        r["v"] for r in cat_wh.fmt.read_at("raw.steps__metrics", cv1).collect()
    } == {10, 20}
    # current state: the v2 pair
    assert {r["v"] for r in cat_wh.read("raw.steps__metrics").collect()} == {90}
    # history names both tables as moving together in each transaction
    hist = cat_wh.fmt.catalog_history()
    assert all(
        {"raw.steps", "raw.steps__metrics"} <= set(h["changed"])
        for h in hist
    )
    with pytest.raises(ValueError, match="no catalog version"):
        cat_wh.fmt.read_at("raw.steps", 99)


# -- round-8 hardening: review findings on the new format ------------------


def test_read_after_dropping_every_partition_is_clean_error(spark, wh):
    """Dropping ALL partitions commits an entries=[] manifest; reading it
    must be the missing-table contract (FileNotFoundError), not an
    IndexError on frames[0]."""
    df = spark.createDataFrame([Row(day="20240101", v=1), Row(day="20240102", v=2)])
    wh.materialize_incremental("stage.e", df, partition_by=("day",))
    assert wh.retention_drop("stage.e", "day", "20240103") == 2
    assert not wh.exists("stage.e")
    with pytest.raises(FileNotFoundError, match="no data"):
        wh.fmt.read("stage.e")


def test_append_never_adopts_new_partition_layout(spark, wh):
    """A partitioned append on a previously-UNPARTITIONED table must not
    mix partitions=None entries with partitioned ones: the append keeps
    the existing (empty) layout, and partition_values stays a clean []
    instead of a TypeError."""
    wh.fmt.write("stage.m", _days(spark, ("20240101", 1)), "overwrite")
    wh.fmt.write(
        "stage.m", _days(spark, ("20240102", 2)), "append", partition_by=("day",)
    )
    assert wh.fmt.partition_columns("stage.m") == []
    assert wh.fmt.partition_values("stage.m") == []
    got = {(r["day"], r["v"]) for r in wh.fmt.read("stage.m").collect()}
    assert got == {("20240101", 1), ("20240102", 2)}


def test_dynamic_partition_overwrite_rejects_unpartitioned_history(spark, wh):
    """Backfilling a table whose committed entries carry no value for the
    partition column cannot decide what to replace — it must refuse (and
    refuse BEFORE landing any data dir), not silently keep rows that
    duplicate the replaced values."""
    wh.fmt.write("stage.b", _days(spark, ("20240101", 1)), "overwrite")
    n_dirs_before = len(
        [d for d in wh.fs.list_subdirs(wh.fmt.path("stage.b")) if d.startswith("d-")]
    )
    with pytest.raises(ValueError, match="no 'day' partition value"):
        wh.fmt.dynamic_partition_overwrite(
            "stage.b", _days(spark, ("20240101", 9)), "day"
        )
    n_dirs_after = len(
        [d for d in wh.fs.list_subdirs(wh.fmt.path("stage.b")) if d.startswith("d-")]
    )
    assert n_dirs_after == n_dirs_before  # guard fired before the write


def test_aborted_transaction_versions_are_not_time_travelable(spark, cat_wh):
    """An aborted transaction's per-table manifest is an orphan no reader
    may resolve — including read_version/history: time travel must only
    serve versions some catalog version actually committed."""
    wh = cat_wh
    wh.materialize_incremental("a.t", _days(spark, ("d1", 1)), None)
    with pytest.raises(RuntimeError, match="boom"):
        with wh.fmt.transaction():
            wh.materialize_upsert("a.t", _days(spark, ("d1", 99)), "day")
            raise RuntimeError("boom")
    # the orphan v2 manifest exists in _log but was never committed
    assert wh.fmt._latest_version("a.t") == 2
    with pytest.raises(ValueError, match="never committed"):
        wh.fmt.read_version("a.t", 2)
    assert [h["version"] for h in wh.fmt.history("a.t")] == [1]
    # the committed version still travels
    assert wh.fmt.read_version("a.t", 1).collect()[0]["v"] == 1


def test_vacuum_inside_open_transaction_refuses(spark, cat_wh):
    """A pending manifest version is catalog-unreachable until the exit
    flip; vacuuming mid-transaction would reclaim it and the flip would
    then commit a pointer to a deleted manifest."""
    wh = cat_wh
    wh.materialize_incremental("a.v", _days(spark, ("d1", 1)), None)
    with wh.fmt.transaction():
        wh.materialize_upsert("a.v", _days(spark, ("d1", 2)), "day")
        with pytest.raises(RuntimeError, match="open transaction"):
            wh.fmt.vacuum("a.v")
    # the transaction itself still committed cleanly
    assert wh.read("a.v").collect()[0]["v"] == 2


# -- round-8: optimistic concurrency for the commit log --------------------


def _fmt_of(spark, root, kind):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
        ManifestFormat,
    )

    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    return cls(spark, root)


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_append_rebases_after_lost_version_cas(spark, tmp_path, kind, monkeypatch):
    """Deterministic lost race: a competing writer lands its commit
    between this writer's head read and its CAS attempt.  The append
    must REBASE onto the new head — both rows land, nothing lost."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, kind)
    other = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(
        name, version, entries, cols, txn=None, segments=None, **kw
    ):
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("b", 2)), "append")
        return orig(
            name, version, entries, cols, txn, segments=segments, **kw
        )

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    fmt.write("s.t", _days(spark, ("c", 3)), "append")

    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}


def test_catalog_append_rebases_after_lost_flip(spark, tmp_path, monkeypatch):
    """Catalog variant of the lost race at the SECOND commit point: the
    manifest CAS succeeds but another writer flips the table first, so
    the conditional flip refuses and the edit rebases — the abandoned
    manifest becomes an orphan, and no append is lost."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, "catalog")
    other = _fmt_of(spark, root, "catalog")
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = fmt._flip_if_base
    state = {"injected": False}

    def racing(name, version, base_version):
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("b", 2)), "append")
        return orig(name, version, base_version)

    monkeypatch.setattr(fmt, "_flip_if_base", racing)
    fmt.write("s.t", _days(spark, ("c", 3)), "append")

    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    # the first attempt's manifest is an orphan: unreadable via time
    # travel, reclaimable by vacuum
    committed = {h["version"] for h in fmt.history("s.t")}
    assert len(committed) < fmt._latest_version("s.t")


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_two_threaded_writers_no_lost_update(spark, tmp_path, kind):
    """Two live writers appending to ONE table concurrently: every
    append must land exactly once (the round-7 format failed loudly
    here by design; the commit loop now rebases instead)."""
    import threading

    root = str(tmp_path)
    seed = _fmt_of(spark, root, kind)
    seed.write("s.t", _days(spark, ("seed", 0)), "overwrite")

    barrier = threading.Barrier(2)
    errors = []

    def appender(writer_id):
        fmt = _fmt_of(spark, root, kind)
        try:
            barrier.wait(timeout=60)
            for i in range(3):
                fmt.write(
                    "s.t", _days(spark, (f"w{writer_id}_{i}", i)), "append"
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    rows = [r["day"] for r in seed.read("s.t").collect()]
    assert sorted(rows) == sorted(
        ["seed"] + [f"w{w}_{i}" for w in (1, 2) for i in range(3)]
    )


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_replace_aborts_on_concurrent_commit(spark, tmp_path, kind, monkeypatch):
    """replace vs concurrent write does NOT commute: the replace that
    lost the race must abort loudly (and leave the concurrent commit
    intact), never silently discard it by rebasing."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, kind)
    other = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(
        name, version, entries, cols, txn=None, segments=None, **kw
    ):
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("b", 2)), "append")
        return orig(
            name, version, entries, cols, txn, segments=segments, **kw
        )

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    with pytest.raises(RuntimeError, match="does not commute"):
        fmt.replace_atomic("s.t", _days(spark, ("c", 3)))
    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2)}  # the winner's commit survives


# -- round-8: threshold auto-compaction for the append read path -----------


def test_auto_compaction_keeps_dir_count_flat(spark, tmp_path):
    """Unbounded incremental appends must not accumulate unbounded data
    dirs: past the threshold the small-dir tail rewrites into one dir,
    so read amplification stays flat at ~threshold dirs forever."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=4)
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)
    for i in range(12):
        wh.materialize_incremental(
            "stage.c", _days(spark, (f"202401{i:02d}", i)), "day"
        )
    n_dirs = len({e["dir"] for e in fmt._manifest("stage.c")["entries"]})
    assert n_dirs <= 5  # threshold + the append that tripped it
    # nothing lost, nothing duplicated, watermark semantics intact
    got = {(r["day"], r["v"]) for r in wh.read("stage.c").collect()}
    assert got == {(f"202401{i:02d}", i) for i in range(12)}
    wh.materialize_incremental(
        "stage.c", _days(spark, ("20240100", 99), ("20240120", 20)), "day"
    )
    got = {(r["day"], r["v"]) for r in wh.read("stage.c").collect()}
    assert ("20240100", 99) not in got and ("20240120", 20) in got


def test_auto_compaction_disabled_and_below_threshold(spark, tmp_path):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)
    for i in range(6):
        wh.materialize_incremental(
            "stage.d", _days(spark, (f"202401{i:02d}", i)), "day"
        )
    assert len({e["dir"] for e in fmt._manifest("stage.d")["entries"]}) == 6
    assert fmt.maybe_compact("stage.d") == 0  # disabled

    fmt2 = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=16)
    assert fmt2.maybe_compact("stage.d") == 0  # 6 dirs <= 16


def test_auto_compaction_leaves_fullsize_dirs_alone(spark, tmp_path):
    """Dirs at/above the target file size never rewrite — the policy's
    cost is O(small tail), not O(table)."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=2)
    for i in range(4):
        fmt.write(
            "stage.f",
            _days(spark, (f"202401{i:02d}", i)),
            "append" if i else "overwrite",
        )
    # every dir counts as "full-size" under a 1-byte target -> no-op
    assert fmt.maybe_compact("stage.f", target_file_bytes=1) == 0
    assert len({e["dir"] for e in fmt._manifest("stage.f")["entries"]}) == 4
    # under the real target all four are small -> one dir remains
    assert fmt.maybe_compact("stage.f") == 4
    assert len({e["dir"] for e in fmt._manifest("stage.f")["entries"]}) == 1
    got = {(r["day"], r["v"]) for r in fmt.read("stage.f").collect()}
    assert got == {(f"202401{i:02d}", i) for i in range(4)}


# -- round-8: genuinely-separate-session recovery drill ---------------------


_DRILL = r"""
import sys

root, kind, repo = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)

fmt = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind](
    spark, root
)
# 1. the crashed session's half-done work is invisible: only committed
#    state reads
rows = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
assert rows == {("a", 1)}, rows
if kind == "catalog":
    try:
        fmt.read_version("s.t", 2)
        raise SystemExit("aborted-transaction manifest was readable")
    except ValueError:
        pass
# 2. vacuum reclaims the crash leftovers from a fresh process
removed = fmt.vacuum("s.t", writer_grace_s=0)
assert removed >= 1, f"expected orphan dirs reclaimed, got {removed}"
# 3. this session can commit on top
fmt.write(
    "s.t",
    spark.createDataFrame([("b", 2)], "day string, v bigint"),
    "append",
)
rows = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
assert rows == {("a", 1), ("b", 2)}, rows
print("DRILL_OK")
"""


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_separate_session_recovery_drill(spark, tmp_path, kind):
    """The pointer protocol must carry NO in-memory state: a SUBPROCESS
    with its own SparkSession opens the warehouse mid-crash (orphan data
    dir; for the catalog format also an aborted transaction's orphan
    manifest), sees only committed data, vacuums the leftovers, and
    commits on top — then this session reads the subprocess's commit."""
    import subprocess
    import sys

    root = str(tmp_path / "wh")
    fmt = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    # crash leftovers: an uncommitted data dir (died before commit) ...
    fmt._new_data_dir("s.t", _days(spark, ("zz", 99)), ())
    if kind == "catalog":
        # ... and an aborted transaction's orphan manifest (v2)
        with pytest.raises(RuntimeError, match="boom"):
            with fmt.transaction():
                fmt.replace_atomic("s.t", _days(spark, ("zz", 99)))
                raise RuntimeError("boom")

    script = tmp_path / "drill.py"
    script.write_text(_DRILL)
    proc = subprocess.run(
        [
            sys.executable,
            str(script),
            root,
            kind,
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRILL_OK" in proc.stdout
    # back in THIS session: the subprocess's append is visible
    rows = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert rows == {("a", 1), ("b", 2)}


# -- round-8: manifest-level data skipping (file-skipping stats) ------------


def test_entry_stats_recorded_and_read_where_prunes(spark, tmp_path):
    """Per-entry min/max stats land in the manifest at write time; a
    range read prunes non-intersecting entries BEFORE any file listing
    and returns exactly what a full-scan filter would."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    # five appends with disjoint v ranges — a time-ordered append stream
    for i in range(5):
        fmt.write(
            "s.t",
            spark.createDataFrame(
                [(f"d{i}_{j}", i * 100 + j) for j in range(10)],
                "day string, v long",
            ),
            "append" if i else "overwrite",
        )
    m = fmt._manifest("s.t")
    assert all(e.get("stats", {}).get("v") for e in m["entries"])

    kept, _ = fmt.prune_entries("s.t", "v", lo=205, hi=260)
    assert len(kept) == 1  # only the [200, 209] entry intersects
    got = {r["v"] for r in fmt.read_where("s.t", "v", 205, 260).collect()}
    want = {
        r["v"]
        for r in fmt.read("s.t").filter("v between 205 and 260").collect()
    }
    assert got == want == {205, 206, 207, 208, 209}

    # no intersection at all: empty result, correct schema, no error
    none = fmt.read_where("s.t", "v", 9000, 9999)
    assert none.count() == 0 and none.columns == ["day", "v"]


def test_stats_pruning_is_safe_for_statless_entries(spark, tmp_path):
    """Entries written BEFORE the column joined stats_cols (or with
    all-NULL values) carry no stats — pruning must keep them, never
    silently drop their rows."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    bare = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    bare.write(
        "s.t",
        spark.createDataFrame([("old", 42)], "day string, v long"),
        "overwrite",
    )
    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    fmt.write(
        "s.t",
        spark.createDataFrame([("new", 7)], "day string, v long"),
        "append",
    )
    # range far from the stat-less entry's actual value: it is still
    # read (kept), and the row filter removes it — results stay exact
    got = {r["day"] for r in fmt.read_where("s.t", "v", 0, 10).collect()}
    assert got == {"new"}
    kept, _ = fmt.prune_entries("s.t", "v", 0, 10)
    assert len(kept) == 2  # stat-less entry kept, stats entry intersects

    # all-NULL stats column: entry kept (min/max are None)
    fmt.write(
        "s.t",
        spark.createDataFrame([("nul", None)], "day string, v long"),
        "append",
    )
    kept, _ = fmt.prune_entries("s.t", "v", 9000, 9999)
    names = {r["day"] for r in fmt.read_where("s.t", "v", 0, 50).collect()}
    assert names == {"old", "new"}  # NULL v never matches a range filter


def test_stats_survive_partitioned_writes_and_compaction(spark, tmp_path):
    """Partitioned entries get per-LEAF stats; auto-compaction rewrites
    recompute stats for the merged dir (same write path)."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=2, stats_cols=("v",)
    )
    fmt.write(
        "s.p",
        spark.createDataFrame(
            [("20240101", 1), ("20240101", 5), ("20240102", 100)],
            "day string, v long",
        ),
        "overwrite",
        partition_by=("day",),
    )
    m = fmt._manifest("s.p")
    by_day = {e["partitions"]["day"]: e["stats"]["v"] for e in m["entries"]}
    assert by_day == {"20240101": [1, 5], "20240102": [100, 100]}

    # three more appends trip the threshold; the compacted dir's entries
    # carry fresh stats
    for i, v in enumerate((7, 8, 9)):
        fmt.write(
            "s.p",
            spark.createDataFrame([("20240103", v)], "day string, v long"),
            "append",
        )
    assert fmt.maybe_compact("s.p") >= 2  # the policy entry point
    m = fmt._manifest("s.p")
    assert len({e["dir"] for e in m["entries"]}) <= 2
    assert all(e.get("stats", {}).get("v") for e in m["entries"])
    got = {r["v"] for r in fmt.read_where("s.p", "v", 6, 10).collect()}
    assert got == {7, 8, 9}


# -- round-8: append-only change feed (CDC read) ----------------------------


def _feed_fmt(spark, tmp_path, **kw):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    return ManifestFormat(spark, str(tmp_path), **kw)


def test_change_feed_pure_appends(spark, tmp_path):
    fmt = _feed_fmt(spark, tmp_path, auto_compact_dirs=None)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")  # v1
    fmt.write("s.t", _days(spark, ("b", 2)), "append")  # v2
    fmt.write("s.t", _days(spark, ("c", 3)), "append")  # v3
    assert {r["day"] for r in fmt.read_changes("s.t", 1).collect()} == {"b", "c"}
    assert {r["day"] for r in fmt.read_changes("s.t", 1, 2).collect()} == {"b"}
    assert {r["day"] for r in fmt.read_changes("s.t", 2).collect()} == {"c"}
    # empty delta: correct schema, zero rows
    empty = fmt.read_changes("s.t", 3, 3)
    assert empty.count() == 0 and empty.columns == ["day", "v"]


def test_change_feed_survives_pre_feed_compaction(spark, tmp_path):
    """Compacting dirs that were all visible at the feed's last-read
    version must NOT re-emit their rows: provenance marks the compacted
    dir as old content in a new coat."""
    fmt = _feed_fmt(spark, tmp_path, auto_compact_dirs=2)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")  # v1
    fmt.write("s.t", _days(spark, ("b", 2)), "append")  # v2
    since = fmt._latest_version("s.t")
    assert fmt.maybe_compact("s.t") == 0  # 2 dirs <= threshold: no-op
    fmt.write("s.t", _days(spark, ("c", 3)), "append")  # v3: 3 dirs
    assert fmt.maybe_compact("s.t") == 3  # all small -> one dir (v4)
    # the feed across the compaction: ONLY the post-since append... but
    # c was absorbed together with a+b -> entry-inseparable -> refuse
    with pytest.raises(ValueError, match="mixed"):
        fmt.read_changes("s.t", since)

    # the separable case: compaction strictly of pre-since content
    fmt2 = _feed_fmt(spark, tmp_path / "w2", auto_compact_dirs=None)
    fmt2.write("s.t", _days(spark, ("a", 1)), "overwrite")  # v1
    fmt2.write("s.t", _days(spark, ("b", 2)), "append")  # v2
    since = fmt2._latest_version("s.t")
    fmt2.auto_compact_dirs = 1
    assert fmt2.maybe_compact("s.t") == 2  # v3 compacts ONLY a+b
    fmt2.write("s.t", _days(spark, ("c", 3)), "append")  # v4
    got = {r["day"] for r in fmt2.read_changes("s.t", since).collect()}
    assert got == {"c"}
    # full read still exact after the dance
    assert {r["day"] for r in fmt2.read("s.t").collect()} == {"a", "b", "c"}


def test_change_feed_resolves_chained_compactions(spark, tmp_path):
    """Provenance is flattened to ORIGINAL append dirs, so a feed whose
    since-manifest already holds compaction output still judges later
    re-compactions correctly."""
    fmt = _feed_fmt(spark, tmp_path, auto_compact_dirs=None)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    fmt.write("s.t", _days(spark, ("b", 2)), "append")
    fmt.auto_compact_dirs = 1
    assert fmt.maybe_compact("s.t") == 2  # c1 = compact(a, b)
    fmt.write("s.t", _days(spark, ("c", 3)), "append")
    assert fmt.maybe_compact("s.t") == 2  # c2 = compact(c1, c) — chained
    since = fmt._latest_version("s.t")
    fmt.write("s.t", _days(spark, ("d", 4)), "append")
    got = {r["day"] for r in fmt.read_changes("s.t", since).collect()}
    assert got == {"d"}
    # and a feed that lagged across the chained compaction refuses
    with pytest.raises(ValueError, match="mixed"):
        fmt.read_changes("s.t", 3)  # since = c1-era manifest


def test_change_feed_refuses_rewritten_history(spark, tmp_path):
    fmt = _feed_fmt(spark, tmp_path, auto_compact_dirs=None)
    df = spark.createDataFrame(
        [Row(day="20240101", v=1), Row(day="20240102", v=2)]
    )
    fmt.write("s.r", _days(spark, ("a", 1)), "overwrite")
    since = fmt._latest_version("s.r")
    fmt.replace_atomic("s.r", _days(spark, ("z", 9)))
    with pytest.raises(ValueError, match="rewritten"):
        fmt.read_changes("s.r", since)

    # retention drop: also not an append delta
    fmt.write("s.p", df, "overwrite", partition_by=("day",))
    since = fmt._latest_version("s.p")
    assert fmt.drop_partitions_below("s.p", "day", "20240102") == 1
    with pytest.raises(ValueError, match="rewritten"):
        fmt.read_changes("s.p", since)


# -- round-8: range-clustered rewrite (file-level skipping) -----------------


def test_cluster_gives_file_level_skipping(spark, tmp_path):
    """Rewriting range-clustered on a column makes it skippable
    regardless of ingest order: per-FILE entries carry near-disjoint
    min/max, and a narrow range read prunes to a fraction of the
    files while returning exactly the full-scan-filter result."""
    from pyspark.sql import Row as R

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    import random

    rng = random.Random(42)
    vals = list(range(1000))
    rng.shuffle(vals)  # ingest order uncorrelated with v
    df = spark.createDataFrame(
        [R(day=f"d{i}", v=v) for i, v in enumerate(vals)]
    )
    fmt.write("s.c", df, "overwrite")
    n = fmt.cluster("s.c", "v", n_files=8)
    assert n == 8
    m = fmt._manifest("s.c")
    assert len(m["entries"]) == 8 and all(e["rel"] for e in m["entries"])
    # near-disjoint ranges: a 50-wide window intersects ~1 of 8 files
    kept, _ = fmt.prune_entries("s.c", "v", 100, 149)
    assert len(kept) <= 2
    got = {r["v"] for r in fmt.read_where("s.c", "v", 100, 149).collect()}
    assert got == set(range(100, 150))
    # full read unchanged
    assert fmt.read("s.c").count() == 1000


def test_cluster_preserves_change_feed_and_rejects_partitioned(spark, tmp_path):
    from pyspark.sql import Row as R

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    fmt.write("s.f", _days(spark, ("a", 1), ("b", 2)), "overwrite")
    since = fmt._latest_version("s.f")
    fmt.cluster("s.f", "v", n_files=2)  # content-preserving rewrite
    fmt.write("s.f", _days(spark, ("c", 3)), "append")
    # the feed sees ONLY the append — the clustered rewrite is absorbed
    got = {r["day"] for r in fmt.read_changes("s.f", since).collect()}
    assert got == {"c"}

    fmt.write(
        "s.p",
        spark.createDataFrame([R(day="20240101", v=1)]),
        "overwrite",
        partition_by=("day",),
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        fmt.cluster("s.p", "v")


# -- round-8: idempotent streaming appends (txn watermarks) -----------------


def test_streaming_batch_write_is_idempotent(spark, tmp_path):
    """A replayed foreachBatch id must no-op: the per-app watermark
    commits inside the same CAS as the data."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    assert fmt.write_streaming_batch("s.t", _days(spark, ("a", 1)), 0)
    assert fmt.write_streaming_batch("s.t", _days(spark, ("b", 2)), 1)
    # replays (crash between sink write and stream commit)
    assert not fmt.write_streaming_batch("s.t", _days(spark, ("b", 2)), 1)
    assert not fmt.write_streaming_batch("s.t", _days(spark, ("a", 1)), 0)
    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2)}
    # independent apps track independently
    assert fmt.write_streaming_batch("s.t", _days(spark, ("c", 3)), 0, "app2")
    assert fmt.read("s.t").count() == 3


def test_streaming_txn_watermark_survives_compaction(spark, tmp_path):
    """Every rebaseable edit carries the txn watermarks forward — a
    compaction between a batch and its replay must not reopen the
    exactly-once window."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=1)
    fmt.write_streaming_batch("s.t", _days(spark, ("a", 1)), 0)
    fmt.write_streaming_batch("s.t", _days(spark, ("b", 2)), 1)
    assert fmt.maybe_compact("s.t") == 2
    assert not fmt.write_streaming_batch("s.t", _days(spark, ("b", 2)), 1)
    assert fmt.read("s.t").count() == 2


def test_streaming_manifest_sink_end_to_end(spark, tmp_path):
    """File stream -> foreachBatch -> manifest commits -> change feed:
    two drains land two deltas; the feed between them is exactly the
    second drain's rows."""
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingManifestSink,
    )

    src = tmp_path / "facts"
    _days(spark, ("a", 1)).coalesce(1).write.mode("append").parquet(str(src))
    sink = StreamingManifestSink(
        spark, str(tmp_path / "wh"), str(src), "raw.ev"
    )
    sink.run_once()
    v1 = sink.fmt._latest_version("raw.ev")
    _days(spark, ("b", 2), ("c", 3)).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    sink.run_once()
    assert {r["day"] for r in sink.read().collect()} == {"a", "b", "c"}
    delta = sink.fmt.read_changes("raw.ev", v1)
    assert {r["day"] for r in delta.collect()} == {"b", "c"}


# -- round-8: time-based vacuum retention -----------------------------------


def test_vacuum_keep_hours_retention(spark, tmp_path, monkeypatch):
    """Delta's RETAIN n HOURS: versions committed within the window
    survive vacuum even past keep_last; once the clock moves on, only
    the keep_last policy holds."""
    import time as time_mod

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")  # v1
    fmt.write("s.t", _days(spark, ("b", 2)), "append")  # v2
    fmt.write("s.t", _days(spark, ("c", 3)), "append")  # v3
    # everything is seconds old: the 24h window retains all versions
    assert fmt.vacuum("s.t", keep_last=1, keep_hours=24) == 0
    assert fmt.read_version("s.t", 1).count() == 1  # still travelable

    # two days later the window is empty; keep_last=1 prevails
    real_now = time_mod.time()
    monkeypatch.setattr(time_mod, "time", lambda: real_now + 48 * 3600)
    removed = fmt.vacuum("s.t", keep_last=1, keep_hours=24, writer_grace_s=0)
    assert removed == 0  # v3 references all three dirs (append chain)
    with pytest.raises(ValueError):
        fmt.read_version("s.t", 1)  # manifest pruned
    assert fmt.read("s.t").count() == 3  # current table intact


def test_warehouse_passthroughs_and_format_guard(spark, tmp_path):
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)
    wh.materialize_incremental("s.t", _days(spark, ("a", 1)), "day")
    v1 = fmt._latest_version("s.t")
    wh.materialize_incremental("s.t", _days(spark, ("b", 2)), "day")
    assert {r["day"] for r in wh.read_changes("s.t", v1).collect()} == {"b"}
    assert wh.read_where("s.t", "v", 2, 2).count() == 1
    assert wh.cluster("s.t", "v", n_files=1) == 1
    assert wh.vacuum("s.t", writer_grace_s=0) >= 1

    plain = Warehouse(spark, str(tmp_path / "pq"))
    plain.materialize_incremental("s.t", _days(spark, ("a", 1)), "day")
    with pytest.raises(NotImplementedError, match="commit-log"):
        plain.read_changes("s.t", 1)


def test_vacuum_catalog_prunes_pointer_files(spark, cat_wh):
    """The catalog's own c*.json files are pruned on a keep-last policy
    — commit cost must not grow with warehouse age — while the current
    state and the retained time-travel window stay readable."""
    wh = cat_wh
    for i in range(6):
        wh.materialize_upsert("a.t", _days(spark, ("d1", i)), "day")
    fmt = wh.fmt
    assert fmt._catalog_version() == 6
    assert fmt.vacuum_catalog(keep_last=2) == 4
    assert wh.read("a.t").collect()[0]["v"] == 5  # current intact
    assert fmt.read_at("a.t", 6).collect()[0]["v"] == 5  # kept window
    with pytest.raises(ValueError, match="no catalog version"):
        fmt.read_at("a.t", 1)  # pruned window
    with pytest.raises(ValueError, match="never committed"):
        fmt.read_version("a.t", 1)  # unreachable from kept files
    assert fmt.read_version("a.t", 6).count() == 1
    # refused mid-transaction (pending pointers not yet in any file)
    with fmt.transaction():
        wh.materialize_upsert("a.t", _days(spark, ("d1", 99)), "day")
        with pytest.raises(RuntimeError, match="open transaction"):
            fmt.vacuum_catalog()
    assert wh.read("a.t").collect()[0]["v"] == 99


def test_new_verbs_work_on_catalog_format(spark, tmp_path):
    """Data skipping, the change feed, and idempotent streaming appends
    all resolve through the catalog pointer (overridden _manifest), so
    the round-8 verbs must behave identically on the catalog format —
    including read-your-writes inside a transaction."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )

    fmt = CatalogManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    fmt.write("s.t", _days(spark, ("a", 1), ("b", 2)), "overwrite")
    since = int(fmt._manifest("s.t")["version"])
    # idempotent streaming append + replay
    assert fmt.write_streaming_batch("s.t", _days(spark, ("c", 30)), 0)
    assert not fmt.write_streaming_batch("s.t", _days(spark, ("c", 30)), 0)
    # change feed via the catalog-resolved head
    got = {r["day"] for r in fmt.read_changes("s.t", since).collect()}
    assert got == {"c"}
    # stats skipping: the appended entry carries stats; prune to it
    kept, m = fmt.prune_entries("s.t", "v", 25, 35)
    assert len(kept) == 1 and len(m["entries"]) == 2
    assert {r["day"] for r in fmt.read_where("s.t", "v", 25, 35).collect()} == {
        "c"
    }
    # clustering commits through the catalog flip
    assert fmt.cluster("s.t", "v", n_files=2) == 2
    assert fmt.read("s.t").count() == 3
    # a transaction sees its own pending writes through every new verb
    with fmt.transaction():
        fmt.write("s.t", _days(spark, ("d", 4)), "append")
        assert fmt.read("s.t").count() == 4  # read-your-writes
    assert fmt.read("s.t").count() == 4


def test_cluster_and_skipping_handle_nulls(spark, tmp_path):
    """NULLs in the clustered column: range repartitioning groups them
    into some file whose stats may be [None, None]; pruning must KEEP
    such entries (unknown range) and the row-level filter then drops
    the NULLs — results stay exact, never a crash or a lost row."""
    from pyspark.sql import Row as R

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    rows = [R(day=f"d{i}", v=i) for i in range(100)] + [
        R(day=f"n{i}", v=None) for i in range(10)
    ]
    fmt.write("s.n", spark.createDataFrame(rows), "overwrite")
    fmt.cluster("s.n", "v", n_files=4)
    got = {r["v"] for r in fmt.read_where("s.n", "v", 10, 19).collect()}
    assert got == set(range(10, 20))
    # the NULL rows are still in the table (full read), just never in
    # a range result
    assert fmt.read("s.n").count() == 110
    assert fmt.read("s.n").filter("v IS NULL").count() == 10


# -- round-9: CAS target anchored to the read base (ADVICE r8 #1) ----------


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_append_racing_commit_after_base_read_rebases(
    spark, tmp_path, kind, monkeypatch
):
    """The ADVICE r8 #1 hole: a commit landing BETWEEN _commit_edit's
    head read and its CAS.  A re-listed CAS target (_latest_version+1)
    slides past the concurrent version and silently discards its
    entries; the base-anchored target collides and rebases — all three
    rows must land."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, kind)
    other = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = type(fmt)._manifest
    state = {"calls": 0, "injected": False}

    def racing_manifest(self, name, version=None, resolve=True):
        m = orig(self, name, version, resolve=resolve)
        state["calls"] += 1
        # call 1 = write()'s layout read; call 2 = _commit_edit's head
        # read — inject the concurrent commit right after it
        if state["calls"] == 2 and not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("b", 2)), "append")
        return m

    monkeypatch.setattr(type(fmt), "_manifest", racing_manifest)
    fmt.write("s.t", _days(spark, ("c", 3)), "append")
    monkeypatch.undo()

    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_replace_racing_append_during_data_write_aborts(
    spark, tmp_path, kind, monkeypatch
):
    """A replace whose data write overlaps a concurrent append must
    abort loudly (stale base), never commit past the append — the
    silent-discard path ADVICE r8 #1 names for the non-rebaseable
    verbs."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, kind)
    other = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("b", 2)), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    with pytest.raises(RuntimeError, match="does not commute"):
        fmt.replace_atomic("s.t", _days(spark, ("c", 3)))
    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2)}  # the append survives


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_cluster_racing_append_rebases_not_discards(
    spark, tmp_path, kind, monkeypatch
):
    """cluster()'s stale window spans the whole range-shuffle rewrite —
    the worst case in ADVICE r8 #1.  Round 13 (optimistic concurrency):
    a BLIND append landing mid-rewrite rebases over the commit — the
    clustered files land AND the late entry survives unclustered
    beside them (the "cluster then append" serialization; Delta
    OPTIMIZE commutes with appends the same way)."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, kind)
    other = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    fmt.write("s.t", _days(spark, ("b", 2)), "append")

    orig = fmt.read
    state = {"injected": False}

    def racing(name):
        out = orig(name)
        # the rewrite's source snapshot is taken; the append lands
        # while the range shuffle is still "running"
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("late", 9)), "append")
        return out

    monkeypatch.setattr(fmt, "read", racing)
    assert fmt.cluster("s.t", "v", n_files=2) == 2
    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("a", 1), ("b", 2), ("late", 9)}
    # the clustered files carry per-file stats; the late entry rode
    # the rebase and sits beside them
    entries = fmt._manifest("s.t")["entries"]
    clustered = [e for e in entries if e.get("sources")]
    assert len(clustered) == 2 and len(entries) == 3


def test_vacuum_writer_grace_protects_inflight_dirs(spark, tmp_path, monkeypatch):
    """Every write verb lands its d-* data dir BEFORE its CAS commit, so
    a vacuum racing an in-flight writer must NOT delete young
    unreferenced dirs (ADVICE r8 #3) — only once the grace window has
    passed is an uncommitted dir fair game."""
    from iot_elt_airflow_mongo_timescaledb_spark.fs import join_uri

    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    # simulate an in-flight writer: data landed, CAS not yet
    _days(spark, ("inflight", 9)).write.parquet(
        join_uri(fmt.path("s.t"), "d-00000000inflight")
    )
    assert fmt.vacuum("s.t") == 0  # default grace: young dir survives
    # after the grace window an uncommitted dir is reclaimable
    monkeypatch.setattr(fmt.fs, "mtime", lambda uri: 0.0)
    assert fmt.vacuum("s.t") == 1


def test_read_changes_both_versions_empty_is_clean_error(spark, tmp_path):
    """An entry-less pair of versions has no file to derive a schema
    from: read_changes must refuse with the same FileNotFoundError
    contract as read(), not IndexError inside _read_entries (ADVICE r8
    #4)."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write(
        "s.t",
        _days(spark, ("20240101", 1)),
        "overwrite",
        partition_by=("day",),
    )
    assert fmt.drop_partitions_below("s.t", "day", "99999999") == 1
    v = fmt._latest_version("s.t")
    assert fmt._manifest("s.t", v)["entries"] == []
    with pytest.raises(FileNotFoundError, match="no schema"):
        fmt.read_changes("s.t", since_version=v, to_version=v)


def test_stats_pruning_domain_safety(spark, tmp_path):
    """ADVICE r8 #5: str()-encoded non-native stats (Decimal) must
    never drive pruning ('9' > '10' lexicographically), cross-domain
    bounds must keep entries instead of raising TypeError, and
    datetime bounds must prune correctly against the ISO-stored
    timestamp stats."""
    import datetime
    from decimal import Decimal

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("d", "ts")
    )
    rows = [
        (Decimal("9"), datetime.datetime(2024, 1, 1, 8)),
        (Decimal("10"), datetime.datetime(2024, 1, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "d decimal(10,0), ts timestamp")
    fmt.write("s.t", df, "overwrite")
    later = spark.createDataFrame(
        [(Decimal("100"), datetime.datetime(2024, 2, 1, 9))],
        "d decimal(10,0), ts timestamp",
    )
    fmt.write("s.t", later, "append")

    # Decimal stats are opaque-tagged: NO pruning, both entries kept —
    # the old lexicographic compare ('10' < '9') silently dropped the
    # matching entry here
    kept, _ = fmt.prune_entries("s.t", "d", lo=10, hi=None)
    assert len(kept) == 2
    got = {int(r["d"]) for r in fmt.read_where("s.t", "d", 10, None).collect()}
    assert got == {10, 100}

    # cross-domain bound (numeric vs ISO-string ts stats): keep, no
    # TypeError
    kept, _ = fmt.prune_entries("s.t", "ts", lo=5, hi=None)
    assert len(kept) == 2

    # datetime bounds DO prune against the ISO-stored stats
    kept, _ = fmt.prune_entries(
        "s.t", "ts", lo=datetime.datetime(2024, 1, 15), hi=None
    )
    assert len(kept) == 1
    got = {
        r["ts"]
        for r in fmt.read_where(
            "s.t", "ts", datetime.datetime(2024, 1, 15), None
        ).collect()
    }
    assert got == {datetime.datetime(2024, 2, 1, 9)}


_CONCURRENT_WRITER = r"""
import sys
import time

root, kind, repo, wid = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)

fmt = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind](
    spark, root
)
# rendezvous: report ready, then spin until the parent fires the gun so
# both writers' append loops genuinely overlap
open(f"{root}/ready_{wid}", "w").write("")
deadline = time.time() + 120
while time.time() < deadline:
    import os

    if os.path.exists(f"{root}/go"):
        break
    time.sleep(0.05)
else:
    raise SystemExit("rendezvous timeout")
for i in range(4):
    fmt.write(
        "s.t",
        spark.createDataFrame([(f"w{wid}_{i}", i)], "day string, v bigint"),
        "append",
    )
print("WRITER_OK")
"""


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_two_process_writers_no_lost_update(spark, tmp_path, kind):
    """VERDICT r8 task 4: the CAS's create-exclusive atomicity claim,
    proven ACROSS PROCESSES (two JVMs, two Python drivers) — the
    threaded drill shares one JVM and could mask per-process FS state.
    Both writers' appends must all land; versions strictly ordered."""
    import subprocess
    import sys
    import time

    root = str(tmp_path / "wh")
    fmt = _fmt_of(spark, root, kind)
    fmt.write("s.t", _days(spark, ("seed", 0)), "overwrite")

    script = tmp_path / "writer.py"
    script.write_text(_CONCURRENT_WRITER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), root, kind, repo, wid],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for wid in ("a", "b")
    ]
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.exists(f"{root}/ready_a") and os.path.exists(
            f"{root}/ready_b"
        ):
            break
        time.sleep(0.2)
    else:
        for p in procs:
            p.kill()
        raise AssertionError("writers never reached the rendezvous")
    open(f"{root}/go", "w").write("")
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "WRITER_OK" in out

    rows = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    want = {("seed", 0)} | {
        (f"w{w}_{i}", i) for w in ("a", "b") for i in range(4)
    }
    assert rows == want

    committed = sorted(h["version"] for h in fmt.history("s.t"))
    assert len(committed) == 9  # seed + 8 appends, none lost
    if kind == "manifest":
        # no catalog layer: versions are exactly the contiguous CAS chain
        assert committed == list(range(1, 10))
    # every committed version is readable and entry counts are strictly
    # monotone — each commit added exactly one entry on top of its base
    counts = [
        len(fmt._manifest("s.t", v)["entries"]) for v in committed
    ]
    assert counts == sorted(set(counts)) == list(range(1, 10))


def test_streaming_replay_races_compaction_of_its_own_batch(
    spark, tmp_path, monkeypatch
):
    """VERDICT r8 task 6: a replayed streaming batch racing a
    compaction of the very dirs the original batch landed in.  Writer B
    re-runs batch 2 (at-least-once retry); after B's top watermark
    check, writer A commits batch 2 AND auto-compaction absorbs its
    dir.  B's edit must no-op against the post-compaction head (the
    watermark rides the compaction edit), B's landed dir becomes a
    vacuumable orphan, and the change feed's flattened provenance still
    resolves across the whole interleaving."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    root = str(tmp_path)
    a = ManifestFormat(spark, root, auto_compact_dirs=1)
    b = ManifestFormat(spark, root, auto_compact_dirs=1)
    assert a.write_streaming_batch("s.t", _days(spark, ("b0", 0)), 0)
    v_after_b0 = a._latest_version("s.t")
    assert a.write_streaming_batch("s.t", _days(spark, ("b1", 1)), 1)

    orig = type(b)._manifest
    state = {"calls": 0, "injected": False}

    def racing_manifest(self, name, version=None, resolve=True):
        state["calls"] += 1
        # call 1 = B's top watermark check (sees watermark 1 -> batch 2
        # is new); call 2 = B's _commit_edit head read — A's commit AND
        # the compaction land in between
        if state["calls"] == 2 and not state["injected"]:
            state["injected"] = True
            assert a.write_streaming_batch(
                "s.t", _days(spark, ("b2", 2)), 2
            )
            assert a.maybe_compact("s.t") >= 2
        return orig(self, name, version, resolve=resolve)

    monkeypatch.setattr(type(b), "_manifest", racing_manifest)
    committed = b.write_streaming_batch("s.t", _days(spark, ("b2", 2)), 2)
    monkeypatch.undo()
    assert committed is False  # recognized replay, no double-land

    rows = {(r["day"], r["v"]) for r in a.read("s.t").collect()}
    assert rows == {("b0", 0), ("b1", 1), ("b2", 2)}
    # a feed window the compaction STRADDLES (b0 was pre-feed, b1/b2
    # post-feed, all three absorbed into one dir) refuses loudly with
    # the documented resync guidance — never a silent wrong delta
    with pytest.raises(ValueError, match="mixed pre- and post-feed"):
        a.read_changes("s.t", since_version=v_after_b0)
    # and after the race the provenance bookkeeping is coherent: a
    # non-straddling window resolves exactly
    head = a._latest_version("s.t")
    assert a.write_streaming_batch("s.t", _days(spark, ("b3", 3)), 3)
    got = {
        (r["day"], r["v"])
        for r in a.read_changes("s.t", since_version=head).collect()
    }
    assert got == {("b3", 3)}
    # B's abandoned data dir is an orphan vacuum reclaims
    assert a.vacuum("s.t", writer_grace_s=0) >= 1
    assert {(r["day"], r["v"]) for r in a.read("s.t").collect()} == rows | {
        ("b3", 3)
    }


def test_read_where_multi_column_conjunction(spark, tmp_path):
    """VERDICT r8 task 9: skipping on a CONJUNCTION of ranges — the
    per-column stats already exist, so an AND of intervals must prune
    the intersection (entries surviving every column's test) and
    return exactly the full-scan filter result."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("a", "b")
    )
    # 4 appends: a-ranges [0..9],[10..19],[20..29],[30..39]; b = 100-a
    for i in range(4):
        fmt.write(
            "s.t",
            spark.createDataFrame(
                [(i * 10 + j, 100 - (i * 10 + j)) for j in range(10)],
                "a long, b long",
            ),
            "append" if i else "overwrite",
        )
    # a>=15 keeps entries 1,2,3; b>=75 (a<=25) keeps entries 0,1,2;
    # the conjunction keeps exactly entries 1,2
    kept, _ = fmt.prune_entries("s.t", {"a": (15, None), "b": (75, None)})
    assert len(kept) == 2
    got = {
        r["a"]
        for r in fmt.read_where(
            "s.t", {"a": (15, None), "b": (75, None)}
        ).collect()
    }
    want = {
        r["a"]
        for r in fmt.read("s.t").filter("a >= 15 and b >= 75").collect()
    }
    assert got == want == set(range(15, 26))

    # disjoint conjunction: zero entries, empty frame, correct schema
    none = fmt.read_where("s.t", {"a": (None, 5), "b": (None, 65)})
    assert none.count() == 0 and none.columns == ["a", "b"]

    # single-column call shape unchanged
    got1 = {r["a"] for r in fmt.read_where("s.t", "a", 35, None).collect()}
    assert got1 == set(range(35, 40))


def test_cluster_zorder_prunes_in_both_dims(spark, tmp_path):
    """Z-order rewrite (multi-column OPTIMIZE ZORDER BY): after
    clustering on (x, y), a conjunction of narrow ranges over BOTH
    columns prunes to a small fraction of the files — where the 1-D
    x-sort prunes nothing for a y-only range.  Results always equal
    the full-scan filter."""
    import random

    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 9999), rng.randint(0, 9999)) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    root_z = str(tmp_path / "z")
    fz = ManifestFormat(spark, root_z, auto_compact_dirs=None)
    fz.write("s.t", df, "overwrite")
    n = fz.cluster_zorder("s.t", ("x", "y"), n_files=16)
    assert n >= 8  # near the requested file count

    # quarter-range in both dims -> ~1/16 of the area; z-locality must
    # keep it well under half the files
    bounds = {"x": (0, 2500), "y": (0, 2500)}
    kept, _ = fz.prune_entries("s.t", bounds)
    assert len(kept) <= n // 2, (len(kept), n)
    got = {r["id"] for r in fz.read_where("s.t", bounds).collect()}
    want = {
        r["id"]
        for r in fz.read("s.t")
        .filter("x between 0 and 2500 and y between 0 and 2500")
        .collect()
    }
    assert got == want and len(want) > 0

    # y-only narrow range also prunes under z-order...
    kept_y, _ = fz.prune_entries("s.t", "y", 0, 1200)
    assert len(kept_y) < n
    # ...whereas a 1-D x-sort cannot skip anything for it (y stats ARE
    # recorded per file via stats_cols — they just all span everything)
    root_x = str(tmp_path / "x1d")
    fx = ManifestFormat(
        spark, root_x, auto_compact_dirs=None, stats_cols=("y",)
    )
    fx.write("s.t", df, "overwrite")
    nx = fx.cluster("s.t", "x", n_files=16)
    assert all(
        (e.get("stats") or {}).get("y")
        for e in fx._manifest("s.t")["entries"]
    )
    kept_x, _ = fx.prune_entries("s.t", "y", 0, 1200)
    assert len(kept_x) == nx  # every file spans the full y range

    # guardrails
    with pytest.raises(ValueError, match=">= 2 columns"):
        fz.cluster_zorder("s.t", ("x",))


def test_torn_head_manifest_clear_error_and_repair(spark, tmp_path):
    """A writer dying between its create-exclusive and its body write
    leaves a TORN head version file.  Within the in-flight grace it is
    indistinguishable from a HEALTHY writer mid-body-write, so readers
    fall back to the previous committed version (the r9 reader-race
    fix); once the file outlives the grace it is a corpse: reads raise
    the clear repair error, repair quarantines it (age-gated), and the
    next commit reclaims the version number."""
    root = str(tmp_path)
    fmt = _fmt_of(spark, root, "manifest")
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    # forge the torn commit: v2 created, body never written
    torn = os.path.join(
        fmt._log_path("s.t").replace("file:", ""), f"v{2:012d}.json"
    )
    with open(torn, "w") as fh:
        fh.write('{"version": 2, "entr')  # truncated mid-body

    # within the grace: maybe a healthy flip in flight — readers
    # resolve the previous version instead of failing
    assert {(r["day"], r["v"]) for r in fmt.read("s.t").collect()} == {
        ("a", 1)
    }
    # ...and a concurrent append cannot silently skip past it: the CAS
    # at the torn version collides until retries exhaust (shrink the
    # per-read retry budget so the attempts finish inside the grace)
    fmt.INFLIGHT_RETRY_BUDGET_S = 0.05
    with pytest.raises(RuntimeError, match="lost the version race"):
        fmt.write("s.t", _days(spark, ("b", 2)), "append")

    # age the corpse past the in-flight grace: reads now raise loudly
    aged = time.time() - fmt.INFLIGHT_GRACE_S - 1
    os.utime(torn, (aged, aged))
    with pytest.raises(RuntimeError, match="repair"):
        fmt.read("s.t")

    assert fmt.repair_log("s.t", grace_s=60) == 0  # inside the grace
    assert fmt.repair_log("s.t", grace_s=0) == 1
    assert {(r["day"], r["v"]) for r in fmt.read("s.t").collect()} == {
        ("a", 1)
    }
    # version 2 is reclaimed by the next commit; the .torn file stays
    fmt.write("s.t", _days(spark, ("b", 2)), "append")
    assert fmt._latest_version("s.t") == 2
    assert os.path.exists(torn + ".torn")
    assert fmt.read("s.t").count() == 2
    # an explicit vacuum reclaims the quarantined forensics file
    fmt.vacuum("s.t", writer_grace_s=0)
    assert not os.path.exists(torn + ".torn")


def test_torn_catalog_file_clear_error_and_repair(spark, tmp_path):
    """Catalog twin: a torn c*.json head gives the clear repair_catalog
    error; repair restores resolution at the previous catalog version."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        CatalogManifestFormat,
    )

    root = str(tmp_path)
    fmt = CatalogManifestFormat(spark, root)
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    head = fmt._catalog_version()
    torn = os.path.join(
        fmt._catalog_path().replace("file:", ""), f"c{head + 1:012d}.json"
    )
    with open(torn, "w") as fh:
        fh.write('{"version"')

    # within the in-flight grace: resolution falls back to the
    # previous readable pointer (a healthy flip may be mid-body-write)
    assert {(r["day"], r["v"]) for r in fmt.read("s.t").collect()} == {
        ("a", 1)
    }
    # aged past the grace: the corpse raises the clear repair error
    aged = time.time() - fmt.INFLIGHT_GRACE_S - 1
    os.utime(torn, (aged, aged))
    with pytest.raises(RuntimeError, match="repair"):
        fmt.read("s.t")
    assert fmt.repair_catalog(grace_s=0) == 1
    assert {(r["day"], r["v"]) for r in fmt.read("s.t").collect()} == {
        ("a", 1)
    }
    # flips resume normally
    fmt.write("s.t", _days(spark, ("b", 2)), "append")
    assert fmt.read("s.t").count() == 2


_TXN_WRITER = r"""
import os
import sys
import time

root, repo, wid = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
)

fmt = CatalogManifestFormat(spark, root)
open(f"{root}/ready_{wid}", "w").write("")
deadline = time.time() + 120
while not os.path.exists(f"{root}/go"):
    if time.time() > deadline:
        raise SystemExit("rendezvous timeout")
    time.sleep(0.05)
# one multi-table transaction: parent + child flip together
with fmt.transaction():
    fmt.write(
        f"{wid}.parent",
        spark.createDataFrame([(f"{wid}_p", 1)], "k string, v bigint"),
        "overwrite",
    )
    fmt.write(
        f"{wid}.child",
        spark.createDataFrame(
            [(f"{wid}_c1", 1), (f"{wid}_c2", 2)], "k string, v bigint"
        ),
        "overwrite",
    )
print("TXN_OK")
"""


def test_two_process_transactions_disjoint_tables(spark, tmp_path):
    """Concurrent multi-table TRANSACTIONS from separate processes on
    DISJOINT tables: both catalog flips must land (they commute through
    the catalog-version CAS), each transaction stays atomic (its parent
    and child appear in the SAME catalog version), and nothing is
    lost."""
    import subprocess
    import sys
    import time

    root = str(tmp_path / "wh")
    fmt = _fmt_of(spark, root, "catalog")
    fmt.write("seed.t", _days(spark, ("s", 0)), "overwrite")

    script = tmp_path / "txn_writer.py"
    script.write_text(_TXN_WRITER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), root, repo, wid],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for wid in ("a", "b")
    ]
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.exists(f"{root}/ready_a") and os.path.exists(
            f"{root}/ready_b"
        ):
            break
        time.sleep(0.2)
    else:
        for p in procs:
            p.kill()
        raise AssertionError("writers never reached the rendezvous")
    open(f"{root}/go", "w").write("")
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]
        assert "TXN_OK" in out

    for wid in ("a", "b"):
        assert fmt.read(f"{wid}.parent").count() == 1
        assert fmt.read(f"{wid}.child").count() == 2
    # each transaction's tables moved in ONE catalog version (atomic),
    # and the two transactions landed as separate flips
    hist = fmt.catalog_history()
    changed = [tuple(sorted(h["changed"])) for h in hist if h["changed"]]
    assert ("a.child", "a.parent") in changed
    assert ("b.child", "b.parent") in changed


def test_read_where_in_set_pruning(spark, tmp_path):
    """IN-list skipping: a value set inside one chunk's range keeps one
    entry; values straddling two chunks keep two; the row filter
    returns exactly the isin() recompute.  Cross-domain values and
    empty sets keep everything (prune must not change results)."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    for i in range(5):
        fmt.write(
            "s.t",
            spark.createDataFrame(
                [(f"d{i}_{j}", i * 100 + j) for j in range(10)],
                "day string, v long",
            ),
            "append" if i else "overwrite",
        )
    kept, _ = fmt.prune_entries("s.t", {"v": [203, 207]})
    assert len(kept) == 1
    kept, _ = fmt.prune_entries("s.t", {"v": [203, 401]})
    assert len(kept) == 2
    got = {r["v"] for r in fmt.read_where("s.t", {"v": [203, 401]}).collect()}
    assert got == {203, 401}
    # value between chunk ranges: provably excluded everywhere
    kept, _ = fmt.prune_entries("s.t", {"v": [50]})
    assert len(kept) == 0
    none = fmt.read_where("s.t", {"v": [50]})
    assert none.count() == 0 and none.columns == ["day", "v"]
    # cross-domain value or empty set: keep-by-default
    kept, _ = fmt.prune_entries("s.t", {"v": ["not-a-long"]})
    assert len(kept) == 5
    kept, _ = fmt.prune_entries("s.t", {"v": []})
    assert len(kept) == 5
    # composes with a range on the same conjunction
    kept, _ = fmt.prune_entries("s.t", {"v": [203, 401], "day": (None, None)})
    assert len(kept) == 2


def test_delete_where_rewrites_only_intersecting_entries(spark, tmp_path):
    """Stats-bounded copy-on-write DELETE: entries whose stats prove no
    match carry over by identity (no rewrite); only may-match entries
    re-land.  NULL predicate rows survive (SQL DELETE semantics)."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, stats_cols=("v",)
    )
    for i in range(5):
        rows = [(f"d{i}_{j}", i * 100 + j) for j in range(10)]
        if i == 2:
            rows.append((f"d{i}_null", None))  # NULL in the target chunk
        fmt.write(
            "s.t",
            spark.createDataFrame(rows, "day string, v long"),
            "append" if i else "overwrite",
        )
    before = {e["dir"] for e in fmt._manifest("s.t")["entries"]}

    n = fmt.delete_where("s.t", "v", 205, 260)
    assert n == 5  # 205..209

    after_entries = fmt._manifest("s.t")["entries"]
    after = {e["dir"] for e in after_entries}
    # 4 untouched dirs survive BY IDENTITY; chunk 2's dir is replaced
    assert len(before & after) == 4
    got = sorted(
        r["v"] for r in fmt.read("s.t").collect() if r["v"] is not None
    )
    want = [v for v in range(500) if v % 100 < 10 and not 205 <= v <= 260]
    assert got == want
    # the NULL row survived the delete
    assert any(r["v"] is None for r in fmt.read("s.t").collect())

    # stats prove no match: pure metadata no-op, zero commits
    v_before = fmt._latest_version("s.t")
    assert fmt.delete_where("s.t", "v", 9000, 9999) == 0
    assert fmt._latest_version("s.t") == v_before

    # a change-feed window in which the consumer had already SEEN the
    # rewritten entry refuses (history rewrite, not append); an earlier
    # window that never saw it is still serveable
    with pytest.raises(ValueError, match="removed without compaction"):
        fmt.read_changes("s.t", since_version=3)  # v3 included chunk 2


def test_delete_where_retries_conflicting_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """Round 13 (optimistic concurrency): a delete racing a concurrent
    append whose rows MATCH the predicate must not commit the stale
    survivor set — and must not merely abort either: it recomputes
    against the new head and produces exactly the serial schedule
    (append, then delete removes the appended match too)."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    other = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("late", 1)), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.delete_where("s.t", "v", 1, 1) == 2
    assert fmt.read("s.t").count() == 0


def test_delete_where_on_partitioned_table(spark, tmp_path):
    """Partitioned layout: survivors re-land under the same partition
    columns; untouched partitions' entries carry over."""
    fmt = _fmt_of(spark, str(tmp_path), "catalog")
    df = spark.createDataFrame(
        [("20240101", i, float(i)) for i in range(10)]
        + [("20240102", i, float(i)) for i in range(10)],
        "day string, id long, v double",
    )
    fmt.write("s.t", df, "overwrite", partition_by=("day",))
    n = fmt.delete_where("s.t", {"v": (3.0, 6.0)})
    assert n == 8  # both days' 3..6
    rows = {(r["day"], r["id"]) for r in fmt.read("s.t").collect()}
    assert rows == {
        (d, i)
        for d in ("20240101", "20240102")
        for i in range(10)
        if not 3 <= i <= 6
    }
    assert fmt.partition_columns("s.t") == ["day"]


def test_delete_where_on_clustered_table_touches_few_files(spark, tmp_path):
    """The 100 TB headline: after cluster(), a narrow DELETE rewrites
    only the file(s) whose range intersects — every other per-file
    entry carries over by identity, still pointing into the original
    clustered dir."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
        ManifestFormat,
    )

    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(10000)], "v long, tag long"
    )
    fmt.write("s.t", df, "overwrite")
    n_files = fmt.cluster("s.t", "v", n_files=10)
    before = {
        (e["dir"], e.get("rel")) for e in fmt._manifest("s.t")["entries"]
    }

    n = fmt.delete_where("s.t", "v", 4100, 4300)
    assert n == 201
    after_entries = fmt._manifest("s.t")["entries"]
    after = {(e["dir"], e.get("rel")) for e in after_entries}
    carried = before & after
    # at most 2 clustered files intersect a 2%-wide range of 10
    assert len(carried) >= n_files - 2, (len(carried), n_files)
    got = fmt.read("s.t").count()
    assert got == 10000 - 201
    assert fmt.read("s.t").filter("v between 4100 and 4300").count() == 0


# -- round-9: timestamp time travel (TIMESTAMP AS OF) -----------------------


def _restamp(fmt, name, stamps: dict) -> None:
    """Rewrite committed_at of given versions (local-FS test helper —
    production version files are immutable; this simulates commits that
    happened at distinct wall-clock times without sleeping through the
    1-second committed_at granularity)."""
    import json

    for v, at in stamps.items():
        p = os.path.join(fmt._log_path(name), f"v{v:012d}.json")
        body = json.load(open(p))
        body["committed_at"] = at
        json.dump(body, open(p, "w"))
        # drop the local-FS sibling checksum the out-of-band rewrite
        # invalidated (ChecksumFileSystem would refuse the read)
        crc = os.path.join(
            fmt._log_path(name), f".v{v:012d}.json.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)


def test_version_at_resolves_timestamp_to_version(spark, wh):
    for day, v in (("d1", 1), ("d2", 2), ("d3", 3)):
        wh.materialize_incremental("tt.t", _days(spark, (day, v)), "day")
    _restamp(wh.fmt, "tt.t", {1: 100, 2: 200, 3: 300})
    assert wh.fmt.version_at("tt.t", 100) == 1  # exact stamp: inclusive
    assert wh.fmt.version_at("tt.t", 199) == 1
    assert wh.fmt.version_at("tt.t", 200) == 2
    assert wh.fmt.version_at("tt.t", 10**12) == 3  # far future: head
    import datetime

    dt = datetime.datetime.fromtimestamp(250)
    assert wh.fmt.version_at("tt.t", dt) == 2  # datetime accepted
    with pytest.raises(ValueError, match="at or before"):
        wh.fmt.version_at("tt.t", 99)  # before the first retained commit
    got = {r["day"] for r in wh.fmt.read_asof("tt.t", 250).collect()}
    assert got == {"d1", "d2"}


def test_version_at_equal_stamps_resolve_to_latest(spark, wh):
    """Two commits inside the same committed_at second: the stamp
    resolves to the LATEST of them (Delta's tie rule — the state a
    reader at that wall-clock instant would have seen last)."""
    wh.materialize_incremental("tt.e", _days(spark, ("d1", 1)), "day")
    wh.materialize_incremental("tt.e", _days(spark, ("d2", 2)), "day")
    _restamp(wh.fmt, "tt.e", {1: 500, 2: 500})
    assert wh.fmt.version_at("tt.e", 500) == 2
    assert wh.fmt.version_at("tt.e", 501) == 2


def test_version_at_survives_vacuumed_prefix(spark, wh):
    for day, v in (("d1", 1), ("d2", 2), ("d3", 3)):
        wh.materialize_incremental("tt.v", _days(spark, (day, v)), "day")
    wh.fmt.vacuum("tt.v", keep_last=1, writer_grace_s=0)
    _restamp(wh.fmt, "tt.v", {3: 300})
    assert wh.fmt.version_at("tt.v", 10**12) == 3
    with pytest.raises(ValueError, match="vacuumed"):
        wh.fmt.version_at("tt.v", 299)


def test_catalog_version_at_skips_aborted_orphans(spark, cat_wh):
    """TIMESTAMP AS OF must never resolve to an aborted transaction's
    orphan manifest: its committed_at exists, but no reader could ever
    have seen that state."""
    wh = cat_wh
    wh.materialize_incremental("tt.c", _days(spark, ("d1", 1)), "day")
    with pytest.raises(RuntimeError, match="boom"):
        with wh.fmt.transaction():
            wh.materialize_upsert("tt.c", _days(spark, ("d1", 99)), "day")
            raise RuntimeError("boom")
    wh.materialize_incremental("tt.c", _days(spark, ("d2", 2)), "day")
    # log holds v1 (committed), v2 (orphan), v3 (committed)
    _restamp(wh.fmt, "tt.c", {1: 100, 2: 200, 3: 300})
    assert wh.fmt.version_at("tt.c", 250) == 1  # orphan v2 skipped
    assert wh.fmt.version_at("tt.c", 300) == 3
    got = {r["day"] for r in wh.fmt.read_asof("tt.c", 10**12).collect()}
    assert got == {"d1", "d2"}


def test_warehouse_read_at_timestamp_passthrough(spark, wh):
    wh.materialize_incremental("tt.w", _days(spark, ("d1", 1)), "day")
    wh.materialize_incremental("tt.w", _days(spark, ("d2", 2)), "day")
    _restamp(wh.fmt, "tt.w", {1: 100, 2: 200})
    assert {
        r["day"] for r in wh.read_at_timestamp("tt.w", 150).collect()
    } == {"d1"}


# -- round-9: RESTORE (roll back the head, metadata-only) -------------------


def test_restore_rolls_head_back_and_preserves_history(spark, wh):
    for day, v in (("d1", 1), ("d2", 2), ("d3", 3)):
        wh.materialize_incremental("rs.t", _days(spark, (day, v)), "day")
    n_dirs_before = len(
        [
            d
            for d in wh.fs.list_subdirs(wh.fmt.path("rs.t"))
            if d.startswith("d-")
        ]
    )
    new_head = wh.restore("rs.t", 2)
    assert new_head == 4
    assert {r["day"] for r in wh.read("rs.t").collect()} == {"d1", "d2"}
    # metadata-only: no data dir written
    n_dirs_after = len(
        [
            d
            for d in wh.fs.list_subdirs(wh.fmt.path("rs.t"))
            if d.startswith("d-")
        ]
    )
    assert n_dirs_after == n_dirs_before
    # the rolled-past head is still auditable
    assert wh.fmt.read_version("rs.t", 3).count() == 3
    # appends continue normally on the restored head
    wh.materialize_incremental("rs.t", _days(spark, ("d4", 4)), "day")
    assert {r["day"] for r in wh.read("rs.t").collect()} == {"d1", "d2", "d4"}


def test_restore_refuses_vacuumed_or_unknown_versions(spark, wh):
    wh.materialize_incremental("rs.v", _days(spark, ("d1", 1)), "day")
    wh.materialize_incremental("rs.v", _days(spark, ("d2", 2)), "day")
    wh.fmt.vacuum("rs.v", keep_last=1, writer_grace_s=0)
    with pytest.raises(ValueError, match="not a committed retained"):
        wh.restore("rs.v", 1)
    with pytest.raises(ValueError, match="not a committed retained"):
        wh.restore("rs.v", 99)


def test_catalog_restore_skips_orphans_and_flips_pointer(spark, cat_wh):
    wh = cat_wh
    wh.materialize_incremental("rs.c", _days(spark, ("d1", 1)), "day")
    with pytest.raises(RuntimeError, match="boom"):
        with wh.fmt.transaction():
            wh.materialize_upsert("rs.c", _days(spark, ("d1", 99)), "day")
            raise RuntimeError("boom")
    wh.materialize_incremental("rs.c", _days(spark, ("d2", 2)), "day")
    # v2 is the aborted orphan: not restorable
    with pytest.raises(ValueError, match="not a committed retained"):
        wh.restore("rs.c", 2)
    wh.restore("rs.c", 1)
    assert {r["day"] for r in wh.read("rs.c").collect()} == {"d1"}
    assert wh.read("rs.c").collect()[0]["v"] == 1


# -- round-9: schema in the log + write-time enforcement --------------------


def test_append_type_conflict_refused_before_data_lands(spark, wh):
    wh.materialize_incremental("sc.t", _days(spark, ("d1", 1)), "day")
    n_dirs = len(
        [
            d
            for d in wh.fs.list_subdirs(wh.fmt.path("sc.t"))
            if d.startswith("d-")
        ]
    )
    bad = spark.createDataFrame([Row(day="d2", v="not-an-int")])
    with pytest.raises(TypeError, match="changes column type"):
        wh.fmt.write("sc.t", bad, "append")
    # fail-fast: refused BEFORE landing a data dir
    assert (
        len(
            [
                d
                for d in wh.fs.list_subdirs(wh.fmt.path("sc.t"))
                if d.startswith("d-")
            ]
        )
        == n_dirs
    )
    # the table is untouched and still readable
    assert wh.read("sc.t").count() == 1


def test_additive_schema_evolution_and_stored_schema(spark, wh):
    wh.materialize_incremental("sc.e", _days(spark, ("d1", 1)), "day")
    wide = spark.createDataFrame([Row(day="d2", v=2, extra="x")])
    wh.fmt.write("sc.e", wide, "append")
    got = {
        (r["day"], r["v"], r["extra"]) for r in wh.read("sc.e").collect()
    }
    assert got == {("d1", 1, None), ("d2", 2, "x")}
    # the manifest now stores the MERGED schema; enforcement against
    # the evolved column is metadata-only and still type-checked
    m = wh.fmt._manifest("sc.e")
    names = [f["name"] for f in m["schema"]["fields"]]
    assert set(names) == {"day", "v", "extra"}
    bad = spark.createDataFrame([Row(day="d3", extra=3)])
    with pytest.raises(TypeError, match="extra"):
        wh.fmt.write("sc.e", bad, "append")
    # narrower appends (missing columns) stay allowed
    wh.fmt.write("sc.e", _days(spark, ("d3", 3)), "append")
    assert wh.read("sc.e").count() == 3


def test_pre_schema_table_self_heals_on_first_append(spark, wh, tmp_path):
    wh.materialize_incremental("sc.h", _days(spark, ("d1", 1)), "day")
    # simulate a pre-schema manifest (older repo version): strip the
    # stored schema from the head version file
    import json as _json

    d = os.path.join(wh.fmt._log_path("sc.h"))
    vf = sorted(f for f in os.listdir(d) if f.startswith("v"))[-1]
    p = os.path.join(d, vf)
    body = _json.load(open(p))
    body.pop("schema", None)
    _json.dump(body, open(p, "w"))
    crc = os.path.join(d, f".{vf}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert "schema" not in wh.fmt._manifest("sc.h")
    # enforcement falls back to a one-time footer read — a conflicting
    # append is still refused...
    bad = spark.createDataFrame([Row(day="d2", v="s")])
    with pytest.raises(TypeError, match="changes column type"):
        wh.fmt.write("sc.h", bad, "append")
    # ...and a clean append heals the manifest: schema stored again
    wh.fmt.write("sc.h", _days(spark, ("d2", 2)), "append")
    assert {f["name"] for f in wh.fmt._manifest("sc.h")["schema"]["fields"]} == {
        "day",
        "v",
    }


def test_replace_resets_schema_and_streaming_append_enforces(spark, wh):
    wh.materialize_incremental("sc.s", _days(spark, ("d1", 1)), "day")
    # full replace may change types freely (the explicit rewrite path)
    wh.fmt.replace_atomic(
        "sc.s", spark.createDataFrame([Row(day="d1", v="now-a-string")])
    )
    assert {f["name"] for f in wh.fmt._manifest("sc.s")["schema"]["fields"]} == {
        "day",
        "v",
    }
    # streaming appends enforce against the NEW schema
    ok = wh.fmt.write_streaming_batch(
        "sc.s", spark.createDataFrame([Row(day="d2", v="s2")]), 0
    )
    assert ok
    with pytest.raises(TypeError, match="changes column type"):
        wh.fmt.write_streaming_batch(
            "sc.s", spark.createDataFrame([Row(day="d3", v=3)]), 1
        )
    # restore rolls the schema back with the entries
    wh.fmt.restore("sc.s", 1)
    sch = {
        f["name"]: f["type"]
        for f in wh.fmt._manifest("sc.s")["schema"]["fields"]
    }
    assert sch["v"] == "long"


def test_schema_survives_every_rewrite_verb(spark, tmp_path):
    """The stored schema rides the commit-edit carry: compaction,
    clustering, row-level delete, and restore must all preserve it
    (none of them sees a DataFrame to re-derive it from), and
    enforcement keeps working afterwards."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    df = spark.createDataFrame([Row(v=i, s=f"x{i}") for i in range(40)])
    fmt.write("sv.t", df, "overwrite")
    want = fmt._manifest("sv.t")["schema"]
    for i in range(4):
        fmt.write(
            "sv.t",
            spark.createDataFrame(
                [Row(v=40 + 10 * i + j, s="y") for j in range(10)]
            ),
            "append",
        )
    fmt.maybe_compact("sv.t", target_file_bytes=1)
    assert fmt._manifest("sv.t")["schema"] == want
    fmt.cluster("sv.t", "v", n_files=4)
    assert fmt._manifest("sv.t")["schema"] == want
    fmt.delete_where("sv.t", "v", 10, 20)
    assert fmt._manifest("sv.t")["schema"] == want
    head = fmt._manifest("sv.t")["version"]
    fmt.restore("sv.t", head)
    assert fmt._manifest("sv.t")["schema"] == want
    with pytest.raises(TypeError, match="changes column type"):
        fmt.write(
            "sv.t", spark.createDataFrame([Row(v=1, s=2)]), "append"
        )


# -- round-9: CHECK constraints (schema-in-the-log companion) ----------------


def test_check_constraint_rejects_bad_batch_atomically(spark, wh):
    wh.materialize_incremental("ck.t", _days(spark, ("d1", 1)), "day")
    wh.add_constraint("ck.t", "v_positive", "v > 0")
    n_dirs = len(
        [
            d
            for d in wh.fs.list_subdirs(wh.fmt.path("ck.t"))
            if d.startswith("d-")
        ]
    )
    head = wh.fmt._manifest("ck.t")["version"]
    with pytest.raises(ValueError, match="v_positive"):
        wh.fmt.write(
            "ck.t", _days(spark, ("d2", 2), ("d3", -1)), "append"
        )
    # atomic rejection: no new data dir survives, no commit happened
    assert (
        len(
            [
                d
                for d in wh.fs.list_subdirs(wh.fmt.path("ck.t"))
                if d.startswith("d-")
            ]
        )
        == n_dirs
    )
    assert wh.fmt._manifest("ck.t")["version"] == head
    # a clean batch lands; NULL predicate rows pass (SQL CHECK)
    wh.fmt.write(
        "ck.t",
        spark.createDataFrame([Row(day="d4", v=4), Row(day="d5", v=None)]),
        "append",
    )
    assert wh.read("ck.t").count() == 3


def test_check_constraint_lifecycle_and_carry(spark, wh):
    wh.materialize_incremental("ck.l", _days(spark, ("d1", 5)), "day")
    # adding a constraint existing data violates is refused
    with pytest.raises(ValueError, match="existing rows violate"):
        wh.add_constraint("ck.l", "big", "v > 100")
    wh.add_constraint("ck.l", "pos", "v > 0")
    wh.add_constraint("ck.l", "pos", "v > 0")  # idempotent re-add
    with pytest.raises(ValueError, match="already exists"):
        wh.add_constraint("ck.l", "pos", "v > 1")
    # constraints survive rewrite verbs and replace
    wh.fmt.write("ck.l", _days(spark, ("d2", 2)), "append")
    wh.fmt.maybe_compact("ck.l", target_file_bytes=1)
    wh.fmt.replace_atomic("ck.l", _days(spark, ("d9", 9)))
    with pytest.raises(ValueError, match="pos"):
        wh.fmt.write("ck.l", _days(spark, ("dx", -3)), "append")
    # streaming appends enforce too
    with pytest.raises(ValueError, match="pos"):
        wh.fmt.write_streaming_batch("ck.l", _days(spark, ("dy", 0)), 0)
    # drop: bad batches land again
    assert wh.drop_constraint("ck.l", "pos") is True
    assert wh.drop_constraint("ck.l", "pos") is False
    wh.fmt.write("ck.l", _days(spark, ("dx", -3)), "append")
    assert wh.read("ck.l").count() == 2


def test_constraints_and_schema_on_catalog_format(spark, cat_wh):
    """The catalog format's _commit/_commit_edit are separate code
    paths: schema and constraints must carry through them too —
    including a multi-table transaction's deferred flip."""
    wh = cat_wh
    wh.materialize_incremental("ck.c", _days(spark, ("d1", 1)), "day")
    wh.add_constraint("ck.c", "pos", "v > 0")
    with pytest.raises(ValueError, match="pos"):
        wh.fmt.write("ck.c", _days(spark, ("d2", -2)), "append")
    with pytest.raises(TypeError, match="changes column type"):
        wh.fmt.write(
            "ck.c", spark.createDataFrame([Row(day="d", v="s")]), "append"
        )
    with wh.fmt.transaction():
        wh.materialize_upsert("ck.c", _days(spark, ("d1", 3)), "day")
    m = wh.fmt._manifest("ck.c")
    assert {
        k: v for k, v in m["constraints"].items() if k != "__none__"
    } == {"pos": "v > 0"}
    assert {f["name"] for f in m["schema"]["fields"]} == {"day", "v"}
    # enforcement still live after the transaction's replace
    with pytest.raises(ValueError, match="pos"):
        wh.fmt.write("ck.c", _days(spark, ("dz", 0)), "append")


# -- round-9: row-level UPDATE (stats-bounded copy-on-write) -----------------


def test_update_where_rewrites_only_matching_entries(spark, tmp_path):
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.stats_cols = ("v",)
    for i in range(5):
        fmt.write(
            "up.t",
            spark.createDataFrame(
                [Row(v=i * 10 + j, s="a") for j in range(10)]
            ),
            "append" if i else "overwrite",
        )
    before = {
        (e["dir"], e.get("rel")) for e in fmt._manifest("up.t")["entries"]
    }
    n = fmt.update_where("up.t", "v", {"s": "'hit'"}, 22, 27)
    assert n == 6
    after = {
        (e["dir"], e.get("rel")) for e in fmt._manifest("up.t")["entries"]
    }
    # four of the five range-disjoint entries carried untouched
    assert len(before & after) == 4
    got = {(r["v"], r["s"]) for r in fmt.read("up.t").collect()}
    assert {(v, "hit") for v in range(22, 28)} <= got
    assert {(v, "a") for v in list(range(22)) + list(range(28, 50))} <= got
    assert len(got) == 50
    # old values referencable in SET; stats recomputed → skipping sound
    n = fmt.update_where("up.t", "v", {"v": "v + 100"}, 0, 4)
    assert n == 5
    assert (
        sorted(r["v"] for r in fmt.read_where("up.t", "v", 100, 110).collect())
        == [100, 101, 102, 103, 104]
    )


def test_update_where_guards_types_nulls_and_constraints(spark, wh):
    wh.materialize_incremental(
        "up.g",
        spark.createDataFrame(
            [Row(day="d1", v=1), Row(day="d2", v=None), Row(day="d3", v=3)]
        ),
        None,
    )
    # NULL predicate rows are not updated (SQL semantics)
    n = wh.update_where("up.g", "v", {"day": "'x'"}, 0, 100)
    assert n == 2
    got = {(r["day"], r["v"]) for r in wh.read("up.g").collect()}
    assert got == {("x", 1), ("d2", None), ("x", 3)}
    # type-changing SET refused
    with pytest.raises(TypeError, match="changes the column type"):
        wh.update_where("up.g", "v", {"v": "'str'"}, 0, 100)
    # unknown column refused
    with pytest.raises(ValueError, match="unknown column"):
        wh.update_where("up.g", "v", {"nope": "1"}, 0, 100)
    # CHECK constraints validate the rewritten rows
    wh.add_constraint("up.g", "pos", "v > 0")
    with pytest.raises(ValueError, match="pos"):
        wh.update_where("up.g", "v", {"v": "v - 10"}, 0, 100)
    # the failed update left the table untouched
    assert {(r["day"], r["v"]) for r in wh.read("up.g").collect()} == got


def test_update_where_racing_append_aborts_not_discards(
    spark, tmp_path, monkeypatch
):
    """update_where shares delete_where's serialization contract
    (round 13, optimistic concurrency): an append landing between the
    base read and the rewrite commit, whose rows match the predicate,
    forces a RECOMPUTE against the new head — the result equals the
    serial schedule (append, then update hits the late row too)."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    other = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _days(spark, ("a", 1)), "overwrite")
    fmt.write("s.t", _days(spark, ("b", 2)), "append")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _days(spark, ("late", 9)), "append")
        return orig(name, df, partition_by)

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.update_where("s.t", "v", {"day": "'hit'"}, 0, 100) == 3
    got = {(r["day"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {("hit", 1), ("hit", 2), ("hit", 9)}


def test_update_where_on_catalog_format(spark, cat_wh):
    wh = cat_wh
    wh.materialize_incremental(
        "up.c", spark.createDataFrame([Row(day="d1", v=1), Row(day="d2", v=2)]), None
    )
    assert wh.update_where("up.c", "v", {"day": "'hit'"}, 2, 9) == 1
    got = {(r["day"], r["v"]) for r in wh.read("up.c").collect()}
    assert got == {("d1", 1), ("hit", 2)}
    # schema still stored after the rewrite (catalog _commit carry)
    m = wh.fmt._manifest("up.c")
    assert {f["name"] for f in m["schema"]["fields"]} == {"day", "v"}


# -- round-9: row-level change data feed (Delta CDF) -------------------------


def test_cdf_serves_inserts_deletes_and_updates(spark, tmp_path):
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.stats_cols = ("v",)
    fmt.cdf = True
    fmt.write(
        "cdf.t",
        spark.createDataFrame([Row(v=i, s="a") for i in range(10)]),
        "overwrite",
    )  # v1
    fmt.write(
        "cdf.t",
        spark.createDataFrame([Row(v=10 + i, s="b") for i in range(5)]),
        "append",
    )  # v2
    assert fmt.delete_where("cdf.t", "v", 3, 4) == 2  # v3
    assert fmt.update_where("cdf.t", "v", {"s": "'hit'"}, 11, 12) == 2  # v4
    feed = fmt.read_changes_cdf("cdf.t", 1).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert sorted(r["v"] for r in by_type["insert"]) == list(range(10, 15))
    assert all(r["_commit_version"] == 2 for r in by_type["insert"])
    assert sorted(r["v"] for r in by_type["delete"]) == [3, 4]
    assert all(r["_commit_version"] == 3 for r in by_type["delete"])
    pre = {(r["v"], r["s"]) for r in by_type["update_preimage"]}
    post = {(r["v"], r["s"]) for r in by_type["update_postimage"]}
    assert pre == {(11, "b"), (12, "b")}
    assert post == {(11, "hit"), (12, "hit")}
    # a downstream mirror replaying the feed converges to the table:
    # apply inserts, drop deletes and preimages, keep postimages
    base = {(r["v"], r["s"]) for r in fmt.read_version("cdf.t", 1).collect()}
    for r in sorted(feed, key=lambda r: r["_commit_version"]):
        t = r["_change_type"]
        if t in ("insert", "update_postimage"):
            base.add((r["v"], r["s"]))
        if t in ("delete", "update_preimage"):
            base.discard((r["v"], r["s"]))
    now = {(r["v"], r["s"]) for r in fmt.read("cdf.t").collect()}
    assert base == now
    # the append-only feed still refuses across the rewrite (additive
    # consumers must not silently miss retractions)
    with pytest.raises(ValueError, match="resync"):
        fmt.read_changes("cdf.t", 1)
    # empty range: typed empty frame
    assert fmt.read_changes_cdf("cdf.t", 4).count() == 0


def test_cdf_vacuum_keeps_retained_sweeps_dropped(spark, tmp_path):
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.cdf = True
    fmt.write(
        "cdf.v",
        spark.createDataFrame([Row(v=i) for i in range(10)]),
        "overwrite",
    )
    fmt.delete_where("cdf.v", "v", 2, 3)  # v2 with cdc dir
    fmt.write(
        "cdf.v", spark.createDataFrame([Row(v=100)]), "append"
    )  # v3
    cdc_dirs = [
        d
        for d in fmt.fs.list_subdirs(fmt.path("cdf.v"))
        if d.startswith("cdc-")
    ]
    assert len(cdc_dirs) == 1
    # keep_last=2 retains v2+v3: the cdc dir survives, CDF reads back
    fmt.vacuum("cdf.v", keep_last=2, writer_grace_s=0)
    assert [
        d
        for d in fmt.fs.list_subdirs(fmt.path("cdf.v"))
        if d.startswith("cdc-")
    ] == cdc_dirs
    assert fmt.read_changes_cdf("cdf.v", 1, 2).count() == 2
    # keep_last=1 drops v2: the cdc dir is swept with it
    fmt.vacuum("cdf.v", keep_last=1, writer_grace_s=0)
    assert [
        d
        for d in fmt.fs.list_subdirs(fmt.path("cdf.v"))
        if d.startswith("cdc-")
    ] == []


def test_cdf_on_catalog_format_skips_orphans(spark, cat_wh):
    wh = cat_wh
    wh.fmt.cdf = True
    wh.materialize_incremental("cdf.c", _days(spark, ("d1", 1)), "day")
    with pytest.raises(RuntimeError, match="boom"):
        with wh.fmt.transaction():
            wh.materialize_upsert("cdf.c", _days(spark, ("d1", 99)), "day")
            raise RuntimeError("boom")
    wh.materialize_incremental("cdf.c", _days(spark, ("d2", 2)), "day")
    feed = wh.read_changes_cdf("cdf.c", 1).collect()
    # the aborted v2 orphan contributes nothing; only the committed
    # append shows, at its manifest version
    assert {(r["day"], r["_change_type"]) for r in feed} == {
        ("d2", "insert")
    }
    assert feed[0]["_commit_version"] == 3


def test_cdf_from_version_zero_is_all_inserts_plus_changes(spark, tmp_path):
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.stats_cols = ("v",)
    fmt.cdf = True
    fmt.write(
        "cdf.z", spark.createDataFrame([Row(v=i) for i in range(5)]), "overwrite"
    )
    fmt.delete_where("cdf.z", "v", 1, 1)
    feed = fmt.read_changes_cdf("cdf.z", 0).collect()
    ins = sorted(r["v"] for r in feed if r["_change_type"] == "insert")
    dels = [r["v"] for r in feed if r["_change_type"] == "delete"]
    assert ins == [0, 1, 2, 3, 4]  # v1 full content, all inserts
    assert dels == [1]


# -- round-9: review-driven hardening (post-self-review fixes) ---------------


def test_cdf_postimage_when_set_moves_predicate_column(spark, tmp_path):
    """SET v = v + 100 WHERE v BETWEEN 0 AND 4: the postimages' new
    values leave the predicate range — they must still be recorded
    (the regression re-filtered the REWRITTEN frame on the bounds and
    silently dropped every such postimage)."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.cdf = True
    fmt.write(
        "cdf.m", spark.createDataFrame([Row(v=i) for i in range(8)]), "overwrite"
    )
    assert fmt.update_where("cdf.m", "v", {"v": "v + 100"}, 0, 4) == 5
    feed = fmt.read_changes_cdf("cdf.m", 1).collect()
    pre = sorted(r["v"] for r in feed if r["_change_type"] == "update_preimage")
    post = sorted(
        r["v"] for r in feed if r["_change_type"] == "update_postimage"
    )
    assert pre == [0, 1, 2, 3, 4]
    assert post == [100, 101, 102, 103, 104]
    # mirror replay converges
    base = {r["v"] for r in fmt.read_version("cdf.m", 1).collect()}
    for r in feed:
        if r["_change_type"] == "update_postimage":
            base.add(r["v"])
        if r["_change_type"] in ("delete", "update_preimage"):
            base.discard(r["v"])
    assert base == {r["v"] for r in fmt.read("cdf.m").collect()}


def test_narrowing_append_passes_constraints_as_null(spark, wh):
    """A legal narrowing append (missing an existing column) must
    evaluate CHECK constraints under NULL semantics — NULL passes —
    not crash on an unresolved column."""
    wh.materialize_incremental("ck.n", _days(spark, ("d1", 1)), "day")
    wh.add_constraint("ck.n", "pos", "v > 0")
    wh.fmt.write(
        "ck.n", spark.createDataFrame([Row(day="d2")]), "append"
    )
    got = {(r["day"], r["v"]) for r in wh.read("ck.n").collect()}
    assert got == {("d1", 1), ("d2", None)}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_vacuum_spares_concurrent_commit_version_files(
    spark, tmp_path, kind, monkeypatch
):
    """A commit landing WHILE vacuum runs (between its keep-set
    snapshot and its version-file sweep) has a version number above
    the snapshot head — vacuum must never delete it (it would silently
    destroy the concurrent writer's committed rows)."""
    fmt = _fmt_of(spark, str(tmp_path), kind)
    other = _fmt_of(spark, str(tmp_path), kind)
    for day, v in (("d1", 1), ("d2", 2)):
        fmt.write("vc.t", _days(spark, (day, v)), "append")
    orig = fmt._sweep_data_dirs
    state = {"injected": False}

    def racing(name, live, grace):
        if not state["injected"]:
            state["injected"] = True
            other.write("vc.t", _days(spark, ("late", 9)), "append")
        return orig(name, live, grace)

    monkeypatch.setattr(fmt, "_sweep_data_dirs", racing)
    # default writer grace: the concurrent append's young DATA DIR is
    # protected by the age check (writer_grace_s=0 is the caller's
    # explicit no-concurrent-writers assertion); the VERSION FILE is
    # protected unconditionally by the snapshot guard
    fmt.vacuum("vc.t", keep_last=1)
    got = {(r["day"], r["v"]) for r in fmt.read("vc.t").collect()}
    assert ("late", 9) in got
    head = fmt._manifest("vc.t")
    assert {e["dir"] for e in head["entries"]} <= {
        d
        for d in fmt.fs.list_subdirs(fmt.path("vc.t"))
        if d.startswith("d-")
    }


def test_rebase_aborts_on_concurrent_conflicting_schema_evolution(
    spark, tmp_path, monkeypatch
):
    """Two appends each introduce column x with DIFFERENT types; the
    loser's rebase must abort loudly — a head-biased merge would store
    a schema that lies about the loser's parquet files."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    other = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write("sc.r", _days(spark, ("d1", 1)), "overwrite")
    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(name, version, entries, cols, txn=None, segments=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            other.write(
                "sc.r",
                spark.createDataFrame([Row(day="d2", v=2, x="str")]),
                "append",
            )
        return orig(
            name, version, entries, cols, txn, segments=segments, **kw
        )

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    with pytest.raises(RuntimeError, match="concurrent schema evolution"):
        fmt.write(
            "sc.r",
            spark.createDataFrame([Row(day="d3", v=3, x=33)]),
            "append",
        )
    # the winner's column survives with its type
    m = fmt._manifest("sc.r")
    types = {f["name"]: f["type"] for f in m["schema"]["fields"]}
    assert types["x"] == "string"


def test_rebase_revalidates_concurrently_added_constraint(
    spark, tmp_path, monkeypatch
):
    """A constraint added between an append's pre-land check and its
    CAS must be enforced on the rebase — otherwise violating rows land
    under a manifest that claims the CHECK holds."""
    fmt = _fmt_of(spark, str(tmp_path), "manifest")
    other = _fmt_of(spark, str(tmp_path), "manifest")
    fmt.write("ck.r", _days(spark, ("d1", 1)), "overwrite")
    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(name, version, entries, cols, txn=None, segments=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            other.add_constraint("ck.r", "pos", "v > 0")
        return orig(
            name, version, entries, cols, txn, segments=segments, **kw
        )

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    with pytest.raises(ValueError, match="pos"):
        fmt.write("ck.r", _days(spark, ("bad", -5)), "append")
    assert fmt.read("ck.r").count() == 1  # nothing leaked


def test_restore_rolls_constraints_back_with_the_entries(spark, wh):
    wh.materialize_incremental("rs.k", _days(spark, ("d1", 1)), "day")
    wh.add_constraint("rs.k", "pos", "v > 0")
    wh.restore("rs.k", 1)  # v1 predates the constraint
    # the restored state has no constraints: a "violating" batch lands
    wh.fmt.write("rs.k", _days(spark, ("d2", -2)), "append")
    assert wh.read("rs.k").count() == 2


def test_add_constraint_before_first_write(spark, wh):
    wh.add_constraint("ck.first", "pos", "v > 0")
    with pytest.raises(ValueError, match="pos"):
        wh.fmt.write("ck.first", _days(spark, ("d1", -1)), "append")
    wh.fmt.write("ck.first", _days(spark, ("d1", 1)), "append")
    assert wh.read("ck.first").count() == 1
