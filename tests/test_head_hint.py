"""Advisory head-pointer (round 14 — Delta's ``_last_checkpoint``
analog): commit-time ``_head.json`` hints make head resolution O(1) in
retained version / catalog-flip count, with the full-listing fallback
whenever the hint is missing, torn, stale, or points at a quarantined
file — correctness never depends on the hint."""

from __future__ import annotations

import json
import os

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.fs import join_uri
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in pairs], "k long, val string"
    )


def test_hint_written_and_resolves_head(spark, tmp_path):
    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    hint_path = join_uri(fmt._log_path("s.t"), fmt.HEAD_HINT)
    assert fmt.fs.exists(hint_path)
    assert json.loads(fmt.fs.read_text(hint_path))["version"] == 2
    assert fmt._latest_version("s.t") == 2


def test_stale_hint_forward_scans(spark, tmp_path):
    """A hint trailing the true head (concurrent-writer overwrite
    order, or a crash before the hint write) recovers via forward
    exists-probes — commits are contiguous by the version CAS."""
    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    for i in range(2, 6):
        fmt.write("s.t", _rows(spark, [(i, "x")]), "append")
    fmt.fs.write_text(
        join_uri(fmt._log_path("s.t"), fmt.HEAD_HINT),
        json.dumps({"version": 2}),
        overwrite=True,
    )
    assert fmt._latest_version("s.t") == 5
    assert sorted(r["k"] for r in fmt.read("s.t").collect()) == [1, 2, 3, 4, 5]


@pytest.mark.parametrize("body", ["{garbage", '{"version": 999}', ""])
def test_bad_hint_falls_back_to_listing(spark, tmp_path, body):
    """Torn hint, or one pointing past every existing file (the
    quarantined-head shape): the listing fallback answers."""
    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    fmt.fs.write_text(
        join_uri(fmt._log_path("s.t"), fmt.HEAD_HINT), body, overwrite=True
    )
    assert fmt._latest_version("s.t") == 2


def test_missing_hint_is_fine(spark, tmp_path):
    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.fs.delete(join_uri(fmt._log_path("s.t"), fmt.HEAD_HINT))
    assert fmt._latest_version("s.t") == 1


def test_catalog_hint_and_restore_semantics(spark, tmp_path):
    """The catalog hint accelerates the FLIP-count axis; resolution
    stays 'newest readable pointer', so a restore (pointer moving
    BACKWARD) is served correctly through the hint path."""
    fmt = CatalogManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    cdir = fmt._catalog_path()
    hint = join_uri(cdir, fmt.HEAD_HINT)
    assert fmt.fs.exists(hint)
    v_flips = fmt._catalog_version()
    assert json.loads(fmt.fs.read_text(hint))["version"] == v_flips
    # stale catalog hint: forward scan recovers
    fmt.fs.write_text(hint, json.dumps({"version": 1}), overwrite=True)
    assert fmt._catalog_version() == v_flips
    assert sorted(r["k"] for r in fmt.read("s.t").collect()) == [1, 2]


def test_stream_resolver_uses_hint_and_survives_its_absence(
    spark, tmp_path
):
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.cdf_source import (
        _PlainLog,
    )

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, cdf=True
    )
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    log = _PlainLog(str(tmp_path), "s.t", catalog=False)
    assert log.head_version() == 2
    os.remove(os.path.join(log.log_path, "_head.json"))
    assert log.head_version() == 2


def test_repair_log_drops_hint_closing_interior_gap(spark, tmp_path):
    """ADVICE r14 #1 (the lost-commit window): a stale hint BELOW a
    quarantined interior version must not cap resolution — v1,v2
    valid, v3 torn, v4 valid, hint stale at 2 (its writer died before
    the hint write).  Pre-fix: repair_log left the hint, the forward
    probe stopped at 2 (v3 gone), and the committed v4 was silently
    lost.  Post-fix: repair deletes the hint, the glob fallback
    returns 4."""
    fmt = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    fmt.write("s.t", _rows(spark, [(3, "c")]), "append")
    fmt.write("s.t", _rows(spark, [(4, "d")]), "append")
    log = fmt._log_path("s.t")
    # tear v3 in place (writer died mid-body; v4's writer had already
    # probed past the present-but-unreadable file) and stale the hint
    # at 2 (v4's writer died before its hint write)
    fmt.fs.write_text(
        join_uri(log, "v000000000003.json"), "{torn", overwrite=True
    )
    fmt.fs.write_text(
        join_uri(log, fmt.HEAD_HINT),
        json.dumps({"version": 2}),
        overwrite=True,
    )
    assert fmt.repair_log("s.t", grace_s=0.0) == 1
    assert not fmt.fs.exists(join_uri(log, fmt.HEAD_HINT))
    assert fmt._latest_version("s.t") == 4  # v4 NOT lost
    assert sorted(r["k"] for r in fmt.read("s.t").collect()) == [1, 2, 3, 4]
    # the next commit re-seeds the hint above the gap
    fmt.write("s.t", _rows(spark, [(5, "e")]), "append")
    assert (
        json.loads(
            fmt.fs.read_text(join_uri(log, fmt.HEAD_HINT))
        )["version"]
        == 5
    )


def test_repair_catalog_drops_hint(spark, tmp_path):
    """Catalog twin of the interior-gap guard: quarantining a torn
    pointer deletes the flip hint so resolution re-globs."""
    fmt = CatalogManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    cdir = fmt._catalog_path()
    head = fmt._catalog_version()
    torn = join_uri(cdir, f"c{head + 1:012d}.json")
    fmt.fs.write_text(torn, "{torn", overwrite=True)
    assert fmt.repair_catalog(grace_s=0.0) == 1
    assert not fmt.fs.exists(join_uri(cdir, fmt.HEAD_HINT))
    assert fmt._catalog_version() == head
    assert sorted(r["k"] for r in fmt.read("s.t").collect()) == [1, 2]
