"""Stats-bounded MERGE on the manifest formats (VERDICT r9 task 1).

The reference's highest-frequency write verb: every 15-minute sync
upserts every raw table on ``_dlt_id``/``_dlt_root_id``
(dags/dlt_sources/mongodb/__init__.py:61-67, models/stage/users.sql:2-5).
Round 9 left it as a full-table rewrite via replace_atomic — O(table)
per micro-batch; these tests pin the Delta-MERGE-shaped replacement:
entries whose key-range stats prove no batch key matches carry BY
IDENTITY, only may-match files re-land, the commit records merge CDC
rows, and writer watermarks survive DML (ADVICE r9 #1).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _fmt(spark, root, kind, **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    kw.setdefault("cdf", True)  # these tests pin the merge CDC classes
    return cls(spark, root, auto_compact_dirs=None, stats_cols=("k",), **kw)


def _rows(spark, *pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])


def _seed_chunks(spark, fmt, name="s.t", n=5, per=10):
    """n key-range chunks, one entry each, stats on k."""
    for i in range(n):
        chunk = _rows(
            spark, *[(i * per + j, 100 * i + j) for j in range(per)]
        )
        fmt.write(name, chunk, "append" if i else "overwrite")
    return {e["dir"] for e in fmt._manifest(name)["entries"]}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_merge_carries_unmatched_entries_by_identity(spark, tmp_path, kind):
    fmt = _fmt(spark, str(tmp_path), kind)
    before = _seed_chunks(spark, fmt)
    assert len(before) == 5
    # batch touches only the middle chunk's key range [20, 30)
    fmt.merge("s.t", _rows(spark, (21, -1), (22, -2)), "k")
    after = {e["dir"] for e in fmt._manifest("s.t")["entries"]}
    # four of five chunks carried by identity; the middle one re-landed
    assert len(before & after) == 4
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got[21] == -1 and got[22] == -2
    assert len(got) == 50  # upsert replaced, never duplicated
    assert got[20] == 200 and got[35] == 305  # neighbors untouched


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_merge_degrades_to_append_when_stats_prove_no_match(
    spark, tmp_path, kind
):
    fmt = _fmt(spark, str(tmp_path), kind)
    before = _seed_chunks(spark, fmt)
    fmt.merge("s.t", _rows(spark, (999, 1), (1000, 2)), "k")
    after = {e["dir"] for e in fmt._manifest("s.t")["entries"]}
    # every old entry carried; the batch landed as ONE new append dir
    assert before <= after and len(after) == len(before) + 1
    assert fmt.read("s.t").count() == 52


def test_merge_delete_keys_purge_and_bounded(spark, tmp_path):
    """Root-key semantics: delete_keys (the PARENT batch ids) purge
    rows the batch no longer carries, still stats-bounded."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    before = _seed_chunks(spark, fmt)
    # parent ids 21, 22 re-extracted; 21 keeps one child row, 22's
    # array shrank to empty (no batch row)
    fmt.merge(
        "s.t",
        _rows(spark, (21, -1)),
        "k",
        delete_keys=spark.createDataFrame([Row(k=21), Row(k=22)]),
    )
    after = {e["dir"] for e in fmt._manifest("s.t")["entries"]}
    assert len(before & after) == 4
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got[21] == -1 and 22 not in got
    assert len(got) == 49


def test_delete_only_merge_is_noop_without_matches(spark, tmp_path):
    """An empty batch whose delete keys provably match nothing commits
    NOTHING — the stale-child sweep on an untouched child table is a
    metadata no-op (VERDICT r9 task 8)."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    _seed_chunks(spark, fmt)
    v = fmt._latest_version("s.t")
    empty = fmt.read("s.t").limit(0)
    fmt.merge(
        "s.t", empty, "k",
        delete_keys=spark.createDataFrame([Row(k=7777)]),
    )
    assert fmt._latest_version("s.t") == v  # no commit at all
    assert fmt.read("s.t").count() == 50


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_merge_cdc_classes(spark, tmp_path, kind):
    """Delta merge-CDF classes: matched+in-batch -> update pre/post,
    matched+absent -> delete, unmatched batch row -> insert; served by
    read_changes_cdf across the merge instead of refusing."""
    fmt = _fmt(spark, str(tmp_path), kind)
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20), (3, 30)), "overwrite")
    base = fmt._manifest("s.t")["version"]
    fmt.merge(
        "s.t",
        _rows(spark, (2, 22), (4, 44)),
        "k",
        delete_keys=spark.createDataFrame([Row(k=2), Row(k=3), Row(k=4)]),
    )
    feed = fmt.read_changes_cdf("s.t", base).collect()
    classes = {(r["k"], r["_change_type"]): r["v"] for r in feed}
    assert classes == {
        (2, "update_preimage"): 20,
        (2, "update_postimage"): 22,
        (3, "delete"): 30,
        (4, "insert"): 44,
    }
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got == {1: 10, 2: 22, 4: 44}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_cdf_mirror_replay_converges_across_merge(spark, tmp_path, kind):
    """A downstream mirror replaying the CDF (apply postimages+inserts,
    drop delete/preimage keys) converges to the table across appends,
    a merge, and a delete_where."""
    fmt = _fmt(spark, str(tmp_path), kind)
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    fmt.write("s.t", _rows(spark, (3, 30), (4, 40)), "append")
    fmt.merge("s.t", _rows(spark, (2, 22), (5, 50)), "k")
    fmt.delete_where("s.t", "k", 4, 4)
    feed = fmt.read_changes_cdf("s.t", 0)
    # replay: the last change per key wins (versions are ordered;
    # within one version postimage/insert is the surviving image)
    from pyspark.sql import Window

    rank = Window.partitionBy("k").orderBy(
        F.col("_commit_version").desc(),
        # within a version: survivor classes outrank preimage/delete
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(0).desc(),
    )
    mirror = (
        feed.withColumn("_rn", F.row_number().over(rank))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_change_type").isin("insert", "update_postimage"))
        .select("k", "v")
    )
    got = {(r["k"], r["v"]) for r in mirror.collect()}
    want = {(r["k"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == want == {(1, 10), (2, 22), (3, 30), (5, 50)}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_merge_racing_disjoint_append_rebases(
    spark, tmp_path, kind, monkeypatch
):
    """Round 13 (optimistic concurrency): merge vs a concurrent append
    whose entry stats are PROVABLY outside the merge's key range
    COMMUTES — the commit rebases in place, both effects land."""
    fmt = _fmt(spark, str(tmp_path), kind)
    other = _fmt(spark, str(tmp_path), kind)
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")

    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(name, version, entries, cols, txn=None, segments=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, (9, 90)), "append")
        return orig(name, version, entries, cols, txn, segments=segments, **kw)

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    fmt.merge("s.t", _rows(spark, (2, 22)), "k")
    got = {(r["k"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {(1, 10), (2, 22), (9, 90)}  # both effects land


def test_merge_vs_merge_race_recomputes_loser(spark, tmp_path, monkeypatch):
    """Two merges rewriting the SAME entry conflict (the loser's
    survivor set was computed from rows the winner rewrote) — the
    loser recomputes against the new head and the outcome equals the
    serial schedule: both upserts apply."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    other = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")

    orig = fmt._try_write_manifest
    state = {"injected": False}

    def racing(name, version, entries, cols, txn=None, segments=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            other.merge("s.t", _rows(spark, (1, 11)), "k")
        return orig(name, version, entries, cols, txn, segments=segments, **kw)

    monkeypatch.setattr(fmt, "_try_write_manifest", racing)
    fmt.merge("s.t", _rows(spark, (2, 22)), "k")
    got = {(r["k"], r["v"]) for r in fmt.read("s.t").collect()}
    assert got == {(1, 11), (2, 22)}


@pytest.mark.parametrize("verb", ["delete", "update", "merge"])
def test_dml_carries_streaming_writer_watermarks(spark, tmp_path, verb):
    """ADVICE r9 #1: a row-level DML commit must NOT reset the
    idempotent streaming-writer watermarks — a foreachBatch replay
    after a delete_where must still be recognized as committed, or the
    restart silently duplicates the batch."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    assert fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 7) is True
    if verb == "delete":
        assert fmt.delete_where("s.t", "k", 2, 2) == 1
    elif verb == "update":
        assert fmt.update_where("s.t", "k", {"v": "v + 1"}, 1, 1) == 1
    else:
        fmt.merge("s.t", _rows(spark, (1, 111)), "k")
    assert fmt._manifest("s.t")["txn"] == {"stream": 7}
    # the replay of batch 7 is still recognized — no duplicate rows
    assert fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 7) is False
    assert fmt.read("s.t").filter(F.col("k") == 3).count() == 1


def test_replace_still_resets_writer_watermarks(spark, tmp_path):
    """The documented replace semantics are unchanged: a full rewrite
    resets the txn map (the stream's checkpoint must be reset too)."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10)), "overwrite")
    fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 7)
    fmt.replace_atomic("s.t", _rows(spark, (5, 50)))
    assert fmt._manifest("s.t")["txn"] == {}


def test_cdf_refuses_on_txn_folded_intermediate_version(spark, tmp_path):
    """ADVICE r9 #2: an append and a delete committed under ONE catalog
    flip fold the append's version away — the CDF must refuse (the
    intervening inserts exist in no payload), not silently omit them."""
    fmt = _fmt(spark, str(tmp_path), "catalog")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    base = fmt._manifest("s.t")["version"]
    with fmt.transaction():
        fmt.write("s.t", _rows(spark, (3, 30)), "append")
        fmt.delete_where("s.t", "k", 1, 1)
    with pytest.raises(ValueError, match="resync"):
        fmt.read_changes_cdf("s.t", base).collect()


def test_constraint_removal_sentinel_never_persisted(spark, tmp_path):
    """ADVICE r9 #3: the {"__none__": true} removal sentinel is an
    in-memory edit convention — the on-disk manifest written after
    drop_constraint carries NO constraints key, and later commits do
    not resurrect one."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10)), "overwrite")
    fmt.add_constraint("s.t", "v_pos", "v > 0")
    fmt.drop_constraint("s.t", "v_pos")
    fmt.write("s.t", _rows(spark, (2, 20)), "append")
    log = os.path.join(str(tmp_path), "s", "t", "_log")
    for f in sorted(os.listdir(log)):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        body = json.loads(open(os.path.join(log, f)).read())
        assert "__none__" not in (body.get("constraints") or {}), f


def test_merge_enforces_constraints_and_schema(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    fmt.add_constraint("s.t", "v_pos", "v > 0")
    with pytest.raises(ValueError, match="v_pos"):
        fmt.merge("s.t", _rows(spark, (2, -5)), "k")
    # type change refuses like any append
    bad = spark.createDataFrame([Row(k=2, v="oops")])
    with pytest.raises(TypeError, match="type"):
        fmt.merge("s.t", bad, "k")
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got == {1: 10, 2: 20}  # nothing landed


def test_merge_additive_schema_evolution(spark, tmp_path):
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    batch = spark.createDataFrame([Row(k=2, v=22, extra="x")])
    fmt.merge("s.t", batch, "k")
    stored = {f["name"] for f in fmt._manifest("s.t")["schema"]["fields"]}
    assert stored == {"k", "v", "extra"}
    got = {(r["k"], r["v"], r["extra"]) for r in fmt.read("s.t").collect()}
    assert got == {(1, 10, None), (2, 22, "x")}


def test_root_key_merge_small_batch_carries_child_entries(spark, tmp_path):
    """Pipeline-level pin (VERDICT r9 tasks 1+8): a sync whose batch
    touches a narrow slice of a key-clustered raw table carries the
    out-of-range entries by identity on BOTH the parent and a child
    that received no rows."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        root_key_merge,
    )

    fmt = CatalogManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None,
        stats_cols=("_dlt_id", "_dlt_root_id"),
    )
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)

    def parent(ids):
        return spark.createDataFrame(
            [Row(_dlt_id=f"id{i:04d}", name=f"u{i}") for i in ids]
        )

    def child(ids):
        return spark.createDataFrame(
            [Row(_dlt_root_id=f"id{i:04d}", dev=f"d{i}") for i in ids]
        )

    # three key-range chunks per table
    for lo in (0, 100, 200):
        ids = range(lo, lo + 50)
        root_key_merge(
            wh, "users", {"users": parent(ids), "users__devices": child(ids)}
        )
    p_before = {e["dir"] for e in fmt._manifest("raw.users")["entries"]}
    c_before = {
        e["dir"] for e in fmt._manifest("raw.users__devices")["entries"]
    }
    # a micro-batch touching only the middle chunk, no child rows at
    # all (arrays shrank to empty): the child owes deletes, bounded
    root_key_merge(wh, "users", {"users": parent(range(100, 110))})
    p_after = {e["dir"] for e in fmt._manifest("raw.users")["entries"]}
    c_after = {
        e["dir"] for e in fmt._manifest("raw.users__devices")["entries"]
    }
    assert len(p_before & p_after) >= 2  # out-of-range chunks carried
    assert len(c_before & c_after) >= 2
    assert wh.read("raw.users").count() == 150
    # the re-extracted parents' child rows were purged
    assert (
        wh.read("raw.users__devices")
        .filter(F.col("_dlt_root_id") < "id0110")
        .filter(F.col("_dlt_root_id") >= "id0100")
        .count()
        == 0
    )
    assert wh.read("raw.users__devices").count() == 140


def test_txn_crash_between_bounded_merges_no_skew_no_resurrection(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 task 7: with merge file-granular, a mid-transaction
    crash between the parent's bounded merge and the child's must
    leave (a) zero reader-visible skew — both tables at the old state,
    entry sets untouched — and (b) zero resurrected entries after the
    retry and a vacuum: the crashed attempt's orphan manifest shares
    carried entries with committed versions, and the sweep must
    reclaim only its fresh dir, never the shared ones."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import (
        Warehouse,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        root_key_merge,
    )

    fmt = CatalogManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None,
        stats_cols=("_dlt_id", "_dlt_root_id"),
    )
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)

    def parent(ids, tag):
        return spark.createDataFrame(
            [Row(_dlt_id=f"id{i:04d}", name=f"{tag}{i}") for i in ids]
        )

    def child(ids, tag):
        return spark.createDataFrame(
            [Row(_dlt_root_id=f"id{i:04d}", dev=f"{tag}{i}") for i in ids]
        )

    for lo in (0, 100, 200):
        ids = range(lo, lo + 50)
        root_key_merge(
            wh, "users",
            {"users": parent(ids, "u"), "users__devices": child(ids, "d")},
        )
    p_before = {e["dir"] for e in fmt._manifest("raw.users")["entries"]}
    c_before = {
        e["dir"] for e in fmt._manifest("raw.users__devices")["entries"]
    }

    calls = {"n": 0}
    orig = Warehouse.materialize_upsert

    def crashing(self, name, df, unique_key, delete_keys=None):
        calls["n"] += 1
        if calls["n"] == 2:  # the child's upsert, inside the txn
            raise RuntimeError("simulated crash mid-merge")
        return orig(self, name, df, unique_key, delete_keys)

    monkeypatch.setattr(Warehouse, "materialize_upsert", crashing)
    batch = {
        "users": parent(range(100, 110), "v2u"),
        "users__devices": child(range(100, 105), "v2d"),
    }
    with pytest.raises(RuntimeError, match="simulated crash"):
        root_key_merge(wh, "users", batch)
    monkeypatch.setattr(Warehouse, "materialize_upsert", orig)

    # (a) zero skew: the catalog never flipped — both tables read the
    # old state, and the resolved entry sets are byte-identical
    assert wh.read("raw.users").filter(
        F.col("name").startswith("v2")
    ).count() == 0
    assert wh.read("raw.users__devices").count() == 150
    assert {e["dir"] for e in fmt._manifest("raw.users")["entries"]} == p_before
    assert {
        e["dir"] for e in fmt._manifest("raw.users__devices")["entries"]
    } == c_before

    # retry converges everywhere (idempotent same-batch re-run)
    root_key_merge(wh, "users", batch)
    assert wh.read("raw.users").count() == 150
    assert (
        wh.read("raw.users__devices")
        .filter(
            (F.col("_dlt_root_id") >= "id0100")
            & (F.col("_dlt_root_id") < "id0110")
        )
        .count()
        == 5
    )
    assert wh.read("raw.users__devices").count() == 145

    # (b) zero resurrection: vacuum reclaims the crashed attempt's
    # orphan dirs but never a dir a committed version still references
    fmt.vacuum("raw.users", keep_last=1, writer_grace_s=0)
    fmt.vacuum("raw.users__devices", keep_last=1, writer_grace_s=0)
    assert wh.read("raw.users").count() == 150
    got = {r["dev"] for r in wh.read("raw.users__devices").collect()}
    assert {f"v2d{i}" for i in range(100, 105)} <= got
    assert not {f"d{i}" for i in range(100, 110)} & got  # purged stay purged
    assert len(got) == 145


def test_zero_row_entries_are_prunable(spark, tmp_path):
    """An EMPTY micro-batch append (routine at a 15-minute cadence)
    records rows=0 on its entry; every pruning tier excludes it
    outright instead of keeping it forever as unknowable [None, None]
    stats — so later merges/deletes never rewrite it."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    fmt.write("s.t", spark.createDataFrame([], "k long, v long"), "append")
    m = fmt._manifest("s.t")
    assert [e.get("rows") for e in m["entries"]] == [2, 0]
    kept, _ = fmt.prune_entries("s.t", "k", 1, 100)
    assert len(kept) == 1  # the empty entry is provably no-match
    before = {e["dir"] for e in m["entries"]}
    fmt.merge("s.t", _rows(spark, (2, 22)), "k")
    after = {e["dir"] for e in fmt._manifest("s.t")["entries"]}
    # the empty entry carried by identity; only the real chunk re-landed
    assert len(before & after) == 1
    assert {r["v"] for r in fmt.read("s.t").collect()} == {10, 22}


def test_cluster_rewrite_carries_streaming_watermarks(spark, tmp_path):
    """Clustering is row-preserving maintenance: it must not reset the
    idempotent streaming-writer watermarks (same contract as
    delete/update/merge — a foreachBatch replay after an OPTIMIZE
    would otherwise land twice)."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10), (2, 20)), "overwrite")
    assert fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 7) is True
    fmt.cluster("s.t", "k", n_files=2)
    assert fmt._manifest("s.t")["txn"] == {"stream": 7}
    assert fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 7) is False
    assert fmt.read("s.t").filter(F.col("k") == 3).count() == 1


def test_append_nullability_narrowing_is_not_a_type_clash(spark, tmp_path):
    """Nullability is not a type: a computed frame whose array column
    carries containsNull=false must append onto a table whose stored
    schema says containsNull=true (parquet-derived frames always do),
    and the stored schema keeps the permissive variant.  A REAL
    element-type change still refuses."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write(
        "s.t",
        spark.createDataFrame([Row(k=1, arr=[1, 2])]),  # containsNull=true
        "overwrite",
    )
    narrow = spark.range(1).select(
        (F.col("id") + 10).alias("k"),
        F.array(F.lit(3).cast("long"), F.lit(4).cast("long")).alias("arr"),
    )
    assert not narrow.schema["arr"].dataType.containsNull
    fmt.write("s.t", narrow, "append")  # must NOT refuse
    stored = fmt._manifest("s.t")["schema"]
    arr_f = next(f for f in stored["fields"] if f["name"] == "arr")
    assert arr_f["type"]["containsNull"] is True
    assert fmt.read("s.t").count() == 2
    bad = spark.createDataFrame([Row(k=2, arr=["x"])])
    with pytest.raises(TypeError, match="type"):
        fmt.write("s.t", bad, "append")


def test_cluster_on_compact_makes_random_keys_prunable(spark, tmp_path):
    """The reference's merge key (_dlt_id) is a HASH — every append
    spans the whole key space, so min/max stats never prune and the
    bounded merge would degrade to a full rewrite forever.  With
    cluster_by, the threshold compaction lands the absorbed tail
    range-shuffled with per-file stats: the table converges to
    near-disjoint key ranges and a later micro-batch merge carries
    most files by identity."""
    import random as _r

    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=4,
        stats_cols=("k",), cluster_by="k",
    )
    rng = _r.Random(3)
    keys = list(range(600))
    rng.shuffle(keys)
    for i in range(6):  # each append spans ~the whole key space
        part = keys[i * 100 : (i + 1) * 100]
        fmt.write(
            "s.t", _rows(spark, *[(k, k) for k in part]),
            "append" if i else "overwrite",
        )
    # pre-compaction: every entry's range covers ~everything — a
    # narrow merge would be a full rewrite
    cand_pre, m_pre = fmt.prune_entries("s.t", "k", 21, 22)
    assert len(cand_pre) == len(m_pre["entries"])
    assert fmt.maybe_compact("s.t", target_file_bytes=10_000) >= 4
    m = fmt._manifest("s.t")
    per_file = [e for e in m["entries"] if e.get("rel")]
    assert len(per_file) >= 2  # clustered per-file entries landed
    # post-compaction: the same narrow range prunes to a strict subset
    cand_post, m2 = fmt.prune_entries("s.t", "k", 21, 22)
    assert 0 < len(cand_post) < len(m2["entries"])
    before = {
        (e["dir"], e.get("rel")) for e in m2["entries"]
    }
    fmt.merge("s.t", _rows(spark, (21, -1), (22, -2)), "k")
    after = {
        (e["dir"], e.get("rel"))
        for e in fmt._manifest("s.t")["entries"]
    }
    assert len(before & after) == len(before) - len(cand_post)
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got[21] == -1 and got[22] == -2 and len(got) == 600


def test_set_txn_restores_watermarks_monotonically(spark, tmp_path):
    """set_txn: metadata-only watermark restore — per app the HIGHER
    id wins, so restoring a captured map never rolls a cursor back
    under a stream that advanced meanwhile."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    fmt.write("s.t", _rows(spark, (1, 10)), "overwrite")
    fmt.write_streaming_batch("s.t", _rows(spark, (2, 20)), 5, app_id="a")
    captured = dict(fmt._manifest("s.t")["txn"])
    fmt.replace_atomic("s.t", _rows(spark, (9, 90)))
    assert fmt._manifest("s.t")["txn"] == {}
    v = fmt._latest_version("s.t")
    assert fmt.set_txn("s.t", captured) is True
    assert fmt._manifest("s.t")["txn"] == {"a": 5}
    assert fmt._latest_version("s.t") == v + 1  # one metadata commit
    assert fmt.read("s.t").count() == 1  # entries untouched
    # a stream that advanced past the captured id is never rolled back
    fmt.write_streaming_batch("s.t", _rows(spark, (3, 30)), 8, app_id="a")
    assert fmt.set_txn("s.t", captured) is False  # 5 < 8: no-op, no commit
    assert fmt._manifest("s.t")["txn"] == {"a": 8}


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_cdf_is_opt_in(spark, tmp_path, kind):
    """Change-data capture is opt-in (Delta's enableChangeDataFeed
    default): a cdf=False merge records NO cdc payload and writes no
    cdc dir — the classification cost is skipped entirely — and the
    CDF read refuses across the rewrite with an error naming the
    flag.  The append-only feed refuses too (unchanged)."""
    fmt = _fmt(spark, str(tmp_path), kind, cdf=False)
    _seed_chunks(spark, fmt)
    base = fmt._manifest("s.t")["version"]
    fmt.merge("s.t", _rows(spark, (21, -1), (99, -2)), "k")
    m = fmt._manifest("s.t")
    assert not m.get("cdc")
    assert not [
        d for d in fmt.fs.list_subdirs(fmt.path("s.t"))
        if d.startswith("cdc-")
    ]
    with pytest.raises(ValueError, match="cdf=True"):
        fmt.read_changes_cdf("s.t", base).collect()
    # merged content is identical to the cdf=True path's
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got[21] == -1 and got[99] == -2 and len(got) == 51


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_merge_txn_update_advances_watermark_atomically(
    spark, tmp_path, kind
):
    """r14: ``txn_update`` lands the idempotent-writer watermark inside
    the merge's own commit — higher-wins overlay, carried base map
    preserved, and the degraded no-match append path records it too."""
    fmt = _fmt(spark, str(tmp_path), kind)
    fmt.write("s.t", _rows(spark, (1, "a"), (2, "b")), "overwrite")
    fmt.set_txn("s.t", {"other-app": 7})
    fmt.merge(
        "s.t", _rows(spark, (2, "upd")), "k", txn_update={"sync": 5}
    )
    m = fmt._manifest("s.t", resolve=False, expand_lists=False)
    assert m["txn"] == {"other-app": 7, "sync": 5}
    # degraded append path (no matching key) also records
    fmt.merge(
        "s.t", _rows(spark, (99, "new")), "k", txn_update={"sync": 6}
    )
    m = fmt._manifest("s.t", resolve=False, expand_lists=False)
    assert m["txn"]["sync"] == 6 and m["txn"]["other-app"] == 7
    # higher-wins: a stale update never rolls the cursor back
    fmt.merge(
        "s.t", _rows(spark, (1, "again")), "k", txn_update={"sync": 2}
    )
    m = fmt._manifest("s.t", resolve=False, expand_lists=False)
    assert m["txn"]["sync"] == 6
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got == {1: "again", 2: "upd", 99: "new"}


def test_merge_txn_update_survives_conflict_rebase(
    spark, tmp_path, monkeypatch
):
    """A concurrent stats-disjoint append rebases inside the merge's
    commit — the watermark advance must survive the rebase (the head's
    carried txn would otherwise win wholesale)."""
    fmt = _fmt(spark, str(tmp_path), "manifest")
    other = fmt.writer_copy()
    fmt.write("s.t", _rows(spark, (1, "a")), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, (900, "far")), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    fmt.merge("s.t", _rows(spark, (1, "upd")), "k", txn_update={"sync": 9})
    m = fmt._manifest("s.t", resolve=False, expand_lists=False)
    assert m["txn"]["sync"] == 9
    got = {r["k"]: r["v"] for r in fmt.read("s.t").collect()}
    assert got == {1: "upd", 900: "far"}
