"""Optimistic concurrency for ManifestFormat (round 13, VERDICT task 1).

The reference's warehouse gets writer isolation from Postgres
transactions (reference docker-compose.yaml:307); Delta/Iceberg get it
from optimistic commit protocols.  These tests pin ours:

- blind appends ALWAYS commit (the rebaseable `_commit_edit` path,
  unchanged) — N appenders never lose a batch to each other or to
  concurrent mergers;
- row-level verbs (merge / delete_where / update_where / the MOR
  forms) commit iff every concurrent commit between their base and the
  winning head is DISJOINT from their read/write sets — disjoint deltas
  rebase inside the commit, intersecting ones raise CommitConflict and
  the verb recomputes against the new head, so the outcome equals the
  serial schedule (no lost updates, no resurrected rows, no duplicate
  keys);
- a genuinely conflicting interleaving is PINNED to raise
  CommitConflict at the commit layer (the classifier), and to
  produce the serial result at the verb layer (the retry loop).

Object-store posture (r14): the CAS primitive is the pluggable
LogStore seam — create-exclusive by default (atomic on HDFS/local
POSIX/conditional-PUT stores), an arbitrated backend for stores
without atomic conditional writes (tests/test_log_store.py).  The
protocol above is unchanged under either backend.
"""

from __future__ import annotations

import threading

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    CommitConflict,
    ManifestFormat,
)


def _fmt(spark, root, kind, **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    return cls(spark, root, **kw)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in pairs], "k long, val string"
    )


# -- stress: N threads appending + merging one table -----------------------


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_stress_appenders_and_mergers_serialize(spark, tmp_path, kind):
    """3 appender threads (disjoint new keys) + 2 merger threads
    (upserting the same 20 existing keys) race on one table.  Every
    commit must serialize: contiguous version history, no lost appended
    batch, no duplicate keys, and the surviving value of the merged
    keys is exactly ONE merger's tag (the one whose commit version is
    highest — the serial schedule)."""
    fmt = _fmt(
        spark, str(tmp_path), kind,
        stats_cols=("k",), auto_compact_dirs=None,
    )
    fmt.write("s.t", _rows(spark, [(k, "seed") for k in range(20)]),
              "overwrite")

    errors = []
    barrier = threading.Barrier(5)

    def appender(i):
        f = fmt.writer_copy()
        try:
            barrier.wait(timeout=120)
            for b in range(2):
                base = 100 + i * 20 + b * 10
                f.write(
                    "s.t",
                    _rows(spark, [(k, f"app{i}") for k in
                                  range(base, base + 5)]),
                    "append",
                )
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    def merger(i):
        f = fmt.writer_copy()
        try:
            barrier.wait(timeout=120)
            for b in range(2):
                f.merge(
                    "s.t",
                    _rows(spark, [(k, f"m{i}b{b}") for k in range(20)]),
                    "k",
                )
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(3)]
    threads += [threading.Thread(target=merger, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    rows = fmt.read("s.t").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r["val"])
    # no duplicate keys anywhere (merges dedup; appends were disjoint)
    dupes = {k: v for k, v in by_key.items() if len(v) > 1}
    assert not dupes, dupes
    # no lost appended batch: all 3 appenders x 2 batches x 5 keys
    appended = {k for k in by_key if k >= 100}
    assert appended == {
        100 + i * 20 + b * 10 + j
        for i in range(3) for b in range(2) for j in range(5)
    }
    # merged keys survived and converged on exactly one merger's tag
    merged_vals = {by_key[k][0] for k in range(20)}
    assert len(merged_vals) == 1, merged_vals
    tag = merged_vals.pop()
    assert tag in {f"m{i}b{b}" for i in range(2) for b in range(2)}
    # the surviving tag is the LAST merge in the serialized history
    # serialized history: 1 seed + 6 appends + 4 merges = 11 committed
    # versions.  On the manifest format they are contiguous (the CAS is
    # the version file); on the catalog format a lost flip leaves an
    # ORPHAN manifest above the committed chain (documented), so the
    # committed versions may skip numbers but must still count 11.
    hist = sorted(h["version"] for h in fmt.history("s.t"))
    assert len(hist) == 11, hist
    if kind == "manifest":
        assert hist == list(range(1, 12)), hist


# -- pinned conflict cases --------------------------------------------------


def test_classifier_pins_conflicting_append(spark, tmp_path):
    """The pinned CommitConflict case: a commit whose read set
    intersects a concurrently appended entry must raise, never rebase."""
    fmt = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    other = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    base = fmt._manifest("s.t")
    # concurrent commit lands first
    other.write("s.t", _rows(spark, [(2, "late")]), "append")
    with pytest.raises(CommitConflict, match="may match"):
        fmt._commit(
            "s.t", list(base["entries"]), list(base["partition_columns"]),
            base["version"], schema=base.get("schema"),
            txn=base.get("txn"),
            conflict={
                "base": base, "touched": set(), "removed": set(),
                "produced": [], "reads": lambda e: True,
            },
        )
    # the losing attempt changed nothing: both rows readable
    got = {(r["k"], r["val"]) for r in fmt.read("s.t").collect()}
    assert got == {(1, "a"), (2, "late")}


def test_classifier_pins_removed_read_target(spark, tmp_path):
    """A concurrent commit that rewrote an entry this operation READ
    conflicts even when the new data is predicate-disjoint (our
    survivors/masks were computed from the gone entry's rows)."""
    fmt = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    other = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    fmt.write("s.t", _rows(spark, [(1, "a"), (2, "b")]), "overwrite")
    base = fmt._manifest("s.t")
    touched = {fmt._entry_key(e) for e in base["entries"]}
    # concurrent COW rewrite of the same entries
    other.update_where("s.t", "k", {"val": "'hit'"}, 2, 2)
    with pytest.raises(CommitConflict, match="this operation read"):
        fmt._commit(
            "s.t", [], list(base["partition_columns"]),
            base["version"], schema=base.get("schema"),
            conflict={
                "base": base, "touched": touched, "removed": touched,
                "produced": [], "reads": None,
            },
        )


def test_classifier_pins_dv_change(spark, tmp_path):
    """A concurrent merge-on-read delete (dv change) conflicts: this
    operation read THROUGH the base's mask set."""
    fmt = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    other = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    fmt.write("s.t", _rows(spark, [(1, "a"), (2, "b")]), "overwrite")
    base = fmt._manifest("s.t")
    other.delete_where_mor("s.t", "k", 2, 2)
    with pytest.raises(CommitConflict, match="merge-on-read delete set"):
        fmt._commit(
            "s.t", list(base["entries"]), list(base["partition_columns"]),
            base["version"], schema=base.get("schema"),
            conflict={
                "base": base, "touched": set(), "removed": set(),
                "produced": [], "reads": None,
            },
        )


def test_retry_exhaustion_is_loud(spark, tmp_path):
    """Persistent conflicts surface as a RuntimeError naming the last
    conflict, never a silent loss or livelock."""
    fmt = _fmt(spark, str(tmp_path), "manifest")

    def always_conflicts():
        raise CommitConflict("synthetic")

    with pytest.raises(RuntimeError, match="conflict races"):
        fmt._retry_conflicts("s.t", always_conflicts)


# -- verb-level serialization under injected races --------------------------


def test_merge_conflicting_append_recomputes(spark, tmp_path, monkeypatch):
    """A concurrent append whose rows share keys with the merge batch
    serializes BEFORE the merge (it committed first): the retried merge
    must upsert the late row too — exactly one row per key afterward."""
    fmt = _fmt(spark, str(tmp_path), "manifest",
               stats_cols=("k",), auto_compact_dirs=None)
    other = _fmt(spark, str(tmp_path), "manifest",
                 stats_cols=("k",), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "old"), (2, "old")]), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, [(1, "late-dupe")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    fmt.merge("s.t", _rows(spark, [(1, "new"), (2, "new")]), "k")
    got = sorted((r["k"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(1, "new"), (2, "new")]


def test_merge_degraded_append_path_conflicts(spark, tmp_path, monkeypatch):
    """The no-match merge degrades to an append — but NOT a blind one:
    a concurrent append carrying a batch key must force the recompute
    (plain rebase would leave a duplicate key)."""
    fmt = _fmt(spark, str(tmp_path), "manifest",
               stats_cols=("k",), auto_compact_dirs=None)
    other = _fmt(spark, str(tmp_path), "manifest",
                 stats_cols=("k",), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "seed")]), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            # lands key 5 — the merge batch's key, unmatched at base
            other.write("s.t", _rows(spark, [(5, "late")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    fmt.merge("s.t", _rows(spark, [(5, "new")]), "k")
    got = sorted((r["k"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(1, "seed"), (5, "new")]


def test_delete_where_disjoint_append_rebases_without_recompute(
    spark, tmp_path, monkeypatch
):
    """A concurrent append PROVABLY outside the delete's predicate
    (entry stats disjoint) rebases inside the commit: the verb body
    runs once (one survivor rewrite), both effects land."""
    fmt = _fmt(spark, str(tmp_path), "manifest",
               stats_cols=("k",), auto_compact_dirs=None)
    other = _fmt(spark, str(tmp_path), "manifest",
                 stats_cols=("k",), auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a"), (2, "b")]), "overwrite")

    orig = fmt._new_data_dir
    calls = {"n": 0, "injected": False}

    def racing(name, df, partition_by):
        calls["n"] += 1
        out = orig(name, df, partition_by)
        if not calls["injected"]:
            calls["injected"] = True
            other.write("s.t", _rows(spark, [(500, "far")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.delete_where("s.t", "k", 2, 2) == 1
    # one survivor-rewrite landing only: the commit rebased, the verb
    # never recomputed
    assert calls["n"] == 1
    got = sorted((r["k"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(1, "a"), (500, "far")]


def test_mor_delete_racing_candidate_rewrite_recomputes(
    spark, tmp_path, monkeypatch
):
    """A MOR delete whose applies-target is concurrently COW-rewritten
    must recompute: committing the stale mask would point at a gone
    entry and silently resurrect the rows in its replacement."""
    fmt = _fmt(spark, str(tmp_path), "manifest",
               stats_cols=("k",), auto_compact_dirs=None)
    other = _fmt(spark, str(tmp_path), "manifest",
                 stats_cols=("k",), auto_compact_dirs=None)
    fmt.write(
        "s.t", _rows(spark, [(k, "v") for k in range(1, 11)]), "overwrite"
    )

    orig = fmt._read_with_dv
    state = {"injected": False}

    def racing(name, m, entries, **kw):
        if not state["injected"]:
            state["injected"] = True
            # concurrent COW update rewrites the single data dir the
            # MOR delete's mask would apply to
            other.update_where("s.t", "k", {"val": "'hit'"}, 9, 9)
        return orig(name, m, entries, **kw)

    monkeypatch.setattr(fmt, "_read_with_dv", racing)
    assert fmt.delete_where_mor("s.t", "k", 1, 2) == 2
    got = sorted((r["k"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(k, "hit" if k == 9 else "v") for k in range(3, 11)]


def test_cdf_feed_contiguous_across_rebased_commit(
    spark, tmp_path, monkeypatch
):
    """A rebased DML commit re-stamps its CDC payload's `since` to the
    head it now covers, so the change feed serves the intervening
    append as inserts and the DML's rows after it — no spurious
    refusal."""
    fmt = _fmt(spark, str(tmp_path), "manifest",
               stats_cols=("k",), cdf=True, auto_compact_dirs=None)
    other = _fmt(spark, str(tmp_path), "manifest",
                 stats_cols=("k",), cdf=True, auto_compact_dirs=None)
    fmt.write("s.t", _rows(spark, [(1, "a"), (2, "b")]), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, [(500, "far")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.delete_where("s.t", "k", 2, 2) == 1
    feed = fmt.read_changes_cdf("s.t", since_version=1).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], set()).add(r["k"])
    assert by_type.get("insert") == {500}
    assert by_type.get("delete") == {2}


def test_conflict_reads_consult_aliases_after_rename(
    spark, tmp_path, monkeypatch
):
    """Post-rename, the conflict read-set check must prune a
    concurrently appended entry by its REAL stats even though old
    entries recorded them under the alias — a stats-disjoint append
    rebases (one verb pass), it does not conservatively conflict."""
    fmt = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    other = _fmt(spark, str(tmp_path), "manifest", stats_cols=("k",))
    fmt.write("s.t", _rows(spark, [(1, "a"), (2, "b")]), "overwrite")
    fmt.rename_column("s.t", "k", "key")

    orig = fmt._new_data_dir
    calls = {"n": 0, "injected": False}

    def racing(name, df, partition_by):
        calls["n"] += 1
        out = orig(name, df, partition_by)
        if not calls["injected"]:
            calls["injected"] = True
            other.write(
                "s.t",
                spark.createDataFrame([(500, "far")], "key long, val string"),
                "append",
            )
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.delete_where("s.t", "key", 2, 2) == 1
    assert calls["n"] == 1  # rebase, not recompute
    got = sorted((r["key"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(1, "a"), (500, "far")]


def test_conflict_rebase_on_segmented_manifest(spark, tmp_path, monkeypatch):
    """The classifier's delta runs over inline tails + changed segments
    via resolved-entry object identity (untouched segments' entries are
    the cache's shared objects) — a delete racing a disjoint append on
    a SEGMENTED table must rebase exactly like on a flat one."""
    fmt = _fmt(spark, str(tmp_path), "manifest", segment_entries=4)
    other = _fmt(spark, str(tmp_path), "manifest", segment_entries=4)
    for i in range(12):  # forces segment spill at tail > 4
        fmt.write(
            "s.t", _rows(spark, [(i * 10 + j, f"b{i}") for j in range(3)]),
            "append" if i else "overwrite",
        )
    assert fmt._manifest("s.t", resolve=False).get("segments")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, [(900, "far")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.delete_where("s.t", "k", 50, 52) == 3
    got = {r["k"] for r in fmt.read("s.t").collect()}
    assert 900 in got and not ({50, 51, 52} & got)
    assert len(got) == 12 * 3 - 3 + 1


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_update_where_racing_disjoint_append_both_land(
    spark, tmp_path, kind, monkeypatch
):
    """Both formats: an update racing a stats-disjoint append commits
    without losing either effect (catalog format rebases across the
    flip)."""
    fmt = _fmt(spark, str(tmp_path), kind,
               stats_cols=("k",), auto_compact_dirs=None)
    other = fmt.writer_copy()
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.write("s.t", _rows(spark, [(900, "far")]), "append")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    assert fmt.update_where("s.t", "k", {"val": "'hit'"}, 1, 1) == 1
    got = sorted((r["k"], r["val"]) for r in fmt.read("s.t").collect())
    assert got == [(1, "hit"), (900, "far")]


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_append_racing_rename_refuses_retired_name(
    spark, tmp_path, kind, monkeypatch
):
    """ADVICE r13 (high): an append whose column name is retired by a
    CONCURRENT rename between its pre-land check and its CAS must abort
    on rebase — merging it back in as a new live field would let old
    files' physical data resurrect through the read-side coalesce (the
    exact corruption `_enforce_append_schema` refuses when the rename
    is already visible)."""
    fmt = _fmt(spark, str(tmp_path), kind, auto_compact_dirs=None)
    other = fmt.writer_copy()
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    fmt.write("s.t", base, "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.rename_column("s.t", "v", "value")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    late = spark.createDataFrame([(2, "ghost")], "k long, v string")
    with pytest.raises(RuntimeError, match="retired|rename"):
        fmt.write("s.t", late, "append")
    # the refused batch must not be readable, under either name
    got = fmt.writer_copy().read("s.t")
    rows = sorted((r["k"], r["value"]) for r in got.collect())
    assert rows == [(1, "a")]
    assert "v" not in got.columns


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_append_racing_drop_refuses_retired_name(
    spark, tmp_path, kind, monkeypatch
):
    """Same rebase guard for drop_column: re-adding the dropped name via
    a racing append would resurrect the tombstoned physical column."""
    fmt = _fmt(spark, str(tmp_path), kind, auto_compact_dirs=None)
    other = fmt.writer_copy()
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    fmt.write("s.t", base, "overwrite")

    orig = fmt._new_data_dir
    state = {"injected": False}

    def racing(name, df, partition_by):
        out = orig(name, df, partition_by)
        if not state["injected"]:
            state["injected"] = True
            other.drop_column("s.t", "v")
        return out

    monkeypatch.setattr(fmt, "_new_data_dir", racing)
    late = spark.createDataFrame([(2, "ghost")], "k long, v string")
    with pytest.raises(RuntimeError, match="retired|drop"):
        fmt.write("s.t", late, "append")
    got = fmt.writer_copy().read("s.t")
    assert "v" not in got.columns
    assert sorted(r["k"] for r in got.collect()) == [1]
