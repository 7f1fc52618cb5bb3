"""Hierarchical manifest segments: commit cost bounded by CHANGE size.

The flat commit-log rewrites the full entry list in every version file
— the measured O(entries) ceiling in PERF_NOTES (~10 MB manifests /
~340 ms commits at 100k entries).  ``segment_entries`` adds the
Iceberg-manifest-list / Delta-checkpoint tier: entries spill into
immutable ``_log/seg-*.json`` files and the version file carries REFS
plus a bounded inline tail.  These tests pin the contract:

- reads/time-travel/history/change-feed over a segmented table are
  byte-identical to the flat twin;
- appends never rewrite an existing segment file (carried by ref);
- an entry-dropping edit dissolves ONLY the segments it touches;
- the inline tail in every committed version file stays <= threshold;
- vacuum reclaims unreferenced segment files (age-guarded, like data
  dirs — segments land BEFORE the CAS) and keeps referenced ones;
- a flat-configured handle can read and edit a segmented table
  without stranding it (setting flip safety);
- both commit-log formats (plain + catalog) honor all of the above.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _mk(spark, root, seg, cls=ManifestFormat, **kw):
    return cls(
        spark, str(root), auto_compact_dirs=None, segment_entries=seg, **kw
    )


def _log_dir(fmt, name):
    return os.path.join(fmt.path(name), fmt.LOG_DIR)


def _raw_head(fmt, name):
    d = _log_dir(fmt, name)
    vf = sorted(f for f in os.listdir(d) if f.startswith("v"))[-1]
    return json.load(open(os.path.join(d, vf)))


def _seg_files(fmt, name):
    return {
        f: os.path.getmtime(os.path.join(_log_dir(fmt, name), f))
        for f in os.listdir(_log_dir(fmt, name))
        if f.startswith("seg-")
    }


def _days(spark, day, lo, hi):
    return spark.createDataFrame(
        [Row(day=day, v=v) for v in range(lo, hi)]
    )


def test_segmented_reads_match_flat_twin(spark, tmp_path):
    seg = _mk(spark, tmp_path / "s", 4)
    flat = _mk(spark, tmp_path / "f", None)
    for i in range(8):
        df = spark.range(i * 10, i * 10 + 10).selectExpr(
            "id as v", "cast(id % 3 as string) as p"
        )
        seg.write("s.t", df, "append", partition_by=("p",))
        flat.write("s.t", df, "append", partition_by=("p",))
    assert sorted(r["v"] for r in seg.read("s.t").collect()) == sorted(
        r["v"] for r in flat.read("s.t").collect()
    )
    # every committed version file keeps its inline tail bounded
    d = _log_dir(seg, "s.t")
    for vf in (f for f in os.listdir(d) if f.startswith("v")):
        m = json.load(open(os.path.join(d, vf)))
        assert len(m["entries"]) <= 4, vf
    # history / time travel resolve through segments
    assert [h["n_entries"] for h in seg.history("s.t")] == [
        h["n_entries"] for h in flat.history("s.t")
    ]
    assert seg.read_version("s.t", 3).count() == 30
    # a cold handle (empty segment cache) resolves identically
    cold = ManifestFormat(spark, str(tmp_path / "s"))
    assert cold.read("s.t").count() == 80


def test_append_never_rewrites_carried_segments(spark, tmp_path):
    fmt = _mk(spark, tmp_path, 1)
    fmt.write("s.t", _days(spark, "d1", 0, 3), "append", ("day",))
    fmt.write("s.t", _days(spark, "d2", 3, 6), "append", ("day",))
    before = _seg_files(fmt, "s.t")
    assert before, "expected at least one segment after threshold overflow"
    fmt.write("s.t", _days(spark, "d3", 6, 9), "append", ("day",))
    after = _seg_files(fmt, "s.t")
    for f, mtime in before.items():
        assert f in after and after[f] == mtime, (
            "append rewrote an existing segment file"
        )
    # carried refs appear in the new head
    head = _raw_head(fmt, "s.t")
    assert {s["file"] for s in head["segments"]} >= set(before)


def test_drop_dissolves_only_touched_segments(spark, tmp_path):
    # one append per day => each flushed segment holds one day's entry,
    # so dropping one day must dissolve exactly that day's segment
    fmt = _mk(spark, tmp_path, 0)  # flush every commit: 1 entry per seg
    for i, day in enumerate(["d1", "d2", "d3", "d4"]):
        fmt.write("s.t", _days(spark, day, i * 5, i * 5 + 5), "append", ("day",))
    head = _raw_head(fmt, "s.t")
    assert len(head["segments"]) == 4 and not head["entries"]
    # map each segment to the day it holds
    by_day = {}
    for s in head["segments"]:
        e = fmt._load_segment("s.t", s["file"])
        assert len(e) == 1
        by_day[e[0]["partitions"]["day"]] = s["file"]
    fmt.drop_partitions_below("s.t", "day", "d2")  # drops only d1
    head2 = _raw_head(fmt, "s.t")
    kept = {s["file"] for s in head2["segments"]}
    assert by_day["d1"] not in kept
    assert {by_day["d2"], by_day["d3"], by_day["d4"]} <= kept
    assert sorted(r["v"] for r in fmt.read("s.t").collect()) == list(
        range(5, 20)
    )


def test_flat_handle_edits_segmented_table_without_stranding(
    spark, tmp_path
):
    seg = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2", "d3"]):
        seg.write("s.t", _days(spark, day, i * 2, i * 2 + 2), "append", ("day",))
    carried = set(_seg_files(seg, "s.t"))
    flat = ManifestFormat(spark, str(tmp_path), auto_compact_dirs=None)
    # a flat-configured writer appends: carried refs preserved, new
    # entries inline, nothing rewritten wholesale
    flat.write("s.t", _days(spark, "d4", 6, 8), "append", ("day",))
    head = _raw_head(flat, "s.t")
    assert {s["file"] for s in head["segments"]} == carried
    assert len(head["entries"]) == 1  # just the new day, inline
    assert flat.read("s.t").count() == 8


def test_vacuum_sweeps_orphan_segments_keeps_live(spark, tmp_path):
    fmt = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2", "d3"]):
        fmt.write("s.t", _days(spark, day, i, i + 1), "append", ("day",))
    # dissolve d1's segment; its file is now referenced only by OLD
    # versions, which vacuum(keep_last=1) drops
    fmt.drop_partitions_below("s.t", "day", "d2")
    live = {s["file"] for s in _raw_head(fmt, "s.t")["segments"]}
    assert set(_seg_files(fmt, "s.t")) > live
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    assert set(_seg_files(fmt, "s.t")) == live
    assert fmt.read("s.t").count() == 2
    # age guard: a young orphan segment survives a graced vacuum
    orphan = os.path.join(_log_dir(fmt, "s.t"), "seg-orphan.json")
    with open(orphan, "w") as fh:
        json.dump({"entries": []}, fh)
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=3600)
    assert os.path.exists(orphan), "graced vacuum deleted a young segment"
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    assert not os.path.exists(orphan)


def test_change_feed_and_streaming_append_on_segmented_table(
    spark, tmp_path
):
    fmt = _mk(spark, tmp_path, 1)
    flat = _mk(spark, tmp_path / "flat", None)
    for f in (fmt, flat):
        f.write_streaming_batch("s.t", _days(spark, "d1", 0, 2), 1, "app")
        f.write_streaming_batch("s.t", _days(spark, "d2", 2, 4), 2, "app")
        # replayed batch: must no-op on both
        assert not f.write_streaming_batch(
            "s.t", _days(spark, "d2", 2, 4), 2, "app"
        )
        f.write_streaming_batch("s.t", _days(spark, "d3", 4, 6), 3, "app")
    assert fmt.read("s.t").count() == flat.read("s.t").count() == 6
    ch_seg = fmt.read_changes("s.t", since_version=1)
    ch_flat = flat.read_changes("s.t", since_version=1)
    assert sorted(r["v"] for r in ch_seg.collect()) == sorted(
        r["v"] for r in ch_flat.collect()
    )


@pytest.mark.parametrize("seg", [0, 2])
def test_catalog_format_segments_and_transaction(spark, tmp_path, seg):
    fmt = _mk(spark, tmp_path, seg, cls=CatalogManifestFormat)
    with fmt.transaction():
        fmt.write("s.a", spark.range(0, 5).toDF("v"), "append")
        fmt.write("s.b", spark.range(5, 9).toDF("v"), "append")
    for i in range(3):
        fmt.write("s.a", spark.range(10 + i, 11 + i).toDF("v"), "append")
    assert fmt.read("s.a").count() == 8
    assert fmt.read("s.b").count() == 4
    head = _raw_head(fmt, "s.a")
    assert len(head["entries"]) <= seg
    assert head["segments"]
    fmt.vacuum("s.a", keep_last=1, writer_grace_s=0)
    live = {s["file"] for s in _raw_head(fmt, "s.a")["segments"]}
    assert set(_seg_files(fmt, "s.a")) == live
    assert fmt.read("s.a").count() == 8
    # aborted transaction: segments it wrote become orphans, swept
    try:
        with fmt.transaction():
            fmt.write("s.a", spark.range(99, 105).toDF("v"), "append")
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    assert fmt.read("s.a").count() == 8
    fmt.vacuum("s.a", keep_last=1, writer_grace_s=0)
    assert set(_seg_files(fmt, "s.a")) == live


def test_concurrent_appends_rebase_with_segments(spark, tmp_path):
    """Two writer threads appending through the segmented commit path:
    both land, neither lost, carried segments intact (the optimistic
    protocol is orthogonal to the metadata tier)."""
    import threading

    fmt = _mk(spark, tmp_path, 1)
    fmt.write("s.t", _days(spark, "d0", 0, 3), "append", ("day",))
    errs = []

    def appender(day, lo):
        try:
            w = fmt.writer_copy()
            w.write("s.t", _days(spark, day, lo, lo + 3), "append", ("day",))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=appender, args=(f"d{i}", i * 10))
        for i in (1, 2)
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    got = sorted(r["v"] for r in fmt.read("s.t").collect())
    assert got == [0, 1, 2, 10, 11, 12, 20, 21, 22]


def test_stats_pruning_survives_segmentation(spark, tmp_path):
    """read_where's manifest-tier skipping works identically when the
    stats-bearing entries live in segment files."""
    fmt = ManifestFormat(
        spark,
        str(tmp_path),
        auto_compact_dirs=None,
        stats_cols=("v",),
        segment_entries=0,
    )
    for i in range(4):
        fmt.write(
            "s.t", spark.range(i * 10, i * 10 + 10).toDF("v"), "append"
        )
    df = fmt.read_where("s.t", "v", 15, 25)
    assert sorted(r["v"] for r in df.collect()) == list(range(15, 26))
    kept, m = fmt.prune_entries("s.t", "v", 15, 25)
    assert len(kept) == 2 and len(m["entries"]) == 4


def test_segment_refs_carry_rolled_up_stats(spark, tmp_path):
    fmt = ManifestFormat(
        spark,
        str(tmp_path),
        auto_compact_dirs=None,
        stats_cols=("v",),
        segment_entries=0,
    )
    for i in range(3):
        fmt.write("s.t", spark.range(i * 10, i * 10 + 10).toDF("v"), "append")
    head = _raw_head(fmt, "s.t")
    spans = sorted(
        tuple(s["stats"]["v"][:2]) for s in head["segments"]
    )
    assert spans == [(0, 9), (10, 19), (20, 29)]


def test_read_where_skips_whole_segments(spark, tmp_path):
    fmt = ManifestFormat(
        spark,
        str(tmp_path),
        auto_compact_dirs=None,
        stats_cols=("v",),
        segment_entries=0,
    )
    for i in range(4):
        fmt.write("s.t", spark.range(i * 10, i * 10 + 10).toDF("v"), "append")
    # cold reader: its segment cache records exactly which seg files
    # were parsed — the excluded segments must never be touched
    reader = ManifestFormat(spark, str(tmp_path))
    got = sorted(r["v"] for r in reader.read_where("s.t", "v", 12, 17).collect())
    assert got == list(range(12, 18))
    head = _raw_head(fmt, "s.t")
    by_span = {tuple(s["stats"]["v"][:2]): s["file"] for s in head["segments"]}
    loaded = {os.path.basename(p) for p in reader._seg_cache}
    assert loaded == {by_span[(10, 19)]}, loaded
    # empty result: schema probe may parse one segment, but the frame
    # is empty and correct
    assert reader.read_where("s.t", "v", 900, 999).count() == 0


def test_segment_without_full_stats_is_never_skipped(spark, tmp_path):
    # first commit written WITHOUT stats_cols: its segment ref gets no
    # rolled-up stats and must always be loaded (keep-by-default)
    plain = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, segment_entries=0
    )
    plain.write("s.t", spark.range(0, 10).toDF("v"), "append")
    fmt = ManifestFormat(
        spark,
        str(tmp_path),
        auto_compact_dirs=None,
        stats_cols=("v",),
        segment_entries=0,
    )
    fmt.write("s.t", spark.range(10, 20).toDF("v"), "append")
    head = _raw_head(fmt, "s.t")
    with_stats = [s for s in head["segments"] if "stats" in s]
    without = [s for s in head["segments"] if "stats" not in s]
    assert len(with_stats) == 1 and len(without) == 1
    reader = ManifestFormat(spark, str(tmp_path))
    got = sorted(r["v"] for r in reader.read_where("s.t", "v", 2, 4).collect())
    assert got == [2, 3, 4]
    loaded = {os.path.basename(p) for p in reader._seg_cache}
    assert without[0]["file"] in loaded


def test_segment_refs_carry_partition_ranges(spark, tmp_path):
    """r10: flushed refs record per-column partition-value [min, max]
    so partition edits can skip whole segments without parsing."""
    fmt = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2"]):
        fmt.write("s.t", _days(spark, day, i * 5, i * 5 + 5), "append", ("day",))
    head = _raw_head(fmt, "s.t")
    ranges = sorted(s["partitions"]["day"] for s in head["segments"])
    assert ranges == [["d1", "d1"], ["d2", "d2"]]


def _counting(fmt, monkeypatch):
    calls = []
    orig = fmt._load_segment

    def counting(name, fname):
        calls.append(fname)
        return orig(name, fname)

    monkeypatch.setattr(fmt, "_load_segment", counting)
    return calls


def test_drop_partitions_skips_untouched_segments_unparsed(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 task 6: retention on a segmented table must not even
    PARSE segments whose recorded partition range proves every entry
    is at/above the cutoff — commit metadata cost scales with the
    dropped tail, not the table."""
    fmt = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2", "d3", "d4"]):
        fmt.write("s.t", _days(spark, day, i * 5, i * 5 + 5), "append", ("day",))
    head = _raw_head(fmt, "s.t")
    by_day = {
        fmt._load_segment("s.t", s["file"])[0]["partitions"]["day"]: s["file"]
        for s in head["segments"]
    }
    calls = _counting(fmt, monkeypatch)
    assert fmt.drop_partitions_below("s.t", "day", "d2") == 1
    # only d1's segment (the one being dropped) was parsed
    assert set(calls) == {by_day["d1"]}
    assert sorted(r["v"] for r in fmt.read("s.t").collect()) == list(
        range(5, 20)
    )
    # the carried refs survive verbatim, ranges intact
    head2 = _raw_head(fmt, "s.t")
    kept = {s["file"]: s for s in head2["segments"]}
    for d in ("d2", "d3", "d4"):
        assert kept[by_day[d]]["partitions"]["day"] == [d, d]


def test_dynamic_partition_overwrite_skips_untouched_segments(
    spark, tmp_path, monkeypatch
):
    fmt = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2", "d3", "d4"]):
        fmt.write("s.t", _days(spark, day, i * 5, i * 5 + 5), "append", ("day",))
    head = _raw_head(fmt, "s.t")
    by_day = {
        fmt._load_segment("s.t", s["file"])[0]["partitions"]["day"]: s["file"]
        for s in head["segments"]
    }
    calls = _counting(fmt, monkeypatch)
    fmt.dynamic_partition_overwrite(
        "s.t", _days(spark, "d2", 100, 103), "day"
    )
    # only d2's segment (the replaced day) was parsed
    assert set(calls) == {by_day["d2"]}
    got = sorted(r["v"] for r in fmt.read("s.t").collect())
    assert got == list(range(5)) + list(range(10, 20)) + [100, 101, 102]
    head2 = _raw_head(fmt, "s.t")
    kept = {s["file"] for s in head2["segments"]}
    assert {by_day["d1"], by_day["d3"], by_day["d4"]} <= kept
    assert by_day["d2"] not in kept


def test_partition_edits_on_rangeless_segments_still_correct(
    spark, tmp_path, monkeypatch
):
    """Pre-r10 segment refs carry no partition ranges — the edits must
    parse them (keep-by-default) and stay correct."""
    import json as _json

    fmt = _mk(spark, tmp_path, 0)
    for i, day in enumerate(["d1", "d2", "d3"]):
        fmt.write("s.t", _days(spark, day, i * 5, i * 5 + 5), "append", ("day",))
    # strip the ranges from the head's refs, as an old writer would have
    d = _log_dir(fmt, "s.t")
    vf = sorted(f for f in os.listdir(d) if f.startswith("v"))[-1]
    path = os.path.join(d, vf)
    head = _json.loads(fmt.fs.read_text(path))
    for s in head["segments"]:
        s.pop("partitions", None)
    # rewrite through the format's FS so the local checksum stays valid
    fmt.fs.delete(path)
    fmt.fs.write_text(path, _json.dumps(head), overwrite=False)
    assert fmt.drop_partitions_below("s.t", "day", "d2") == 1
    assert sorted(r["v"] for r in fmt.read("s.t").collect()) == list(
        range(5, 15)
    )


def test_ref_list_spools_into_manifest_list_tier(spark, tmp_path):
    """Round-11 third tier (Iceberg's manifest list): above 64 refs the
    version file stores segl-*.json LIST refs instead of the flat ref
    list — resolution is unchanged, an append carries the list file by
    reference (same mtime), and vacuum sweeps a dissolved list."""
    import json
    import os

    fmt = _mk(spark, tmp_path, 1)  # 1 entry per segment: refs pile up
    # 70 single-entry commits -> ~70 refs > the 64-ref spill threshold
    for i in range(70):
        fmt.write("s.t", _days(spark, f"d{i:03d}", i, i + 1), "append", ("day",))
    head = _raw_head(fmt, "s.t")
    lists = [s for s in head["segments"] if "list" in s]
    assert lists, "expected the ref list to spool above 64 refs"
    inline = [s for s in head["segments"] if "file" in s]
    assert len(inline) <= 64
    # resolution sees every entry exactly once
    m = fmt._manifest("s.t")
    assert len(m["entries"]) == 70
    assert fmt.read("s.t").count() == 70
    # an append carries the spooled list BY REFERENCE: same file, same
    # mtime, and the new head still points at it
    lpath = os.path.join(fmt._log_path("s.t"), lists[0]["list"])
    mt0 = fmt.fs.mtime(lpath)
    fmt.write("s.t", _days(spark, "d999", 999, 1000), "append", ("day",))
    head2 = _raw_head(fmt, "s.t")
    assert lists[0]["list"] in {
        s.get("list") for s in head2["segments"] if "list" in s
    }
    assert fmt.fs.mtime(lpath) == mt0
    assert fmt.read("s.t").count() == 71
    # a cold reader resolves the spooled form identically
    cold = _mk(spark, tmp_path, 1)
    assert cold.read("s.t").count() == 71
    # stats/partition rollups survive the extra tier: the partition
    # drop still prunes and the dropped rows disappear
    dropped = fmt.drop_partitions_below("s.t", "day", "d010")
    assert dropped == 10
    assert fmt.read("s.t").count() == 61
    # vacuum on the head sweeps any list file no retained version
    # references
    fmt.vacuum("s.t", keep_last=1, writer_grace_s=0)
    live = {
        s.get("list")
        for s in _raw_head(fmt, "s.t")["segments"]
        if "list" in s
    }
    on_disk = {
        f
        for f in fmt.fs.list_files(fmt._log_path("s.t"))
        if f.startswith("segl-")
    }
    assert on_disk == {x for x in live if x}
    assert fmt.read("s.t").count() == 61


def test_seglist_tier0_pruning_skips_excluded_list_files(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 task 1 (lazy tier-3 resolution): a cold selective
    ``read_where`` must not even PARSE ``segl-*.json`` list files whose
    ROLLED stats exclude the range — the same never-parsed guarantee
    the segment tier pins, one level up.  Metadata cost of a narrow
    read then scales with MATCHING list files, not the table's ref
    count."""
    monkeypatch.setattr(ManifestFormat, "SEGLIST_SPILL_REFS", 4)
    fmt = _mk(spark, tmp_path, 1, stats_cols=("v",))
    # 14 single-entry commits with disjoint v-ranges -> 14 refs ->
    # >=2 spooled list files (4 refs each) + a small inline tail
    for i in range(14):
        fmt.write(
            "s.t", _days(spark, f"d{i:03d}", i * 10, i * 10 + 5),
            "append", ("day",),
        )
    head = _raw_head(fmt, "s.t")
    lists = [s for s in head["segments"] if "list" in s]
    assert len(lists) >= 2, "layout must spool into multiple list files"
    # every spooled list carries rolled stats (tier-0's fuel)
    assert all("stats" in s and "v" in s["stats"] for s in lists)

    # map each list file -> its members' v-range, to know the one
    # matching list for a narrow probe range
    by_list = {
        s["list"]: [
            r["stats"]["v"] for r in fmt._load_seglist("s.t", s["list"])
        ]
        for s in lists
    }
    target = lists[0]["list"]
    t_lo = min(r[0] for r in by_list[target])

    cold = _mk(spark, tmp_path, 1, stats_cols=("v",))
    segl_calls, seg_calls = [], []
    orig_l, orig_s = cold._load_seglist, cold._load_segment

    def count_l(name, fname):
        segl_calls.append(fname)
        return orig_l(name, fname)

    def count_s(name, fname):
        seg_calls.append(fname)
        return orig_s(name, fname)

    monkeypatch.setattr(cold, "_load_seglist", count_l)
    monkeypatch.setattr(cold, "_load_segment", count_s)
    got = sorted(
        r["v"] for r in cold.read_where("s.t", "v", t_lo, t_lo + 2).collect()
    )
    assert got == [t_lo, t_lo + 1, t_lo + 2]  # hi inclusive
    # ONLY the matching list file was parsed; the excluded lists'
    # segment files were never touched either
    assert set(segl_calls) == {target}
    member_files = {
        r["file"] for r in fmt._load_seglist("s.t", target)
    }
    assert set(seg_calls) <= member_files
    # equivalence with the fully-resolved flat prune (the tier-0 path
    # must never change results, only skip work)
    flat = sorted(
        r["v"]
        for r in _mk(spark, tmp_path, 1, stats_cols=("v",))
        .read_where("s.t", "v", t_lo, t_lo + 2)
        .collect()
    )
    assert flat == got


def test_append_never_parses_segments(spark, tmp_path, monkeypatch):
    """r12 resolve-free append: on a segmented table, ``write(mode=
    'append')`` must not parse a single SEGMENT file — refs carry
    verbatim through the two-tier edit (6-tuple), so commit cost is
    O(inline tail + batch) at any entry count (probe: 7 ms at 1M
    entries).  Only the O(lists) segl tier may load (spool carry);
    resolution still sees every entry exactly once."""
    fmt = _mk(spark, tmp_path, 2)
    for i in range(8):
        fmt.write("s.t", _days(spark, f"d{i}", i * 5, i * 5 + 5), "append" if i else "overwrite")
    n_before = fmt._manifest("s.t", resolve=False)
    assert n_before["segments"], "layout must be segmented"
    cold = _mk(spark, tmp_path, 2)
    calls = _counting(cold, monkeypatch)
    cold.write("s.t", _days(spark, "d8", 40, 45), "append")
    assert calls == [], f"append parsed segment files: {calls}"
    # resolution unchanged: every entry exactly once, all rows served
    assert fmt.read("s.t").count() == 45
    m = fmt._manifest("s.t")
    assert len(m["entries"]) == 9
