"""Property pins for hierarchical manifest segments (hypothesis).

The segment tier rewrites the commit path's bookkeeping, so its two
load-bearing invariants get adversarial coverage beyond the scenario
tests in test_manifest_segments.py:

1. ENTRY CONSERVATION — across any sequence of rebaseable edits
   (appends, arbitrary-subset drops, full replaces) the resolved
   entry multiset equals the multiset the edit function returned:
   no entry lost into a dissolved segment, none duplicated by a
   carried-plus-inlined double count.  This is the invariant whose
   violation silently loses (or resurrects) data files.

2. TWO-TIER PRUNING EQUIVALENCE — `_prune_two_tier` over the RAW
   manifest (segment refs' rolled-up stats deciding whole-segment
   skips) keeps exactly the same entry multiset as flat per-entry
   pruning over the RESOLVED list, for random same-domain bounds and
   random stats coverage (entries with missing stats mixed in, which
   must block their segment's rollup from excluding them).

Edits run through the real `_commit_edit` (resegment + CAS + resolve)
against a local warehouse root; no Spark jobs are involved — entries
are metadata dicts, so hundreds of sequenced commits run in seconds.
"""

from __future__ import annotations

import json
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)

pytestmark = pytest.mark.usefixtures("spark")


def _key(e) -> str:
    return json.dumps(e, sort_keys=True)


def _multiset(entries) -> Counter:
    return Counter(_key(e) for e in entries)


# an edit step: which surviving entries to keep (as a bitmask seed) and
# how many fresh entries to add, with what stats coverage
edit_step = st.tuples(
    st.integers(min_value=0, max_value=2**16 - 1),  # survival mask seed
    st.integers(min_value=0, max_value=7),  # fresh entries
    st.sampled_from(["full", "partial", "none"]),  # stats coverage
)


def _fresh_entries(uid_start: int, n: int, coverage: str) -> list:
    out = []
    for i in range(n):
        uid = uid_start + i
        e = {"dir": f"d-{uid:06d}", "partitions": None}
        has_stats = coverage == "full" or (coverage == "partial" and uid % 2)
        if has_stats:
            lo = (uid * 37) % 1000
            e["stats"] = {"v": [lo, lo + (uid % 50)]}
        out.append(e)
    return out


@settings(max_examples=60, deadline=None)
@given(
    steps=st.lists(edit_step, min_size=1, max_size=8),
    seg_n=st.integers(min_value=0, max_value=4),
)
def test_entry_conservation_across_edit_sequences(
    spark, tmp_path_factory, steps, seg_n
):
    root = tmp_path_factory.mktemp("segprop")
    fmt = ManifestFormat(
        spark, str(root), auto_compact_dirs=None, segment_entries=seg_n
    )
    name = "p.t"
    uid = 0
    expected: list = []
    for si, (mask, n_new, coverage) in enumerate(steps):
        fresh = _fresh_entries(uid, n_new, coverage)
        uid += n_new
        prev_resolved = fmt._manifest(name)
        prev_entries = prev_resolved["entries"] if prev_resolved else []
        survivors = [
            e for i, e in enumerate(prev_entries) if (mask >> (i % 16)) & 1
        ]
        new_entries = survivors + fresh
        if not new_entries and not prev_entries:
            continue
        committed = fmt._commit_edit(name, lambda prev: (new_entries, []))
        assert committed
        expected = new_entries
        resolved = fmt._manifest(name)["entries"]
        assert _multiset(resolved) == _multiset(expected), (
            f"step {si}: resolved multiset diverged from the edit's "
            f"return (seg_n={seg_n})"
        )
        # rolled-up segment stats are sound: every ref's interval
        # covers every member entry's interval for that column
        raw = fmt._manifest(name, resolve=False)
        for s in raw.get("segments") or []:
            members = fmt._load_segment(name, s["file"])
            for c, (lo, hi, *_) in (s.get("stats") or {}).items():
                for e in members:
                    est = (e.get("stats") or {}).get(c)
                    assert est is not None, (
                        "segment rollup advertised a column an entry "
                        "lacks stats for"
                    )
                    assert lo <= est[0] and est[1] <= hi
        # inline tail stays bounded when segmentation is on
        assert len(raw["entries"]) <= seg_n


@settings(max_examples=60, deadline=None)
@given(
    steps=st.lists(edit_step, min_size=1, max_size=6),
    seg_n=st.integers(min_value=0, max_value=3),
    lo=st.one_of(st.none(), st.integers(min_value=-50, max_value=1100)),
    hi=st.one_of(st.none(), st.integers(min_value=-50, max_value=1100)),
)
def test_two_tier_pruning_equals_flat_pruning(
    spark, tmp_path_factory, steps, seg_n, lo, hi
):
    root = tmp_path_factory.mktemp("segprune")
    fmt = ManifestFormat(
        spark, str(root), auto_compact_dirs=None, segment_entries=seg_n
    )
    name = "p.t"
    uid = 0
    wrote = False
    for mask, n_new, coverage in steps:
        fresh = _fresh_entries(uid, n_new, coverage)
        uid += n_new
        prev_resolved = fmt._manifest(name)
        prev_entries = prev_resolved["entries"] if prev_resolved else []
        survivors = [
            e for i, e in enumerate(prev_entries) if (mask >> (i % 16)) & 1
        ]
        new_entries = survivors + fresh
        if not new_entries:
            continue
        fmt._commit_edit(name, lambda prev: (new_entries, []))
        wrote = True
    if not wrote:
        return
    bounds = {"v": (lo, hi)}
    raw = fmt._manifest(name, resolve=False)
    resolved = fmt._manifest(name)
    two_tier = fmt._prune_two_tier(name, raw, bounds)
    flat = [
        e
        for e in resolved["entries"]
        if fmt._entry_may_match(e, "v", lo, hi)
    ]
    assert _multiset(two_tier) == _multiset(flat), (
        "segment-tier pruning kept a different entry set than flat "
        f"per-entry pruning (seg_n={seg_n}, bounds={bounds})"
    )
