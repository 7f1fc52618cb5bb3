"""Property pins for manifest stats pruning (hypothesis, no Spark).

Soundness is the only hard requirement: an entry PRUNED by
``_entry_may_match`` / ``_entry_may_match_in`` must provably contain no
matching value — keeping too much is always allowed (and is the
designed answer for opaque/cross-domain/missing stats), losing rows
never is.  The strategies deliberately mix domains (ints, floats,
strings, datetimes, Decimals) because the ADVICE r8 #5 failure class
was exactly a cross-domain compare silently pruning a matching entry.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
    _stat_triplet,
)

# unbound method use: _entry_may_match touches no instance state beyond
# the static helpers, so a bare class reference works without Spark
M = ManifestFormat

# one column holds ONE domain: draw stats values and bounds from the
# same base strategy per example (a string column probed with a DATE
# bound is a separate, keep-or-consistent case — the row filter's cast
# semantics decide it, not Python comparison, so it has its own test)
DOMAINS = [
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
    st.datetimes(
        min_value=datetime.datetime(1990, 1, 1),
        max_value=datetime.datetime(2040, 1, 1),
    ),
    st.dates(),
    st.decimals(allow_nan=False, allow_infinity=False, places=2),
]


@st.composite
def domain_case(draw, n_probes=2):
    base = draw(st.sampled_from(DOMAINS))
    values = draw(st.lists(base, min_size=1, max_size=6))
    probes = draw(st.lists(st.one_of(base, st.none()), max_size=n_probes))
    return values, probes


def _matches(v, lo, hi) -> bool:
    if lo is not None and not v >= lo:
        return False
    if hi is not None and not v <= hi:
        return False
    return True


@settings(max_examples=300, deadline=None)
@given(case=domain_case())
def test_range_prune_is_sound(case):
    """If the entry is pruned, NO value that produced its stats can
    match the range (same-domain bounds)."""
    values, probes = case
    lo = probes[0] if len(probes) > 0 else None
    hi = probes[1] if len(probes) > 1 else None
    mn, mx = min(values), max(values)
    e = {"stats": {"c": _stat_triplet(mn, mx)}}
    if not M._entry_may_match(M, e, "c", lo, hi):
        for v in values:
            assert not _matches(v, lo, hi), (v, lo, hi, e)


@settings(max_examples=300, deadline=None)
@given(case=domain_case(n_probes=5))
def test_in_set_prune_is_sound(case):
    """If the entry is pruned for an IN set, no probe value equals any
    stored value."""
    values, probes = case
    probes = [p for p in probes if p is not None]
    mn, mx = min(values), max(values)
    e = {"stats": {"c": _stat_triplet(mn, mx)}}
    if not M._entry_may_match_in(M, e, "c", probes):
        for v in values:
            for p in probes:
                assert v != p, (v, p)


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(
        st.one_of(*DOMAINS), min_size=1, max_size=4
    ),
    bound=st.one_of(*DOMAINS),
)
def test_cross_domain_numeric_vs_string_keeps(values, bound):
    """A NUMERIC bound against STRING-domain stats (and vice versa)
    must keep the entry — the ADVICE r8 #5 class.  (String-vs-date
    compares BY DESIGN through the ISO normalization; numeric-vs-string
    never does.)"""
    try:
        mn, mx = min(values), max(values)
    except TypeError:
        return
    e = {"stats": {"c": _stat_triplet(mn, mx)}}
    b_num = isinstance(bound, (int, float)) and not isinstance(bound, bool)
    s_num = isinstance(mn, (int, float)) and not isinstance(mn, bool)
    if b_num != s_num:
        assert M._entry_may_match(M, e, "c", bound, None)
        assert M._entry_may_match(M, e, "c", None, bound)
        assert M._entry_may_match_in(M, e, "c", [bound])


@settings(max_examples=200, deadline=None)
@given(values=st.lists(st.one_of(*DOMAINS), min_size=1, max_size=6))
def test_missing_and_null_stats_always_keep(values):
    assert M._entry_may_match(M, {}, "c", 0, 10)
    assert M._entry_may_match(M, {"stats": {"c": [None, None]}}, "c", 0, 10)
    assert M._entry_may_match_in(M, {"stats": {}}, "c", values)
