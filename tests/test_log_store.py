"""Pluggable LogStore / CAS seam (round 14, VERDICT task 1).

The OCC protocol (tests/test_concurrency.py) rests on ONE storage
operation: a linearizable put-if-absent of a small log file.  The
default backend is the store's own create-exclusive — atomic on
HDFS/POSIX and on conditional-PUT object stores, NOT on a legacy
object store where "create if absent" decomposes into a LIST/HEAD
probe plus a blind PUT.  These tests pin the seam:

- the HAZARD is real: with create-exclusive simulated non-atomic
  (exists-probe + interleave window + blind overwrite), two appenders
  both believe they committed and one batch is silently LOST;
- :class:`ArbitratedLogStore` over the SAME broken store serializes:
  the stress drill (appends + merges, both formats) produces the
  serial result because ownership is decided by the arbiter, never by
  the storage layer;
- a failed write after a granted claim UNCLAIMS so the commit retries
  instead of wedging;
- a stalled claim owner makes contenders refuse LOUDLY (bounded
  retries), never serve or corrupt.

Reference role: the transactional warehouse TimescaleDB provides
(reference docker-compose.yaml:307) — Postgres arbitration is exactly
the "external linearizable claim" this seam injects.
"""

from __future__ import annotations

import threading

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ArbitratedLogStore,
    CatalogManifestFormat,
    CreateExclusiveLogStore,
    InProcessArbiter,
    ManifestFormat,
)


class NonAtomicCreateFS:
    """A filesystem whose create-exclusive is NOT atomic — the classic
    eventual-consistency object-store shape: an exists() probe, an
    interleave window (``hook``), then a blind overwrite PUT.  Every
    other operation delegates to the real FS."""

    def __init__(self, real, hook=None):
        self._real = real
        self._hook = hook
        self.raced_uris: list[str] = []

    def write_text(self, uri, text, overwrite=False):
        if not overwrite:
            if self._real.exists(uri):
                raise FileExistsError(uri)
            self.raced_uris.append(uri)
            if self._hook is not None:
                self._hook(uri)
            # the non-atomic half: the "exclusive" create is a plain PUT
            self._real.write_text(uri, text, overwrite=True)
            return
        self._real.write_text(uri, text, overwrite=True)

    def __getattr__(self, item):
        return getattr(self._real, item)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in pairs], "k long, val string"
    )


def _fmt(spark, root, kind, **kw):
    cls = {"manifest": ManifestFormat, "catalog": CatalogManifestFormat}[kind]
    kw.setdefault("auto_compact_dirs", None)
    return cls(spark, root, **kw)


def test_nonatomic_create_silently_loses_a_commit(spark, tmp_path):
    """The hazard the seam exists for: under a non-atomic create, a
    writer that interleaves inside another's exists→PUT window
    overwrites its version file — BOTH return success, one append is
    gone.  (This is why the default LogStore is documented unsound on
    stores without conditional PUT.)"""
    fmt_a = _fmt(spark, str(tmp_path), "manifest")
    fmt_b = _fmt(spark, str(tmp_path), "manifest")
    fmt_a.write("s.t", _rows(spark, [(1, "base")]), "overwrite")

    state = {"fired": False}

    def interleave(uri):
        # inside A's window, B runs a COMPLETE append: same head, same
        # target version, exists() still False — B commits and returns
        if state["fired"] or "v0000" not in uri.rsplit("/", 1)[-1]:
            return
        state["fired"] = True
        fmt_b.write("s.t", _rows(spark, [(99, "lost")]), "append")

    fmt_a.fs = NonAtomicCreateFS(fmt_a.fs, hook=interleave)
    fmt_a.write("s.t", _rows(spark, [(2, "a")]), "append")  # "succeeds"

    got = sorted(r["k"] for r in _fmt(spark, str(tmp_path), "manifest")
                 .read("s.t").collect())
    assert state["fired"], "interleave hook never fired"
    assert got == [1, 2], (
        f"expected B's commit to be silently lost under the broken "
        f"store, got keys {got}"
    )


@pytest.mark.parametrize("kind", ["manifest", "catalog"])
def test_arbitrated_logstore_serializes_on_nonatomic_store(
    spark, tmp_path, kind
):
    """The fix: the SAME broken store, commits arbitrated by an
    external linearizable claim — N appenders and 2 mergers race and
    the outcome equals the serial schedule (no lost batch, no
    duplicate key)."""
    arb = InProcessArbiter()
    store = ArbitratedLogStore(arb.claim, arb.unclaim)

    def handle():
        f = _fmt(spark, str(tmp_path), kind, log_store=store)
        f.fs = NonAtomicCreateFS(f.fs)
        return f

    boot = handle()
    boot.write("cc.t", _rows(spark, [(i, "base") for i in range(4)]),
               "overwrite")

    n_appenders = 4
    errors: list = []
    barrier = threading.Barrier(n_appenders + 2)

    def appender(i):
        def go():
            try:
                barrier.wait(timeout=120)
                handle().write(
                    "cc.t", _rows(spark, [(100 + i, f"app{i}")]), "append"
                )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
        return go

    def merger(tag):
        def go():
            try:
                barrier.wait(timeout=120)
                handle().merge(
                    "cc.t", _rows(spark, [(0, f"upd-{tag}"), (1, f"upd-{tag}")]),
                    "k",
                )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
        return go

    threads = [threading.Thread(target=appender(i)) for i in range(n_appenders)]
    threads += [threading.Thread(target=merger(t)) for t in ("x", "y")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "hung writer thread"
    if errors:
        raise errors[0]

    got = {r["k"]: r["val"] for r in handle().read("cc.t").collect()}
    # every batch landed exactly once
    assert sorted(got) == [0, 1, 2, 3, 100, 101, 102, 103]
    # the merged keys carry one of the two serialized updates
    assert got[0] in ("upd-x", "upd-y") and got[1] == got[0]


def test_arbitrated_unclaim_makes_failed_write_retryable(spark, tmp_path):
    """A write failure AFTER a granted claim releases the name: the
    retried commit succeeds instead of wedging on its own claim."""
    arb = InProcessArbiter()
    store = ArbitratedLogStore(arb.claim, arb.unclaim)
    fmt = _fmt(spark, str(tmp_path), "manifest", log_store=store)

    real = fmt.fs
    state = {"fail_next": True}

    class FlakyFS:
        def write_text(self, uri, text, overwrite=False):
            if overwrite and state["fail_next"]:
                state["fail_next"] = False
                raise IOError("transient store failure")
            real.write_text(uri, text, overwrite=overwrite)

        def __getattr__(self, item):
            return getattr(real, item)

    fmt.fs = FlakyFS()
    with pytest.raises(Exception, match="transient|commit"):
        fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    # the claim was released: the same version commits on retry
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    assert [r["k"] for r in fmt.read("s.t").collect()] == [1]


def test_stalled_claim_owner_refuses_loudly(spark, tmp_path):
    """A claim granted to a writer that never completes its PUT must
    make contenders FAIL after bounded retries — never spin forever,
    never serve a half-committed table."""
    arb = InProcessArbiter()
    store = ArbitratedLogStore(arb.claim, arb.unclaim)
    fmt = _fmt(spark, str(tmp_path), "manifest", log_store=store)
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    # simulate a crashed owner: v2's name is claimed, file never lands
    head_log = fmt._log_path("s.t")
    from iot_elt_airflow_mongo_timescaledb_spark.fs import join_uri

    assert arb.claim(join_uri(head_log, f"v{2:012d}.json"))
    with pytest.raises(RuntimeError, match="lost the version race"):
        fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    # the table is uncorrupted and still serves the committed state
    assert [r["k"] for r in fmt.read("s.t").collect()] == [1]


def test_default_logstore_explicit_injection_roundtrip(spark, tmp_path):
    """Injecting the default backend explicitly behaves identically to
    the implicit default (the seam adds no behavior on sound stores),
    and writer_copy shares the instance."""
    store = CreateExclusiveLogStore()
    fmt = _fmt(spark, str(tmp_path), "catalog", log_store=store)
    assert fmt.log_store is store
    assert fmt.writer_copy().log_store is store
    fmt.write("s.t", _rows(spark, [(1, "a")]), "overwrite")
    fmt.write("s.t", _rows(spark, [(2, "b")]), "append")
    assert sorted(r["k"] for r in fmt.read("s.t").collect()) == [1, 2]
