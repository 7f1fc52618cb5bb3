"""Pipeline observability — the run log the reference gets from
Airflow's task-instance table + dlt's load_info.

One row per step per run appended to an ordinary warehouse table
(``meta.run_log``), so operational questions ("which collection's
extract shrank last night?", "how long has stage been trending up?")
are plain queries over the same engine — no separate metrics store.
Failures record ``status='error'`` with the message and RE-RAISE: the
log is evidence, never a swallow.
"""

from __future__ import annotations

import time
import traceback
from contextlib import contextmanager

from .materialize import Warehouse


class RunLog:
    """Append-only step log.  ``run_id`` is the caller's logical run
    identifier (the Airflow run_id / trigger timestamp — supplied, not
    wall clock, so re-runs are attributable); ``wall_s`` is measured.
    Each record is one tiny append — O(1) rows per step, never a table
    rewrite."""

    TABLE = "meta.run_log"

    def __init__(self, wh: Warehouse):
        import threading

        self.wh = wh
        # ONE shared table, many possible writer threads (the T3
        # parallel collection sync): appends serialize behind this lock
        # — the extract work itself runs outside it
        self._lock = threading.Lock()

    def record(
        self,
        run_id: str,
        step: str,
        status: str,
        wall_s: float,
        rows_out: int | None = None,
        error: str | None = None,
    ) -> None:
        from ..session import local_rows

        row = local_rows(
            self.wh.spark,
            [(run_id, step, status, float(wall_s), rows_out, error)],
            "run_id string, step string, status string, wall_s double, "
            "rows_out long, error string",
        )
        with self._lock:
            self.wh.materialize_incremental(self.TABLE, row)

    @contextmanager
    def step(self, run_id: str, name: str):
        """Time a pipeline step; yield a dict whose ``rows_out`` the
        body may set (row counts are the body's choice — counting can
        cost a scan, so it is never implicit)."""
        info: dict = {"rows_out": None}
        t0 = time.perf_counter()
        try:
            yield info
        except Exception as e:  # noqa: BLE001 — logged then re-raised
            self.record(
                run_id,
                name,
                "error",
                time.perf_counter() - t0,
                info.get("rows_out"),
                f"{type(e).__name__}: {e}\n{traceback.format_exc(limit=3)}",
            )
            raise
        self.record(
            run_id, name, "ok", time.perf_counter() - t0, info.get("rows_out")
        )

    def read(self):
        return self.wh.read(self.TABLE)
