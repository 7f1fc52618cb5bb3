"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's only state is the dlt cursor (T7); a Spark deployment of
the same pipeline would also want *per-device* running state (counters,
last-seen, gap detection) that no built-in windowed aggregate expresses.
This is the SURVEY custom-operator rule (b) path: an Arrow-batched
stateful function over grouped streaming data.

Semantics implemented: per user, a monotonically updated running event
count, running value sum, and the max inter-event gap — emitted once per
micro-batch per updated user (update mode).  Drained to completion the
final row per user equals the batch groupBy equivalent, which is what
the test asserts.

MAX-GAP LATENESS CONTRACT: state carries only (last_ts, max_gap), so the
gap computation is exact for events arriving in batch-boundary order
(each micro-batch may be internally unordered — handled by the
accumulate-then-sort below).  An event arriving in a LATER micro-batch
with a timestamp inside an already-recorded gap cannot retroactively
split that gap — the recorded max stays an upper bound.  That is the
bounded-state trade: the exact answer needs the full per-user timestamp
history; production pipelines bound it with a watermark + allowed
lateness (dropping older events, as the dedup operator does) or re-sort
offline.  The single-file gate sources deliver one micro-batch, where
the contract is exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .micro_batch import _drain_to_memory, events_stream

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_gap_s double"
)
# last_ts / max_gap tracked in integer microseconds: float seconds at
# epoch scale lose sub-µs precision and round differently than the
# oracle's exact interval arithmetic
STATE_SCHEMA = "n long, total double, last_ts_us long, max_gap_us long"


def _track_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts_us, max_gap_us = state.get
    else:
        n, total, last_ts_us, max_gap_us = 0, 0.0, None, 0
    import numpy as np

    # A group larger than the Arrow batch size arrives as SEVERAL chunks
    # with no ordering guarantee between (or within) them, so gaps must
    # be computed over the micro-batch's timestamps as a whole: collect
    # every chunk first, sort ONCE (prepending the carried last-seen ts),
    # then diff.  Per-chunk sorting with a carried cursor would measure
    # gaps between out-of-order fragments (the round-2 defect).
    chunks = []
    for pdf in pdfs:
        if pdf.empty:
            continue
        chunks.append(pdf["ts"].values.astype("datetime64[us]").astype("int64"))
        n += len(pdf)
        total += float(pdf["value"].sum())
    if chunks:
        if last_ts_us is not None:
            chunks.append(np.array([last_ts_us], dtype="int64"))
        ts = np.sort(np.concatenate(chunks))
        if len(ts) >= 2:
            max_gap_us = max(max_gap_us, int(np.diff(ts).max()))
        last_ts_us = int(ts[-1])
    state.update((n, total, last_ts_us, max_gap_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_gap_s": [max_gap_us / 1e6],
        }
    )


def user_activity_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running activity state over the events stream, drained.

    Update-mode memory sink keeps every emission; the *last* row per
    user is the converged state — the caller (and the batch-equivalence
    test) selects it with a max_by.
    """
    stream = events_stream(spark, sf_dir)
    tracked = stream.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # last emission per user == converged running state (update-mode
    # memory sink is bounded by |users| emissions — _drain_to_memory's
    # contract)
    out = _drain_to_memory(spark, tracked, "user_activity", "update")
    # round JVM-side (HALF_UP, matching the oracle's ROUND) — Python's
    # round() is banker's and flips boundary values
    return (
        out.groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
            F.round(F.max_by("max_gap_s", "n_events"), 3).alias("max_gap_s"),
        )
    )
