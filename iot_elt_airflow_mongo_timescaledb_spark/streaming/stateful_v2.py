"""Custom stateful streaming on Spark 4's transformWithState API.

The current-generation arbitrary-state operator (SPARK-40434 /
``StatefulProcessor``): typed state handles (ValueState here), explicit
lifecycle (init/handleInputRows/close), and first-class timers — the
successor to ``applyInPandasWithState`` (which
``streaming/stateful.py`` keeps for the reference's T7/T8 semantics).
Both express the same per-key running aggregate, so the two
implementations cross-check each other and against the batch oracle.

ENVIRONMENT GATE: transformWithState's Python worker speaks protobuf to
the JVM state server, and this container ships no ``google.protobuf``
runtime (and installs are disallowed) — so executing the stream dies at
the first micro-batch with the ImportError the test pins.  The operator
is NOT registered as a gated query for that reason;
``streaming_user_activity`` (the applyInPandasWithState twin with
identical semantics) carries the driver-checked row.  On a normal Spark
4.1 install (protobuf ships with pyspark[connect] and most distros)
this module runs as-is.

Reference parity target: the dlt incremental cursor's per-entity
running state (``dags/dlt_sources/mongodb/helpers.py:58-92``) — here
per-user activity totals maintained incrementally as events stream in.

Scale notes: state is one (count, total) pair per user key, partitioned
by the groupBy — bounded by |users|, never by |events|; Arrow batches
flow per key-partition (no driver involvement); the RocksDB state store
backend (config, not code) handles key counts beyond executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .micro_batch import _drain_to_memory, events_stream

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


class UserActivityProcessor(StatefulProcessor):
    """Running (count, total) per user via a typed ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "count long, total double")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        count, total = (
            self._agg.get() if self._agg.exists() else (0, 0.0)
        )
        for batch in rows:
            count += len(batch)
            total += float(batch["value"].sum())
        self._agg.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def user_activity_stream_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running activity state over the events stream, drained —
    the transformWithState twin of ``stateful.user_activity_stream``.

    Update-mode memory sink keeps every emission; the last row per user
    (selected by max_by on the monotone count) is the converged state,
    equal to the batch groupBy aggregate.
    """
    stream = events_stream(spark, sf_dir).select("user_id", "value")
    tracked = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    out = _drain_to_memory(spark, tracked, "user_activity_v2", "update")
    # round JVM-side (HALF_UP, matching the oracle's ROUND)
    return out.groupBy("user_id").agg(
        F.max_by("n_events", "n_events").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
    )
