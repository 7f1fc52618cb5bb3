"""connected_components: pointer-jumping convergence in O(log diameter)
rounds, and a loud failure (never silent mislabeling) on exhaustion
(operators/dedup.py connected_components)."""

from __future__ import annotations

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.operators import dedup as D

_PATH_N = 300  # path graph diameter 299 — plain neighbour propagation
#               would need ~299 rounds; pointer jumping needs ~10.


def _path_pairs(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )


def test_path_graph_converges_within_log_rounds(spark):
    """Diameter 299 >> default max_iter=25: only the label-of-label
    shortcut can converge this graph — plain propagation would raise."""
    pairs = _path_pairs(spark, _PATH_N)
    labels = D.connected_components(pairs).collect()
    assert len(labels) == _PATH_N
    assert all(r["cluster_id"] == 0 for r in labels)


def test_two_components_unordered_ids(spark):
    """Min-id labels are per-component even when ids are not laid out
    along the path."""
    pairs = [(9, 4), (4, 7), (7, 2), (100, 205), (205, 101)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels = {r["node"]: r["cluster_id"] for r in D.connected_components(df).collect()}
    assert {labels[n] for n in (9, 4, 7, 2)} == {2}
    assert {labels[n] for n in (100, 205, 101)} == {100}


def test_exhaustion_raises_not_mislabels(spark):
    """With max_iter too small for the diameter, the operator must raise
    rather than return split clusters."""
    pairs = _path_pairs(spark, _PATH_N)
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=3)
