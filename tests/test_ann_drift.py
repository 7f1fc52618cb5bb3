"""Codebook drift policy (r12, VERDICT r11 task 6).

Under distribution shift a frozen IVF codebook degrades silently —
the recall floor is only pinned at train time.  The policy: every
``sync_from_cdf(drift_band=...)`` records per-cluster batch assignment
quality (mean best-centroid cosine vs the codebook's __q0 baseline)
in ``{name}__drift``; a cluster below the band triggers
``partial_retrain`` of JUST the drifted clusters — bounded by their
member count, never an O(corpus) rebuild.

The soak: train on 4 tight orthogonal clusters, run quiet cycles (no
repair must fire), then plant a distribution shift (one cluster's
members replaced by vectors in a direction between two old anchors —
the IVF-splitting worst case).  Pins: the shift triggers the repair,
untouched centroids are byte-identical (boundedness), membership
stays exactly the corpus (exactly-once survives the repair), the
index==recompute equivalence holds, and the recall floor on
shift-region queries holds after repair and is no worse than the
unrepaired twin.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import iot_elt_airflow_mongo_timescaledb_spark.operators.similarity as S
from iot_elt_airflow_mongo_timescaledb_spark.plans.ann_index import (
    IncrementalANNSync,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)

DIM = 16


def _vec(direction: list[float], rng, noise=0.03):
    return [float(x + rng.gauss(0, noise)) for x in direction]


def _anchor(i: int) -> list[float]:
    v = [0.0] * DIM
    v[i] = 1.0
    return v


@pytest.fixture(scope="module")
def corpus(spark):
    """4 tight clusters x 40 points on orthogonal anchors e0..e3."""
    rng = random.Random(11)
    rows = []
    for cl in range(4):
        for j in range(40):
            rows.append((cl * 40 + j, _vec(_anchor(cl), rng), cl))
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    ).cache()


def _shift_batch(spark, n=120, start_id=1000):
    """The planted shift: vectors at (e0+e1)/|..| — equidistant from
    anchors 0 and 1, so with the frozen codebook the mass SPLITS
    between two clusters while a 1-probe query reaches only one."""
    rng = random.Random(13)
    d = [0.0] * DIM
    d[0] = d[1] = 0.7071
    rows = [
        (start_id + j, _vec(d, rng), 9) for j in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )


def _recall(truth_df, approx_df) -> float:
    truth: dict = {}
    for r in truth_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict = {}
    for r in approx_df.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    return hit / total


def _mk(spark, root, name):
    fmt = ManifestFormat(
        spark, str(root), auto_compact_dirs=None,
        stats_cols=("vec_id",), cdf=True,
    )
    idx = IncrementalANNSync(spark, str(root), name, table_format=fmt)
    return fmt, idx


def _queries(spark):
    rng = random.Random(17)
    d = [0.0] * DIM
    d[0] = d[1] = 0.7071
    rows = [(9000 + j, _vec(d, rng)) for j in range(10)]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>"
    )


def test_drift_soak_partial_retrain_bounded(spark, tmp_path, corpus):
    fmt, idx = _mk(spark, tmp_path, "agg.ann")
    fmt.write("raw.vecs", corpus, "overwrite")
    idx.train_from_table(fmt, "raw.vecs")
    cent0 = {
        r["__cluster"]: (list(r["__cvec"]), r["__q0"])
        for r in idx.wh.read(idx.centroids_table).collect()
    }
    assert all(q0 is not None for _, q0 in cent0.values())

    # -- quiet cycles: in-distribution inserts must NOT fire a repair
    rng = random.Random(23)
    for cycle in range(2):
        batch = spark.createDataFrame(
            [
                (500 + cycle * 40 + j, _vec(_anchor(j % 4), rng), j % 4)
                for j in range(40)
            ],
            "vec_id: long, embedding: array<float>, label: int",
        )
        fmt.merge("raw.vecs", batch, "vec_id")
        assert idx.sync_from_cdf(
            fmt, "raw.vecs", drift_band=0.9, drift_min_n=20
        )
    log = idx.wh.read("agg.ann__drift")
    assert log.filter(F.col("repaired")).count() == 0

    # -- the planted shift
    shift = _shift_batch(spark)
    fmt.merge("raw.vecs", shift, "vec_id")
    assert idx.sync_from_cdf(
        fmt, "raw.vecs", drift_band=0.9, drift_min_n=20
    )
    log = idx.wh.read("agg.ann__drift")
    repaired = {
        r["__cluster"] for r in log.filter(F.col("repaired")).collect()
    }
    assert repaired, "the planted shift must trigger the repair"

    # boundedness: untouched clusters' centroids are byte-identical
    cent1 = {
        r["__cluster"]: list(r["__cvec"])
        for r in idx.wh.read(idx.centroids_table).collect()
    }
    untouched = set(cent0) - repaired
    assert untouched, "the repair must not have rebuilt every cluster"
    for c in untouched:
        assert cent1[c] == cent0[c][0], c

    # exactly-once through the repair: membership == corpus
    final = fmt.read("raw.vecs")
    got = {r["vec_id"] for r in
           idx.wh.read(idx.assign_table).select("vec_id").collect()}
    want = {r["vec_id"] for r in final.select("vec_id").collect()}
    assert got == want

    # QUALITY RECOVERY — the metric the policy manages: the repaired
    # clusters' refreshed baseline (mean member cosine to the NEW
    # centroid) must clearly exceed the degraded batch quality that
    # fired the repair (members at (e0+e1)/√2 scored ~0.707 against
    # the old axis centroids)
    new_q0 = {
        r["__cluster"]: r["__q0"]
        for r in idx.wh.read(idx.centroids_table).collect()
    }
    fired = {
        r["__cluster"]: r["mean_cos"]
        for r in log.filter(F.col("repaired")).collect()
    }
    for c in repaired:
        assert new_q0[c] > 0.8 > fired[c] + 0.05, (c, new_q0[c], fired[c])

    # the maintained-index invariant survives the repair
    queries = _queries(spark)
    served = idx.topk(queries, k=5, n_probe=2, id_col="vec_id")
    recomputed = idx.recompute_topk(
        final, queries, k=5, n_probe=2, id_col="vec_id"
    )
    def rows(df):
        return {
            (r["query_id"], r["neighbor_id"], r["rk"]) for r in df.collect()
        }
    assert rows(served) == rows(recomputed)

    # recall floor on shift-region queries AFTER repair, at the
    # documented multi-probe posture (the split between the two
    # repaired clusters is a symmetric tie one Lloyd step cannot
    # consolidate — partial_retrain's stated approximation — so the
    # floor is pinned at n_probe=2, which reaches both sides)
    truth = S.quantized_cosine_topk(final, queries, k=5)
    rec_repaired = _recall(truth, served)
    assert rec_repaired >= 0.9, rec_repaired

    # the unrepaired twin: same lifecycle, no drift policy — recall at
    # the same probe count must not beat the repaired index, and its
    # quality metric stays degraded (no __q0 refresh, no drift log)
    fmt2, idx2 = _mk(spark, tmp_path / "twin", "agg.ann2")
    fmt2.write("raw.vecs", corpus, "overwrite")
    idx2.train_from_table(fmt2, "raw.vecs")
    fmt2.merge("raw.vecs", _shift_batch(spark), "vec_id")
    assert idx2.sync_from_cdf(fmt2, "raw.vecs")  # no drift_band
    served2 = idx2.topk(queries, k=5, n_probe=2, id_col="vec_id")
    truth2 = S.quantized_cosine_topk(fmt2.read("raw.vecs"), queries, k=5)
    rec_plain = _recall(truth2, served2)
    assert rec_repaired >= rec_plain
    # and no drift table ever materialized on the twin
    assert not idx2.wh.exists("agg.ann2__drift")


def test_partial_retrain_explicit_counts(spark, tmp_path, corpus):
    """The explicit verb alone: re-centering one named cluster
    reassigns exactly its members and leaves every other centroid."""
    fmt, idx = _mk(spark, tmp_path, "agg.annx")
    fmt.write("raw.vecs", corpus, "overwrite")
    idx.train_from_table(fmt, "raw.vecs")
    a = idx.wh.read(idx.assign_table)
    sizes = {
        r["__cluster"]: r["n"]
        for r in a.groupBy("__cluster").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    target = sorted(sizes)[0]
    before = {
        r["__cluster"]: list(r["__cvec"])
        for r in idx.wh.read(idx.centroids_table).collect()
    }
    n = idx.partial_retrain([target])
    assert n == sizes[target] < sum(sizes.values())
    after = {
        r["__cluster"]: list(r["__cvec"])
        for r in idx.wh.read(idx.centroids_table).collect()
    }
    for c in before:
        if c != target:
            assert after[c] == before[c]
    # empty list no-ops
    assert idx.partial_retrain([]) == 0


def test_quality_df_all_null_cos_matches_groupby_fallback(spark):
    """ADVICE r13 (low): a cluster whose batch members all carry NULL
    __cos must yield a NULL __q row from the Observation fast path —
    exactly what F.avg produces in the persist+groupBy fallback — not a
    float(None) TypeError."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.ann_index import (
        IncrementalANNSync,
    )

    idx = IncrementalANNSync.__new__(IncrementalANNSync)
    idx.spark = spark
    scored = spark.createDataFrame(
        [("0", None), ("0", None), ("1", 0.5), ("1", 0.7)],
        "__cluster string, __cos double",
    )
    observed, obs = idx._quality_observation(scored, ["0", "1"])
    observed.write.mode("overwrite").format("noop").save()
    fast = {
        r["__cluster"]: (r["__q"], r["__n"])
        for r in idx._quality_df(obs, ["0", "1"]).collect()
    }
    slow = {
        r["__cluster"]: (r["__q"], r["__n"])
        for r in idx._cluster_quality(scored).collect()
    }
    assert fast.keys() == slow.keys() == {"0", "1"}
    assert fast["0"] == slow["0"] == (None, 2)
    assert fast["1"][1] == slow["1"][1] == 2
    assert abs(fast["1"][0] - slow["1"][0]) < 1e-12
