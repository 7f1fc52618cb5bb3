"""incremental_lsh_candidates must equal the full-corpus recompute
restricted to pairs touching a new document — the invariant that lets a
100 TB pipeline LSH-check each ingest batch against a materialized
signature table instead of re-running dedup over the whole corpus."""

from __future__ import annotations

from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
    incremental_lsh_candidates,
    lsh_candidate_pairs,
    minhash_signature,
    word_shingles,
)


def _sig(spark, rows):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return minhash_signature(word_shingles(docs, "doc_id", "text", n=3), "doc_id")


BASE = "alpha beta gamma delta epsilon zeta"
OLD = [
    (1, BASE),
    (2, BASE + " eta"),          # near-dup family with 1
    (3, "totally different words one two three"),
]
NEW = [
    (10, BASE + " theta"),       # near-dup of the 1/2 family
    (11, "totally different words one two four"),  # near-dup of 3
    (12, BASE + " theta iota"),  # near-dup of 10 (new-vs-new)
    (13, "nothing in common with anything else here"),
]


def test_matches_full_recompute_on_new_pairs(spark):
    old_sig, new_sig = _sig(spark, OLD), _sig(spark, NEW)
    inc = {
        (r["id_a"], r["id_b"])
        for r in incremental_lsh_candidates(old_sig, new_sig, "doc_id").collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(_sig(spark, OLD + NEW), "doc_id").collect()
    }
    new_ids = {i for i, _ in NEW}
    expected = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert inc == expected
    assert inc, "fixture must actually produce candidate pairs"
    # no old-vs-old pair leaks in
    assert all(a in new_ids or b in new_ids for a, b in inc)
    # both directions present: new-vs-old and new-vs-new
    assert any((a in new_ids) != (b in new_ids) for a, b in inc)
    assert any(a in new_ids and b in new_ids for a, b in inc)


def test_full_chain_unchanged_by_banding_refactor(spark):
    sig = _sig(spark, OLD + NEW)
    pairs = lsh_candidate_pairs(sig, "doc_id").collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_validate_ids_guard_raises_on_overlap(spark):
    """ADVICE r4: a re-ingested id on both sides silently suppresses its
    new-vs-old pairing — the validate flag must catch the misuse."""
    import pytest

    old_sig = _sig(spark, OLD)
    new_with_overlap = _sig(spark, NEW + [(2, BASE + " eta")])  # id 2 re-ingested
    with pytest.raises(ValueError, match="overlap"):
        incremental_lsh_candidates(
            old_sig, new_with_overlap, "doc_id", validate_ids=True
        ).collect()
    # disjoint ids pass the guard unchanged
    assert incremental_lsh_candidates(
        old_sig, _sig(spark, NEW), "doc_id", validate_ids=True
    ).count() > 0


def test_dedup_sync_end_to_end(spark, tmp_path):
    """VERDICT r4 task 6: two syncs through the persisted signature
    table — the second batch's candidates must equal the full-corpus
    recompute restricted to pairs touching the new ids, and the corpus
    table must accumulate both batches' signatures."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalDedupSync,
    )

    ds = IncrementalDedupSync(spark, str(tmp_path))
    batch1 = spark.createDataFrame(OLD, ["doc_id", "text"])
    batch2 = spark.createDataFrame(NEW, ["doc_id", "text"])

    p1 = {(r["id_a"], r["id_b"]) for r in ds.sync(batch1).collect()}
    full_old = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(_sig(spark, OLD), "doc_id").collect()
    }
    assert p1 == full_old  # first batch: plain self-join

    p2 = {(r["id_a"], r["id_b"]) for r in ds.sync(batch2).collect()}
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(_sig(spark, OLD + NEW), "doc_id").collect()
    }
    new_ids = {i for i, _ in NEW}
    assert p2 == {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert p2, "second batch must produce candidates"

    # signature table accumulated both batches
    sigs = ds.wh.read(IncrementalDedupSync.SIG_TABLE)
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == (
        {i for i, _ in OLD} | new_ids
    )

    # third sync re-ingesting an existing id trips the guard
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        ds.sync(spark.createDataFrame([(2, BASE)], ["doc_id", "text"]))


def test_streaming_dedup_sync(spark, tmp_path):
    """Streaming twin: two ingest files drained by two availableNow
    runs land the same candidates as the batch sync path, with the
    checkpoint (not a cursor table) guaranteeing each file is LSH-
    checked exactly once."""
    import json
    import os

    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingDedupSync,
    )

    src = tmp_path / "ingest"
    src.mkdir()
    wh_root = str(tmp_path / "wh")

    def write_batch(name, rows):
        (src / name).write_text(
            json.dumps([{"doc_id": i, "text": t} for i, t in rows])
        )

    write_batch("b1.json", OLD)
    sync = StreamingDedupSync(spark, wh_root, str(src))
    sync.run_once()
    write_batch("b2.json", NEW)
    sync.run_once()

    got = {
        (r["id_a"], r["id_b"])
        for r in sync.wh.read(StreamingDedupSync.PAIRS_TABLE).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(_sig(spark, OLD + NEW), "doc_id").collect()
    }
    new_ids = {i for i, _ in NEW}
    expected = {
        p for p in full if p[0] in new_ids or p[1] in new_ids
    } | {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(_sig(spark, OLD), "doc_id").collect()
    }
    assert got == expected and got
    # a third drain with no new files is a no-op (checkpoint + isEmpty)
    sync.run_once()
    assert sync.wh.read(StreamingDedupSync.PAIRS_TABLE).count() == len(got)


def test_recover_mode_survives_redelivery(spark, tmp_path):
    """At-least-once replay: re-syncing the SAME batch in recover mode
    recomputes its original candidate pairs (no wedge, no raise) and
    leaves the signature table duplicate-free."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalDedupSync,
    )

    ds = IncrementalDedupSync(spark, str(tmp_path))
    b1 = spark.createDataFrame(OLD, ["doc_id", "text"])
    b2 = spark.createDataFrame(NEW, ["doc_id", "text"])
    ds.sync(b1, on_redelivery="recover")
    first = {
        (r["id_a"], r["id_b"])
        for r in ds.sync(b2, on_redelivery="recover").collect()
    }
    replay = {
        (r["id_a"], r["id_b"])
        for r in ds.sync(b2, on_redelivery="recover").collect()
    }
    assert replay == first and first
    sigs = ds.wh.read(IncrementalDedupSync.SIG_TABLE).select("doc_id").collect()
    ids = [r["doc_id"] for r in sigs]
    assert sorted(ids) == sorted(set(ids))  # no duplicate signatures
    assert set(ids) == {i for i, _ in OLD} | {i for i, _ in NEW}


def test_recover_mode_rejects_changed_content(spark, tmp_path):
    """recover mode only forgives IDENTICAL re-delivery (a foreachBatch
    replay); an already-present id with CHANGED text is a content
    re-ingest whose stale signature would shadow the new text forever —
    it must abort loudly."""
    import pytest

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalDedupSync,
    )

    ds = IncrementalDedupSync(spark, str(tmp_path))
    ds.sync(spark.createDataFrame(OLD, ["doc_id", "text"]))
    changed = spark.createDataFrame(
        [(1, "completely different text now with new words")],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="CHANGED"):
        ds.sync(changed, on_redelivery="recover")


def test_streaming_dedup_process_batch_replay_idempotent(spark, tmp_path):
    """Simulated foreachBatch replay: invoking the batch handler twice
    with the same micro-batch (as Structured Streaming does after a
    crash between sink write and commit) leaves the candidates and
    signature tables exactly as after the first invocation."""
    import json

    from iot_elt_airflow_mongo_timescaledb_spark.plans.pipeline import (
        IncrementalDedupSync,
    )
    from iot_elt_airflow_mongo_timescaledb_spark.streaming.pipeline_stream import (
        StreamingDedupSync,
    )

    src = tmp_path / "ingest"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps([{"doc_id": i, "text": t} for i, t in OLD + NEW])
    )
    sync = StreamingDedupSync(spark, str(tmp_path / "wh"), str(src))
    batch = spark.read.option("multiLine", "true").json(str(src))
    sync._process_batch(batch, 0)
    pairs_1 = sorted(
        (r["id_a"], r["id_b"])
        for r in sync.wh.read(StreamingDedupSync.PAIRS_TABLE).collect()
    )
    sigs_1 = sorted(
        r["doc_id"]
        for r in sync.wh.read(IncrementalDedupSync.SIG_TABLE).collect()
    )
    sync._process_batch(batch, 0)  # replay
    pairs_2 = sorted(
        (r["id_a"], r["id_b"])
        for r in sync.wh.read(StreamingDedupSync.PAIRS_TABLE).collect()
    )
    sigs_2 = sorted(
        r["doc_id"]
        for r in sync.wh.read(IncrementalDedupSync.SIG_TABLE).collect()
    )
    assert pairs_2 == pairs_1 and pairs_1
    assert sigs_2 == sigs_1 == sorted({i for i, _ in OLD + NEW})
