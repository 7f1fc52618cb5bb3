"""Round-5 training-data operators: chunk dedup segmentation edges,
shuffle-shard determinism across partition layouts, mixing-weight
normalization, and top-k gram tie determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
    chunk_dedup_stats,
    doc_chunks,
)
from iot_elt_airflow_mongo_timescaledb_spark.operators.packing import (
    mix_weights,
    shuffle_shard,
)
from iot_elt_airflow_mongo_timescaledb_spark.operators.text import corpus_ngram_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunks_trailing_partial_and_short_docs(spark):
    out = doc_chunks(
        _docs(
            spark,
            [
                (1, " ".join(f"w{i}" for i in range(25))),  # 3 chunks (10/10/5)
                (2, "solo"),  # 1 chunk shorter than the width
                (3, "   "),  # whitespace-only: no chunks
            ],
        ),
        "doc_id",
        "text",
        chunk_words=10,
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3
    assert sorted(r["chunk_idx"] for r in by_doc[1]) == [0, 1, 2]
    trailing = next(r for r in by_doc[1] if r["chunk_idx"] == 2)
    assert trailing["chunk"] == "w20 w21 w22 w23 w24"
    assert [r["chunk"] for r in by_doc[2]] == ["solo"]
    assert 3 not in by_doc


def test_chunk_dedup_counts_cross_doc_only(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    # doc 3 repeats ITS OWN chunk twice — self-repetition is not a
    # cross-document duplicate (doc_freq counts distinct docs)
    self_rep = " ".join(f"c{i}" for i in range(10))
    chunks = doc_chunks(
        _docs(
            spark,
            [
                (1, f"{shared} {uniq_a}"),
                (2, f"{shared} {uniq_b}"),
                (3, f"{self_rep} {self_rep}"),
            ],
        ),
        "doc_id",
        "text",
    )
    rows = {r["doc_id"]: r for r in chunk_dedup_stats(chunks, "doc_id").collect()}
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_dup_chunks"] == 1
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_dup_chunks"] == 1
    assert rows[1]["dup_chunk_frac"] == 0.5
    assert rows[3]["n_chunks"] == 2 and rows[3]["n_dup_chunks"] == 0


def test_shuffle_shard_deterministic_across_layouts(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(300)], "doc_id long, payload string"
    )
    base = sorted(
        shuffle_shard(df, "doc_id", n_shards=8).collect(),
        key=lambda r: r["doc_id"],
    )
    for parts in (1, 7):
        again = sorted(
            shuffle_shard(df.repartition(parts), "doc_id", n_shards=8).collect(),
            key=lambda r: r["doc_id"],
        )
        assert again == base
    # positions are a 1..n_i permutation within each shard
    by_shard: dict[int, list] = {}
    for r in base:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # a different seed re-deals the corpus
    reseeded = sorted(
        shuffle_shard(df, "doc_id", n_shards=8, seed=1).collect(),
        key=lambda r: r["doc_id"],
    )
    assert reseeded != base


def test_mix_weights_normalized_and_monotone(spark):
    df = spark.createDataFrame(
        [("big", 900), ("mid", 90), ("small", 10)] * 5,
        "source string, n_tok long",
    )
    rows = {r["source"]: r for r in mix_weights(df, "source", "n_tok").collect()}
    assert abs(sum(r["mix_weight"] for r in rows.values()) - 1.0) < 1e-5
    assert abs(sum(r["token_share"] for r in rows.values()) - 1.0) < 1e-5
    # alpha=0.5 flattens: the small source's weight exceeds its share
    assert rows["small"]["mix_weight"] > rows["small"]["token_share"]
    assert rows["big"]["mix_weight"] < rows["big"]["token_share"]
    # shares keep the natural order
    assert rows["big"]["mix_weight"] > rows["mid"]["mix_weight"] > rows["small"]["mix_weight"]


def test_corpus_ngram_topk_tiebreak_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "x y z x y z"),  # 'x y z' twice (plus bridging grams once)
            (2, "x y z q r s"),
            (3, "q r s q r s"),
        ],
    )
    rows = corpus_ngram_topk(docs, "doc_id", "text", n=3, k=3).collect()
    assert [r["gram"] for r in rows[:2]] == ["q r s", "x y z"]  # 3 each, tie → asc
    assert rows[0]["n_occurrences"] == 3 and rows[0]["n_docs"] == 2
    assert rows[1]["n_occurrences"] == 3 and rows[1]["n_docs"] == 2


def test_chunk_dedup_clean_first_occurrence_survives(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        chunk_dedup_clean,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(10))
    other = " ".join(f"v{i}" for i in range(10))
    rows = {
        r["doc_id"]: r
        for r in chunk_dedup_clean(
            doc_chunks(
                _docs(
                    spark,
                    [
                        (1, f"{shared} {uniq}"),   # owns the first occurrence
                        (2, f"{shared}"),          # loses its only chunk
                        (3, f"{other} {shared}"),  # distinct first chunk, loses shared
                    ],
                ),
                "doc_id",
                "text",
            ),
            "doc_id",
        ).collect()
    }
    assert rows[1]["n_kept_chunks"] == 2
    assert rows[1]["clean_text"] == f"{shared} {uniq}"
    assert 2 not in rows  # every chunk removed -> doc disappears
    assert rows[3]["n_kept_chunks"] == 1 and shared not in rows[3]["clean_text"]


def test_best_quality_keepers_ties_nulls_singletons(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        best_quality_keepers,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, None), (11, None), (20, 0.3)],
        "doc_id long, quality_score double",
    )
    rows = {
        r["doc_id"]: r
        for r in best_quality_keepers(
            clusters, scored, "doc_id", "quality_score"
        ).collect()
    }
    assert set(rows) == {2, 10, 20}
    assert rows[2]["cluster_id"] == 1 and rows[2]["quality_score"] == 0.9  # tie -> min id
    assert rows[10]["quality_score"] is None  # all-null cluster still keeps one
    assert rows[20]["cluster_id"] is None  # singleton passes through


def test_mix_weights_zero_token_corpus_yields_nulls(spark):
    """An all-zero-token corpus must score NULL shares, not abort the
    job under ANSI (Spark 4 default) — the quality_scores try_divide
    contract applied to the mixing aggregate."""
    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "source string, n_tok long"
    )
    rows = {r["source"]: r for r in mix_weights(df, "source", "n_tok").collect()}
    assert rows["a"]["token_share"] is None
    assert rows["a"]["mix_weight"] is None
    assert rows["a"]["n_docs"] == 1


def test_chunk_clean_identity_when_no_cross_doc_dups(spark):
    """With no cross-document duplicate chunk, cleaning must be the
    identity (modulo whitespace normalization of the split)."""
    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        chunk_dedup_clean,
    )

    texts = {
        i: " ".join(f"d{i}w{j}" for j in range(23)) for i in range(1, 6)
    }
    rows = {
        r["doc_id"]: r["clean_text"]
        for r in chunk_dedup_clean(
            doc_chunks(_docs(spark, list(texts.items())), "doc_id", "text"),
            "doc_id",
        ).collect()
    }
    assert rows == texts


def test_normalize_corpus_strips_controls_and_collapses(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.text import (
        normalize_corpus,
    )

    rows = {
        r["doc_id"]: r
        for r in normalize_corpus(
            _docs(
                spark,
                [
                    (1, "a\x00b\x07c"),           # control chars stripped
                    (2, "  hello \t\n  world  "),  # collapse + trim
                    (3, "clean already"),
                ],
            ),
            "doc_id",
            "text",
        ).collect()
    }
    assert rows[1]["clean_text"] == "abc" and rows[1]["n_removed_chars"] == 2
    assert rows[2]["clean_text"] == "hello world"
    assert rows[3]["clean_text"] == "clean already" and rows[3]["n_removed_chars"] == 0


def test_window_chunks_coverage_and_overlap(spark):
    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        window_chunks,
    )

    words = [f"w{i}" for i in range(25)]
    rows = sorted(
        window_chunks(
            _docs(spark, [(1, " ".join(words)), (2, "short doc")]),
            "doc_id",
            "text",
            window_words=10,
            stride_words=5,
        ).collect(),
        key=lambda r: (r["doc_id"], r["piece_idx"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # 25 words, window 10, stride 5 -> ceil(15/5)+1 = 4 pieces
    assert [r["piece_idx"] for r in d1] == [0, 1, 2, 3]
    assert d1[0]["piece"].split() == words[0:10]
    assert d1[1]["piece"].split() == words[5:15]   # 5-word overlap
    assert d1[3]["piece"].split() == words[15:25]  # tail covered exactly
    assert all(r["n_words"] == 10 for r in d1)
    # every word appears in some piece (full coverage)
    covered = set()
    for r in d1:
        covered.update(r["piece"].split())
    assert covered == set(words)
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["piece"] == "short doc"
    import pytest

    with pytest.raises(ValueError):
        window_chunks(_docs(spark, [(1, "a")]), "doc_id", "text", 10, 11)
