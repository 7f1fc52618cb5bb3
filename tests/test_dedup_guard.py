"""Exact-dup pre-guard: a k-identical-document family must contribute
O(k) work to the near-dup chain — never O(k²) LSH candidate pairs
(operators/dedup.py exact_dup_keepers / exact_dup_edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.operators import dedup as D

_FAMILY = 1000  # identical docs
_BOILERPLATE = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark):
    rows = [(i, _BOILERPLATE) for i in range(_FAMILY)]
    rows += [
        (2000, "alpha beta gamma delta epsilon zeta eta theta"),
        (2001, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 2000
        (2002, "one two three four five six seven eight nine"),
        (2003, "completely different text about spark partitioning strategies"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keepers_collapse_exact_family(spark):
    docs = _corpus(spark)
    keepers = D.exact_dup_keepers(docs, "doc_id", "text")
    ids = {r["doc_id"] for r in keepers.select("doc_id").collect()}
    assert ids == {0, 2000, 2001, 2002, 2003}  # one keeper for the family


def test_candidate_pairs_stay_linear(spark):
    """Without the guard the family alone yields C(1000,2) ≈ 5·10⁵
    pairs; with it the whole corpus must stay under C(5,2)."""
    docs = _corpus(spark)
    kept = D.exact_dup_keepers(docs, "doc_id", "text")
    sh = D.word_shingles(kept, "doc_id", "text", n=3)
    sig = D.minhash_signature(sh, "doc_id", k=8)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4).collect()
    assert len(pairs) <= 10  # C(5,2) upper bound; actual: near-dup hits only
    family_members = set(range(1, _FAMILY))  # non-keeper members
    for r in pairs:
        assert r["id_a"] not in family_members
        assert r["id_b"] not in family_members
    # the near-dup pair the chain exists to find is still found
    assert any((r["id_a"], r["id_b"]) == (2000, 2001) for r in pairs)


def test_exact_edges_linear_and_clusters_complete(spark):
    """Star edges are O(k) and re-attach every family member to its
    cluster after connected components."""
    docs = _corpus(spark)
    edges = D.exact_dup_edges(docs, "doc_id", "text")
    rows = edges.collect()
    assert len(rows) == _FAMILY - 1  # O(k), not O(k²)
    assert all(r["id_a"] == 0 for r in rows)

    kept = D.exact_dup_keepers(docs, "doc_id", "text")
    sh = D.word_shingles(kept, "doc_id", "text", n=3)
    sig = D.minhash_signature(sh, "doc_id", k=8)
    lsh_pairs = D.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4)
    clusters = D.connected_components(
        lsh_pairs.unionByName(edges).distinct()
    ).collect()
    labels = {r["node"]: r["cluster_id"] for r in clusters}
    assert all(labels[i] == 0 for i in range(_FAMILY))  # whole family clustered
    assert labels[2001] == labels[2000] == 2000
