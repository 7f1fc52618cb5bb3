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


def test_simhash_bands_must_divide_signature(spark):
    import pytest

    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        simhash_hamming_pairs,
        simhash_signature,
    )

    docs = _corpus(spark)
    sig = simhash_signature(docs, "doc_id", "text")
    with pytest.raises(ValueError, match="evenly divide"):
        simhash_hamming_pairs(sig, "doc_id", bands=5)


def test_funnel_neardup_uses_surviving_corpus(spark):
    """A doc whose only near-dup partner was already removed by an
    earlier stage must NOT be dropped at the near-dup stage — otherwise
    no retained copy of that content survives at all.

    The crafted pair (1, 2) shares a long marker-free tail so it IS an
    LSH candidate over the full corpus (asserted below — the precondition
    under which near-dup-on-the-full-corpus would wrongly drop doc 2,
    the pair's id_b), while doc 1 alone fails the language gate."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.queries_traindata import (
        build_curation_funnel,
    )

    tail = (
        "quick brown fox jumps over lazy dog near river bank while "
        "sun sets behind tall mountain peaks casting long golden shadows "
        "across quiet green valley fields where farmers harvest ripe wheat "
        "before autumn rain arrives bringing cold wind from northern hills"
    )
    docs = spark.createDataFrame(
        [(1, "der ein von und zu " + tail), (2, "the a of and to " + tail)],
        "doc_id long, text string",
    )
    # precondition: (1, 2) is a full-corpus LSH candidate pair
    sh = D.word_shingles(docs, "doc_id", "text", n=3)
    sig = D.minhash_signature(sh, "doc_id", k=8)
    full_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4).collect()
    }
    assert (1, 2) in full_pairs

    out = {r["stage"]: r["n_docs"] for r in build_curation_funnel(docs).collect()}
    assert out["total"] == 2
    assert out["lang_en"] == 1             # doc 1 (de markers) filtered
    assert out["quality"] == 1
    assert out["exact_dedup"] == 1
    assert out["near_dedup"] == 1          # doc 2 survives: its partner
    #                                        never reached the near-dup stage


def test_simhash_single_band_rejected(spark):
    """bands=1 would XOR 64-bit chunks through conv(...,16,10)
    .cast('long'), which overflows to NULL for signatures >= 2^63 and
    silently DROPS matching pairs — rejected up front."""
    import pytest

    docs = _corpus(spark)
    sig = D.simhash_signature(docs, "doc_id", "text")
    with pytest.raises(ValueError, match=">= 2"):
        D.simhash_hamming_pairs(sig, "doc_id", bands=1)


def test_simhash_high_bit_signatures_pair_up(spark):
    """Signatures with the top bit set (>= 2^63 as a 64-bit value) must
    still produce hamming=0 self-pairs at every legal band count — the
    overflow regime the bands >= 2 guard exists for."""
    sig = spark.createDataFrame(
        [(1, "f" * 16), (2, "f" * 16), (3, "0" * 16)],
        "doc_id long, simhash string",
    )
    for bands in (2, 4, 8, 16):
        rows = D.simhash_hamming_pairs(sig, "doc_id", bands=bands).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def test_lsh_band_tuning_picks_matching_divisor():
    from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
        lsh_band_tuning,
    )

    # k=8, target 0.5: b=4, r=2 gives midpoint (1/4)^(1/2) = 0.5 exactly
    t = lsh_band_tuning(8, 0.5)
    assert (t["bands"], t["rows_per_band"]) == (4, 2)
    assert t["threshold_midpoint"] == 0.5
    # at the midpoint the collision probability is substantial (~0.68)
    assert 0.6 < t["p_collide_at_target"] < 0.8
    # a high threshold pushes toward fewer bands (longer rows)
    hi = lsh_band_tuning(8, 0.95)
    assert hi["rows_per_band"] > 2
    import pytest

    with pytest.raises(ValueError):
        lsh_band_tuning(8, 1.5)
