"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (JVM-side, codegen'd) and
shuffle only on bounded keys:

- exact:    one hash-agg on a text fingerprint (map-side partial agg).
- minhash:  one shingle explode + one hash-agg with k min()s — the
            signature never materializes the O(n²) pair space.
- LSH:      banded self-join; bucket sizes are bounded by signature
            collisions, and AQE skew-join handles hot buckets.
- jaccard:  exact verification on *candidate pairs only* (inverted-
            index join on shared shingles), never all-pairs.

Hashing uses md5 hex strings so an external SQL oracle (DuckDB,
Postgres) reproduces results bit-for-bit; lexicographic min over hex
digests is a valid min-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import ensure_min_parallelism

NORM_PATTERN = r"\s+"


def normalize_text(text_col) -> F.Column:
    """Whitespace-collapsed, lower-cased canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(text_col), NORM_PATTERN, " "))


def _fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fingerprint, id) projection — the shared input of the groups
    aggregate and the star-edge join."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    # project to the two needed columns BEFORE the widening shuffle
    # so it never moves payload columns
    return ensure_min_parallelism(df.select(id_col, text_col)).select(
        fp, F.col(id_col)
    )


def exact_dedup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns one row per distinct content: (fingerprint, n_docs, keeper_id).
    Single shuffle on the fingerprint; partial aggregation map-side.
    ``fingerprints`` lets a caller that also joins against the
    (fingerprint, id) projection pass in one shared — typically
    checkpointed — frame, so the md5 scan is computed once structurally
    rather than relying on AQE exchange reuse.
    """
    fp = (
        fingerprints
        if fingerprints is not None
        else _fingerprints(df, id_col, text_col)
    )
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id")
    )


def exact_dup_keepers(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Keeper-only corpus: one representative document per distinct
    (normalized) content — the EXACT-DUP PRE-GUARD for the MinHash/LSH
    chain.

    A family of k byte-identical documents fed straight into banded LSH
    lands in the same bucket and emits O(k²) candidate pairs; common
    crawl corpora have k in the millions (boilerplate pages), which is a
    quadratic blow-up no bucketing fixes.  Removing exact duplicates
    first costs one hash-agg + one semi-join and restores the LSH
    bucket-size bound to *near*-dup collision rates.  Exact-dup
    membership is preserved separately by ``exact_dedup_groups`` /
    ``exact_dup_edges`` — nothing is lost, the k² pairs are simply never
    materialized.

    ``fingerprints`` — same passthrough as ``exact_dedup_groups``: a
    pipeline running keepers AND edges shares one (typically
    checkpointed) md5 projection instead of scanning the corpus twice.
    """
    groups = exact_dedup_groups(df, id_col, text_col, fingerprints=fingerprints)
    return df.join(
        groups.select(F.col("keeper_id").alias(id_col)), id_col, "left_semi"
    )


def exact_dup_edges(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Star edges (keeper_id → member_id) for every exact-duplicate
    group member: O(k) edges per k-document family, never O(k²).

    Unioned with the LSH candidate pairs before connected components so
    duplicate CLUSTERS still contain every document even though the LSH
    tier only ever sees keepers.

    The (fingerprint, id) projection is checkpointed and fed to BOTH the
    keeper aggregate and the member join, so the md5 scan runs once by
    construction — previously the two sides each rebuilt it and only
    AQE's ReusedExchange (an optimizer choice, not a guarantee) saved
    the second pass.
    """
    fp = _fingerprints(df, id_col, text_col).localCheckpoint()
    # keeper choice delegated to exact_dedup_groups — ONE definition of
    # "keeper" (min id per fingerprint), so edges can never drift from
    # the groups/keeper-corpus views of the same dedup
    keepers = exact_dedup_groups(df, id_col, text_col, fingerprints=fp).select(
        "fingerprint", F.col("keeper_id").alias("id_a")
    )
    return (
        fp.join(keepers, "fingerprint")
        .filter(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )


def lsh_band_tuning(k: int, target_threshold: float) -> dict:
    """Calibrate banded-LSH parameters for a target Jaccard threshold.

    With a k-hash signature split into b bands of r = k/b rows, a pair
    of Jaccard similarity s collides in at least one band with
    probability 1 - (1 - s^r)^b; the S-curve's midpoint is
    approximately (1/b)^(1/r).  This picks the divisor b of k whose
    midpoint lands closest to ``target_threshold`` and reports the
    collision probability AT the target (the false-negative rate for
    pairs exactly at threshold is its complement) — so a pipeline can
    state its dedup recall instead of inheriting a default.

    Driver-side arithmetic over the handful of divisors of k — use it
    to choose ``bands`` for ``lsh_candidate_pairs`` /
    ``minhash_signature``'s k.
    """
    if k < 1 or not 0 < target_threshold < 1:
        raise ValueError(f"need k >= 1 and 0 < threshold < 1, got {k}, {target_threshold}")
    best = None
    for b in range(1, k + 1):
        if k % b:
            continue
        r = k // b
        midpoint = (1.0 / b) ** (1.0 / r)
        p_at_target = 1.0 - (1.0 - target_threshold**r) ** b
        cand = {
            "bands": b,
            "rows_per_band": r,
            "threshold_midpoint": round(midpoint, 6),
            "p_collide_at_target": round(p_at_target, 6),
        }
        if best is None or abs(midpoint - target_threshold) < abs(
            best["threshold_midpoint"] - target_threshold
        ):
            best = cand
    return best


def gram_expr(words_col: str, n: int) -> str:
    """SQL expression producing the word n-gram array of a split-words
    column — the ONE definition of gram construction, shared by the
    dedup shingles (distinct sets) and the repetition-quality signals
    (multiplicity kept) so the two can never drift."""
    idx_terms = [f"element_at({words_col}, CAST(i + {j} AS INT))" for j in range(n)]
    return (
        f"transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', {', '.join(idx_terms)}))"
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh).

    Built with array transforms over a single split — no UDFs.  Documents
    shorter than ``n`` words produce no shingles.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    sh_expr = gram_expr("__words", n)
    return (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), words.alias("__words"))
        .filter(F.size("__words") >= n)
        .select(F.col(id_col), F.explode(F.expr(sh_expr)).alias("sh"))
        .distinct()
    )


def minhash_signature(shingles: DataFrame, id_col: str, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature as one hash-agg pass.

    Permutation ``i`` is simulated by re-hashing each shingle with a seed
    prefix; the minimum md5 hex digest per seed is the signature slot.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signature: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any full band of the signature become a
    candidate pair.  (id_a, id_b) with id_a < id_b, distinct.

    The unpivot keeps one row per (doc, band); the self-join shuffles on
    (band, key) so each bucket joins locally.

    Bucket-size bound: a bucket of b docs emits O(b²) pairs, so the
    input signature table MUST be exact-dup free (``exact_dup_keepers``
    upstream) — then b is bounded by the near-dup collision rate of a
    band (small by construction: band width tunes the similarity
    threshold), and residual hot buckets are AQE skew-join territory
    rather than a quadratic blow-up.
    """
    banded = _banded(signature, id_col, k, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _banded(signature: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """Unpivot a MinHash signature to one (id, band, key) row per band."""
    if bands < 1 or k % bands != 0 or k // bands < 1:
        # a silent k % bands remainder shifts the similarity threshold;
        # bands > k would make every band key the empty string — ONE
        # universal bucket, i.e. an O(n²) self-join (same validation
        # class as simhash_hamming_pairs' band-width check)
        raise ValueError(
            f"k={k} must be a positive multiple of bands={bands} "
            "(every signature slot in exactly one band)"
        )
    rows = k // bands
    band_cols = []
    for b in range(bands):
        key = F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return signature.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def incremental_lsh_candidates(
    old_sig: DataFrame,
    new_sig: DataFrame,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    validate_ids: bool = False,
) -> DataFrame:
    """LSH candidate pairs INVOLVING AT LEAST ONE NEW DOCUMENT:
    new-vs-corpus plus new-vs-new, without ever self-joining the old
    corpus with itself.

    The production shape of dedup at 100 TB: the corpus signature table
    is a materialized artifact (|corpus| × k hashes — the cheap tier),
    and each ingest batch LSH-checks only against it.  A naive re-run of
    ``lsh_candidate_pairs`` over the unioned corpus re-derives every
    old-vs-old pair each batch — O(|corpus|) bucket work per batch;
    here the join's LEFT side is only the new batch's bands, so bucket
    work is O(|batch| × bucket occupancy) and the old corpus is stream-
    probed once.  Id spaces must be disjoint (new docs get new ids): a
    re-ingested id appearing on BOTH sides has its new-vs-old pairing
    suppressed by the ``a.id != b.id`` guard and its duplicate
    signature rows distort buckets.  ``validate_ids=True`` enforces
    this with a batch-vs-corpus semi-join (cost bounded by the batch
    side — the pipeline sync path turns it on; default off for callers
    who guarantee disjointness upstream).

    Equivalent to the full recompute restricted to pairs touching a new
    id — asserted by tests/test_incremental_dedup.py.
    """
    if validate_ids:
        overlap = [
            r[0]
            for r in new_sig.select(id_col)
            .join(old_sig, id_col, "left_semi")
            .limit(5)
            .collect()
        ]
        if overlap:
            raise ValueError(
                "incremental_lsh_candidates: old/new id spaces overlap "
                f"(e.g. {overlap}); re-ingested ids suppress their "
                "new-vs-old pairs — dedup/replace them before the "
                "incremental check"
            )
    # banded new batch materialized once (it is read twice: probe side
    # and inside the union) — batches are small relative to the corpus,
    # so the checkpoint is cheap by construction
    nb = _banded(new_sig, id_col, k, bands).localCheckpoint()
    new_banded = nb.alias("a")
    all_banded = (
        _banded(old_sig, id_col, k, bands)
        .withColumn("__is_new", F.lit(False))
        .unionByName(nb.withColumn("__is_new", F.lit(True)))
        .alias("b")
    )
    # right side old: always pair (orientation normalized below, emitted
    # exactly once since only new ids appear on the left).  right side
    # new: require a.id < b.id so each new-new pair emits once.
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (
            (~F.col("b.__is_new"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
    )
    return (
        new_banded.join(all_banded, cond)
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame,
    shingles: DataFrame,
    id_col: str,
    pairs_materialized: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs only.

    Intersection via double equi-join against the distinct-shingle table
    (an inverted-index probe, not an all-pairs scan); union by
    inclusion-exclusion on per-doc shingle counts.

    The shingle table feeds multiple consumers (both join probes, the
    size aggregate, and the MinHash chain upstream) but is deliberately
    NOT persist()ed: its distinct() shuffle is identical across
    consumers, so AQE shares it via ReusedExchange at zero extra cost,
    while an explicit cache forces a full columnar materialization of
    the exploded shingle table (measured 3x slower end-to-end).

    ``pairs`` IS materialized: LSH candidates are a tiny fraction of
    the corpus by construction, and without the cut the whole
    signature/banding chain is embedded as a duplicated subtree whose
    AQE stage-reuse is racy (identical stages submitted concurrently
    can both run before either registers) — measured as bimodal 2.8s
    vs 8s runs.  Same pattern as ``connected_components``'s edge set.
    ``pairs_materialized=True`` skips the cut when the caller already
    checkpointed the pair set (re-checkpointing copies the materialized
    partitions a second time for nothing).
    """
    if not pairs_materialized:
        pairs = pairs.localCheckpoint()
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("__id_b"), F.col("sh").alias("__sh_b"))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("__id_b")) & (F.col("sh") == F.col("__sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def minhash_jaccard_estimate(
    pairs: DataFrame, signature: DataFrame, id_col: str, k: int = 8
) -> DataFrame:
    """Sketch-based Jaccard estimate for candidate pairs: the fraction
    of agreeing MinHash slots is an unbiased estimator of the true
    Jaccard similarity (E[mh_a == mh_b] = J(A,B) per permutation).

    This is the 100 TB verification path: it touches only the k-slot
    signature table (|docs| × k hashes), never the exploded shingle
    corpus — exact verification (``jaccard_on_pairs``) can then be
    reserved for pairs whose estimate clears a threshold.
    """
    sa = signature.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)]
    )
    sb = signature.select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(float(k)), 6).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash — 64-bit signature from per-word md5 bits (bit-majority vote).
# Expressed as 64 conditional aggregates generated programmatically; the
# whole thing is one explode + one hash-agg, same scale profile as minhash.
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_signature(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word unigrams (with multiplicity).

    Each word hashes to 64 bits (16 hex chars of md5); per bit position
    the signed occurrence counts vote, and the sign becomes the output
    bit.  Emitted as a 16-hex-char string for cross-engine comparability.
    """
    # single-pass formulation: per-occurrence md5 (JVM codegen — cheap),
    # 64 conditional sums in ONE groupBy.  Map-side partial aggregation
    # collapses each partition to |docs|×64 longs before the only
    # shuffle, so shuffle volume is bounded by the doc count, never the
    # token count.  (A vocab-dedup + broadcast-join variant measured
    # 2.4× slower here: two extra exchanges beat the saved hashing.)
    words = ensure_min_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).withColumn("h", F.md5("w"))
    digit_cols = [
        F.conv(F.substring("h", c + 1, 1), 16, 10).cast("int").alias(f"d{c}")
        for c in range(16)
    ]
    dw = words.select(id_col, *digit_cols)
    aggs = []
    for c in range(16):
        for b in range(4):
            bit = F.shiftright(F.col(f"d{c}"), 3 - b).bitwiseAND(F.lit(1))
            aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{c}_{b}"))
    votes = dw.groupBy(id_col).agg(*aggs)
    # reassemble: 4 vote signs per hex char -> digit -> hex char
    char_exprs = []
    for c in range(16):
        digit = sum(
            F.when(F.col(f"v{c}_{b}") > 0, F.lit(1 << (3 - b))).otherwise(F.lit(0))
            for b in range(4)
        )
        char_exprs.append(F.lower(F.conv(digit.cast("string"), 10, 16)))
    return votes.select(F.col(id_col), F.concat(*char_exprs).alias("simhash"))


# ---------------------------------------------------------------------------
# Connected components — near-dup pairs -> dup clusters.
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, max_iter: int = 25, jump_after: int = 2
) -> DataFrame:
    """Cluster candidate pairs into duplicate groups: (node, cluster_id)
    with cluster_id = min node id in the connected component.

    Min-label propagation with DEFERRED pointer jumping: each round a
    node takes the minimum of (its label, its neighbours' labels, and —
    from round ``jump_after`` on — its label's label).  The label-of-
    label shortcut halves the remaining distance to the component
    minimum every round, so convergence is O(log diameter) rounds — a
    path graph of 1M nodes converges in ~20 rounds where plain
    neighbour propagation needs 1M.  It costs one extra join per round,
    which near-dup graphs (near-cliques that converge in 1-2 rounds)
    never need — hence deferred: the first ``jump_after`` rounds run
    plain propagation, and only a graph still unconverged after them
    (i.e. with actual diameter) pays for the shortcut that guarantees
    its log-round bound.  Every intermediate label is the id of a node
    in the same component (labels start as self/neighbour ids and only
    ever adopt other labels from the same component), so the fixpoint —
    constant across each component, and the component minimum labels
    itself — is exactly min-id clustering.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass with labels
    still changing: returning the unconverged labels would silently
    split clusters, and downstream dedup would keep both halves of a
    duplicate family.  (With pointer jumping, hitting 25 rounds means a
    component diameter over ~2^25 — a pathological chain, not a near-dup
    clique; raising is the correct signal.)

    Scale notes: each round is two joins + one aggregate shuffled on the
    node id (the same key every round, so AQE reuses the partitioning);
    ``localCheckpoint`` truncates the lineage so the plan does not grow
    per iteration.  The driver sees only the per-round change count — no
    data ever collects.
    """
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # seed with the 1-hop minimum (free first propagation round: LSH dup
    # graphs are near-cliques, so most components converge immediately)
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nbr_min"))
        .select("node", F.least(F.col("node"), F.col("__nbr_min")).alias("label"))
        .localCheckpoint()
    )
    converged = False
    for round_idx in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("nl")),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nl").alias("nbr_label"))
        )
        candidates = [
            F.col("label"),
            F.coalesce("nbr_label", F.col("label")),
        ]
        changed = F.col("nbr_label") < F.col("label")
        joined = labels.join(nbr_min, "node", "left")
        if round_idx >= jump_after:
            # pointer jumping: the label of my label (labels self-joined
            # on label == node).  A label is always a real node of the
            # same component, so the lookup never misses semantically;
            # left join only guards isolated self-labels.
            grand = labels.select(
                F.col("node").alias("label"), F.col("label").alias("grand_label")
            )
            joined = joined.join(grand, "label", "left")
            candidates.append(F.coalesce("grand_label", F.col("label")))
            changed = changed | (F.col("grand_label") < F.col("label"))
        # the change count rides the checkpoint itself (Observation):
        # one job per round instead of checkpoint + count — the rounds
        # are scheduling-bound locally, and at cluster scale the count
        # was a second full pass over the labels (r16 optimization
        # round).  NULL __changed (no neighbour / no grand label)
        # counts as unchanged, exactly like the filter().count() form.
        from pyspark.sql import Observation

        obs = Observation()
        updated = (
            joined.select(
                "node",
                F.least(*candidates).alias("label"),
                changed.alias("__changed"),
            )
            .observe(obs, F.sum(F.col("__changed").cast("long")).alias("n"))
            .localCheckpoint()
        )
        # non-blocking in practice: the eager checkpoint above already
        # ran the observed plan to completion
        n_changed = obs.get["n"] or 0
        labels = updated.drop("__changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels are still changing — returning them would silently "
            "mislabel clusters.  Raise max_iter (rounds needed ≈ "
            "log2(component diameter) with pointer jumping)."
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# SimHash near-dup pairs — banded candidate generation + exact Hamming
# verification, the bitwise sibling of the MinHash/LSH chain.
# ---------------------------------------------------------------------------


def simhash_hamming_pairs(
    sig: DataFrame, id_col: str, max_hamming: int = 8, bands: int = 4
) -> DataFrame:
    """Near-dup pairs from 64-bit SimHash signatures.

    Banding gives the sub-quadratic candidate set: two signatures within
    Hamming distance (bands - 1) must agree on at least one of ``bands``
    equal-width chunks (pigeonhole), so candidates = docs sharing any
    16-bit chunk — an equi-join on (band, chunk), same shuffle shape as
    MinHash LSH banding.  Exact Hamming distance (per-chunk XOR popcount,
    all JVM bit ops) then verifies candidates against ``max_hamming``.
    Input must be exact-dup free (``exact_dup_keepers`` upstream) for
    the same O(k²) reason as LSH.

    RECALL CONTRACT: the pigeonhole guarantee is complete only up to
    Hamming distance ``bands - 1``.  With the defaults
    (``max_hamming=8 > bands-1=3``) pairs at distance 4-8 are reported
    IF they happen to share a chunk but are not guaranteed found — the
    standard banded-SimHash trade (full recall to bands-1, probabilistic
    beyond; raise ``bands`` for a stronger guarantee at more shuffle
    rows).  Callers needing guaranteed recall must keep
    ``max_hamming <= bands - 1``.
    """
    if bands < 2 or 16 % bands != 0:
        raise ValueError(
            f"bands={bands} must be >= 2 and evenly divide the 16 hex "
            "chars of the signature — a remainder would silently drop "
            "trailing bits from both banding and the Hamming sum, and a "
            "single 16-hex-char band (64 bits) overflows conv(...,16,10)"
            ".cast('long') to NULL for values >= 2^63, silently dropping "
            "matching pairs instead of returning hamming=0"
        )
    chunk = 16 // bands  # hex chars per band
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", b * chunk + 1, chunk).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .distinct()
    )
    hamming = sum(
        F.bit_count(
            F.conv(F.substring("__sa", c * chunk + 1, chunk), 16, 10)
            .cast("long")
            .bitwiseXOR(
                F.conv(F.substring("__sb", c * chunk + 1, chunk), 16, 10).cast("long")
            )
        )
        for c in range(bands)
    )
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — cross-corpus n-gram overlap.
# ---------------------------------------------------------------------------


def benchmark_contamination(
    corpus_sh: DataFrame, bench_sh: DataFrame, id_col: str
) -> DataFrame:
    """Flag corpus documents sharing word n-grams with a benchmark set.

    The decontamination step of a pretraining pipeline: any training
    document containing an n-gram that also appears in an eval/benchmark
    document is a leakage risk and gets reported with the evidence —
    ``(doc_id, n_hit_shingles, n_bench_docs)`` for every contaminated
    document (clean documents are absent from the output).

    Both inputs are ``word_shingles`` outputs (``(id, sh)``, distinct
    per document).  Scale shape: the benchmark side is always tiny
    relative to a 100 TB corpus (thousands of eval documents), so it is
    broadcast — the corpus shingle stream probes a hash map and never
    shuffles on the shingle key; the only shuffle is the per-doc
    hash-agg on ``doc_id`` (map-side combinable).  In production the
    n-gram order is 8-13; tests use the corpus-wide n=3 shingles so the
    synthetic word-salad data produces hits.
    """
    bench = bench_sh.select(
        F.col("sh"), F.col(id_col).alias("__bench_id")
    ).distinct()
    return (
        corpus_sh.join(F.broadcast(bench), "sh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("sh").alias("n_hit_shingles"),
            F.countDistinct("__bench_id").alias("n_bench_docs"),
        )
    )


def substring_dup_pairs(
    grams: DataFrame, id_col: str, min_df: int = 2, max_df: int = 50
) -> DataFrame:
    """Exact substring-overlap pairs: documents sharing at least one
    LONG word n-gram (``grams`` = ``word_shingles`` with n≈10-50), with
    the shared-gram count as evidence.

    The tier Jaccard misses: a document that embeds one long verbatim
    passage of another (quotes, partial copies, template reuse) can sit
    far below any whole-document similarity threshold while still being
    a memorization risk — the published fix is exact long-substring
    matching (suffix-array dedup); this is its bounded n-gram
    approximation as two hash-aggs + one self-equi-join.

    The document-frequency band is the scale guard: grams must be
    shared (df >= min_df) but grams hot beyond ``max_df`` are
    boilerplate ("stop-grams" — headers, licenses) and are EXCLUDED,
    bounding every gram's pair fan-out at max_df² instead of the
    unbounded k² a boilerplate phrase would otherwise emit.  At 100 TB:
    explode → df hash-agg (map-side combinable) → banded self-join on
    the gram key, all shuffles on bounded-fan-out keys; exact-dup
    keepers should feed it (same O(k) guard as LSH).
    """
    df_band = (
        grams.groupBy("sh")
        .agg(F.count("*").alias("__df"))
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
        .select("sh")
    )
    g = grams.join(df_band, "sh")
    a = g.select("sh", F.col(id_col).alias("id_a"))
    b = g.select("sh", F.col(id_col).alias("id_b"))
    return (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def doc_chunks(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int = 10
) -> DataFrame:
    """Segment each document into fixed-width word chunks (pseudo-
    paragraphs): ``(id, chunk_idx, chunk)``.

    The corpus in this environment carries no newline structure, so the
    paragraph unit of line/paragraph-level dedup (C4's "discard every
    repeated three-sentence span", RefinedWeb's line dedup) is
    approximated by deterministic fixed-width segmentation — the
    trailing partial chunk is kept.  Pure array expressions over one
    split: no UDF, no shuffle; a narrow map over the corpus scan.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size("__words") / F.lit(float(chunk_words))).cast("int")
    chunk_arr = F.expr(
        f"transform(sequence(0, __n_chunks - 1), "
        f"i -> concat_ws(' ', slice(__words, i * {chunk_words} + 1, {chunk_words})))"
    )
    return (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), words.alias("__words"))
        .withColumn("__n_chunks", n_chunks)
        .select(F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
    )


def window_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_words: int = 100,
    stride_words: int = 80,
) -> DataFrame:
    """Split long documents into overlapping training-window pieces:
    ``(id, piece_idx, piece, n_words)`` — the long-document split of a
    pretraining pipeline (documents beyond the context length become
    strided windows so no text is dropped and boundaries overlap by
    ``window - stride`` words for continuity).

    Piece i covers words ``[i*stride, i*stride + window)``; the final
    piece truncates at the document end, and a document at or under the
    window size yields exactly itself.  Pure array expressions over one
    split — no UDF, no shuffle.
    """
    if not 0 < stride_words <= window_words:
        raise ValueError(
            f"need 0 < stride <= window, got {stride_words}, {window_words}"
        )
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_pieces = F.when(F.size("__words") <= window_words, F.lit(1)).otherwise(
        F.ceil(
            (F.size("__words") - F.lit(window_words))
            / F.lit(float(stride_words))
        ).cast("int")
        + 1
    )
    piece_arr = F.expr(
        f"transform(sequence(0, __n_pieces - 1), "
        f"i -> slice(__words, i * {stride_words} + 1, {window_words}))"
    )
    return (
        ensure_min_parallelism(df.select(id_col, text_col), id_col)
        .filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), words.alias("__words"))
        .withColumn("__n_pieces", n_pieces)
        .select(
            F.col(id_col), F.posexplode(piece_arr).alias("piece_idx", "__pw")
        )
        .select(
            F.col(id_col),
            "piece_idx",
            F.concat_ws(" ", F.col("__pw")).alias("piece"),
            F.size("__pw").alias("n_words"),
        )
    )


def chunk_dedup_stats(
    chunks: DataFrame, id_col: str, min_doc_freq: int = 2
) -> DataFrame:
    """Cross-document chunk (pseudo-paragraph) duplication census:
    per document, how many of its chunks appear in ≥``min_doc_freq``
    DISTINCT documents — the measurement step of line/paragraph-level
    dedup (the removal step is a filter on the same join).

    ``chunks`` is a ``doc_chunks`` output.  Scale shape: one hash-agg on
    the chunk key for the document-frequency table (map-side combinable;
    distinct-doc counting via the (chunk, doc) pre-distinct), then an
    equi-join back on the chunk key and a per-doc hash-agg — every
    shuffle is on a bounded key, nothing is collected, and boilerplate
    chunks (the high-df tail) cost one df row each, not a pair fan-out.
    """
    cdf = (
        chunks.select("chunk", F.col(id_col)).distinct()
        .groupBy("chunk")
        .agg(F.count("*").alias("__doc_freq"))
    )
    return (
        chunks.join(cdf, "chunk")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("__doc_freq") >= min_doc_freq, 1).otherwise(0)
            ).alias("n_dup_chunks"),
            F.round(
                F.try_divide(
                    F.sum(
                        F.when(F.col("__doc_freq") >= min_doc_freq, 1).otherwise(0)
                    ),
                    F.count("*"),
                ),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


def chunk_dedup_clean(
    chunks: DataFrame, id_col: str, min_doc_freq: int = 2
) -> DataFrame:
    """Paragraph-level dedup REMOVAL: rebuild each document keeping a
    duplicated chunk only at its first occurrence corpus-wide (lowest
    ``(doc, chunk_idx)``), all other occurrences dropped — the
    RefinedWeb line-dedup rule (one copy survives; C4's drop-all is
    this with the keeper filter removed).

    Determinism without a global sort: the surviving occurrence is the
    lexicographic ``min(struct(doc, chunk_idx))`` per chunk — doc-
    frequency and keeper ride ONE map-side-combinable hash-agg on the
    chunk key, joined back once as the filter.  Reassembly is a per-doc
    ``collect_list`` of (idx, chunk) structs sorted in-array — no
    window, no per-doc ordering shuffle beyond the one hash-agg.  A doc
    whose every chunk was removed disappears from the output (matches
    the SQL GROUP BY over survivors).
    """
    cdf = chunks.groupBy("chunk").agg(
        F.countDistinct(id_col).alias("__doc_freq"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("chunk_idx").alias("i")))
        .alias("__keep"),
    )
    survivors = chunks.join(cdf, "chunk").filter(
        (F.col("__doc_freq") < min_doc_freq)
        | (
            (F.col(id_col) == F.col("__keep.d"))
            & (F.col("chunk_idx") == F.col("__keep.i"))
        )
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("chunk_idx").alias("i"), F.col("chunk").alias("c")))
    )
    return survivors.groupBy(id_col).agg(
        F.count("*").alias("n_kept_chunks"),
        F.array_join(F.transform(parts, lambda x: x["c"]), " ").alias("clean_text"),
    )


def best_quality_keepers(
    clusters: DataFrame, scored: DataFrame, id_col: str, score_col: str
) -> DataFrame:
    """Quality-aware dedup keep-list: for every dup cluster keep the
    member with the HIGHEST quality score (ties → lowest id); documents
    in no cluster keep themselves.  Production dedup keeps the best
    copy, not the lowest-id copy — a near-dup family often mixes a
    clean original with truncated/boilerplate variants.

    ``clusters`` is a ``connected_components`` output ``(node,
    cluster_id)``; ``scored`` maps ``id_col`` → ``score_col``.  Null
    scores rank lowest (null-safe max equality picks them only in
    all-null clusters).  Shape: two hash-aggs on the bounded cluster
    key + one anti-join for singletons; no window needed.
    """
    j = clusters.join(
        scored.select(F.col(id_col), F.col(score_col)),
        clusters["node"] == scored[id_col],
    ).select(
        F.col("node").alias(id_col), "cluster_id", F.col(score_col)
    )
    best = j.groupBy("cluster_id").agg(F.max(score_col).alias("__best"))
    reps = (
        j.join(best, "cluster_id")
        .filter(F.col(score_col).eqNullSafe(F.col("__best")))
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias(id_col), F.max("__best").alias(score_col))
    )
    # singletons carry a NULL cluster_id of the CLUSTERS frame's own
    # type — a hardcoded long would break the union for string ids
    cluster_type = clusters.schema["cluster_id"].dataType
    singles = scored.select(F.col(id_col), F.col(score_col)).join(
        clusters.select(F.col("node").alias(id_col)), id_col, "left_anti"
    ).withColumn("cluster_id", F.lit(None).cast(cluster_type))
    return reps.select(id_col, "cluster_id", score_col).unionByName(
        singles.select(id_col, "cluster_id", score_col)
    )
