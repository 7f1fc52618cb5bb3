"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- ``cosine_topk``   — exact brute force: one pass over the corpus per
  query batch, dot products computed JVM-side with ``zip_with`` +
  ``aggregate`` (sequential fold → deterministic, oracle-comparable),
  top-k via a per-query window.  The right baseline, and fine whenever
  |queries| × |corpus| rows fit a shuffle.
- ``ivf_topk``      — IVF-style scale path: corpus is coarse-clustered
  (here: by a partition key, e.g. a precomputed label or an LSH sign
  bucket), each query probes only its nearest cluster(s).  Cuts the
  candidate set by the cluster fan-out instead of scanning everything.

Embeddings are cast float→double *before* any arithmetic so results are
reproducible across engines (float32 accumulation is not).

Cosine scores use ``try_divide``: a zero-norm vector (failed/padded
embedding rows are routine at corpus scale) scores NULL instead of
aborting the job — Spark 4's ANSI-default ``/`` throws DIVIDE_BY_ZERO,
and DuckDB's ``/`` yields NULL on zero, so the oracle agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec) -> F.Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(vec) -> F.Column:
    return F.sqrt(dot(vec, vec))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = as_double(F.col(vec_col))
    return df.withColumn("__vec", v).withColumn("__norm", l2_norm(F.col("__vec")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbours per query vector.

    Queries are broadcast (small side); the corpus streams through one
    projection — no shuffle until the per-query top-k window, which
    shuffles only (n_queries × corpus) scored rows.  Ranking uses the
    rounded score with the id as tie-break so results are deterministic.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "__vec", "__norm"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.try_divide(
                    dot(F.col("__vec"), F.col("__qvec")),
                    F.col("__norm") * F.col("__qnorm"),
                ),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    k: int = 3,
    n_probe: int = 1,
) -> DataFrame:
    """IVF-bucketed ANN: centroids from an existing coarse partition
    (``cluster_col``), queries probe their ``n_probe`` nearest
    centroids (IVF's standard recall knob — probe cost grows linearly,
    recall monotonically).

    Scale shape: centroid table is tiny (n_clusters rows → broadcast);
    the candidate join is an equi-join on the cluster id, so the probe
    cost is ``n_probe`` cluster occupancies, not |corpus|.  Recall <
    1.0 by design — the brute-force path is the correctness baseline.

    Measured recall floor (tests/test_ann_recall.py): >= 0.9 recall@3
    on clustered data (queries whose true neighbours share their
    cluster, the workload IVF is built for) at n_probe=1; on
    structureless uniform-random vectors (the gate table — nearest
    neighbours are near-orthogonal, so no partition correlates with
    them) recall reaches >= 0.3 by widening to n_probe=4 (0.45
    measured at sf0.001).
    """
    c = with_norm(corpus, vec_col)
    # centroids: positional mean via posexplode + re-collect (all JVM ops)
    dims = (
        c.select(cluster_col, F.posexplode("__vec").alias("i", "x"))
        .groupBy(cluster_col, "i")
        .agg(F.avg("x").alias("m"))
    )
    centroids = (
        dims.groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"))
        .select(
            F.col(cluster_col).alias("__cluster"),
            F.transform("im", lambda s: s.getField("m")).alias("__cvec"),
        )
        .withColumn("__cnorm", l2_norm(F.col("__cvec")))
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    # assign each query to its nearest centroid (broadcast nested loop over
    # n_clusters rows, then keep the argmax)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "__qvec",
        "__qnorm",
        "__cluster",
        (
            F.try_divide(
                dot(F.col("__qvec"), F.col("__cvec")),
                F.col("__qnorm") * F.col("__cnorm"),
            )
        ).alias("__csim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__csim").desc(), F.col("__cluster").asc()
    )
    assigned = qc.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= max(1, n_probe)
    ).select("query_id", "__qvec", "__qnorm", "__cluster")
    # probe only the assigned cluster
    cand = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cluster_col).alias("__cluster"),
        "__vec",
        "__norm",
    )
    scored = (
        cand.join(assigned, "__cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.try_divide(
                    dot(F.col("__vec"), F.col("__qvec")),
                    F.col("__norm") * F.col("__qnorm"),
                ),
                6,
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN — the bucketed scale path WITH an exact
# cross-engine oracle (unlike IVF, whose centroid assignment is
# engine-float-order dependent).
# ---------------------------------------------------------------------------


def hyperplane_signs(
    dim: int, n_planes: int = 8, seed: int = 0
) -> list[list[int]]:
    """Deterministic ±1 hyperplane components: sign(j, i) follows the
    parity of the first hex digit of md5("j:i") (seed 0; other seeds
    prefix the key, giving an independent plane family for recall
    OR-ing).  Both the Spark plan and the SQL oracle embed the SAME
    literals, so the bucketing is reproducible everywhere (and across
    runs — no RNG state)."""
    import hashlib

    def key(j: int, i: int) -> str:
        return f"{j}:{i}" if seed == 0 else f"{seed}:{j}:{i}"

    return [
        [
            1
            if int(hashlib.md5(key(j, i).encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def hyperplane_signature(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    quant: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """SimHash-style bucket signature for vectors: bit j = (v·h_j >= 0).

    The vector is quantized to integers (round(x·quant)) BEFORE the dot
    product so the sign is computed in exact integer arithmetic —
    float summation order differs between engines (and between Spark
    partitions), and a near-zero dot must not flip a bucket bit.
    One narrow projection, no shuffle, no UDF.
    """
    q = F.transform(
        as_double(F.col(vec_col)), lambda x: F.round(x * quant).cast("long")
    )
    planes = hyperplane_signs(dim, n_planes, seed)
    out = df.withColumn("__q", q)
    bits = []
    for signs in planes:
        lit_signs = F.array(*[F.lit(s).cast("long") for s in signs])
        d = F.aggregate(
            F.zip_with(F.col("__q"), lit_signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return out.withColumn("bucket", F.concat(*bits)).drop("__q")


def _hamming_ball(bucket_col: str, n_planes: int, radius: int) -> F.Column:
    """Array of every bit-string within Hamming distance <= radius of
    ``bucket_col`` (the query signature).  The subsets of flip positions
    are enumerated driver-side (sum of C(n_planes, r) for r <= radius —
    37 strings at 8 planes / radius 2) and compiled into pure string
    expressions; each corpus row lives in exactly ONE bucket, so the
    probed buckets are distinct and no candidate pair duplicates."""
    from itertools import combinations

    def flipped(positions: tuple[int, ...]) -> F.Column:
        chars = []
        for i in range(n_planes):
            ch = F.substring(F.col(bucket_col), i + 1, 1)
            if i in positions:
                ch = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
            chars.append(ch)
        return F.concat(*chars)

    variants = [F.col(bucket_col)]
    for r in range(1, radius + 1):
        variants.extend(flipped(pos) for pos in combinations(range(n_planes), r))
    return F.array(*variants)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 3,
    hamming_radius: int = 0,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's full hyperplane
    signature; exact cosine re-ranks within the bucket.

    ``hamming_radius`` is the multi-probe recall knob: radius r probes
    every bucket within Hamming distance r of the query's signature
    (r=1 → n_planes+1 buckets per query — the QUERY side fans out,
    never the corpus, so the probe stays O(buckets-probed × occupancy)).

    Scale shape: the signature is a narrow map over the corpus; the
    candidate join is an equi-join on the bucket string (2^n_planes
    buckets → tune n_planes to the corpus size), so probe cost is the
    bucket occupancy, not |corpus|.  Recall < 1.0 by design.

    Measured recall floor (tests/test_ann_recall.py): on clustered
    data, >= 0.8 recall@3 at radius 0 (a cluster ON a hyperplane
    boundary splits buckets — the inherent LSH miss) and >= 0.9 at
    radius 1 (1.0 measured); on structureless uniform-random vectors
    (the gate table — near-orthogonal neighbours flip each bit with
    p≈0.5) recall reaches >= 0.25 at 8 planes / radius 2 (0.42
    measured at sf0.001).
    """
    c = hyperplane_signature(
        with_norm(corpus, vec_col), id_col, "__vec", dim, n_planes
    ).select(
        F.col(id_col).alias("neighbor_id"), "bucket", "__vec", "__norm"
    )
    q = hyperplane_signature(
        with_norm(queries, vec_col), id_col, "__vec", dim, n_planes
    ).select(
        F.col(id_col).alias("query_id"),
        "bucket",
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    if hamming_radius > 0:
        q = q.withColumn(
            "bucket", F.explode(_hamming_ball("bucket", n_planes, hamming_radius))
        )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.try_divide(
                    dot(F.col("__vec"), F.col("__qvec")),
                    F.col("__norm") * F.col("__qnorm"),
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def semantic_dedup_keepers(
    vectors: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """SemDeDup-style keep-list: drop every vector that has a near-dup
    pair with a SMALLER id, keep the rest — the greedy min-id removal
    step applied to an embedding near-dup pair list (``pairs`` =
    ``(id_a, id_b)`` with ``id_a < id_b``, from the threshold join over
    LSH/IVF candidates; the exact all-pairs frame works too at test
    scale).

    Greedy-by-id is the standard deterministic tie-break for semantic
    dedup (cluster-internal order is otherwise arbitrary); unlike
    connected-components clustering it never chains A-B-C into one
    family through a below-threshold A-C edge, which for SEMANTIC
    similarity is the wanted behavior (chains drift in meaning).  Shape:
    one distinct on the pair list + a left-anti equi-join — no new
    shuffle over the vector payloads beyond the id key.
    """
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(dropped, id_col, "left_anti")


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.4,
    plane_seeds: tuple[int, ...] = (0,),
) -> DataFrame:
    """Embedding near-dup pairs through hyperplane-LSH buckets — the
    100 TB path that replaces the exact all-pairs threshold join:
    vectors only compare within their integer-exact signature bucket
    (equi-join on the bucket key), then exact cosine thresholds the
    candidates.

    Recall contract: under one plane family a pair is found iff its two
    vectors agree on all ``n_planes`` sign bits; for cosine similarity
    s the per-plane agreement probability is 1 - arccos(s)/π, so
    high-similarity pairs (the ones dedup cares about) survive with
    probability p = (1 - arccos(s)/π)^n_planes — e.g. ~0.85 at s=0.998
    with 8 planes (measured 0.78 on the planted-cluster test).  OR-ing
    r independent plane families (``plane_seeds``) lifts that to
    1-(1-p)^r — two seeds clear 0.9 on the same test (floor pinned in
    tests/test_ann_recall.py) — at r× the bucket-join cost, each join
    still bucket-bounded.  Every shuffle is on a bucket key; a hot
    bucket is AQE skew-split like any hot LSH band.
    """
    if not plane_seeds:
        raise ValueError("plane_seeds must not be empty")
    # one corpus scan total: the (vec, norm) projection is checkpointed
    # because every seed's self-join references it from BOTH aliases —
    # without pinning, 2×len(plane_seeds) full scans re-cast and
    # re-norm the corpus (the incremental_lsh_candidates "read twice →
    # pin" convention)
    v = (
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("__vec"))
        .withColumn("__norm", l2_norm(F.col("__vec")))
        .localCheckpoint()
    )
    cos = F.try_divide(
        dot(F.col("__ea"), F.col("__eb")), F.col("__na") * F.col("__nb")
    )
    out = None
    for seed in plane_seeds:
        s = hyperplane_signature(v, id_col, "__vec", dim, n_planes, seed=seed)
        a = s.select(
            F.col(id_col).alias("id_a"),
            F.col("__vec").alias("__ea"),
            F.col("__norm").alias("__na"),
            "bucket",
        )
        b = s.select(
            F.col(id_col).alias("id_b"),
            F.col("__vec").alias("__eb"),
            F.col("__norm").alias("__nb"),
            "bucket",
        )
        pairs = (
            a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("__raw", cos)
            .filter(F.col("__raw") > threshold)
            .select("id_a", "id_b", F.round(F.col("__raw"), 6).alias("cosine"))
        )
        out = pairs if out is None else out.unionByName(pairs)
    # a pair found under several plane families carries the same exact
    # cosine — dedup on the pair key alone
    return out if len(plane_seeds) == 1 else out.dropDuplicates(["id_a", "id_b"])


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    bits: int = 8,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-vector symmetric integer quantization — the storage tier for
    vectors at corpus scale: float32 embeddings ship as int8 + one
    float scale (4x smaller, and int dot products SIMD well), with
    exactness bounded per vector instead of assumed.

    scale = max|x| / (2^(bits-1) - 1); q_i = round(x_i / scale) (a
    zero vector quantizes to zeros via the NULL-safe divide).  Output:
    (id, scale, q, rel_err) where rel_err = ||x - scale*q|| / ||x|| —
    the reconstruction bound callers threshold before switching the ANN
    tier to quantized dot products.  All expressions are per-element
    array folds (deterministic order — no partition-dependent float
    summation), so the whole operator is hash-oracle-able.
    """
    qmax = 2 ** (bits - 1) - 1
    e = as_double(F.col(vec_col))
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(float(qmax))
    # ``keep`` passes extra columns through the projection (r14): the
    # codebook-training path needs (id, cluster_label, q) and a
    # post-hoc join back to the source would be a corpus-sized
    # shuffle for a column the scan already had in hand
    out = df.select(
        F.col(id_col), *[F.col(c) for c in keep],
        e.alias("__e"), scale.alias("scale"),
    )
    q = F.transform(
        F.col("__e"),
        lambda x: F.coalesce(
            F.round(F.try_divide(x, F.col("scale"))).cast("int"), F.lit(0)
        ),
    )
    out = out.withColumn("q", q)
    # Residual in UNITS OF SCALE: r_i = x_i/scale - q_i, then scaled
    # back — NOT x_i - q_i*scale.  The multiply-subtract form is an FMA
    # candidate, and whether codegen fuses it depends on which sibling
    # columns share subexpressions in the surrounding projection
    # (observed: adding `q` to the select shifted rel_err by ~1e-8 and
    # flipped a 6-dp rounding).  A division cannot fuse, so this form
    # is bit-stable across plan shapes AND matches the SQL oracle
    # op-for-op.
    resid = F.zip_with(
        F.col("__e"),
        F.col("q"),
        lambda x, qx: F.coalesce(F.try_divide(x, F.col("scale")), F.lit(0.0))
        - qx.cast("double"),
    )
    rel_err = F.try_divide(
        F.col("scale")
        * F.sqrt(
            F.aggregate(
                F.zip_with(resid, resid, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        l2_norm(F.col("__e")),
    )
    return out.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.round(F.col("scale"), 9).alias("scale"),
        "q",
        F.round(rel_err, 6).alias("rel_err"),
    )


def int_dot(a, b) -> F.Column:
    """Exact integer dot product (long accumulation — order-free)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bits: int = 8,
) -> DataFrame:
    """Top-k cosine over the int8 storage tier: because symmetric
    quantization scales every component by one per-vector factor, the
    factor CANCELS in cosine — score = intdot(qa, qb) /
    sqrt(intdot(qa,qa) * intdot(qb,qb)) — so the whole ranking runs on
    exact integer dot products (SIMD-friendly, 4x less memory traffic)
    with one float division at the end.  No float accumulation
    anywhere: the score is bit-reproducible on any engine, which is why
    the query carries a full hash oracle (unlike IVF).

    Quality bound: quantization perturbs each cosine by O(rel_err) of
    the operands (see ``quantize_embeddings``); recall@k vs the exact
    ``cosine_topk`` is pinned in tests/test_quantization.py.
    """
    cq = quantize_embeddings(corpus, id_col, vec_col, bits).select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("__cq")
    )
    qq = quantize_embeddings(queries, id_col, vec_col, bits).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("__qq")
    )
    num = int_dot(F.col("__cq"), F.col("__qq")).cast("double")
    den = F.sqrt(
        (
            int_dot(F.col("__cq"), F.col("__cq"))
            * int_dot(F.col("__qq"), F.col("__qq"))
        ).cast("double")
    )
    scored = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.try_divide(num, den), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_int_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    k: int = 3,
    n_probe: int = 1,
    bits: int = 8,
) -> DataFrame:
    """IVF ANN with INTEGER centroids — the deterministic twin of
    ``ivf_topk``: every accumulation that touches more than one row
    happens in integer space (per-dimension SUMS of int8 codes), which
    is order-independent, so unlike the float-mean variant the whole
    query is bit-reproducible and carries a full hash oracle.

    The probe target is the per-cluster sum of quantized codes.  Each
    vector's symmetric scale normalizes it to max|x| = 2^(bits-1)-1, so
    the code sum approximates the cluster's DIRECTION mean up to
    per-vector magnitude — an approximation of an approximation, which
    is fine: IVF's cluster assignment only has to pick good probe
    buckets (recall floors pinned in tests/test_ann_recall.py), it
    never scores final candidates.  Final candidate ranking is the
    exact integer-dot cosine of ``quantized_cosine_topk``.

    Integer ranges at 100 TB: codes <= 127, so a 64-dim centroid sum
    stays exact in int64 up to ~7e16 member vectors per cluster, and
    every dot fits a double's 2^53 integer window until cluster
    membership passes ~1e9 — validate lgk/bits before that, don't
    discover it in production.
    """
    cq = quantize_embeddings(corpus, id_col, vec_col, bits).join(
        corpus.select(id_col, cluster_col), id_col
    )
    # per-cluster integer centroid: posexplode -> integer sums -> re-collect
    cent = (
        cq.select(cluster_col, F.posexplode("q").alias("i", "x"))
        .groupBy(cluster_col, "i")
        .agg(F.sum("x").alias("s"))
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("im"))
        .select(
            F.col(cluster_col).alias("__cluster"),
            F.transform("im", lambda t: t.getField("s")).alias("__cvec"),
        )
    )
    qq = quantize_embeddings(queries, id_col, vec_col, bits).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("__qq")
    )
    # probe scores: exact integer dots -> one float division (bit-stable)
    pnum = int_dot(F.col("__cvec"), F.col("__qq")).cast("double")
    pden = F.sqrt(
        (
            int_dot(F.col("__cvec"), F.col("__cvec"))
            * int_dot(F.col("__qq"), F.col("__qq"))
        ).cast("double")
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.try_divide(pnum, pden).desc(), F.col("__cluster").asc()
    )
    probes = (
        qq.crossJoin(F.broadcast(cent))
        .withColumn("__prk", F.row_number().over(pw))
        .filter(F.col("__prk") <= n_probe)
        .select("query_id", "__qq", "__cluster")
    )
    # candidates: equi-join on the probed cluster — n_probe occupancies
    cand = probes.join(
        cq.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("q").alias("__cq"),
            F.col(cluster_col).alias("__cluster"),
        ),
        "__cluster",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    num = int_dot(F.col("__cq"), F.col("__qq")).cast("double")
    den = F.sqrt(
        (
            int_dot(F.col("__cq"), F.col("__cq"))
            * int_dot(F.col("__qq"), F.col("__qq"))
        ).cast("double")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(F.try_divide(num, den), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
