"""Training-batch assembly operators: sequence packing + dataset mixing.

Pretraining pipelines end by (a) packing variable-length documents into
fixed-token-budget training sequences and (b) sampling sources/languages
at target mixing rates.  Both are expressed as pure DataFrame ops with
exact SQL oracles:

- packing is a windowed cumulative sum SHARDED by a hash bucket — a
  single global ORDER BY would funnel 100 TB through one task, so each
  shard packs independently (deterministic: shard and order are both
  content-derived), which is exactly how distributed packing runs in
  production (per-worker bins, no cross-worker coordination);
- sampling is a deterministic hash-mod Bernoulli per row — reproducible
  across engines and runs, no RNG state, joins/filters push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 512,
    n_shards: int | None = None,
) -> DataFrame:
    """Assign each document to a (shard, bin) training-sequence slot.

    bin = floor((running token total before this doc) / budget) within
    the shard, docs ordered by id — contiguous-fill packing (a doc may
    straddle a budget boundary; exact greedy packing is inherently
    sequential and buys <2% fill at training scale).  One shuffle on the
    shard key; windows run per-shard, never globally.

    ``n_shards`` defaults to 4× the cluster's ``defaultParallelism`` so
    the per-shard window tasks saturate every core with headroom for
    stragglers — a fixed default (the old 64) would cap a 1000-executor
    job at 64 window tasks.  Pass it explicitly when the shard layout
    must be reproducible across cluster sizes (the gated oracle query
    pins 64): shard assignment is content-derived, so the SAME value
    yields the SAME packing anywhere.
    """
    if n_shards is None:
        n_shards = 4 * df.sparkSession.sparkContext.defaultParallelism
    # 8 hex chars = 32 hash bits: a 16-bit prefix would cap usable
    # shards at 65536 (silently empty shards past it — defeating the
    # parallelism-derived default on big clusters) and visibly skew
    # modulo buckets; 32 bits keeps bias under n_shards/2^32
    shard = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10) \
        .cast("long") % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), F.col(token_col).alias("n_tokens"))
        .withColumn("shard", shard)
        .withColumn(
            "bin_idx",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
            ).cast("long"),
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    md5(id) mod 100 < its stratum's percentage.

    The mixing knob of a pretraining corpus (e.g. en 80%, code 100%,
    other 10%) as a narrow filter — reproducible (content-derived, no
    seed), and the SAME rows are kept on any engine and any cluster
    size.  Rates are integer percentages so the oracle needs no float
    comparison.
    """
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10) \
        .cast("long") % 100
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.withColumn("__bucket", bucket).filter(F.col("__bucket") < rate).drop(
        "__bucket"
    )


def token_budget_cut(
    df: DataFrame,
    id_col: str,
    token_col: str,
    score_col: str,
    budget: int,
    n_buckets: int = 1000,
) -> DataFrame:
    """Keep the best documents whose running token total fits ``budget``.

    Semantics (the SQL oracle): rank docs by ``(score DESC, id ASC)``,
    keep every doc whose cumulative token count — including itself — is
    ``<= budget``.  The standard "curate down to a target token budget"
    step after quality scoring.

    A literal window ``SUM() OVER (ORDER BY score DESC)`` funnels the
    whole corpus through ONE task (Spark plans an un-partitioned window
    as a single partition), so this computes the same answer in two
    scale-safe phases:

    1. histogram: hash-agg token sums per score bucket
       (``floor(score * n_buckets)``) — a ``n_buckets``-row aggregate;
       the driver scans it best-first to find the boundary bucket where
       the running total crosses the budget (bounded driver work, like
       the watermark cursor read — never data-sized);
    2. per-bucket windows: every kept bucket gets its internal
       ``(score DESC, id ASC)`` cumulative sum plus the bucket's prefix
       offset (a broadcast ``n_buckets``-row join) — partitions are
       score buckets, so no single task sees more than one bucket.

    Buckets above the boundary are kept whole, below dropped whole
    WITHOUT evaluating their windows; only the boundary bucket is
    budget-trimmed.  Output: ``(id, n_tokens, score, cum_tokens)`` for
    kept docs — bit-identical to the single-window oracle because
    bucket order refines score order and the within-bucket tiebreak is
    the same ``(score DESC, id ASC)``.

    Scale contract: the histogram split assumes scores SPREAD across
    buckets (quality scores do — they mix several continuous ratios).
    A degenerate distribution (all docs sharing one score, or a score
    range ≪ 1/n_buckets) collapses everything into one bucket and its
    window into one task — the global-window trap re-entered through
    the data.  Callers cutting on a low-cardinality score should raise
    ``n_buckets`` toward the score cardinality or refine the score with
    a deterministic secondary component (e.g. a content-hash fraction)
    before cutting.
    """
    scored = (
        df.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("n_tokens"),
            F.col(score_col).alias("score"),
        )
        # CONTRACT: null-scored/null-length docs are unrankable and are
        # excluded from the cut (callers' SQL oracles must carry the
        # same explicit IS NOT NULL filter — plain SUM() OVER would
        # instead rank them last and keep them when everything fits)
        .filter(F.col("score").isNotNull() & F.col("n_tokens").isNotNull())
        .withColumn("__bucket", F.floor(F.col("score") * n_buckets).cast("long"))
        # the histogram collect and the returned plan both execute this
        # frame — materialize it once (the _kept_signature pattern)
        .localCheckpoint()
    )
    hist = (
        scored.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__bucket_tokens"))
        .collect()
    )
    running = 0
    offsets: list[tuple[int, int]] = []  # (bucket, tokens-before-bucket)
    boundary = None
    for row in sorted(hist, key=lambda r: -r["__bucket"]):
        offsets.append((row["__bucket"], running))
        running += row["__bucket_tokens"]
        if running > budget:
            boundary = row["__bucket"]
            break
    spark = df.sparkSession
    if not offsets:  # empty input: keep the output schema, zero rows
        return scored.select(
            id_col, "n_tokens", "score", F.col("n_tokens").alias("cum_tokens")
        ).limit(0)
    if boundary is None:  # everything fits
        boundary = offsets[-1][0]
    from ..session import local_rows

    # explicit schema: the column-name form ran an extra rdd sampling
    # job to infer the (known) int types (ADVICE r15 #3), and the DDL
    # form rides local_rows' all-JVM literal fast path
    off = F.broadcast(
        local_rows(
            spark,
            [(int(b), int(o)) for b, o in offsets],
            "__bucket long, __offset long",
        )
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.filter(F.col("__bucket") >= boundary)
        .join(off, "__bucket")
        .withColumn(
            "cum_tokens", (F.col("__offset") + F.sum("n_tokens").over(w)).cast("long")
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "n_tokens", "score", "cum_tokens")
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    keep_payload: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    writing: ``(id, shard, pos)`` where ``shard`` and the within-shard
    order are both content-derived (seeded md5), so the SAME layout
    comes out of any cluster size, any engine, and any re-run.

    Pretraining ingestion ends by shuffling the curated corpus and
    writing fixed-count shard files; a ``rand()``-based shuffle is
    irreproducible and a global ``ORDER BY hash`` funnels the corpus
    through one sort.  Here the hash IS the order: shard = hash mod
    n_shards (one shuffle on the shard key), position = per-shard
    ``row_number`` over (hash, id) — windows run per shard, never
    globally, and changing ``seed`` re-deals the whole corpus.

    ``keep_payload=True`` carries every input column through the same
    single shuffle (for writers that land the sharded rows directly);
    the default returns just the ``(id, shard, pos)`` assignment.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__h")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    base = (
        (df if keep_payload else df.select(F.col(id_col)))
        .withColumn("__h", h)
        .withColumn("shard", F.col("__h") % n_shards)
        .withColumn("pos", F.row_number().over(w))
    )
    if keep_payload:
        return base.drop("__h")
    return base.select(id_col, "shard", "pos")


def curriculum_shard(
    df: DataFrame,
    id_col: str,
    order_col: str,
    n_shards: int,
    ascending: bool = True,
) -> DataFrame:
    """Curriculum shard layout: a GLOBAL easy-to-hard ordering of the
    corpus without a global sort.  Shard k holds the k-th quantile
    bucket of ``order_col`` (approximate cuts from one
    ``percentile_approx`` pass — a bounded driver list, never a
    collect of data), and rows inside each shard are ordered by
    ``(order_col, id)`` with a per-shard window.  Trainers consuming
    shard 0, 1, ... in order therefore see difficulty monotonically
    non-decreasing ACROSS shards (threshold bucketing guarantees range
    contiguity regardless of cut accuracy — only shard SIZES are
    approximate) and exactly sorted WITHIN each shard.

    The anti-shape this avoids: ``ORDER BY score`` over the corpus is a
    single-ranged sort whose final pass funnels everything through few
    tasks; here the one shuffle is the bucketed repartition and every
    window is per-shard.  Rows with NULL ``order_col`` are rejected
    loudly — silently sorting them first would corrupt the curriculum.
    Duplicate quantile cuts (heavily-tied scores) collapse — shard
    count is an upper bound, empty shards possible, documented.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    qs = [i / n_shards for i in range(1, n_shards)]
    cuts_row = df.agg(
        F.percentile_approx(
            F.col(order_col), F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
        ).alias("c"),
        F.sum(F.col(order_col).isNull().cast("long")).alias("n_null"),
    ).first()
    if cuts_row["n_null"]:
        raise ValueError(
            f"curriculum_shard: {cuts_row['n_null']} rows have NULL "
            f"{order_col} — filter or impute upstream, a curriculum over "
            "NULLs is undefined"
        )
    cuts = sorted(set(cuts_row["c"] or []))
    o = F.col(order_col) if ascending else -F.col(order_col)
    if not ascending:
        cuts = sorted(-c for c in cuts)
    shard = F.lit(0)
    for c in cuts:
        shard = shard + (o > F.lit(c)).cast("int")
    w = Window.partitionBy("shard").orderBy(o.asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard.cast("long"))
        .withColumn("pos", F.row_number().over(w))
    )


def mix_weights(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source-mixing weights: per stratum (source,
    language, domain), its token share ``p`` and the sampling weight
    ``p^alpha / Σ p^alpha`` — the standard upsampling rule for
    low-resource sources (alpha < 1 flattens the distribution, alpha = 1
    keeps natural proportions).

    One map-side-combinable hash-agg over the corpus; everything after
    runs on the stratum-count-bounded aggregate (an unpartitioned window
    over tens of rows, the same bounded-cardinality exception as the
    budget histogram).  Ratios rounded to 6 dp.
    """
    agg = df.groupBy(stratum_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        F.count("*").alias("n_docs"),
    )
    w_all = Window.partitionBy()
    # try_divide: a zero-token corpus (or all-null strata) yields NULL
    # shares instead of an ANSI DIVIDE_BY_ZERO abort — DuckDB's `/`
    # NULLs on zero too, so the oracle agrees (same guard as
    # quality_scores)
    p = F.try_divide(F.col("n_tokens"), F.sum("n_tokens").over(w_all))
    scaled = F.pow(p, F.lit(alpha))
    return agg.select(
        F.col(stratum_col),
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("token_share"),
        F.round(F.try_divide(scaled, F.sum(scaled).over(w_all)), 6).alias(
            "mix_weight"
        ),
    )
