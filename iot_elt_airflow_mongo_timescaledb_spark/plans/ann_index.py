"""Maintained IVF index in the warehouse (VERDICT r9 task 5).

``operators.similarity.ivf_topk``/``ivf_int_topk`` recompute centroids
from the corpus on EVERY call — at 100 TB that is a full corpus pass
per query batch.  This module stores the index as two warehouse tables
and maintains it batch-incrementally from the same change-feed pattern
the sketch rollups use, so query cost is probe-bounded and maintenance
cost is batch-bounded:

- ``<name>__centroids``   — ``__cluster``, ``__cvec`` (per-dimension
  INTEGER sums of int8 codes over the training members — the
  order-free probe target of ``ivf_int_topk``).  FROZEN between
  explicit ``retrain`` calls: incremental syncs assign against a
  stable codebook (FAISS's IVF contract — adds never move centroids).
- ``<name>__assignments`` — ``vec_id``, ``q`` (int8 codes),
  ``__cluster`` (nearest centroid at sync time).  Append-only;
  exactly-once via the manifest formats' idempotent-writer watermarks
  (``write_streaming_batch``), with the source table's manifest
  version as the batch id (the rollup family's design).

Everything is INTEGER-deterministic (the ``ivf_int_topk`` math): int8
quantization is per-vector, centroid sums and candidate dots are exact
integer folds, the single probe division is bit-stable — so
index-served results are reproducible and DuckDB-oracle-able, unlike a
float-mean IVF.

Scale shape: ``topk`` touches the centroid table (broadcast,
n_clusters rows) plus ``n_probe`` cluster occupancies via an equi-join
on ``__cluster`` — never the corpus.  ``sync`` touches the batch plus
the broadcast centroids.  ``retrain`` is the one O(indexed-corpus)
verb, and it is explicit (one Lloyd step over the STORED codes — no
re-read of the source embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import int_dot, quantize_embeddings


class IncrementalANNSync:
    """Warehouse-maintained ANN index with incremental membership.

    Lifecycle: ``train`` (build the codebook + index the training
    corpus) -> ``sync``/``sync_from_changes`` per batch cadence ->
    ``topk`` at query time (``topk_realtime`` unions an unindexed
    tail) -> periodic explicit ``retrain``.
    """

    _APP_ID = "ann_index"

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        name: str,
        table_format=None,
        bits: int = 8,
    ):
        from .materialize import Warehouse

        self.spark = spark
        self.wh = Warehouse(spark, warehouse_root, table_format=table_format)
        self.name = name
        self.centroids_table = f"{name}__centroids"
        self.assign_table = f"{name}__assignments"
        self.bits = bits

    # -- build ------------------------------------------------------------

    def train(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        cluster_col: str = "label",
    ) -> int:
        """Build the codebook: integer centroid sums per ``cluster_col``
        bucket of the TRAINING corpus (any deterministic coarse
        partition — a label, an LSH sign bucket), then index the
        training vectors by NEAREST centroid (the same rule every
        later sync applies, so train-time and sync-time members are
        indistinguishable).  Returns the number of centroids."""
        cq = quantize_embeddings(corpus, id_col, vec_col, self.bits).join(
            corpus.select(id_col, cluster_col), id_col
        )
        cent = (
            cq.select(cluster_col, F.posexplode("q").alias("i", "x"))
            .groupBy(cluster_col, "i")
            .agg(F.sum("x").alias("s"))
            .groupBy(cluster_col)
            .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("im"))
            .select(
                F.col(cluster_col).cast("string").alias("__cluster"),
                F.transform("im", lambda t: t.getField("s")).alias("__cvec"),
            )
        )
        import contextlib

        tx = getattr(self.wh.fmt, "transaction", None)
        with tx() if tx is not None else contextlib.nullcontext():
            # one flip commits codebook + memberships together on the
            # catalog format — no reader sees one without the other
            self.wh.fmt.replace_atomic(self.centroids_table, cent, ())
            codes = cq.select(F.col(id_col).alias("vec_id"), "q")
            assigned = self._assign(codes)
            self.wh.fmt.replace_atomic(self.assign_table, assigned, ())
        return self.wh.read(self.centroids_table).count()

    def _centroids(self) -> DataFrame:
        return self.wh.read(self.centroids_table)

    def _assign(self, codes: DataFrame) -> DataFrame:
        """Nearest stored centroid per code vector — broadcast over the
        (tiny) centroid table, exact integer dots, ONE bit-stable
        float division, deterministic ties (cluster asc)."""
        cent = F.broadcast(self._centroids())
        num = int_dot(F.col("__cvec"), F.col("q")).cast("double")
        den = F.sqrt(
            (
                int_dot(F.col("__cvec"), F.col("__cvec"))
                * int_dot(F.col("q"), F.col("q"))
            ).cast("double")
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.try_divide(num, den).desc(), F.col("__cluster").asc()
        )
        return (
            codes.crossJoin(cent)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("vec_id", "q", "__cluster")
        )

    # -- maintain ----------------------------------------------------------

    def sync(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        app_id: str | None = None,
    ) -> bool:
        """Index one batch of NEW vectors: quantize, assign to the
        frozen codebook, append — cost bounded by the batch, never the
        index.  With ``batch_id`` on a manifest-format warehouse the
        append rides the idempotent-writer watermark
        (``write_streaming_batch``) — a replayed batch no-ops
        (returns False).  On formats without txn watermarks the append
        is at-least-once; deduplicate upstream.  ``app_id`` separates
        independent id streams (the change-feed cursor vs a Structured
        Streaming micro-batch counter must never share a watermark)."""
        codes = quantize_embeddings(batch, id_col, vec_col, self.bits).select(
            F.col(id_col).alias("vec_id"), "q"
        )
        assigned = self._assign(codes)
        wsb = getattr(self.wh.fmt, "write_streaming_batch", None)
        if batch_id is not None and wsb is not None:
            committed = wsb(
                self.assign_table, assigned, int(batch_id),
                app_id=app_id or self._APP_ID,
            )
        else:
            self.wh.fmt.write(self.assign_table, assigned, "append")
            committed = True
        # one immutable dir lands per synced batch: the threshold
        # compaction keeps the index's read amplification flat over
        # unbounded cadences, like every other append stream
        maybe_compact = getattr(self.wh.fmt, "maybe_compact", None)
        if committed and maybe_compact is not None:
            maybe_compact(self.assign_table)
        return committed

    def _applied_batch_id(self, app_id: str | None = None):
        man = getattr(self.wh.fmt, "_manifest", None)
        if man is None or not self.wh.exists(self.assign_table):
            return None
        m = man(self.assign_table)
        return ((m or {}).get("txn") or {}).get(app_id or self._APP_ID)

    def sync_from_changes(
        self,
        fmt,
        source_table: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> bool:
        """Maintain the index FROM a commit-log table's append feed —
        the source's manifest version is the batch id, committed
        inside the same CAS as the appended assignments, so a crashed
        and retried sync re-reads the identical delta and no-ops
        (exactly-once, no side cursor — the rollup family's design).
        A feed refusal (history rewritten) propagates loudly: an
        append-only index cannot absorb deletes — retrain instead."""
        m = fmt._manifest(source_table)
        if m is None:
            raise FileNotFoundError(
                f"no committed manifest for table {source_table}"
            )
        cur = int(m["version"])
        applied = self._applied_batch_id()
        if applied is not None and cur == int(applied):
            return False
        if applied is None:
            # bootstrap from the SNAPSHOT at the captured version, not
            # the head: fmt.read is lazy and would resolve whatever is
            # latest when the assignment write executes — a concurrent
            # append landing in that window would be indexed now AND
            # re-delivered by the next incremental sync (duplicates)
            delta = fmt.read_version(source_table, cur)
        else:
            delta = fmt.read_changes(source_table, int(applied), cur)
        return self.sync(delta, batch_id=cur, id_col=id_col, vec_col=vec_col)

    def retrain(self) -> int:
        """One Lloyd step over the STORED codes — the explicit
        periodic verb: new centroid sums from the CURRENT assignments
        (members that drifted toward another centroid re-center it),
        then every vector re-assigns to its new nearest.  Both tables
        rewrite atomically; O(indexed corpus), by design — run it on
        the maintenance cadence, not the sync cadence.  Returns the
        number of centroids (empty clusters dissolve).

        The sync cursors SURVIVE the retrain crash-safely: the whole
        watermark map rides INSIDE the assignments replace commit
        (``replace_atomic(txn=...)``) — a separate restore commit
        would leave a window where a crash (or a concurrent sync
        trigger) sees a cursor-less table and re-indexes the whole
        source (duplicate neighbors at every rank).  On a catalog
        format both rewrites flip in ONE transaction, so a reader can
        never see the new codebook with the old memberships."""
        import contextlib

        man = getattr(self.wh.fmt, "_manifest", None)
        txn_before = (
            dict((man(self.assign_table) or {}).get("txn") or {})
            if man is not None
            else {}
        )
        a = self.wh.read(self.assign_table)
        cent = (
            a.select("__cluster", F.posexplode("q").alias("i", "x"))
            .groupBy("__cluster", "i")
            .agg(F.sum("x").alias("s"))
            .groupBy("__cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("im"))
            .select(
                "__cluster",
                F.transform("im", lambda t: t.getField("s")).alias("__cvec"),
            )
        )
        tx = getattr(self.wh.fmt, "transaction", None)
        with tx() if tx is not None else contextlib.nullcontext():
            self.wh.fmt.replace_atomic(self.centroids_table, cent, ())
            reassigned = self._assign(a.select("vec_id", "q"))
            self.wh.fmt.replace_atomic(
                self.assign_table, reassigned, (), txn=txn_before or None
            )
        return self.wh.read(self.centroids_table).count()

    # -- serve ---------------------------------------------------------------

    @staticmethod
    def _int_cosine(a, b):
        """The module's ONE scoring expression (exact integer dots, a
        single bit-stable float division, round 6) — the contract with
        the DuckDB oracle and with index==recompute equivalence; every
        serving path must use it so a precision change can never split
        the tiers."""
        num = int_dot(a, b).cast("double")
        den = F.sqrt((int_dot(a, a) * int_dot(b, b)).cast("double"))
        return F.round(F.try_divide(num, den), 6)

    @staticmethod
    def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        return scored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= k
        )

    def _score_candidates(self, probes: DataFrame, cand: DataFrame) -> DataFrame:
        return (
            probes.join(cand, "__cluster")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                self._int_cosine(F.col("__cq"), F.col("__qq")).alias("score"),
            )
        )

    def topk(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 3,
        n_probe: int = 1,
    ) -> DataFrame:
        """Index-served top-k: queries probe their ``n_probe`` nearest
        stored centroids (broadcast — n_clusters rows), candidates
        come from the assignments equi-join on ``__cluster`` —
        ``n_probe`` cluster occupancies, never the corpus.  Scoring is
        the exact integer-dot cosine of ``ivf_int_topk``, so
        index-served == recompute-served on the same membership
        (pinned in tests/test_ann_index.py)."""
        probes, qq = self._probe(queries, id_col, vec_col, n_probe)
        cand = self.wh.read(self.assign_table).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("__cq"),
            "__cluster",
        )
        scored = self._score_candidates(probes.join(qq, "query_id"), cand)
        return self._rank_topk(scored, k)

    def _probe(self, queries, id_col, vec_col, n_probe):
        qq = quantize_embeddings(queries, id_col, vec_col, self.bits).select(
            F.col(id_col).alias("query_id"), F.col("q").alias("__qq")
        )
        cent = F.broadcast(self._centroids())
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
            qq.crossJoin(cent)
            .withColumn("__prk", F.row_number().over(pw))
            .filter(F.col("__prk") <= max(1, n_probe))
            .select("query_id", "__cluster")
        )
        return probes, qq

    def topk_realtime(
        self,
        queries: DataFrame,
        tail: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 3,
        n_probe: int = 1,
    ) -> DataFrame:
        """Index-served candidates UNIONED with a brute-force pass over
        an unindexed TAIL (vectors landed since the last sync — the
        ``read_realtime`` pattern): tail cost is |queries| x |tail|,
        bounded by the sync cadence, and the final window dedups, so
        a vector present in both tiers scores once."""
        probes, qq = self._probe(queries, id_col, vec_col, n_probe)
        cand = self.wh.read(self.assign_table).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("__cq"),
            "__cluster",
        )
        indexed = self._score_candidates(probes.join(qq, "query_id"), cand)
        tq = quantize_embeddings(tail, id_col, vec_col, self.bits).select(
            F.col(id_col).alias("neighbor_id"), F.col("q").alias("__cq")
        )
        fresh = (
            qq.crossJoin(F.broadcast(tq))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                self._int_cosine(F.col("__cq"), F.col("__qq")).alias("score"),
            )
        )
        # a tail vector may ALSO be indexed already (sync raced the
        # caller's tail cut) — keep one score per (query, neighbor)
        allc = indexed.unionByName(fresh).groupBy(
            "query_id", "neighbor_id"
        ).agg(F.max("score").alias("score"))
        return self._rank_topk(allc, k)

    def topk_auto(
        self,
        queries: DataFrame,
        fmt,
        source_table: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 3,
        n_probe: int = 1,
    ) -> DataFrame:
        """``topk_realtime`` with the tail DERIVED: everything the
        source table committed since the last sync (its change feed
        between the recorded cursor and the head) scores brute-force
        alongside the index — the ANN twin of the rollups'
        ``read_realtime_auto``: results are always current, index lag
        costs |queries| x |unsynced tail|, and no caller bookkeeping.
        Requires at least one prior ``sync_from_changes`` against the
        same source (the cursor anchors the tail)."""
        applied = self._applied_batch_id()
        if applied is None:
            raise ValueError(
                f"topk_auto: index {self.name} has no sync cursor for "
                f"{source_table} — run sync_from_changes first (the "
                "cursor anchors the realtime tail)"
            )
        m = fmt._manifest(source_table)
        cur = int(m["version"]) if m else int(applied)
        if cur == int(applied):
            return self.topk(queries, id_col, vec_col, k, n_probe)
        tail = fmt.read_changes(source_table, int(applied), cur)
        return self.topk_realtime(
            queries, tail, id_col, vec_col, k, n_probe
        )

    def recompute_topk(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 3,
        n_probe: int = 1,
    ) -> DataFrame:
        """The NON-incremental evaluation against the same frozen
        codebook: assign the WHOLE given corpus to nearest stored
        centroids in one pass (ignoring stored assignments), then
        serve.  The equivalence target for the incremental path —
        ``topk()`` over a synced index must equal this exactly on the
        same corpus (the maintained-index correctness pin)."""
        codes = quantize_embeddings(corpus, id_col, vec_col, self.bits).select(
            F.col(id_col).alias("vec_id"), "q"
        )
        assigned = self._assign(codes)
        probes, qq = self._probe(queries, id_col, vec_col, n_probe)
        cand = assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("__cq"),
            "__cluster",
        )
        scored = self._score_candidates(probes.join(qq, "query_id"), cand)
        return self._rank_topk(scored, k)
