"""Physical-plan invariants — scale properties asserted as tests.

A query that silently loses filter pushdown, column pruning, or its
broadcast would still pass the value-parity gate at sf0.01 but fall over
at 100 TB; these tests pin the plan shape itself.
"""

from __future__ import annotations

from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import spark_queries
from tools.explain_audit import plan_facts

_Q = spark_queries()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    facts = plan_facts(_Q["pricing_summary"](spark, sf_dir), execute=True)
    # the shipdate filter must reach the parquet scan
    assert any("l_shipdate" in p for p in facts["pushed_filters"]), facts["pushed_filters"]
    # column pruning: the scan reads only the 7 referenced columns
    schema = facts["read_schemas"][0]
    assert "l_orderkey" not in schema and "l_partkey" not in schema, schema
    assert facts["n_codegen"] >= 1
    # exactly one shuffle: the partial/final group-by exchange
    assert facts["n_exchanges"] == 1, facts["plan"]


def test_daily_steps_filter_pushdown(spark, sf_dir):
    facts = plan_facts(_Q["daily_steps"](spark, sf_dir))
    assert any("event_type" in p for p in facts["pushed_filters"]), facts["pushed_filters"]


def test_semi_join_is_semi(spark, sf_dir):
    facts = plan_facts(_Q["semi_join_urgent"](spark, sf_dir))
    assert "LeftSemi" in facts["plan"]
    assert "CartesianProduct" not in facts["joins"]


def test_membership_join_broadcasts(spark, sf_dir):
    """J5 literal form: 5-row dim side must broadcast, never shuffle the
    fact side into a cartesian space."""
    facts = plan_facts(_Q["array_membership_region"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in facts["joins"] or "BroadcastHashJoin" in facts["joins"]
    assert "CartesianProduct" not in facts["joins"]


def test_equi_joins_never_cartesian(spark, sf_dir):
    for name in ("stage_users", "weekly_summary", "health_metrics_per_age_grp",
                 "range_join_ship_lag", "user_steps_last_month"):
        facts = plan_facts(_Q[name](spark, sf_dir))
        assert "CartesianProduct" not in facts["joins"], name


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    """The as-of composition must plan as window-over-union: zero join
    nodes, and only the partitionBy(user_id) shuffle pair from the two
    scans feeding the union."""
    facts = plan_facts(_Q["asof_last_view_before_purchase"](spark, sf_dir))
    assert not facts["joins"], facts["joins"]
    assert facts["n_exchanges"] == 1, facts["plan"]


def test_lsh_no_cartesian(spark, sf_dir):
    """Banded LSH self-join must hash-partition on (band, key) — a
    cartesian fallback here is the difference between hours and never."""
    facts = plan_facts(_Q["lsh_candidate_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in facts["joins"]
    assert any(j in facts["joins"] for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_ann_lsh_bucket_join_broadcasts_queries(spark, sf_dir):
    """Hyperplane-LSH ANN: the 5-query side must broadcast and the
    vec_id < 5 predicate must reach the parquet scan; the bucket match
    is an equi-join, never cartesian."""
    facts = plan_facts(_Q["ann_lsh_topk"](spark, sf_dir))
    assert "CartesianProduct" not in facts["joins"]
    assert "BroadcastHashJoin" in facts["joins"], facts["joins"]
    assert any("vec_id" in p and "LessThan" in p for p in facts["pushed_filters"]), (
        facts["pushed_filters"]
    )


def test_simhash_pairs_no_cartesian(spark, sf_dir):
    """Banded SimHash candidates join on (band, chunk) — equi only."""
    facts = plan_facts(spark_queries()["simhash_neardup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in facts["joins"]


def test_curation_funnel_no_cartesian(spark, sf_dir):
    facts = plan_facts(spark_queries()["curation_funnel"](spark, sf_dir))
    assert "CartesianProduct" not in facts["joins"]


def test_tfidf_single_scan(spark, sf_dir):
    """TF-IDF is ONE action over ONE corpus scan: N (the doc count) is a
    broadcast 1-row aggregate inside the lazy plan, and the tf exchange
    is shared by all three consumers (scores, doc-frequency, N) via AQE
    ReusedExchange — a second scan here would re-tokenize the corpus
    just to count documents."""
    import re

    facts = plan_facts(_Q["tfidf_top_terms"](spark, sf_dir), execute=True)
    tree = facts["plan"].split("== Initial Plan ==")[0]
    tree = re.split(r"\n\n\(\d+\) ", tree)[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree
    assert len(re.findall(r"ReusedExchange", tree)) >= 2, tree


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    """The benchmark shingle set is tiny vs any real corpus: the overlap
    join must be a broadcast probe — the corpus never shuffles on the
    n-gram key."""
    facts = plan_facts(_Q["contamination_check"](spark, sf_dir))
    assert "BroadcastHashJoin" in facts["joins"], facts["joins"]
    assert "CartesianProduct" not in facts["joins"]


def test_token_budget_cut_no_global_window(spark, sf_dir):
    """The budget cut must never plan a single-partition global window
    (Window with an empty partition spec serializes the corpus through
    one task); every window is partitioned by the score bucket."""
    df = _Q["token_budget_cut"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # partition columns precede the sort spec; a spec that starts
        # with the ORDER BY expression has no partitioning
        assert "__bucket" in spec, plan


def test_pii_redact_no_shuffle(spark, sf_dir):
    """Census + redaction is a narrow codegen map — zero exchanges."""
    facts = plan_facts(_Q["pii_redact"](spark, sf_dir))
    assert facts["n_exchanges"] == 0, facts["plan"]
    assert facts["n_codegen"] >= 1


def test_props_json_stats_single_exchange(spark, sf_dir):
    """JSON extraction stays in the scan-side map; the only shuffle is
    the per-type aggregate."""
    facts = plan_facts(_Q["props_json_stats"](spark, sf_dir))
    assert facts["n_exchanges"] == 1, facts["plan"]


def test_shuffle_shards_single_exchange_shard_window(spark, sf_dir):
    """The training-shard shuffle is exactly one exchange (on the shard
    key) and its window is partitioned — never a global row_number."""
    df = _Q["shuffle_shards"](spark, sf_dir)
    facts = plan_facts(df)
    assert facts["n_exchanges"] == 1, facts["plan"]
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "shard" in m.group(1), plan


def test_chunk_dedup_no_cartesian_bounded_exchanges(spark, sf_dir):
    """Chunk dedup joins back on the chunk key — equi-join only, and the
    shuffle count stays at the 3 the shape needs (min-parallelism
    repartition, chunk-df agg, doc agg reuses the repartition)."""
    facts = plan_facts(_Q["chunk_dedup_stats"](spark, sf_dir))
    assert "CartesianProduct" not in facts["joins"], facts["plan"]
    assert "BroadcastNestedLoopJoin" not in facts["joins"], facts["plan"]
    assert facts["n_exchanges"] <= 3, facts["plan"]


_NESTED_LOOP_OK = {
    # broadcast 1-row or tiny-side crossJoins, and the documented exact
    # all-pairs baselines — every other query must plan equi-joins only
    "ann_ivf_topk",        # broadcast centroid assignment
    "ann_ivf_int_topk",    # broadcast integer-centroid assignment
    "ann_maintained_topk",  # broadcast STORED-centroid probe (n_clusters rows)
    "ann_streaming_topk",   # same probe shape, streaming-maintained index
    "ann_cdf_upsert_topk",  # same probe shape, CDF-maintained index
    "ann_quantized_topk",  # broadcast query side
    "cosine_topk",         # broadcast query side (exact baseline)
    "rag_context_assembly",  # broadcast query side (cosine recall stage)
    "series_similarity_topk",  # broadcast probe-profile side
    "embedding_near_dup",  # documented exact all-pairs baseline
    "array_membership_region",  # 5-row dim broadcast (scale path = explode rewrite)
    "tfidf_top_terms",     # 1-row broadcast N
    "unigram_logprob_scores",  # 1-row broadcast corpus total
    "gapfill_locf",        # 1-row broadcast gapfill [lo, hi] range
    "gapfill_interpolate",  # 1-row broadcast gapfill [lo, hi] range
    "dsir_importance_weights",  # 1-row broadcast model totals
    "curriculum_shards",   # 1-row broadcast verdict crossJoin
}


def test_registry_sweep_no_unexpected_nested_loops(spark, sf_dir):
    """Every registered batch query plans equi-joins only, except the
    whitelisted broadcast-tiny/exact-baseline cases — a new query that
    accidentally cartesian-joins fails here, not in production."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import (
        spark_queries,
    )

    offenders = {}
    for name, fn in sorted(spark_queries().items()):
        if name.startswith("streaming"):
            continue
        facts = plan_facts(fn(spark, sf_dir))
        bad = [
            j
            for j in facts["joins"]
            if j in ("CartesianProduct", "BroadcastNestedLoopJoin")
        ]
        if bad and name not in _NESTED_LOOP_OK:
            offenders[name] = bad
    assert not offenders, offenders


def test_table_profile_single_scan(spark, sf_dir):
    """Every column's null/distinct/min/max metric rides ONE expand +
    hash-agg over ONE scan — per-column scans would multiply the
    100 TB read by the column count."""
    import re

    facts = plan_facts(_Q["table_profile"](spark, sf_dir), execute=True)
    tree = facts["plan"].split("== Initial Plan ==")[0]
    tree = re.split(r"\n\n\(\d+\) ", tree)[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree


def test_unigram_logprob_single_scan(spark, sf_dir):
    """The per-doc tf, the corpus frequency table, and the corpus total
    all hang off one tokenize exchange (AQE ReusedExchange) — the
    TF-IDF sharing shape."""
    import re

    facts = plan_facts(_Q["unigram_logprob_scores"](spark, sf_dir), execute=True)
    tree = facts["plan"].split("== Initial Plan ==")[0]
    tree = re.split(r"\n\n\(\d+\) ", tree)[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, tree
    assert len(re.findall(r"ReusedExchange", tree)) >= 1, tree


def test_corpus_ngram_topk_take_ordered(spark, sf_dir):
    """Global top-k plans as TakeOrderedAndProject (per-partition top-k +
    k-row driver merge), not a global Sort."""
    df = _Q["corpus_ngram_topk"](spark, sf_dir)
    facts = plan_facts(df)
    assert "TakeOrderedAndProject" in facts["plan"], facts["plan"]
    assert facts["n_exchanges"] <= 2, facts["plan"]


def test_hist_rollup_value_filter_reaches_scan(spark, sf_dir):
    """r7 quantile rollup: the [lo, hi] value filter must be pushed to
    the parquet scan on the fact passes, the 50 conditional sums must
    ride ONE exchange, and the tiny exact side must broadcast."""
    facts = plan_facts(_Q["hist_rollup_quantiles"](spark, sf_dir))
    assert any("value" in p for p in facts["pushed_filters"]), facts["pushed_filters"]
    assert "BroadcastHashJoin" in facts["joins"]
    assert "CartesianProduct" not in facts["joins"]
    assert facts["n_exchanges"] <= 2, facts["plan"]


def test_manifest_time_travel_no_exchange(spark, sf_dir):
    """Both versions are manifest-resolved scans joined broadcast-side —
    no shuffle anywhere."""
    facts = plan_facts(_Q["manifest_time_travel"](spark, sf_dir))
    assert facts["n_exchanges"] == 0, facts["plan"]
    assert "CartesianProduct" not in facts["joins"]


def test_multicol_skipping_pushes_both_ranges(spark, sf_dir):
    """The AND-of-ranges read must reach the parquet scan as TWO pushed
    range predicates (row-level tier), on top of the manifest-entry
    pruning the query's entries_read lit already pins (value tier)."""
    facts = plan_facts(_Q["manifest_multicol_skipping"](spark, sf_dir))
    pushed = " ".join(facts["pushed_filters"])
    assert "GreaterThanOrEqual(c_custkey" in pushed, pushed
    assert "LessThanOrEqual(c_acctbal" in pushed, pushed
    assert facts["n_exchanges"] == 1, facts["plan"]


def test_zorder_skipping_pushes_both_ranges(spark, sf_dir):
    """Same two-tier contract for the z-order clustered read."""
    facts = plan_facts(_Q["manifest_zorder_skipping"](spark, sf_dir))
    pushed = " ".join(facts["pushed_filters"])
    assert "GreaterThanOrEqual(c_custkey" in pushed, pushed
    assert "LessThanOrEqual(c_acctbal" in pushed, pushed
    assert "CartesianProduct" not in facts["joins"]
