"""Unit tests for the round-4 curation operators: benchmark
decontamination, token-budget cut, and PII redaction.

The oracle-parity suite (tests/test_oracle_parity.py) already checks the
registered queries against DuckDB; these tests pin the operator-level
semantics the SQL comparison can't see — boundary behavior, redaction
ordering, and the two-phase budget cut agreeing with a literal global
window.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
    benchmark_contamination,
    word_shingles,
)
from iot_elt_airflow_mongo_timescaledb_spark.operators.packing import (
    token_budget_cut,
)
from iot_elt_airflow_mongo_timescaledb_spark.operators.text import pii_scan


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBenchmarkContamination:
    def test_flags_only_overlapping_docs(self, spark):
        corpus = _docs(
            spark,
            [
                (1, "the quick brown fox jumps"),  # shares "the quick brown"
                (2, "completely unrelated words here"),
                (3, "quick brown fox runs far"),  # shares "quick brown fox"
            ],
        )
        bench = _docs(spark, [(100, "the quick brown fox")])
        out = benchmark_contamination(
            word_shingles(corpus, "doc_id", "text", n=3),
            word_shingles(bench, "doc_id", "text", n=3),
            "doc_id",
        )
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {1, 3}  # doc 2 is clean -> absent
        # doc 1 shares "the quick brown" + "quick brown fox"
        assert rows[1]["n_hit_shingles"] == 2
        assert rows[1]["n_bench_docs"] == 1
        assert rows[3]["n_hit_shingles"] == 1

    def test_multiple_bench_docs_counted(self, spark):
        corpus = _docs(spark, [(1, "a b c d e")])
        bench = _docs(spark, [(100, "a b c x"), (101, "c d e y")])
        out = benchmark_contamination(
            word_shingles(corpus, "doc_id", "text", n=3),
            word_shingles(bench, "doc_id", "text", n=3),
            "doc_id",
        ).collect()
        assert len(out) == 1
        assert out[0]["n_hit_shingles"] == 2  # "a b c", "c d e"
        assert out[0]["n_bench_docs"] == 2


class TestTokenBudgetCut:
    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "n_tokens", "score"])

    def _oracle(self, df, budget):
        """Literal single-window cumsum (the semantics being refined)."""
        w = (
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {
            (r["doc_id"], r["cum_tokens"])
            for r in df.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget)
            .collect()
        }

    def test_matches_global_window(self, spark):
        rows = [
            (i, 10 + (i * 7) % 13, round(((i * 37) % 100) / 100.0, 6))
            for i in range(200)
        ]
        df = self._scored(spark, rows)
        for budget in (50, 500, 1500, 10**6):
            got = {
                (r["doc_id"], r["cum_tokens"])
                for r in token_budget_cut(
                    df, "doc_id", "n_tokens", "score", budget=budget
                ).collect()
            }
            assert got == self._oracle(df, budget), f"budget={budget}"

    def test_boundary_doc_exactly_fits(self, spark):
        df = self._scored(
            spark, [(1, 10, 0.9), (2, 10, 0.8), (3, 10, 0.7)]
        )
        kept = token_budget_cut(
            df, "doc_id", "n_tokens", "score", budget=20
        ).collect()
        assert {r["doc_id"] for r in kept} == {1, 2}
        assert {r["cum_tokens"] for r in kept} == {10, 20}

    def test_tie_broken_by_doc_id(self, spark):
        df = self._scored(
            spark, [(5, 10, 0.5), (1, 10, 0.5), (3, 10, 0.5)]
        )
        kept = token_budget_cut(
            df, "doc_id", "n_tokens", "score", budget=20
        ).collect()
        assert sorted(r["doc_id"] for r in kept) == [1, 3]


class TestPiiScan:
    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a@b.com call 555-123-4567 ref #12345 acct 123456789")],
            ["id", "t"],
        )
        row = pii_scan(df, "id", "t").collect()[0]
        assert row["n_email"] == 1
        assert row["n_phone"] == 1
        assert row["n_id_tag"] == 1
        assert row["n_digit_run"] == 1
        assert row["redacted"] == "mail [EMAIL] call [PHONE] ref [ID] acct [NUM]"

    def test_counts_measured_before_redaction(self, spark):
        # "#123456789" is both an id_tag and contains a 9-digit run:
        # counts see the ORIGINAL text (both fire); redaction applies
        # id_tag first so digit_run finds nothing left to replace.
        df = spark.createDataFrame([(1, "ref #123456789 end")], ["id", "t"])
        row = pii_scan(df, "id", "t").collect()[0]
        assert row["n_id_tag"] == 1
        assert row["n_digit_run"] == 1
        assert row["redacted"] == "ref [ID] end"

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "no pii here at all")], ["id", "t"])
        row = pii_scan(df, "id", "t").collect()[0]
        assert row["redacted"] == "no pii here at all"
        assert row["n_email"] == row["n_phone"] == 0


class TestSubstringDupPairs:
    def test_shared_passage_detected_boilerplate_excluded(self, spark):
        from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
            substring_dup_pairs,
            word_shingles,
        )

        passage = "one two three four"  # shared 4-gram between docs 1 and 2
        boiler = "w x y z"  # in EVERY doc -> df above max_df, excluded
        docs = _docs(
            spark,
            [
                (1, f"{boiler} alpha {passage} beta"),
                (2, f"{boiler} gamma {passage} delta"),
                (3, f"{boiler} epsilon zeta eta theta"),
                (4, f"{boiler} iota kappa lambda mu"),
            ],
        )
        grams = word_shingles(docs, "doc_id", "text", n=4)
        out = substring_dup_pairs(grams, "doc_id", min_df=2, max_df=3).collect()
        assert [(r["id_a"], r["id_b"], r["n_shared_ngrams"]) for r in out] == [
            (1, 2, 1)
        ]


class TestTokenBudgetCutNulls:
    def test_null_scores_excluded_not_crashing(self, spark):
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("n_tokens", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        df = spark.createDataFrame(
            [(1, 10, 0.9), (2, None, 0.8), (3, 10, None), (4, 10, 0.7)],
            schema,
        )
        kept = token_budget_cut(
            df, "doc_id", "n_tokens", "score", budget=100
        ).collect()
        assert sorted(r["doc_id"] for r in kept) == [1, 4]


class TestAnsiSafety:
    """Spark 4 runs ANSI by default: one junk row must never abort a
    corpus-wide job with DIVIDE_BY_ZERO."""

    def test_quality_scores_empty_doc_scores_null(self, spark):
        from iot_elt_airflow_mongo_timescaledb_spark.operators.text import (
            quality_scores,
        )

        df = _docs(spark, [(1, "real words here"), (2, "   "), (3, "")])
        rows = {r["doc_id"]: r for r in quality_scores(df, "doc_id", "text").collect()}
        assert rows[1]["quality_score"] is not None
        assert rows[2]["stopword_ratio"] is None  # 0 words -> NULL, not crash
        assert rows[3]["punct_ratio"] is None  # 0 chars -> NULL, not crash

    def test_cosine_topk_zero_norm_vector_survives(self, spark):
        from iot_elt_airflow_mongo_timescaledb_spark.operators.similarity import (
            cosine_topk,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
            ["vec_id", "embedding"],
        )
        out = cosine_topk(
            emb, emb.filter("vec_id = 1"), "vec_id", "embedding", k=5
        ).collect()
        scores = {r["neighbor_id"]: r["score"] for r in out}
        assert scores[2] is None  # zero-norm scores NULL, job survives
        assert scores[3] == 0.0


class TestOperatorValidation:
    def test_banded_rejects_bad_geometry(self, spark):
        import pytest as _pytest

        from iot_elt_airflow_mongo_timescaledb_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        sig = spark.createDataFrame([(1, "a", "b")], ["doc_id", "mh0", "mh1"])
        with _pytest.raises(ValueError, match="multiple of bands"):
            lsh_candidate_pairs(sig, "doc_id", k=2, bands=3)

    def test_membership_join_dedups_array_and_rejects_right(self, spark):
        import pytest as _pytest

        from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import (
            array_membership_join,
        )

        facts = spark.createDataFrame([(1, "d1")], ["f_id", "device_id"])
        dims = spark.createDataFrame([(10, ["d1", "d1"])], ["u_id", "devices"])
        out = array_membership_join(facts, dims, "devices", "device_id")
        assert out.count() == 1  # duplicated member matches ONCE
        with _pytest.raises(ValueError, match="right/full"):
            array_membership_join(facts, dims, "devices", "device_id", how="full")

    def test_salted_join_rejects_outer(self, spark):
        import pytest as _pytest

        from iot_elt_airflow_mongo_timescaledb_spark.operators.skew import (
            salted_join,
        )

        facts = spark.createDataFrame([(1, "k1", 5)], ["f_id", "k", "v"])
        dim = spark.createDataFrame([("k1", "x")], ["k", "attr"])
        with _pytest.raises(ValueError, match="phantom"):
            salted_join(facts, dim, "k", ["f_id"], how="full")

    def test_check_not_null_empty_cols(self, spark):
        from iot_elt_airflow_mongo_timescaledb_spark.operators.quality_checks import (
            check_not_null,
        )

        df = spark.createDataFrame([(1,)], ["a"])
        assert check_not_null(df, []).count() == 0
