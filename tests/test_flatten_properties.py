"""Property-based flattener tests (hypothesis).

Property: for ANY document shape — arbitrary scalar fields, arrays of
scalars, arrays of structs, including empty arrays — flatten is
lossless: parent rows are preserved, child cardinalities equal the sum
of array lengths, positions are dense per parent, and the parent/child
join reconstructs exactly the original (doc, element) pairs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from iot_elt_airflow_mongo_timescaledb_spark.operators.joins import parent_child_join
from iot_elt_airflow_mongo_timescaledb_spark.sources.flatten import (
    flatten_document_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("num", T.LongType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField(
            "metrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ts", T.LongType(), True),
                        T.StructField("v", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 10**6),  # unique-ified into _id below
        st.integers(-100, 100),
        st.lists(st.text("ab", min_size=0, max_size=3), max_size=4),
        st.lists(
            st.tuples(st.integers(0, 10**9), st.integers(0, 10**4)), max_size=4
        ),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)


@given(docs=docs_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_flatten_is_lossless(spark, docs):
    rows = [
        (f"id{key}", num, tags, [{"ts": ts, "v": v} for ts, v in metrics])
        for key, num, tags, metrics in docs
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = flatten_document_table(df, "t")

    parent = out["t"]
    assert parent.count() == len(rows)

    tags_child = out["t__tags"]
    metrics_child = out["t__metrics"]
    assert tags_child.count() == sum(len(t) for _, _, t, _ in rows)
    assert metrics_child.count() == sum(len(m) for _, _, _, m in rows)

    # reassembly recovers the original (doc, element, position) triples
    re_tags = {
        (r["_id"], r["value"], r["_dlt_list_idx"])
        for r in parent_child_join(parent, tags_child).collect()
    }
    want_tags = {
        (i, v, pos) for i, _, tags, _ in rows for pos, v in enumerate(tags)
    }
    assert re_tags == want_tags

    re_metrics = {
        (r["_id"], r["ts"], r["v"], r["_dlt_list_idx"])
        for r in parent_child_join(parent, metrics_child).collect()
    }
    want_metrics = {
        (i, m["ts"], m["v"], pos)
        for i, _, _, ms in rows
        for pos, m in enumerate(ms)
    }
    assert re_metrics == want_metrics
