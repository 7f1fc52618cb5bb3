"""Physical-plan audit — the ".explain and iterate" feedback loop.

For every registered query, renders the formatted physical plan and
reports the scale-relevant facts: shuffle (Exchange) count, join
strategies chosen, parquet filter pushdown, and whole-stage-codegen
coverage.  Usage:

    python tools/explain_audit.py [sf_dir] [query ...]

The helpers are importable; tests/test_plans.py asserts the invariants
(pushdown happens, pruning happens, nothing cartesian-joins by accident)
so a regression in plan shape fails CI, not just the benchmark.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_string(df, mode: str = "formatted") -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def plan_facts(df, execute: bool = False) -> dict:
    """Plan metrics.  With ``execute=True`` the query runs first so the
    AQE *final* plan is inspected — codegen ids and runtime-chosen join
    strategies only appear there."""
    if execute:
        # collect() (not count()) — count() builds a *different* query, so
        # this df's own execution would never happen and the final plan
        # would stay unannotated
        df.collect()
    plan = plan_string(df)
    # an executed AQE plan prints a Final tree, an Initial tree, then the
    # shared operator-detail blocks.  Count operators (exchanges/joins) in
    # the final tree only — the initial tree would double-count — but read
    # scan details (PushedFilters/ReadSchema) from the whole text.
    # meter operators from the (final) tree lines, "Name (id)" — detail
    # blocks repeat per tree section in executed AQE plans, and the
    # initial tree would double-count.  The lookbehind keeps
    # BroadcastExchange from matching as Exchange.
    tree = plan.split("== Initial Plan ==")[0]
    tree = re.split(r"\n\n\(\d+\) ", tree)[0]  # cut operator-detail blocks
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "n_exchanges": len(re.findall(r"(?<![A-Za-z])Exchange \(\d+\)", tree)),
        "joins": [
            j
            for j in JOIN_KINDS
            for _ in re.findall(rf"(?<![A-Za-z]){j}\b", tree)
        ],
        "pushed_filters": sorted({p for p in pushed if p.strip()}),
        "read_schemas": sorted(set(read_schema)),
        "n_codegen": len(
            set(re.findall(r"codegen id : (\d+)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "plan": plan,
    }


def main():
    from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import spark_queries
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = get_spark("explain-audit")
    for name, fn in sorted(spark_queries().items()):
        if only and name not in only:
            continue
        try:
            facts = plan_facts(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        joins = ",".join(facts["joins"]) or "-"
        pushed = "; ".join(facts["pushed_filters"]) or "-"
        print(
            f"{name}: exchanges={facts['n_exchanges']} codegen={facts['n_codegen']} "
            f"joins=[{joins}]\n    pushed=[{pushed}]"
        )
        if only:
            print(facts["plan"])


if __name__ == "__main__":
    main()
