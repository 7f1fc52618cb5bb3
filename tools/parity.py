"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names, and
an order-insensitive multiset of normalized values.  Usage:

    python tools/parity.py [sf_dir] [query ...] [--all]

``--all`` widens from the driver-gated set to the ENTIRE registry
(gate=False rows included) — the coverage pytest exercises, in one CLI
run.  The comparison helpers are importable
(tests/test_oracle_parity.py uses them) so the pytest gate and this CLI
can never drift apart.
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")


def _norm(v):
    if isinstance(v, np.generic):
        v = v.item()  # numpy scalar -> plain Python (pandas .df() path)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            # the driver canonicalizes through pandas, where a float NULL
            # IS NaN — None and NaN are indistinguishable in the gate
            # (proved by window_frames_user_value: Spark NULL deltas vs
            # DuckDB-via-pandas NaN, hash_match=true in CORRECTNESS_r06).
            # Mirror that: NaN collapses to the same token as None.
            return None
        return f"{v:.9g}"
    if isinstance(v, datetime):
        if v != v:  # pd.NaT — a NULL timestamp in the pandas path
            return None
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_norm(x)) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(str(_norm(r[i])) for i in order) for r in rows)


def duck_connection(sf_dir: str):
    """DuckDB connection with every testdata table registered as a view."""
    from iot_elt_airflow_mongo_timescaledb_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


#: DuckDB types whose pandas (`.df()`) representation is lossy vs what a
#: Spark query emits for the same logical value — HUGEINT/DECIMAL become
#: float64 ("0.0" vs Spark's long "0"), nested types become ndarrays/dicts
#: the driver's canonicalizer cannot hash.  r6's red row (`tokenize_docs`)
#: was a HUGEINT `SUM(CASE ...)` in the oracle.
PANDAS_LOSSY_TYPE_RE = (
    r"HUGEINT|UHUGEINT|DECIMAL|\[\]$|^STRUCT|^MAP|^LIST|^UNION"
)


def oracle_column_types(con, sql: str) -> list[tuple[str, str]]:
    """(column_name, duckdb_type) for an oracle SQL, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows]


def _kind(dtype_or_spark_type) -> str:
    """Collapse a type to 'i' (integer), 'f' (float), or 'o' (other)."""
    s = str(dtype_or_spark_type).lower()
    if any(k in s for k in ("int", "long", "short", "byte", "uint")):
        return "i"
    if any(k in s for k in ("float", "double")):
        return "f"
    return "o"


def compare_query(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run one Spark query + its DuckDB oracle; return a list of problems
    (empty == parity).  Raises nothing: engine errors become problems.

    The DuckDB side is fetched through ``.df()`` (pandas) — the driver's
    canonicalization path — NOT ``fetchall()``: DuckDB HUGEINT comes back
    from fetchall() as a plain Python int but from pandas as float64,
    which is exactly the representation divergence that kept
    `tokenize_docs` red in rounds 5-6 while this harness passed."""
    try:
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_kinds = {f.name: _kind(f.dataType.simpleString()) for f in sdf.schema.fields}
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        return [f"spark error: {e}"]
    try:
        ddf = con.execute(sql).df()
        d_cols = list(ddf.columns)
        d_kinds = {c: _kind(ddf[c].dtype) for c in d_cols}
        # pandas widens DuckDB DATE to datetime64[ns]; Spark emits
        # datetime.date.  Fold back to date where Spark's schema says so.
        for f in sdf.schema.fields:
            if f.dataType.simpleString() == "date" and f.name in ddf.columns:
                if np.issubdtype(ddf[f.name].dtype, np.datetime64):
                    ddf[f.name] = ddf[f.name].dt.date
        d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    except Exception as e:  # noqa: BLE001
        return [f"duckdb error: {e}"]
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
    else:
        # A Spark integer column vs a pandas float64 oracle column means the
        # driver sees "0" vs "0.0" on every row — rows+schema match, hash
        # fails.  Surface it as a type problem, not a value diff.  EXCEPT
        # when the column actually contains NULLs: then the driver's Spark
        # side widens to float64 through pandas too (nullable int64 ->
        # float64 is a pandas rule, not a DuckDB one), both sides render
        # identically, and there is no divergence to flag.
        lossy = [
            c
            for c in s_cols
            if s_kinds[c] == "i"
            and d_kinds.get(c) == "f"
            and not ddf[c].isna().any()
        ]
        if lossy:
            problems.append(
                "pandas-lossy oracle column(s) "
                f"{lossy}: Spark integer vs DuckDB-via-pandas float64 "
                "(HUGEINT/DECIMAL or NULL-widened int) — cast the oracle "
                "to BIGINT"
            )
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        ms, md = _rows_to_multiset(s_rows, s_cols), _rows_to_multiset(d_rows, d_cols)
        if ms != md:
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
            problems.append(f"values differ; first diffs: {diff}")
    return problems


def main():
    import __spark_entry__ as entry_mod
    from iot_elt_airflow_mongo_timescaledb_spark.session import get_spark

    args = sys.argv[1:]
    include_ungated = "--all" in args
    args = [a for a in args if a != "--all"]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = get_spark("parity")
    con = duck_connection(sf_dir)

    if include_ungated:
        # full registry (gate=False rows included) — what pytest covers
        from iot_elt_airflow_mongo_timescaledb_spark.plans.registry import (
            oracle_queries,
            spark_queries,
        )

        qs = spark_queries()
        oracles = oracle_queries()
    else:
        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n_rows = fn(spark, sf_dir).count()
                print(f"SKIP  {name}: no oracle ({n_rows} rows)")
                n_skip += 1
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: spark error: {e}")
                n_fail += 1
            continue
        problems = compare_query(spark, con, fn, oracles[name], sf_dir)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
