"""Property pins for column mapping (hypothesis, r13).

A random interleaving of RENAME / DROP / APPEND against one table must
always serve exactly the model's state: live columns under their
current names, historical files resolving through the alias registry,
dropped lineages excluded and their names refused.  The model tracks
column IDENTITIES (c0..c3) independently of their current names, so a
rename chain is checked by identity, not by string.

Spark-backed (each op is a real commit + the final read), so examples
are few and frames are 1-row — the schema-algebra breadth lives in the
verbs' own unit tests; THIS pins that no sequence of metadata edits
can desynchronize reads from the log.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    ManifestFormat,
)

IDS = ["c0", "c1", "c2", "c3"]
NAME_POOL = [f"n{i}" for i in range(8)]

op = st.one_of(
    st.tuples(st.just("append"), st.sets(st.sampled_from(IDS[1:]))),
    st.tuples(
        st.just("rename"),
        st.sampled_from(IDS),
        st.sampled_from(NAME_POOL),
    ),
    st.tuples(st.just("drop"), st.sampled_from(IDS[1:])),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op, min_size=1, max_size=6))
def test_random_mapping_sequences_match_model(spark, tmp_path_factory, ops):
    import uuid

    root = str(tmp_path_factory.mktemp("cmprop")) + "/" + uuid.uuid4().hex
    fmt = ManifestFormat(spark, root, auto_compact_dirs=None)

    # model: identity -> current name; None name = dropped
    names = {i: i for i in IDS}
    retired: set[str] = set()
    live = set(IDS)
    rows: list[dict] = []  # identity -> value (None = absent at append)
    next_val = [0]

    def append(omit: set):
        next_val[0] += 1
        base = next_val[0] * 100
        row = {
            i: (None if i in omit else base + k)
            for k, i in enumerate(IDS)
            if i in live
        }
        rows.append(dict(row))
        df = spark.createDataFrame(
            [tuple(row[i] for i in sorted(row))],
            ", ".join(f"{names[i]} long" for i in sorted(row)),
        )
        fmt.write("s.t", df, "append" if fmt.exists("s.t") else "overwrite")

    append(set())  # seed
    for o in ops:
        if o[0] == "append":
            append(o[1] & live)
        elif o[0] == "rename":
            _, ident, new = o
            if ident not in live:
                continue  # dropped: the verb refuses; model skips
            old = names[ident]
            current = {names[i] for i in live}
            if new == old:
                with pytest.raises(ValueError):
                    fmt.rename_column("s.t", old, new)
            elif new in current or new in retired:
                with pytest.raises(ValueError, match="collides"):
                    fmt.rename_column("s.t", old, new)
            else:
                fmt.rename_column("s.t", old, new)
                retired.add(old)
                names[ident] = new
        else:
            _, ident = o
            if ident not in live:
                continue
            fmt.drop_column("s.t", names[ident])
            retired.add(names[ident])
            live.discard(ident)

    got = fmt.read("s.t")
    assert set(got.columns) == {names[i] for i in live}
    served = sorted(
        (tuple(r[names[i]] for i in sorted(live)) for r in got.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    expected = sorted(
        (tuple(r.get(i) for i in sorted(live)) for r in rows),
        key=lambda t: tuple((x is None, x) for x in t),
    )
    assert served == expected
    # every retired name refuses a fresh append
    for bad in sorted(retired):
        with pytest.raises(TypeError, match="retired"):
            fmt.write(
                "s.t",
                spark.createDataFrame([(1,)], f"{bad} long"),
                "append",
            )
        break  # one is enough per example (keeps runtime bounded)
