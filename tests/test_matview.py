"""SQL materialized views (r15 tail) — TimescaleDB continuous
aggregates as SQL over the incremental rollup machinery.

Pins: (1) CREATE bootstraps from the source snapshot and the mv read
equals the recompute; (2) REFRESH merges exactly the commits since
the last refresh — append feed on plain sources, signed CDF facts
under UPDATE/DELETE/MERGE — and is idempotent; (3) WITH (REALTIME)
serves stored-rollup ∪ unsynced tail with no write; (4) definitions
persist in the catalog log across restart and compose under plain
views; (5) the refusal matrix: bounded grammar, collision checks both
ways, DML/DROP guards on the mv name and its state table, non-catalog
formats refuse DDL.

Reference semantics: TimescaleDB continuous aggregates (the
reference's warehouse maintains dashboards from them; its Airflow
aggregate DAGs recompute instead — dags/iot_dwh_agg_transform_daily
.py:75 — which is the cost shape this feature removes).
"""

from __future__ import annotations

import pytest

from iot_elt_airflow_mongo_timescaledb_spark.plans.materialize import Warehouse
from iot_elt_airflow_mongo_timescaledb_spark.plans.matview import (
    MatviewParseError,
    parse_matview_body,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.sql_frontend import (
    SqlFrontend,
    SqlParseError,
)
from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
)


def _setup(spark, tmp_path, cdf=True):
    fmt = CatalogManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, cdf=cdf,
        stats_cols=("k",),
    )
    wh = Warehouse(spark, str(tmp_path), table_format=fmt)
    df = spark.createDataFrame(
        [
            (i, f"d{i % 3}", float(i), f"2024-01-{(i % 5) + 1:02d} 03:00:00")
            for i in range(20)
        ],
        "k long, dev string, v double, tss string",
    ).selectExpr("k", "dev", "v", "cast(tss as timestamp) as ts")
    fmt.write("s.facts", df, "overwrite")
    return fmt, wh, SqlFrontend(wh)


def _recompute(spark, facts):
    return {
        tuple(r)
        for r in spark.sql(
            "SELECT dev, DATE_TRUNC('day', ts) AS day, SUM(v) AS total, "
            "COUNT(*) AS n, ROUND(AVG(v), 6) AS mean "
            "FROM {f} GROUP BY dev, day",
            f=facts,
        ).collect()
    }


CREATE = (
    "CREATE MATERIALIZED VIEW agg.mv AS "
    "SELECT dev, DATE_TRUNC('day', ts) AS day, SUM(v) AS total, "
    "COUNT(*) AS n, AVG(v) AS mean FROM s.facts GROUP BY dev, day"
)


def test_create_refresh_cdf_parity(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path)
    sq.sql(CREATE)
    got = {tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()}
    assert got == _recompute(spark, fmt.read("s.facts"))

    # append-only delta
    sq.sql("INSERT INTO s.facts SELECT k + 100, dev, v * 2, ts FROM s.facts")
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == _recompute(spark, fmt.read("s.facts"))

    # upserting DML -> signed CDF facts
    sq.sql("DELETE FROM s.facts WHERE k BETWEEN 0 AND 5")
    sq.sql("UPDATE s.facts SET v = v + 50.0 WHERE k BETWEEN 100 AND 110")
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    want = _recompute(spark, fmt.read("s.facts"))
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == want
    # idempotent: nothing new committed -> second refresh is a no-op
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == want


def test_realtime_restart_and_view_composition(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path)
    sq.sql(
        "CREATE MATERIALIZED VIEW agg.rt WITH (REALTIME) AS "
        "SELECT dev, SUM(v) AS total, COUNT(*) AS n "
        "FROM s.facts GROUP BY dev"
    )
    sq.sql("UPDATE s.facts SET v = v + 100.0 WHERE k BETWEEN 0 AND 3")
    sq.sql(
        "INSERT INTO s.facts SELECT 50, 'd9', CAST(7.5 AS DOUBLE), "
        "CAST(NULL AS TIMESTAMP)"
    )
    want = {
        tuple(r)
        for r in spark.sql(
            "SELECT dev, SUM(v) AS total, COUNT(*) AS n FROM {f} "
            "GROUP BY dev",
            f=fmt.read("s.facts"),
        ).collect()
    }
    # un-refreshed tail shows through the realtime read, nothing written
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.rt").collect()
    } == want
    # restart: fresh format + frontend resolve from the catalog log
    sq2 = SqlFrontend(
        Warehouse(
            spark,
            str(tmp_path),
            table_format=CatalogManifestFormat(
                spark, str(tmp_path), auto_compact_dirs=None, cdf=True
            ),
        )
    )
    assert {
        tuple(r) for r in sq2.sql("SELECT * FROM agg.rt").collect()
    } == want
    assert "agg.rt" in {
        r["matview"]
        for r in sq2.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    sq2.sql("REFRESH MATERIALIZED VIEW agg.rt")
    assert {
        tuple(r) for r in sq2.sql("SELECT * FROM agg.rt").collect()
    } == want
    # a plain persisted view composes over the mv
    sq2.sql("CREATE VIEW examples.top AS SELECT dev, total FROM agg.rt")
    assert sorted(
        r["dev"] for r in sq2.sql("SELECT * FROM examples.top").collect()
    ) == ["d0", "d1", "d2", "d9"]


def test_or_replace_rebuilds_state(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path)
    sq.sql(CREATE)
    sq.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW agg.mv AS "
        "SELECT dev, COUNT(*) AS n FROM s.facts GROUP BY dev"
    )
    rows = sq.sql("SELECT * FROM agg.mv").collect()
    assert set(rows[0].asDict()) == {"dev", "n"}
    assert {(r["dev"], r["n"]) for r in rows} == {
        ("d0", 7), ("d1", 7), ("d2", 6),
    }


def test_append_only_source_without_cdf(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path, cdf=False)
    sq.sql(CREATE)
    sq.sql("INSERT INTO s.facts SELECT k + 100, dev, v, ts FROM s.facts")
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == _recompute(spark, fmt.read("s.facts"))


def test_grammar_refusals(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path)
    for body, why in [
        ("SELECT dev, SUM(v) AS t FROM s.facts "
         "JOIN s.other ON 1=1 GROUP BY dev", "canonical form"),
        ("SELECT dev, SUM(v) AS t FROM s.facts "
         "WHERE v > 1 GROUP BY dev", "canonical form"),
        ("SELECT dev, COUNT(DISTINCT k) AS n FROM s.facts "
         "GROUP BY dev", "sketch rollup"),
        ("SELECT dev, COUNT(k) AS n FROM s.facts GROUP BY dev",
         "COUNT"),
        ("SELECT dev, SUM(v) AS x, AVG(v) AS x FROM s.facts "
         "GROUP BY dev", "duplicate"),
        ("SELECT dev, k, SUM(v) AS t FROM s.facts GROUP BY dev",
         "GROUP BY lists"),
        ("SELECT dev, SUM(v) AS t FROM s.facts GROUP BY ts",
         "does not match"),
        ("SELECT SUM(v) AS t FROM s.facts GROUP BY dev",
         "at least one group key"),
        ("SELECT dev FROM s.facts GROUP BY dev",
         "at least one aggregate"),
        ("SELECT v, SUM(v) AS t FROM s.facts GROUP BY v",
         "shares a name"),
    ]:
        with pytest.raises((MatviewParseError, SqlParseError)):
            sq.sql(f"CREATE MATERIALIZED VIEW agg.bad AS {body}")
    # positional GROUP BY resolves against the key positions
    d = parse_matview_body(
        "SELECT dev, DATE_TRUNC('day', ts) AS day, SUM(v) AS t "
        "FROM s.facts GROUP BY 1, 2"
    )
    assert [k["alias"] for k in d["keys"]] == ["dev", "day"]
    # bad column / bad type refuse at CREATE and commit NOTHING
    with pytest.raises(ValueError, match="does not exist"):
        sq.sql(
            "CREATE MATERIALIZED VIEW agg.bad AS "
            "SELECT dev, SUM(nope) AS t FROM s.facts GROUP BY dev"
        )
    with pytest.raises(ValueError, match="numeric"):
        sq.sql(
            "CREATE MATERIALIZED VIEW agg.bad AS "
            "SELECT k AS kk, SUM(dev) AS t FROM s.facts GROUP BY kk"
        )
    with pytest.raises(ValueError, match="timestamp/date"):
        sq.sql(
            "CREATE MATERIALIZED VIEW agg.bad AS "
            "SELECT DATE_TRUNC('day', v) AS d, COUNT(*) AS n "
            "FROM s.facts GROUP BY d"
        )
    assert "agg.bad" not in sq._matviews()
    assert not wh.exists("agg.bad__mvstate")


def test_matview_maintain_stream(spark, tmp_path):
    """The mv rides the warehouse_cdf readStream like the Python-API
    rollups: appended commits drain through maintain_stream, the key
    projection applies per micro-batch, and the result equals the
    recompute; the REFRESH cadence interleaves on the same cursor."""
    from iot_elt_airflow_mongo_timescaledb_spark.plans.matview import (
        matview_sync,
    )

    fmt, wh, sq = _setup(spark, tmp_path)
    sq.sql(CREATE)
    sq.sql("INSERT INTO s.facts SELECT k + 100, dev, v * 3, ts FROM s.facts")
    sq.sql("INSERT INTO s.facts SELECT k + 200, dev, v + 1, ts FROM s.facts")
    mv = matview_sync(wh, "agg.mv", sq._matviews()["agg.mv"])
    q = mv.maintain_stream(
        fmt, "s.facts", str(tmp_path / "ck_mv"), max_versions_per_batch=1
    )
    assert q.awaitTermination(180)
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == _recompute(spark, fmt.read("s.facts"))
    # the polling cadence shares the cursor: refresh after the stream
    # is a no-op, and a further commit refreshes normally
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    sq.sql("DELETE FROM s.facts WHERE k BETWEEN 200 AND 205")
    sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    assert {
        tuple(r) for r in sq.sql("SELECT * FROM agg.mv").collect()
    } == _recompute(spark, fmt.read("s.facts"))


def test_guards_and_collisions(spark, tmp_path):
    fmt, wh, sq = _setup(spark, tmp_path)
    sq.sql(CREATE)
    for stmt in [
        "INSERT INTO agg.mv SELECT * FROM VALUES (1)",
        "UPDATE agg.mv SET n = 0 WHERE dev = 'd0'",
        "DELETE FROM agg.mv WHERE dev = 'd0'",
        "DROP TABLE agg.mv",
        "DROP TABLE agg.mv__mvstate",
        "INSERT INTO agg.mv__mvstate SELECT * FROM VALUES (1)",
    ]:
        with pytest.raises(SqlParseError):
            sq.sql(stmt)
    with pytest.raises(ValueError, match="MATERIALIZED VIEW of that"):
        sq.sql("CREATE VIEW agg.mv AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="MATERIALIZED VIEW of that"):
        sq.sql("CREATE TABLE agg.mv AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="already exists"):
        sq.sql(CREATE)
    with pytest.raises(ValueError, match="TABLE of that name"):
        sq.sql(
            "CREATE MATERIALIZED VIEW s.facts AS "
            "SELECT dev, COUNT(*) AS n FROM s.facts GROUP BY dev"
        )
    sq.sql("CREATE VIEW examples.v AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="VIEW of that name"):
        sq.sql(
            "CREATE MATERIALIZED VIEW examples.v AS "
            "SELECT dev, COUNT(*) AS n FROM s.facts GROUP BY dev"
        )
    # no-txn and non-catalog refusals
    sq.sql("BEGIN")
    with pytest.raises(RuntimeError, match="transaction"):
        sq.sql(
            "CREATE MATERIALIZED VIEW agg.t AS "
            "SELECT dev, COUNT(*) AS n FROM s.facts GROUP BY dev"
        )
    sq.sql("ROLLBACK")
    plain = SqlFrontend(
        Warehouse(
            spark,
            str(tmp_path / "plain"),
            table_format=ManifestFormat(
                spark, str(tmp_path / "plain"), auto_compact_dirs=None
            ),
        )
    )
    with pytest.raises(SqlParseError, match="catalog commit-log"):
        plain.sql(
            "CREATE MATERIALIZED VIEW agg.x AS "
            "SELECT dev, COUNT(*) AS n FROM s.facts GROUP BY dev"
        )
    # a source whose columns drifted refuses NAMING the mv (not a raw
    # analysis error): rename the summed column, then refresh
    sq.sql("ALTER TABLE s.facts RENAME COLUMN v TO val")
    with pytest.raises(ValueError, match="no longer matches its source"):
        sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
    # drop still works on a drifted mv (it never reads the source);
    # removes definition AND state; IF EXISTS tolerates absence
    assert sq.sql("DROP MATERIALIZED VIEW agg.mv") is True
    assert not wh.exists("agg.mv__mvstate")
    with pytest.raises(ValueError, match="no such"):
        sq.sql("DROP MATERIALIZED VIEW agg.mv")
    assert sq.sql("DROP MATERIALIZED VIEW IF EXISTS agg.mv") is False
    with pytest.raises(ValueError, match="no such"):
        sq.sql("REFRESH MATERIALIZED VIEW agg.mv")
