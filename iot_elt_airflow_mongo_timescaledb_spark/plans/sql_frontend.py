"""SQL DML/DDL front-end over the warehouse verbs (round 14, VERDICT
r13 task 6).

A real user's first contact with a transactional table is SQL text —
``MERGE INTO`` / ``UPDATE`` / ``DELETE`` / ``INSERT`` / ``ALTER TABLE
… RENAME COLUMN`` (the reference's users speak raw SQL to
TimescaleDB, reference README.md:46).  Spark's own SQL layer cannot
target our commit-log tables (they are not catalog tables), so this
front-end is a THIN dispatcher: statements that read (SELECT/VALUES,
and every MERGE source / INSERT body) pass through ``spark.sql``
unchanged except that warehouse table names resolve to temp views of
the committed snapshots; statements that write parse into the exact
Python verb a user would call — so every refusal (type change on
append, retired-name reuse, constraint violations, commit conflicts)
is THE SAME refusal, not a parallel implementation
(tests/test_sql_frontend.py pins refusal parity).

Deliberately NOT a SQL parser: the accepted grammar is the canonical
form of each statement (regexes below, case-insensitive, one
statement per call) and anything else refuses loudly naming the
supported shape.  Same posture as early Delta SQL support — the
DataFrame/Python API remains the full surface.

Scale shape: identical to the underlying verbs — SELECT passthrough
is Catalyst end-to-end (the temp views are lazy committed-snapshot
reads, so pushdown/pruning work as in any read), UPDATE/DELETE map to
the stats-bounded ``update_where``/``delete_where`` range forms, and
MERGE to the stats-bounded merge.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ..session import local_rows

__all__ = ["SqlFrontend", "SqlParseError"]


class SqlParseError(ValueError):
    """Statement shape not supported by the thin dispatcher — the
    message names the canonical accepted form."""


_TBL = r"[A-Za-z_][\w]*\.[A-Za-z_][\w]*"
_ID = r"[A-Za-z_][\w]*"


def _lit(tok: str):
    """One SQL literal → Python value (numbers, single-quoted strings,
    NULL/booleans) — the bound domain the range verbs accept."""
    t = tok.strip()
    if re.fullmatch(r"'(?:[^']|'')*'", t):
        return t[1:-1].replace("''", "'")
    if re.fullmatch(r"-?\d+", t):
        return int(t)
    if re.fullmatch(r"-?\d*\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+", t):
        return float(t)
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    raise SqlParseError(
        f"unsupported literal {tok!r}: numbers, 'strings', true/false"
    )


class SqlFrontend:
    """``SqlFrontend(warehouse).sql(text)`` — returns a DataFrame for
    reads, the verb's return value (rows touched / new version / None)
    for writes."""

    def __init__(self, wh):
        self.wh = wh
        self.spark = wh.spark
        self._views: dict[str, str] = {}

    # -- table-name resolution for the read path ----------------------

    def _view_for(self, table: str) -> str:
        """Committed snapshot of ``schema.table`` as a temp view (temp
        view names cannot be qualified, hence the mangling); re-created
        per statement so each statement reads the CURRENT commit."""
        vname = "__wh_" + table.replace(".", "__")
        self.wh.read(table).createOrReplaceTempView(vname)
        self._views[table] = vname
        return vname

    def _persisted_views(self) -> dict:
        fn = getattr(self.wh.fmt, "views", None)
        return fn() if fn is not None else {}

    def _matviews(self) -> dict:
        fn = getattr(self.wh.fmt, "matviews", None)
        return fn() if fn is not None else {}

    def _view_for_matview(self, name: str, defn: dict) -> str:
        """Materialized view read: the rollup state's DERIVED
        presentation under the definition's aliases; REALTIME
        definitions union the not-yet-refreshed source tail
        (Timescale real-time continuous aggregates)."""
        from .matview import matview_sync

        vname = "__whm_" + name.replace(".", "__")
        sync = matview_sync(self.wh, name, defn)
        if defn.get("realtime"):
            # the realtime union re-aggregates the source tail — a
            # source whose columns drifted from the definition must
            # refuse naming the mv, like a view over a dropped column
            self._check_matview_source(name, defn)
            df = sync.read_realtime(self.wh.fmt, defn["source"])
        else:
            df = sync.read()
        df.createOrReplaceTempView(vname)
        return vname

    def _check_matview_source(self, name: str, defn: dict) -> None:
        from .matview import validate_defn

        if not self.wh.exists(defn["source"]):
            raise ValueError(
                f"materialized view {name}: source table "
                f"{defn['source']} no longer exists — DROP MATERIALIZED "
                f"VIEW {name}, or recreate the source"
            )
        try:
            validate_defn(defn, self.wh.read(defn["source"]).schema)
        except ValueError as e:
            raise ValueError(
                f"materialized view {name} no longer matches its "
                f"source {defn['source']} (renamed/dropped column?): {e}"
            ) from None

    def _view_for_persisted(
        self, name: str, sql_text: str, stack: frozenset
    ) -> str:
        """Materialize a PERSISTED view (catalog-stored text, r15) as a
        temp view over the CURRENT commits — re-resolved per statement,
        so the view tracks base-table commits; a base column/table the
        view text no longer finds refuses naming the view."""
        vname = "__whv_" + name.replace(".", "__")
        body = self._substitute(sql_text, stack | {name})
        try:
            self.spark.sql(body).createOrReplaceTempView(vname)
        except Exception as e:
            raise ValueError(
                f"view {name} no longer resolves against its base "
                f"tables (dropped column or table?): {e}"
            ) from None
        return vname

    def _substitute(self, text: str, _stack: frozenset = frozenset()) -> str:
        """Rewrite warehouse ``schema.table`` references in a read-only
        statement to their temp views — including TIME TRAVEL suffixes
        (``t VERSION AS OF n`` / ``t TIMESTAMP AS OF 'ts'``, the
        Delta/Iceberg SQL shape, resolved through the commit log) and
        PERSISTED views (resolved recursively; cycles refuse).
        Textual (word-boundary) — a table name inside a string literal
        would also rewrite; the full-parser surface is the Python
        API."""
        out = text

        def tt_register(t: str, version: int) -> str:
            vname = f"__wh_tt_{t.replace('.', '__')}_v{version}"
            self.wh.fmt.read_version(t, version).createOrReplaceTempView(
                vname
            )
            return vname

        def sub_version(m):
            t = m.group(1)
            if not self.wh.exists(t):
                return m.group(0)
            return tt_register(t, int(m.group(2)))

        def sub_timestamp(m):
            t = m.group(1)
            if not self.wh.exists(t):
                return m.group(0)
            import datetime as _dt

            when = _dt.datetime.fromisoformat(m.group(2).strip("'"))
            return tt_register(t, self.wh.fmt.version_at(t, when))

        out = re.sub(
            rf"\b({_TBL})\s+VERSION\s+AS\s+OF\s+(\d+)",
            sub_version,
            out,
            flags=re.I,
        )
        out = re.sub(
            rf"\b({_TBL})\s+TIMESTAMP\s+AS\s+OF\s+('[^']+')",
            sub_timestamp,
            out,
            flags=re.I,
        )
        tables = {t for t in re.findall(rf"\b({_TBL})\b", out)}
        views = self._persisted_views()
        matviews = self._matviews()
        for t in sorted(tables, key=len, reverse=True):
            if self.wh.exists(t):
                out = re.sub(
                    rf"\b{re.escape(t)}\b", self._view_for(t), out
                )
            elif t in views:
                if t in _stack:
                    raise ValueError(
                        f"view {t} is defined (transitively) in terms "
                        "of itself — drop and recreate the cycle-free "
                        "definition"
                    )
                out = re.sub(
                    rf"\b{re.escape(t)}\b",
                    self._view_for_persisted(t, views[t], _stack),
                    out,
                )
            elif t in matviews:
                out = re.sub(
                    rf"\b{re.escape(t)}\b",
                    self._view_for_matview(t, matviews[t]),
                    out,
                )
        return out

    # -- WHERE → bounded-range spec ------------------------------------

    def _where_spec(self, where: str) -> dict:
        """The WHERE shapes the stats-bounded verbs accept, as the
        conjunction dict ``{col: (lo, hi)}`` (or an IN list):
        ``col = v`` / ``col BETWEEN a AND b`` / ``col >= a AND col <=
        b`` / ``col IN (v, …)``, AND-combined over distinct columns."""
        spec: dict = {}

        def put(col, lo, hi):
            if col in spec:
                old = spec[col]
                if isinstance(old, list):
                    raise SqlParseError(
                        f"column {col} constrained twice in WHERE"
                    )
                # INTERSECT repeated bounds (None-aware): ``k >= 7 AND
                # k >= 5`` must yield lo=7, and ``k = 5 AND k = 6`` an
                # empty range — overwriting widened the predicate and
                # a bounded UPDATE/DELETE would touch excluded rows
                # (ADVICE r14 #2).  Mixed-type bounds refuse loudly.
                olo, ohi = old
                try:
                    if lo is None:
                        lo = olo
                    elif olo is not None:
                        lo = max(olo, lo)
                    if hi is None:
                        hi = ohi
                    elif ohi is not None:
                        hi = min(ohi, hi)
                except TypeError:
                    raise SqlParseError(
                        f"column {col} constrained twice in WHERE "
                        "with incomparable bound types"
                    ) from None
            spec[col] = (lo, hi)

        # shield BETWEEN's own AND from the conjunction split
        shielded = re.sub(
            r"(?i)\b(BETWEEN\s+\S+)\s+AND\s+",
            lambda m: m.group(1) + " \x00 ",
            where.strip(),
        )
        for clause in re.split(r"(?i)\s+AND\s+", shielded):
            c = clause.replace("\x00", "AND").strip().rstrip(";")
            m = re.fullmatch(
                rf"({_ID})\s+BETWEEN\s+(\S+)\s+AND\s+(\S+)", c, re.I
            )
            if m:
                put(m.group(1), _lit(m.group(2)), _lit(m.group(3)))
                continue
            m = re.fullmatch(rf"({_ID})\s*=\s*(.+)", c)
            if m:
                v = _lit(m.group(2))
                put(m.group(1), v, v)
                continue
            m = re.fullmatch(rf"({_ID})\s*(>=|<=)\s*(.+)", c)
            if m:
                col, op, v = m.group(1), m.group(2), _lit(m.group(3))
                put(col, v if op == ">=" else None,
                    v if op == "<=" else None)
                continue
            m = re.fullmatch(
                rf"({_ID})\s+IN\s*\(([^)]*)\)", c, re.I
            )
            if m:
                if m.group(1) in spec:
                    raise SqlParseError(
                        f"column {m.group(1)} constrained twice in WHERE"
                    )
                spec[m.group(1)] = [
                    _lit(x) for x in m.group(2).split(",")
                ]
                continue
            raise SqlParseError(
                f"unsupported WHERE clause {c!r}: the bounded verbs "
                "accept col = v, col BETWEEN a AND b, col >= a / "
                "col <= b, col IN (…), AND-combined"
            )
        return spec

    # -- statement handlers ---------------------------------------------

    def _do_update(self, m: re.Match):
        # shared paren/quote-aware comma splitter (expressions carry
        # function calls) — one implementation, matview.py's parser
        # uses the same one
        from .matview import _split_top

        table, set_clause, where = m.group(1), m.group(2), m.group(3)
        self._refuse_matview_target(table, "UPDATE")
        sets: dict[str, str] = {}
        for p in _split_top(set_clause):
            mm = re.fullmatch(rf"\s*({_ID})\s*=\s*(.+?)\s*", p, re.S)
            if not mm:
                raise SqlParseError(f"unsupported SET item {p!r}")
            sets[mm.group(1)] = mm.group(2)
        return self.wh.update_where(table, self._where_spec(where), sets)

    def _do_delete(self, m: re.Match):
        self._refuse_matview_target(m.group(1), "DELETE FROM")
        return self.wh.delete_where(m.group(1), self._where_spec(m.group(2)))

    def _do_insert(self, m: re.Match):
        table, overwrite, cols, body = (
            m.group("table"),
            m.group("ow") is not None,
            m.group("cols"),
            m.group("body").strip(),
        )
        self._refuse_matview_target(table, "INSERT")
        df = self.spark.sql(self._substitute(body))
        if cols:
            names = [c.strip() for c in cols.split(",")]
        elif self.wh.exists(table):
            # SQL INSERT binds POSITIONALLY to the target's columns; a
            # VALUES body's col1/col2 names must not be taken literally
            # (additive schema evolution would silently absorb them as
            # new columns and NULL the real ones)
            names = self.wh.read(table).columns
        else:
            names = list(df.columns)
        if len(names) != len(df.columns):
            raise SqlParseError(
                f"INSERT provides {len(df.columns)} column(s) but the "
                f"target takes {len(names)}: {names}"
            )
        df = df.toDF(*names)
        mode = "overwrite" if overwrite else "append"
        self.wh.fmt.write(table, df, mode)
        return None

    def _do_merge(self, m: re.Match):
        table, t_alias = m.group("table"), m.group("talias")
        self._refuse_matview_target(table, "MERGE INTO")
        src, s_alias = m.group("src").strip(), m.group("salias")
        on = m.group("on").strip()
        clauses = m.group("clauses").strip()
        if src.startswith("("):
            df = self.spark.sql(self._substitute(src[1:-1]))
        elif re.fullmatch(_TBL, src) and self.wh.exists(src):
            df = self.wh.read(src)
        else:
            df = self.spark.sql(f"SELECT * FROM {src}")
        # ON t.k = s.k (aliases optional, either order) — the verb's
        # contract is a same-named unique key on both sides
        om = re.fullmatch(
            rf"(?:({_ID})\.)?({_ID})\s*=\s*(?:({_ID})\.)?({_ID})", on
        )
        if not om or om.group(2) != om.group(4):
            raise SqlParseError(
                "unsupported ON clause: the merge verb upserts by one "
                "same-named unique key — ON t.key = s.key"
            )
        key = om.group(2)
        canon = re.sub(r"\s+", " ", clauses).lower()
        if canon != (
            "when matched then update set * "
            "when not matched then insert *"
        ):
            raise SqlParseError(
                "unsupported MERGE clauses: the verb implements the "
                "canonical upsert — WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        self.wh.fmt.merge(table, df, key)
        return None

    def _do_alter(self, m: re.Match):
        table, action = m.group(1), m.group(2).strip()
        am = re.fullmatch(
            rf"RENAME\s+COLUMN\s+({_ID})\s+TO\s+({_ID})", action, re.I
        )
        if am:
            return self.wh.rename_column(table, am.group(1), am.group(2))
        am = re.fullmatch(rf"DROP\s+COLUMN\s+({_ID})", action, re.I)
        if am:
            return self.wh.drop_column(table, am.group(1))
        am = re.fullmatch(
            rf"ADD\s+CONSTRAINT\s+({_ID})\s+CHECK\s*\((.+)\)", action,
            re.I | re.S,
        )
        if am:
            return self.wh.add_constraint(table, am.group(1), am.group(2))
        am = re.fullmatch(rf"DROP\s+CONSTRAINT\s+({_ID})", action, re.I)
        if am:
            return self.wh.drop_constraint(table, am.group(1))
        am = re.fullmatch(
            r"PARTITION\s+BY\s*\(([^)]*)\)", action, re.I
        )
        if am:
            cols = tuple(
                c.strip() for c in am.group(1).split(",") if c.strip()
            )
            return self.wh.set_partition_spec(table, cols)
        am = re.fullmatch(
            rf"ALTER\s+COLUMN\s+({_ID})\s+(?:SET\s+DATA\s+)?TYPE\s+(.+)",
            action,
            re.I,
        )
        if am:
            return self.wh.widen_column(
                table, am.group(1), am.group(2).strip()
            )
        raise SqlParseError(
            f"unsupported ALTER TABLE action {action!r}: RENAME COLUMN "
            "a TO b | DROP COLUMN c | ADD CONSTRAINT n CHECK (expr) | "
            "DROP CONSTRAINT n | PARTITION BY (cols…) | ALTER COLUMN c "
            "TYPE t (safe widenings)"
        )

    def _do_drop_table(self, m: re.Match):
        if_exists, table = m.group(1) is not None, m.group(2)
        if table in self._matviews():
            raise SqlParseError(
                f"DROP TABLE {table}: target is a MATERIALIZED VIEW — "
                f"use DROP MATERIALIZED VIEW {table}"
            )
        from .matview import is_state_table

        if is_state_table(table):
            raise SqlParseError(
                f"DROP TABLE {table}: materialized-view STATE tables "
                "are engine-internal; DROP MATERIALIZED VIEW removes "
                "definition and state together"
            )
        dropped = self.wh.drop_table(table)
        if not dropped and not if_exists:
            raise ValueError(f"DROP TABLE {table}: no such table")
        return dropped

    def _do_ctas(self, m: re.Match):
        table, body = m.group(1), m.group(2).strip()
        if self.wh.exists(table):
            raise ValueError(
                f"CREATE TABLE {table}: already exists (INSERT OVERWRITE "
                "replaces contents; DROP TABLE first to re-create)"
            )
        if table in self._persisted_views():
            raise ValueError(
                f"CREATE TABLE {table}: a VIEW of that name exists "
                "(DROP VIEW first)"
            )
        if table in self._matviews():
            raise ValueError(
                f"CREATE TABLE {table}: a MATERIALIZED VIEW of that "
                "name exists (DROP MATERIALIZED VIEW first)"
            )
        self.wh.fmt.write(table, self.spark.sql(self._substitute(body)),
                          "overwrite")
        return None

    # -- transactions (r15, VERDICT r14 task 2) -------------------------

    def _txn_verb(self, verb: str):
        fn = getattr(self.wh.fmt, verb, None)
        if fn is None:
            raise SqlParseError(
                "BEGIN/COMMIT/ROLLBACK require the catalog commit-log "
                "format (CatalogManifestFormat) — plain ManifestFormat "
                "has no multi-table atomic flip"
            )
        return fn

    def _do_begin(self, m: re.Match):
        self._txn_verb("begin")()
        return None

    def _do_commit(self, m: re.Match):
        self._txn_verb("commit_txn")()
        return None

    def _do_rollback(self, m: re.Match):
        self._txn_verb("abort_txn")()
        return None

    # -- persisted views (r15, VERDICT r14 task 7) -----------------------

    def _do_create_view(self, m: re.Match):
        replace, name, body = (
            m.group("rep") is not None,
            m.group("name"),
            m.group("body").strip(),
        )
        create = getattr(self.wh.fmt, "create_view", None)
        if create is None:
            raise SqlParseError(
                "CREATE VIEW requires the catalog commit-log format "
                "(CatalogManifestFormat) — view text lives in the "
                "catalog log"
            )
        # validate NOW against the current commits (a view that never
        # resolved should refuse at CREATE, not at first SELECT)
        self.spark.sql(self._substitute(body))
        create(name, body, replace=replace)
        return None

    def _do_drop_view(self, m: re.Match):
        if_exists, name = m.group(1) is not None, m.group(2)
        drop = getattr(self.wh.fmt, "drop_view", None)
        if drop is None:
            raise SqlParseError(
                "DROP VIEW requires the catalog commit-log format "
                "(CatalogManifestFormat)"
            )
        dropped = drop(name)
        if not dropped and not if_exists:
            raise ValueError(f"DROP VIEW {name}: no such view")
        return dropped

    # -- materialized views (r15 tail) -----------------------------------

    def _matview_verb(self, verb: str):
        fn = getattr(self.wh.fmt, verb, None)
        if fn is None:
            raise SqlParseError(
                "MATERIALIZED VIEW DDL requires the catalog commit-log "
                "format (CatalogManifestFormat) — definitions live in "
                "the catalog log"
            )
        return fn

    def _refuse_matview_target(self, table: str, action: str) -> None:
        from .matview import is_state_table

        if table in self._matviews():
            raise SqlParseError(
                f"{action} {table}: target is a MATERIALIZED VIEW — "
                "it is maintained from its source table; write to "
                f"{self._matviews()[table]['source']} and REFRESH "
                f"MATERIALIZED VIEW {table}"
            )
        if is_state_table(table):
            raise SqlParseError(
                f"{action} {table}: materialized-view STATE tables "
                "are engine-internal (partial sums + exactly-once "
                "cursor); DML through them would corrupt the rollup"
            )
        # a persisted VIEW name must never become a DML target either:
        # INSERT/MERGE auto-create their target, which would land a
        # SHADOW TABLE under the view's name — and the read path
        # resolves tables before views, so every later SELECT would
        # silently read the shadow instead of the view (review r15)
        if table in self._persisted_views():
            raise SqlParseError(
                f"{action} {table}: target is a VIEW — DML against a "
                "view would shadow it with a real table; write to its "
                "base tables instead"
            )

    def _do_create_matview(self, m: re.Match):
        from .matview import (
            matview_sync_unchecked,
            next_state_table,
            parse_matview_body,
            state_table_for,
            validate_defn,
        )

        replace, name, opts, body = (
            m.group("rep") is not None,
            m.group("name"),
            (m.group("opts") or "").strip().lower(),
            m.group("body").strip(),
        )
        create = self._matview_verb("create_matview")
        defn = parse_matview_body(body)
        if opts:
            if opts != "realtime":
                raise SqlParseError(
                    f"unsupported WITH option {opts!r}: WITH (REALTIME) "
                    "serves reads as stored-rollup ∪ unsynced source "
                    "tail (Timescale real-time continuous aggregates)"
                )
            defn["realtime"] = True
        if not self.wh.exists(defn["source"]):
            raise ValueError(
                f"CREATE MATERIALIZED VIEW {name}: source table "
                f"{defn['source']} does not exist"
            )
        # refuse BEFORE committing anything: bad column/type surfaces
        # at CREATE (the persisted-view posture), and a name collision
        # must not touch an existing mv's state table
        validate_defn(defn, self.wh.read(defn["source"]).schema)
        old = self._matviews().get(name)
        if old is not None and not replace:
            raise ValueError(
                f"materialized view {name} already exists (CREATE OR "
                "REPLACE MATERIALIZED VIEW to redefine)"
            )
        # bootstrap the state FIRST, under a state name the current
        # definition (if any) does not point to, then commit the
        # definition in ONE catalog flip: readers always resolve a
        # consistent defn+state pair — a crash before the flip leaves
        # the old mv intact plus a harmless orphan state table
        # (review r15; the old create-then-bootstrap order exposed a
        # definition whose reads raised raw missing-table errors)
        defn["state"] = next_state_table(name, old)
        if self.wh.exists(defn["state"]):  # orphan from a crashed CREATE
            self.wh.drop_table(defn["state"])
        sync = matview_sync_unchecked(self.wh, name, defn)
        sync.refresh(self.wh.fmt, defn["source"])
        create(name, defn, replace=replace)
        if old is not None:
            # old state is unreachable after the flip; reclaim it
            self.wh.drop_table(state_table_for(name, old))
        return None

    def _do_drop_matview(self, m: re.Match):
        from .matview import state_table_for

        if_exists, name = m.group(1) is not None, m.group(2)
        drop = self._matview_verb("drop_matview")
        defn = self._matviews().get(name)
        dropped = drop(name)
        if not dropped and not if_exists:
            raise ValueError(
                f"DROP MATERIALIZED VIEW {name}: no such materialized "
                "view"
            )
        if dropped:
            self.wh.drop_table(state_table_for(name, defn))
        return dropped

    def _do_refresh_matview(self, m: re.Match):
        # unchecked: REFRESH doubles as the recovery path for a
        # bootstrap that never completed (sync_from_* bootstraps from
        # a full read when the state table is absent)
        from .matview import matview_sync_unchecked

        name = m.group(1)
        defn = self._matviews().get(name)
        if defn is None:
            raise ValueError(
                f"REFRESH MATERIALIZED VIEW {name}: no such "
                "materialized view"
            )
        # a source whose columns drifted from the definition refuses
        # NAMING the mv instead of surfacing a raw analysis error
        self._check_matview_source(name, defn)
        sync = matview_sync_unchecked(self.wh, name, defn)
        sync.refresh(self.wh.fmt, defn["source"])
        return None

    def _do_vacuum(self, m: re.Match):
        table, hours = m.group(1), m.group(2)
        if hours is not None:
            return self.wh.vacuum(table, keep_hours=float(hours))
        return self.wh.vacuum(table)

    def _do_optimize(self, m: re.Match):
        table, zcols = m.group(1), m.group(2)
        if zcols:
            cols = [c.strip() for c in zcols.split(",") if c.strip()]
            if len(cols) == 1:
                return self.wh.cluster(table, cols[0])
            return self.wh.cluster_zorder(table, tuple(cols))
        # plain OPTIMIZE = unconditional compaction of the sub-target
        # append tail (force=True bypasses the auto threshold, which
        # would otherwise make the statement a silent no-op on a
        # format built with auto_compact_dirs=None — ADVICE r14 #3)
        fn = getattr(self.wh.fmt, "maybe_compact", None)
        if fn is None:
            raise SqlParseError(
                "OPTIMIZE requires a commit-log format"
            )
        return fn(table, force=True)

    def _describe_history(self, table: str) -> DataFrame:
        """``DESCRIBE HISTORY`` (Delta's shape, from the commit log):
        one row per RETAINED version — commit time, entry/segment
        counts, whether the commit recorded row-level change data, the
        live MOR-delete count, and the writer-watermark apps.  All
        metadata reads; bounded by retained versions."""
        import datetime as _dt

        fmt = self.wh.fmt
        rows = []
        for v in sorted(fmt._travelable_versions(table), reverse=True):
            m = fmt._manifest(
                table, v, resolve=False, expand_lists=False
            )
            if m is None:
                continue
            rows.append(
                (
                    int(v),
                    _dt.datetime.utcfromtimestamp(
                        int(m.get("committed_at") or 0)
                    ),
                    len(m.get("entries") or []),
                    len(m.get("segments") or []),
                    bool(m.get("cdc")),
                    len(m.get("dv") or []),
                    sorted((m.get("txn") or {}).keys()),
                )
            )
        return local_rows(
            self.spark,
            rows,
            "version long, committed_at timestamp, entries long, "
            "segments long, has_change_data boolean, mor_deletes long, "
            "txn_apps array<string>",
        )

    def _describe_detail(self, table: str) -> DataFrame:
        """``DESCRIBE DETAIL`` (Delta's shape): one row of current-
        version table metadata — entry/byte counts, partition spec,
        constraint names, MOR-delete count, CDF flag.  Metadata reads
        plus one tree-size walk; no data scan."""
        import datetime as _dt

        fmt = self.wh.fmt
        m = fmt._manifest(table)
        if m is None:
            raise FileNotFoundError(
                f"no committed manifest for table {table}"
            )
        return local_rows(
            self.spark,
            [
                (
                    table,
                    int(m["version"]),
                    _dt.datetime.utcfromtimestamp(
                        int(m.get("committed_at") or 0)
                    ),
                    len(m["entries"]),
                    int(fmt.table_bytes(table)),
                    list(m.get("partition_columns") or []),
                    sorted((m.get("constraints") or {}).keys()),
                    len(m.get("dv") or []),
                    bool(getattr(fmt, "cdf", False)),
                )
            ],
            "table string, version long, committed_at timestamp, "
            "num_entries long, size_bytes long, "
            "partition_columns array<string>, constraints array<string>, "
            "mor_deletes long, cdf boolean",
        )

    def _fsck(self, table: str) -> DataFrame:
        fn = getattr(self.wh.fmt, "fsck", None)
        if fn is None:
            raise SqlParseError("FSCK TABLE requires a commit-log format")
        r = fn(table)
        return local_rows(
            self.spark,
            [
                (
                    r["table"],
                    r["version"],
                    r["entries"],
                    r["missing"],
                    r["orphan_dirs"],
                    r["ok"],
                )
            ],
            "table string, version long, entries long, "
            "missing array<string>, orphan_dirs array<string>, ok boolean",
        )

    # -- entry ------------------------------------------------------------

    _WRITES = (
        (
            re.compile(
                rf"^UPDATE\s+({_TBL})\s+SET\s+(.+?)\s+WHERE\s+(.+)$",
                re.I | re.S,
            ),
            _do_update,
        ),
        (
            re.compile(
                rf"^DELETE\s+FROM\s+({_TBL})\s+WHERE\s+(.+)$", re.I | re.S
            ),
            _do_delete,
        ),
        (
            re.compile(
                rf"^INSERT\s+(?:(?P<ow>OVERWRITE)\s+|INTO\s+)"
                rf"(?P<table>{_TBL})\s*(?:\((?P<cols>[^)]+)\)\s*)?"
                rf"(?P<body>(?:SELECT|VALUES|\().+)$",
                re.I | re.S,
            ),
            _do_insert,
        ),
        (
            re.compile(
                rf"^MERGE\s+INTO\s+(?P<table>{_TBL})"
                rf"(?:\s+(?:AS\s+)?(?P<talias>{_ID}))?"
                rf"\s+USING\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|{_TBL}|{_ID})"
                rf"(?:\s+(?:AS\s+)?(?P<salias>{_ID}))?"
                rf"\s+ON\s+(?P<on>.+?)"
                rf"\s+(?P<clauses>WHEN\s+.+)$",
                re.I | re.S,
            ),
            _do_merge,
        ),
        (
            re.compile(
                rf"^ALTER\s+TABLE\s+({_TBL})\s+(.+)$", re.I | re.S
            ),
            _do_alter,
        ),
        (
            re.compile(
                rf"^DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_TBL})$", re.I
            ),
            _do_drop_table,
        ),
        (
            re.compile(
                rf"^CREATE\s+TABLE\s+({_TBL})\s+AS\s+(.+)$", re.I | re.S
            ),
            _do_ctas,
        ),
        (
            re.compile(
                rf"^CREATE\s+(?:(?P<rep>OR\s+REPLACE)\s+)?MATERIALIZED\s+"
                rf"VIEW\s+(?P<name>{_TBL})\s*"
                rf"(?:WITH\s*\((?P<opts>[^)]*)\)\s*)?AS\s+(?P<body>.+)$",
                re.I | re.S,
            ),
            _do_create_matview,
        ),
        (
            re.compile(
                rf"^DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?"
                rf"({_TBL})$",
                re.I,
            ),
            _do_drop_matview,
        ),
        (
            re.compile(
                rf"^REFRESH\s+MATERIALIZED\s+VIEW\s+({_TBL})$", re.I
            ),
            _do_refresh_matview,
        ),
        (
            re.compile(
                rf"^CREATE\s+(?:(?P<rep>OR\s+REPLACE)\s+)?VIEW\s+"
                rf"(?P<name>{_TBL})\s+AS\s+(?P<body>.+)$",
                re.I | re.S,
            ),
            _do_create_view,
        ),
        (
            re.compile(
                rf"^DROP\s+VIEW\s+(IF\s+EXISTS\s+)?({_TBL})$", re.I
            ),
            _do_drop_view,
        ),
        (re.compile(r"^(?:BEGIN|START)(?:\s+TRANSACTION)?$", re.I), _do_begin),
        (re.compile(r"^COMMIT(?:\s+TRANSACTION)?$", re.I), _do_commit),
        (
            re.compile(r"^ROLLBACK(?:\s+TRANSACTION)?$", re.I),
            _do_rollback,
        ),
        (
            re.compile(
                rf"^VACUUM\s+({_TBL})"
                rf"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?$",
                re.I,
            ),
            _do_vacuum,
        ),
        (
            re.compile(
                rf"^OPTIMIZE\s+({_TBL})"
                rf"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?$",
                re.I,
            ),
            _do_optimize,
        ),
    )

    def sql(self, text: str):
        """Execute one statement.  Reads return a DataFrame; writes
        dispatch to the warehouse verb and return its result."""
        stmt = text.strip().rstrip(";").strip()
        head = stmt.split(None, 1)[0].upper() if stmt else ""
        if head in ("SELECT", "WITH", "VALUES"):
            return self.spark.sql(self._substitute(stmt))
        m = re.fullmatch(
            rf"DESCRIBE\s+HISTORY\s+({_TBL})", stmt, re.I
        )
        if m:
            return self._describe_history(m.group(1))
        m = re.fullmatch(
            rf"DESCRIBE\s+DETAIL\s+({_TBL})", stmt, re.I
        )
        if m:
            return self._describe_detail(m.group(1))
        m = re.fullmatch(rf"FSCK\s+TABLE\s+({_TBL})", stmt, re.I)
        if m:
            return self._fsck(m.group(1))
        if re.fullmatch(r"SHOW\s+TABLES", stmt, re.I):
            return local_rows(
                self.spark,
                [(t,) for t in sorted(self.wh.tables())] or [("",)],
                "table string",
            ).filter("table != ''")
        if re.fullmatch(r"SHOW\s+MATERIALIZED\s+VIEWS", stmt, re.I):
            import json as _json

            return local_rows(
                self.spark,
                [
                    (
                        n,
                        d.get("source", ""),
                        bool(d.get("realtime")),
                        _json.dumps(d.get("aggs", [])),
                    )
                    for n, d in sorted(self._matviews().items())
                ]
                or [("", "", False, "")],
                "matview string, source string, realtime boolean, "
                "aggs string",
            ).filter("matview != ''")
        if re.fullmatch(r"SHOW\s+VIEWS", stmt, re.I):
            return local_rows(
                self.spark,
                [
                    (n, s)
                    for n, s in sorted(self._persisted_views().items())
                ]
                or [("", "")],
                "view string, text string",
            ).filter("view != ''")
        for pat, handler in self._WRITES:
            m = pat.match(stmt)
            if m:
                return handler(self, m)
        raise SqlParseError(
            f"unsupported statement (starts {head!r}): SELECT/WITH/"
            "VALUES pass through; UPDATE / DELETE / INSERT / MERGE / "
            "ALTER TABLE / CREATE [OR REPLACE] [MATERIALIZED] VIEW / "
            "DROP [MATERIALIZED] VIEW / REFRESH MATERIALIZED VIEW / "
            "BEGIN / COMMIT / ROLLBACK dispatch to warehouse verbs in "
            "their canonical forms (see class docstring)"
        )
