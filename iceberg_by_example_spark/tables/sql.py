"""SQL-string facade over the versioned-table engine.

The reference drives EVERYTHING through ``spark.sql`` strings: MERGE
INTO (`IcebergLoadActivityTask.scala:68-76`), ``VERSION AS OF 'day1'``
time travel (LT:114, 128-149), branch DDL (LT:78-80, WI:85), CALL
procedures (LT:156-165, WI:81), CREATE/DROP TABLE with TBLPROPERTIES
(LT:15-40), and metadata-table suffixes (``t.history``, LT:84-97).
This module accepts those literal statement shapes and dispatches them
to :class:`VersionedTable` — so a user can paste the reference's
README queries (RM:52-114) unchanged.

It is deliberately a THIN statement-shape dispatcher, not a SQL
parser: the handful of DDL/DML shapes above are matched by grammar-
anchored regexes; **everything else falls through to Catalyst**
(``spark.sql``) after versioned-table references are rewritten to temp
views. Query planning, joins, aggregation, and expression semantics
stay 100% Spark — the facade only resolves which snapshot each table
name denotes (the same division of labor as Iceberg's own SQL
extensions, where the parser delegates to Spark for everything but the
branch/procedure grammar).

Usage::

    engine = SqlEngine(spark)
    engine.sql("select * from iceberg.finance.activity VERSION AS OF 'day1' where txn_id='txn10'")
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.tables.catalog import Catalog
from iceberg_by_example_spark.tables.versioned import MAIN, VersionedTable

_METADATA_RELATIONS = {
    "history",
    "snapshots",
    "files",
    "refs",
    "manifests",
    "metadata_log_entries",
}

_IDENT = r"[A-Za-z_]\w*"
# Three-part dotted table name — catalog.db.table, the reference's
# shape (LT:14). Matching exactly three parts keeps bare aliases and
# qualified column refs (t.col) from ever looking like tables.
_NAME = rf"{_IDENT}(?:\.{_IDENT}){{2}}"


def _flags():
    return re.IGNORECASE | re.DOTALL


class SqlEngine:
    """Executes the reference's SQL statement shapes against
    VersionedTable, falling through to ``spark.sql`` for queries."""

    def __init__(self, spark: SparkSession, catalog: Catalog | None = None):
        self.spark = spark
        self.catalog = catalog or Catalog()

    # -- public entry ---------------------------------------------------------

    def sql(self, statement: str) -> DataFrame | None:
        stmt = statement.strip().rstrip(";").strip()
        for matcher, handler in self._HANDLERS:
            m = matcher(stmt)
            if m:
                return handler(self, m)
        # Everything else (SELECT, CTE, set ops, …): rewrite versioned-
        # table references to temp views, then let Catalyst do its job.
        return self.spark.sql(self._rewrite_table_refs(stmt))

    # -- table resolution -----------------------------------------------------

    def _table(self, name: str) -> VersionedTable:
        return VersionedTable.load(
            self.spark, self.catalog.resolve(name.replace("`", ""))
        )

    def _table_exists(self, name: str) -> bool:
        import os

        loc = self.catalog.resolve(name.replace("`", ""))
        return os.path.exists(os.path.join(loc, "_meta", "table.json"))

    # -- DDL ------------------------------------------------------------------

    def _h_drop_table(self, m: re.Match) -> None:
        name = m.group("name")
        if not self._table_exists(name):
            if m.group("ife"):
                return None
            raise ValueError(f"no such table: {name}")
        self._table(name).drop()
        return None

    def _h_create_table(self, m: re.Match) -> None:
        """CREATE TABLE [IF NOT EXISTS] t (cols…) USING iceberg
        [TBLPROPERTIES('k'='v', …)] [PARTITIONED BY (col)] (LT:17-40)."""
        name, body = m.group("name"), m.group("cols")
        schema = " ".join(body.split())  # collapse newlines/indentation
        props = dict(
            re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("props") or "")
        )
        partition_by = m.group("part")
        VersionedTable.create(
            self.spark,
            self.catalog.resolve(name),
            schema=schema,
            partition_by=partition_by,
            properties=props,
            if_not_exists=bool(m.group("ine")),
        )
        return None

    def _h_ctas(self, m: re.Match) -> None:
        """CREATE OR REPLACE TABLE t USING iceberg [PARTITIONED BY (c)]
        AS <select> — the reference's schema-only staging CTAS uses
        ``AS select * from t limit 0`` (LT:45-49)."""
        from iceberg_by_example_spark.util import detach

        name = m.group("name")
        # Pin the SELECT's result BEFORE any drop: a self-referencing
        # REPLACE ("create or replace table t ... as select * from t")
        # must read the OLD table, and the lazily-built plan would
        # otherwise execute only after drop() had deleted its input
        # files (non-atomic data loss). Pinning also means the query
        # runs exactly once — the isEmpty probe and the append both
        # read the materialized blocks.
        df = detach(self.spark.sql(self._rewrite_table_refs(m.group("select"))))
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        if self._table_exists(name):
            self._table(name).drop()
        t = VersionedTable.create(
            self.spark,
            self.catalog.resolve(name),
            schema=schema,
            partition_by=m.group("part"),
        )
        if not df.isEmpty():
            t.append(df)
        return None

    def _h_branch_ddl(self, m: re.Match) -> None:
        """ALTER TABLE t CREATE OR REPLACE BRANCH/TAG x / DROP BRANCH/TAG x
        (LT:78-80, LT:167, WI:85; tags are Iceberg's immutable refs)."""
        t = self._table(m.group("name"))
        ref = m.group("branch").replace("`", "")
        op = m.group("op").lower()
        kind = m.group("kind").lower()
        if op.startswith("create"):
            if kind == "tag":
                t.create_tag(ref, replace="replace" in op)
            else:
                t.create_branch(ref)
        elif kind == "tag":
            t.drop_tag(ref)
        else:
            t.drop_branch(ref)
        return None

    # -- MERGE ----------------------------------------------------------------

    def _h_merge(self, m: re.Match) -> None:
        """MERGE INTO t [AS target] USING s [AS src] ON target.k=src.k
        WHEN MATCHED THEN UPDATE SET target.c=src.c, … WHEN NOT MATCHED
        THEN INSERT * — the reference's exact upsert shape (LT:68-76).
        The ON clause must be an equality on one shared column and the
        SET list ``target.c = src.c`` pairs (the shapes the reference
        uses); anything fancier belongs in the DataFrame API."""
        target_name = m.group("t")
        t_alias = m.group("ta") or target_name
        s_alias = m.group("sa") or m.group("s")

        on = m.group("on").strip()
        om = re.fullmatch(
            rf"(?:{re.escape(t_alias)}|{re.escape(s_alias)})\.(?P<k1>{_IDENT})"
            rf"\s*=\s*(?:{re.escape(t_alias)}|{re.escape(s_alias)})\.(?P<k2>{_IDENT})",
            on,
            re.IGNORECASE,
        )
        if not om or om.group("k1").lower() != om.group("k2").lower():
            raise ValueError(f"unsupported MERGE ON clause: {on!r}")
        key = om.group("k1")

        if m.group("sets").strip() == "*":
            # WHEN MATCHED THEN UPDATE SET * — update every column
            self._table(target_name).merge(
                self._read_relation(m.group("s")), on=key
            )
            return None
        update_cols = []
        for assign in m.group("sets").split(","):
            am = re.fullmatch(
                rf"\s*{re.escape(t_alias)}\.(?P<c1>{_IDENT})\s*=\s*"
                rf"{re.escape(s_alias)}\.(?P<c2>{_IDENT})\s*",
                assign,
                re.IGNORECASE,
            )
            if not am or am.group("c1").lower() != am.group("c2").lower():
                raise ValueError(f"unsupported MERGE SET clause: {assign!r}")
            update_cols.append(am.group("c1"))

        source = self._read_relation(m.group("s"))
        self._table(target_name).merge(source, on=key, update_cols=update_cols)
        return None

    def _read_relation(self, name: str) -> DataFrame:
        """A MERGE source: a versioned table, or any Spark-readable
        relation (temp view) as fallback."""
        if self._table_exists(name):
            return self._table(name).read()
        return self.spark.table(name)

    # -- CALL procedures ------------------------------------------------------

    def _h_call(self, m: re.Match) -> DataFrame | None:
        """CALL [catalog.]system.<proc>(args) — the procedures the
        reference calls (LT:156-165, WI:81). Args may be positional or
        ``name => value``."""
        proc = m.group("proc").lower()
        pos, kw = self._parse_call_args(m.group("args") or "")

        def arg(name: str, idx: int, default=None):
            if name in kw:
                return kw[name]
            return pos[idx] if idx < len(pos) else default

        if proc == "fast_forward":
            # call …fast_forward('tbl', 'main', 'feature_branch') (WI:81)
            t = self._table(arg("table", 0))
            t.fast_forward(arg("branch", 1), arg("to", 2))
            return None
        t = self._table(arg("table", 0))
        if proc == "rollback_to_snapshot":
            t.rollback(arg("snapshot_id", 1))
            return None
        if proc == "cherrypick_snapshot":
            # Iceberg's result: (source_snapshot_id, current_snapshot_id)
            snap = t.cherrypick_snapshot(arg("snapshot_id", 1))
            return self.spark.createDataFrame(
                [(snap.summary["published-wap-id"], snap.snapshot_id)],
                "source_snapshot_id string, current_snapshot_id string",
            )
        if proc == "remove_orphan_files":
            dry = str(arg("dry_run", 1, "false")).lower() == "true"
            orphans = t.remove_orphan_files(dry_run=dry)
            return self.spark.createDataFrame(
                [(o,) for o in orphans], "orphan_file_location string"
            )
        if proc == "rewrite_data_files":
            # Iceberg signature: (table, strategy, sort_order, options)
            # — the reference passes all four (LT:159). Unknown values
            # raise: silently dropping an argument the caller spelled
            # out is worse than rejecting it.
            strategy = (arg("strategy", 1) or "sort").lower()
            if strategy not in ("sort", "binpack"):
                raise ValueError(
                    f"unsupported rewrite strategy: {strategy!r}"
                )
            opts = self._parse_map_literal(arg("options", 3, "") or "")
            unknown = set(opts) - {"delete-file-threshold"}
            if unknown:
                raise ValueError(
                    f"unsupported rewrite_data_files options: {sorted(unknown)}"
                )
            thr = opts.get("delete-file-threshold")
            thr = int(thr) if thr is not None else None
            raw_order = arg("sort_order", 2)
            zm = raw_order and re.match(
                r"(?i)^\s*zorder\s*\((.*)\)\s*$", raw_order
            )
            if zm:
                # Iceberg's spelling: sort_order => 'zorder(c1, c2)'
                t.rewrite_data_files(
                    zorder_by=[c.strip() for c in zm.group(1).split(",")],
                    delete_file_threshold=thr,
                )
            else:
                t.rewrite_data_files(
                    sort_order=(
                        self._parse_sort_order(raw_order)
                        if strategy == "sort"
                        else None
                    ),
                    delete_file_threshold=thr,
                )
            return None
        if proc == "rewrite_manifests":
            removed = t.rewrite_manifests()
            return self.spark.createDataFrame(
                [(removed,)], "rewritten_manifests_count int"
            )
        if proc == "rewrite_position_delete_files":
            # Iceberg's MoR-overlay compaction procedure: consolidates
            # per-mutation delete files, drops dangling rows. Returns
            # the same counts Iceberg's procedure reports.
            snap = t.rewrite_position_delete_files()
            s = snap.summary
            return self.spark.createDataFrame(
                [
                    (
                        int(s.get("rewritten-delete-files", 0)),
                        int(s.get("added-delete-files", 0)),
                    )
                ],
                "rewritten_delete_files_count int, "
                "added_delete_files_count int",
            )
        if proc == "create_changelog_view":
            # Iceberg's spelling: CALL …create_changelog_view(
            #   table => 't', changelog_view => 'v'
            #   [, options => map('start-snapshot-id','…',
            #                     'end-snapshot-id','…')])
            view = arg("changelog_view", 1) or "changelog_view"
            opts = self._parse_map_literal(arg("options", 2, "") or "")
            df = t.changelog(
                from_snapshot_id=opts.get("start-snapshot-id"),
                to_snapshot_id=opts.get("end-snapshot-id"),
            )
            df.createOrReplaceTempView(view)
            return self.spark.createDataFrame([(view,)], "changelog_view string")
        if proc == "expire_snapshots":
            older = arg("older_than", 1)
            retain = int(arg("retain_last", 2, 3))
            expired = t.expire_snapshots(
                older_than=self._parse_ts_ms(older), retain_last=retain
            )
            return self.spark.createDataFrame(
                [(e,) for e in expired], "expired_snapshot_id string"
            )
        raise ValueError(f"unknown procedure: {proc}")

    @staticmethod
    def _split_top_level(raw: str) -> list[str]:
        """Split on commas at paren depth 0, outside quotes — so nested
        call arguments (``options => map('k', 'v')``) stay whole."""
        parts, cur, depth, in_quote = [], [], 0, False
        for ch in raw:
            if ch == "'":
                in_quote = not in_quote
            elif not in_quote:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts.append("".join(cur))
                    cur = []
                    continue
            cur.append(ch)
        if "".join(cur).strip():
            parts.append("".join(cur))
        return parts

    @staticmethod
    def _parse_call_args(raw: str) -> tuple[list[str], dict[str, str]]:
        pos, kw = [], {}
        for piece in SqlEngine._split_top_level(raw):
            piece = piece.strip()
            if not piece:
                continue
            km = re.match(rf"({_IDENT})\s*=>\s*(.+)$", piece, re.DOTALL)
            if km:
                kw[km.group(1).lower()] = SqlEngine._unquote(km.group(2))
            else:
                pos.append(SqlEngine._unquote(piece))
        return pos, kw

    @staticmethod
    def _unquote(v: str) -> str:
        v = v.strip()
        tm = re.match(r"(?i)^timestamp\s+'([^']*)'$", v)
        if tm:
            return tm.group(1)
        if len(v) >= 2 and v[0] == v[-1] == "'":
            return v[1:-1]
        return v

    @staticmethod
    def _parse_ts_ms(v: str | None) -> float | None:
        """``TIMESTAMP 'yyyy-MM-dd HH:mm:ss[.SSS]'`` → epoch millis
        (local time, like the reference's formatted now(), LT:162)."""
        if v is None:
            return None
        import datetime as dt

        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                return dt.datetime.strptime(v, fmt).timestamp() * 1000
            except ValueError:
                continue
        raise ValueError(f"unparseable timestamp: {v!r}")

    @staticmethod
    def _parse_map_literal(raw: str) -> dict[str, str]:
        """``map('k1','v1','k2','v2')`` → dict (Iceberg's CALL-arg map
        spelling, reference F4/LT:159). Empty input → {}."""
        m = re.match(r"(?is)^\s*map\s*\((.*)\)\s*$", raw.strip())
        if not m:
            return {}
        items = [
            SqlEngine._unquote(p) for p in SqlEngine._split_top_level(m.group(1))
        ]
        if len(items) % 2:
            raise ValueError(f"map literal needs even arg count: {raw!r}")
        return dict(zip(items[::2], items[1::2]))

    @staticmethod
    def _parse_sort_order(raw: str | None):
        """'account ASC NULLS LAST, txn_id DESC NULLS FIRST' (LT:159)
        → Spark sort Columns."""
        if not raw:
            return None
        cols = []
        for piece in raw.split(","):
            toks = piece.split()
            col, mods = toks[0], [t.upper() for t in toks[1:]]
            desc = "DESC" in mods
            nulls_first = ("NULLS" in mods and "FIRST" in mods) or (
                "NULLS" not in mods and desc
            )
            c = F.col(col)
            if desc:
                c = c.desc_nulls_first() if nulls_first else c.desc_nulls_last()
            else:
                c = c.asc_nulls_first() if nulls_first else c.asc_nulls_last()
            cols.append(c)
        return cols

    # -- SELECT rewriting -----------------------------------------------------

    def _rewrite_table_refs(self, stmt: str) -> str:
        """Replace every versioned-table reference — ``cat.db.table``,
        ``cat.db.table VERSION AS OF 'x'``, ``cat.db.table.<metadata>``
        — with a temp view bound to the right snapshot/relation.
        Non-matching identifiers (functions, column refs, real temp
        views) pass through untouched because resolution only fires
        when the named table actually exists in the catalog's
        warehouse; the full name is tried as a table BEFORE its last
        segment is interpreted as a metadata suffix, so a table
        literally named ``cat.db.files`` still resolves. References
        inside single-quoted string literals are never rewritten."""
        pattern = re.compile(
            rf"(?P<name>{_NAME}(?:\.(?:{'|'.join(_METADATA_RELATIONS)}))?)"
            rf"(?:\s+(?P<kind>version|timestamp)\s+as\s+of\s+'(?P<ver>[^']+)')?",
            _flags(),
        )
        # spans of single-quoted literals ('' = escaped quote): a table
        # reference can't START inside one.
        quoted = [
            m.span() for m in re.finditer(r"'(?:[^']|'')*'", stmt)
        ]

        def repl(m: re.Match) -> str:
            if any(a < m.start() < b for a, b in quoted):
                return m.group(0)
            name, ver = m.group("name"), m.group("ver")
            meta = None
            base = name
            last = name.rsplit(".", 1)[-1].lower()
            if not self._table_exists(base) and last in _METADATA_RELATIONS:
                base = name.rsplit(".", 1)[0]
                meta = last
            if not self._table_exists(base):
                return m.group(0)
            t = self._table(base)
            kind = (m.group("kind") or "").lower()
            if meta is not None:
                df = getattr(t, meta)()
            elif ver is not None and kind == "timestamp":
                df = t.read(as_of_ms=self._parse_ts_ms(ver))
            elif ver is not None:
                named = set(t.branches()) | set(t.tags())
                df = (
                    t.read(branch=ver)
                    if ver in named
                    else t.read(snapshot_id=ver)
                )
            else:
                df = t.read()
            key = hashlib.md5(
                f"{t.location}|{meta}|{kind}|{ver}".encode()
            ).hexdigest()[:10]
            view = f"__vt_{key}"
            df.createOrReplaceTempView(view)
            return view

        return pattern.sub(repl, stmt)

    # -- dispatch table -------------------------------------------------------

    _HANDLERS = [
        (
            lambda s: re.fullmatch(
                rf"drop\s+table\s+(?P<ife>if\s+exists\s+)?(?P<name>`?{_NAME}`?)",
                s,
                _flags(),
            ),
            _h_drop_table,
        ),
        (
            lambda s: re.fullmatch(
                rf"create\s+or\s+replace\s+table\s+(?P<name>{_NAME})\s+"
                rf"using\s+iceberg\s*(?:partitioned\s+by\s*\((?P<part>{_IDENT})\)\s*)?"
                rf"as\s+(?P<select>.+)",
                s,
                _flags(),
            ),
            _h_ctas,
        ),
        (
            lambda s: re.fullmatch(
                rf"create\s+table\s+(?P<ine>if\s+not\s+exists\s+)?(?P<name>{_NAME})\s*"
                rf"\((?P<cols>.*?)\)\s*using\s+iceberg\s*"
                rf"(?:tblproperties\s*\((?P<props>.*?)\)\s*)?"
                rf"(?:partitioned\s+by\s*\((?P<part>{_IDENT})\)\s*)?",
                s,
                _flags(),
            ),
            _h_create_table,
        ),
        (
            lambda s: re.fullmatch(
                rf"alter\s+table\s+(?P<name>{_NAME})\s+"
                rf"(?P<op>create(?:\s+or\s+replace)?|drop)\s+"
                rf"(?P<kind>branch|tag)\s+"
                rf"(?P<branch>`?{_IDENT}`?)",
                s,
                _flags(),
            ),
            _h_branch_ddl,
        ),
        (
            lambda s: re.fullmatch(
                rf"merge\s+into\s+(?P<t>{_NAME})(?:\s+as\s+(?P<ta>{_IDENT}))?\s+"
                rf"using\s+(?P<s>{_NAME})(?:\s+as\s+(?P<sa>{_IDENT}))?\s+"
                rf"on\s+(?P<on>.+?)\s+"
                rf"when\s+matched\s+then\s+update\s+set\s+(?P<sets>.+?)\s+"
                rf"when\s+not\s+matched\s+then\s+insert\s+\*",
                s,
                _flags(),
            ),
            _h_merge,
        ),
        (
            lambda s: re.fullmatch(
                rf"call\s+(?:{_IDENT}\.)?system\.(?P<proc>{_IDENT})\s*"
                rf"\((?P<args>.*)\)",
                s,
                _flags(),
            ),
            _h_call,
        ),
    ]
