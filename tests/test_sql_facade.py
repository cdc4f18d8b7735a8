"""SQL-facade golden tests: the reference's literal statements, pasted.

Replays IcebergLoadActivityTask's daily lifecycle (LT:43-82) driving
every step through SQL strings — CREATE TABLE with TBLPROPERTIES,
schema-only staging CTAS, MERGE INTO, branch DDL, VERSION AS OF reads,
CALL procedures — and asserts the README's published category flips
(RM:52-114). Because the CREATE declares merge-on-read update/merge
modes (LT:30-31), this lifecycle also exercises the position-delete
write path end-to-end.
"""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_by_example_spark.sources.activity import (
    REFERENCE_INPUT_DIR,
    read_activity_csv,
)
from iceberg_by_example_spark.tables.catalog import Catalog
from iceberg_by_example_spark.tables.sql import SqlEngine
from iceberg_by_example_spark.tables.versioned import VersionedTable

TABLE = "iceberg.finance.activity"

# The reference's CREATE TABLE, verbatim shape (LT:17-40).
CREATE_STMT = f"""create table if not exists {TABLE}(
account string,
txn_date date,
txn_id string,
merchant string,
amount double,
category string,
last_updated timestamp
) USING iceberg
TBLPROPERTIES(
   'write.wap.enabled'='true',
   'write.delete.mode'='copy-on-write',
   'write.update.mode'='merge-on-read',
   'write.merge.mode'='merge-on-read',
   'read.parquet.vectorization.enabled'='true',
   'write.format.default'='parquet',
   'write.parquet.compression-codec'='zstd',
   'comment'='Transaction Table'
)
partitioned by (txn_date) """

DAYS = [
    ("2024-03-02", "day1", 15),
    ("2024-03-03", "day2", 30),
    ("2024-03-05", "day3", 45),
    ("2024-03-08", "day4", 47),
    ("2024-03-09", "day5", 50),
]


def load_day(eng: SqlEngine, day: str, branch: str) -> None:
    """loadDataFile (LT:43-82) with every statement as SQL."""
    eng.sql(
        f"""create or replace table iceberg.finance.activity_tmp USING iceberg
            PARTITIONED BY (txn_date)
            AS select * from {TABLE} limit 0"""
    )
    batch = read_activity_csv(
        eng.spark, os.path.join(REFERENCE_INPUT_DIR, day)
    )
    VersionedTable.load(
        eng.spark, eng.catalog.resolve("iceberg.finance.activity_tmp")
    ).append(batch)
    eng.sql(
        f"""MERGE INTO {TABLE} as target
            USING iceberg.finance.activity_tmp as src
            ON target.txn_id = src.txn_id
            WHEN MATCHED THEN
             UPDATE SET target.amount = src.amount, target.category = src.category, target.last_updated = src.last_updated, target.txn_date = src.txn_date
            WHEN NOT MATCHED THEN
             INSERT *"""
    )
    eng.sql(f"ALTER TABLE {TABLE} CREATE OR REPLACE BRANCH `{branch}`")
    eng.sql("DROP TABLE iceberg.finance.activity_tmp")


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("sql_warehouse"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    eng.sql(f"drop table if exists {TABLE}")
    eng.sql(CREATE_STMT)
    for day, branch, _n in DAYS:
        load_day(eng, day, branch)
    return eng


def test_counts_per_version(engine):
    """countTableData (LT:113-123): day1..day5 = 15/30/45/47/50."""
    for _day, branch, expected in DAYS:
        got = engine.sql(
            f"select * from {TABLE} VERSION AS OF '{branch}'"
        ).count()
        assert got == expected, branch
    assert engine.sql(f"select * from {TABLE}").count() == 50


def test_txn10_category_flip(engine):
    """README RM:58-88: txn10 Jewellery@day1 → Fashion@day5/latest."""
    day1 = engine.sql(
        f"select * from {TABLE} VERSION AS OF 'day1' where txn_id='txn10'"
    ).collect()
    assert len(day1) == 1 and day1[0]["category"] == "Jewellery"
    assert day1[0]["merchant"] == "Prouds Jewellery"
    assert day1[0]["amount"] == 189.0

    day5 = engine.sql(
        f"select * from {TABLE} VERSION AS OF 'day5' where txn_id='txn10'"
    ).collect()
    assert len(day5) == 1 and day5[0]["category"] == "Fashion"

    latest = engine.sql(
        f"select * from {TABLE} where txn_id='txn10'"
    ).collect()
    assert len(latest) == 1 and latest[0]["category"] == "Fashion"
    # CSV stores 2024-03-07T13:00:00Z (the README renders it in local
    # time as 2024-03-08 00:00:00); session TZ is pinned UTC.
    assert str(latest[0]["last_updated"]).startswith("2024-03-07 13:00")


def test_txn44_category_flip(engine):
    """README RM:90-114: Apple Store Sydney Hardware@day3 → Phone."""
    q = (
        "select * from {t}{v} where account = 'acc5' and "
        "txn_date=cast('2024-03-05' as date) and merchant='Apple Store Sydney'"
    )
    day3 = engine.sql(q.format(t=TABLE, v=" VERSION as of 'day3'")).collect()
    assert len(day3) == 1 and day3[0]["category"] == "Hardware"
    latest = engine.sql(q.format(t=TABLE, v="")).collect()
    assert len(latest) == 1 and latest[0]["category"] == "Phone"


def test_group_by_account(engine):
    """README RM:43-47: aggregation over the facade-resolved table."""
    rows = engine.sql(
        f"select account, count(*) as activity_count from {TABLE} "
        "group by account"
    ).collect()
    counts = {r["account"]: r["activity_count"] for r in rows}
    assert sum(counts.values()) == 50
    assert len(counts) >= 5


def test_metadata_suffix_tables(engine):
    """printTableMetadata (LT:84-97): suffix relations resolve in SQL."""
    for rel in ("history", "snapshots", "manifests", "files",
                "metadata_log_entries"):
        assert engine.sql(f"SELECT * from {TABLE}.{rel}").count() > 0, rel


def test_merge_was_merge_on_read(engine):
    """The CREATE declared write.merge.mode=merge-on-read (LT:31):
    the daily MERGEs after the first must have committed position
    deletes, not rewritten data files."""
    t = VersionedTable.load(engine.spark, engine.catalog.resolve(TABLE))
    assert t._current().delete_files, "expected a live MoR delete overlay"
    merges = [s for s in t._snapshots() if s.operation == "merge"]
    assert any(s.summary.get("mode") == "merge-on-read" for s in merges)


def test_call_procedures_and_cleanup(engine):
    """cleanupMetadata (LT:156-165) + WAP publish CALL (WI:81), with
    the reference's literal CALL argument shapes."""
    eng = engine
    dry = eng.sql(
        f"call iceberg.system.remove_orphan_files(table => '{TABLE}', dry_run => true)"
    )
    assert dry.columns == ["orphan_file_location"]
    eng.sql(
        f"call iceberg.system.rewrite_data_files(table => '{TABLE}', "
        "strategy => 'sort', sort_order => 'account ASC NULLS LAST, txn_id DESC NULLS FIRST',  "
        "options => map('delete-file-threshold', '1'))"
    )
    # compaction materialized the MoR overlay
    t = VersionedTable.load(eng.spark, eng.catalog.resolve(TABLE))
    assert t._current().delete_files == []
    eng.sql(f"call iceberg.system.rewrite_manifests('{TABLE}')")
    eng.sql(
        f"call iceberg.system.expire_snapshots(table => '{TABLE}', "
        "older_than => TIMESTAMP '2030-01-01 00:00:00.000', retain_last => 3)"
    )
    eng.sql(f"call iceberg.system.remove_orphan_files(table => '{TABLE}')")
    # the published answers survive maintenance
    assert eng.sql(f"select * from {TABLE}").count() == 50
    row = eng.sql(f"select * from {TABLE} where txn_id='txn10'").collect()[0]
    assert row["category"] == "Fashion"
    # branch DDL: drop one of the day branches (LT:167)
    eng.sql(f"ALTER TABLE {TABLE} DROP BRANCH `day1`")
    assert "day1" not in VersionedTable.load(
        eng.spark, eng.catalog.resolve(TABLE)
    ).branches()


def test_wap_fast_forward_sql(spark, tmp_path_factory):
    """WapIceberg (WI:20-87) via SQL: append on a WAP branch, audit,
    CALL fast_forward positional args, drop branch."""
    wh = str(tmp_path_factory.mktemp("wap_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    tbl = "iceberg.finance.activity2"
    eng.sql(CREATE_STMT.replace(TABLE, tbl))
    t = VersionedTable.load(spark, eng.catalog.resolve(tbl))
    from iceberg_by_example_spark.tables.versioned import wap_session

    with wap_session(spark, "feature_branch"):
        batch = read_activity_csv(
            spark, os.path.join(REFERENCE_INPUT_DIR, "2024-03-02")
        )
        t.append(batch)
        audited = eng.sql(
            f"select * from {tbl} version as of 'feature_branch'"
        )
        assert audited.count() == 15
    # main unchanged until published
    assert eng.sql(f"select * from {tbl}").count() == 0
    eng.sql(
        f"call iceberg.system.fast_forward('{tbl}', 'main', 'feature_branch')"
    )
    eng.sql(f"alter table {tbl} drop branch feature_branch")
    assert eng.sql(f"select * from {tbl}").count() == 15


def test_catalog_env_warehouse(spark, tmp_path, monkeypatch):
    """G12 shim: CATALOG_WAREHOUSE env root (IS:6-9) resolves dotted
    names in VersionedTable.create/load directly."""
    monkeypatch.setenv("CATALOG_WAREHOUSE", str(tmp_path))
    t = VersionedTable.create(
        spark, "iceberg.finance.envtab", schema="id bigint, v string"
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"))
    loaded = VersionedTable.load(spark, "iceberg.finance.envtab")
    assert loaded.read().count() == 2
    assert loaded.location.startswith(str(tmp_path))


def test_self_referencing_ctas_reads_old_table(spark, tmp_path_factory):
    """CREATE OR REPLACE TABLE t AS SELECT * FROM t must materialize
    the SELECT before the drop — otherwise the lazy plan executes
    against deleted files (non-atomic data loss)."""
    wh = str(tmp_path_factory.mktemp("ctas_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.selfref"), schema="id bigint"
    )
    t.append(spark.range(0, 7))
    eng.sql(
        "create or replace table iceberg.db.selfref USING iceberg "
        "as select * from iceberg.db.selfref"
    )
    assert eng.sql("select * from iceberg.db.selfref").count() == 7


def test_rewrite_skips_quoted_literals(spark, tmp_path_factory):
    """A table name inside a string literal is data, not a reference."""
    wh = str(tmp_path_factory.mktemp("quote_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.names"), schema="v string"
    )
    t.append(
        spark.createDataFrame([("iceberg.db.names",), ("other",)], "v string")
    )
    rows = eng.sql(
        "select * from iceberg.db.names where v = 'iceberg.db.names'"
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] == "iceberg.db.names"


def test_mor_table_survives_relocation(spark, tmp_path):
    """Delete files store table-relative paths, so moving the table
    directory keeps the overlay (absolute URIs would silently
    resurrect deleted rows)."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    old = str(tmp_path / "before_move")
    t = VersionedTable.create(
        spark,
        old,
        schema="id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(
        spark.range(0, 100).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    t.delete(F.col("id") < 40)
    assert t.read().count() == 60
    new = str(tmp_path / "after_move")
    _shutil.move(old, new)
    moved = VersionedTable.load(spark, new)
    assert moved.read().count() == 60
    assert moved.read().filter(F.col("id") < 40).count() == 0


def test_mor_with_reserved_looking_column_names(spark, tmp_path):
    """A data schema with columns literally named file/pos must not
    collide with the overlay join's delete-side columns."""
    from pyspark.sql import functions as F

    t = VersionedTable.create(
        spark,
        str(tmp_path / "clash"),
        schema="file string, pos bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(
        spark.range(0, 50).select(
            F.concat(F.lit("f"), F.col("id")).alias("file"),
            F.col("id").alias("pos"),
        )
    )
    t.delete(F.col("pos") >= 40)
    assert t.read().count() == 40
    assert t.read().filter(F.col("pos") >= 40).count() == 0


def test_rollback_to_snapshot(spark, tmp_path_factory):
    """CALL system.rollback_to_snapshot: move main back to an ancestor;
    non-ancestors are rejected (Iceberg's rollback contract)."""
    import pytest as _pytest

    wh = str(tmp_path_factory.mktemp("rb_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.rb"), schema="id bigint"
    )
    s1 = t.append(spark.range(0, 5))
    t.append(spark.range(5, 9))
    assert eng.sql("select * from iceberg.db.rb").count() == 9
    eng.sql(
        "call iceberg.system.rollback_to_snapshot(table => 'iceberg.db.rb', "
        f"snapshot_id => '{s1.snapshot_id}')"
    )
    assert eng.sql("select * from iceberg.db.rb").count() == 5
    # the abandoned commit is gone from main but still time-travelable
    t2 = VersionedTable.load(spark, eng.catalog.resolve("iceberg.db.rb"))
    with _pytest.raises(ValueError, match="not an ancestor"):
        # a branch head that is NOT on main's (rolled-back) chain
        t2.create_branch("side")
        orphan = t2.append(spark.range(100, 101), branch="side")
        t2.rollback(orphan.snapshot_id)


def test_merge_update_set_star(spark, tmp_path_factory):
    """WHEN MATCHED THEN UPDATE SET * updates every column."""
    wh = str(tmp_path_factory.mktemp("star_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.star"), schema="k bigint, v string"
    )
    t.append(spark.createDataFrame([(1, "old"), (2, "keep")], "k bigint, v string"))
    s = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.star_src"), schema="k bigint, v string"
    )
    s.append(spark.createDataFrame([(1, "new"), (3, "ins")], "k bigint, v string"))
    eng.sql(
        """MERGE INTO iceberg.db.star as target
           USING iceberg.db.star_src as src
           ON target.k = src.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *"""
    )
    got = {
        r["k"]: r["v"]
        for r in eng.sql("select * from iceberg.db.star").collect()
    }
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_timestamp_as_of(spark, tmp_path_factory):
    """TIMESTAMP AS OF reads the newest snapshot committed at or
    before the instant (Iceberg's timestamp travel, alongside the
    reference's VERSION AS OF labels)."""
    import datetime as dt

    import pytest as _pytest

    wh = str(tmp_path_factory.mktemp("ts_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.ts"), schema="id bigint"
    )
    s1 = t.append(spark.range(0, 4))
    t.append(spark.range(4, 10))
    mid = dt.datetime.fromtimestamp(s1.timestamp_ms / 1000).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )[:-3]
    got = eng.sql(
        f"select * from iceberg.db.ts TIMESTAMP AS OF '{mid}'"
    ).count()
    assert got == 4
    assert eng.sql("select * from iceberg.db.ts").count() == 10
    with _pytest.raises(ValueError, match="at or before"):
        t.read(as_of_ms=0)


def test_table_codec_property_honored(spark, tmp_path):
    """write.parquet.compression-codec (G7) routes to the writer."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "codec"),
        schema="id bigint",
        properties={"write.parquet.compression-codec": "snappy"},
    )
    snap = t.append(spark.range(0, 10))
    assert any(".snappy.parquet" in f for f in snap.files), snap.files


def test_call_create_changelog_view(spark, tmp_path_factory):
    """CALL iceberg.system.create_changelog_view registers a queryable
    temp view of row-level changes (Iceberg's procedure spelling),
    honoring start/end snapshot ids via the options map."""
    wh = str(tmp_path_factory.mktemp("clog_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.clog"), schema="id bigint"
    )
    s1 = t.append(spark.range(0, 10))
    t.append(spark.range(10, 30))
    t.delete(F.col("id") >= 25)
    eng.sql(
        "CALL iceberg.system.create_changelog_view("
        "table => 'iceberg.db.clog', changelog_view => 'clog_v', "
        f"options => map('start-snapshot-id','{s1.snapshot_id}'))"
    )
    got = {
        (r["_change_type"], r["id"])
        for r in spark.sql("select _change_type, id from clog_v").collect()
    }
    assert got == {("insert", i) for i in range(10, 30)} | {
        ("delete", i) for i in range(25, 30)
    }


# The reference's FULL CREATE for the WAP table, every TBLPROPERTY it
# declares (WI:24-45) — including the avro delete format and
# metadata-GC knobs — must parse and apply.
WAP_CREATE = """create table if not exists {tbl}(
account string,
txn_date date,
txn_id string,
merchant string,
amount double,
category string,
last_updated timestamp
) USING iceberg
TBLPROPERTIES(
   'write.wap.enabled'='true',
   'write.delete.mode'='copy-on-write',
   'write.update.mode'='merge-on-read',
   'write.merge.mode'='merge-on-read',
   'read.parquet.vectorization.enabled'='true',
   'write.format.default'='parquet',
   'write.delete.format.default'='avro',
   'write.parquet.compression-codec'='zstd',
   'write.metadata.delete-after-commit.enabled'='true',
   'write.metadata.previous-versions-max'='80',
   'comment'='Transaction Table'
)
partitioned by (txn_date) """


def test_wap_full_lifecycle_reference_statements(spark, tmp_path_factory):
    """WapIceberg.scala's loadForDate sequence (WI:14-87), replayed for
    both of its dates with only reference-spelled statements: ambient
    ``spark.wap.branch`` session conf, append to the audit branch,
    ``version as of 'feature_branch'`` null audit, publish via CALL
    fast_forward when clean (2024-03-02) and discard via DROP BRANCH
    when not (2024-03-10 carries null amounts/timestamps)."""
    wh = str(tmp_path_factory.mktemp("wap_full_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    tbl = "iceberg.finance.activity2"
    eng.sql(f"drop table if exists {tbl}")
    spark.conf.set("spark.wap.branch", "feature_branch")
    try:
        counts = {}
        for day in ("2024-03-02", "2024-03-10"):
            eng.sql(WAP_CREATE.format(tbl=tbl))
            batch = read_activity_csv(
                spark, os.path.join(REFERENCE_INPUT_DIR, day)
            )
            VersionedTable.load(spark, eng.catalog.resolve(tbl)).append(
                batch
            )
            audited = eng.sql(
                f"select * from {tbl} version as of 'feature_branch'"
            )
            invalid = audited.filter(
                " OR ".join(f"{c} IS NULL" for c in audited.columns)
            ).count()
            if invalid == 0:
                eng.sql(
                    f"call iceberg.system.fast_forward('{tbl}', 'main', 'feature_branch')"
                )
            eng.sql(f"alter table {tbl} drop branch feature_branch")
            counts[day] = invalid
        assert counts["2024-03-02"] == 0  # clean day published
        assert counts["2024-03-10"] > 0  # dirty day detected
    finally:
        spark.conf.unset("spark.wap.branch")
    # main holds exactly the published day; the dirty day was discarded
    # with its branch
    assert eng.sql(f"select * from {tbl}").count() == 15
    t = VersionedTable.load(spark, eng.catalog.resolve(tbl))
    assert "feature_branch" not in t.branches()
    assert (
        t.table_meta["properties"]["write.delete.format.default"] == "avro"
    )
