"""Tier-A golden invariants from the reference (SURVEY.md §5, FIXTURES.md §A).

Replays the reference's full activity lifecycle — 5 daily loads with
MERGE upserts and a branch per day, then WAP, then maintenance — and
asserts the golden values embedded in the reference README
(/root/reference/README.md:58-114) and count logic (LT:113-123).
"""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_by_example_spark.sources.activity import REFERENCE_INPUT_DIR
from iceberg_by_example_spark.tables.versioned import MAIN, VersionedTable
from iceberg_by_example_spark.tables.workflows import (
    count_at,
    create_activity_table,
    ingest_day,
    maintain,
    metadata_counts,
    wap_load,
)

DAYS = [
    ("2024-03-02", "day1", 15),
    ("2024-03-03", "day2", 30),
    ("2024-03-05", "day3", 45),
    ("2024-03-08", "day4", 47),
    ("2024-03-09", "day5", 50),
]


def day_path(day: str) -> str:
    return os.path.join(REFERENCE_INPUT_DIR, day)


@pytest.fixture(scope="module")
def loaded_table(spark, tmp_path_factory):
    """The table after all five daily ingests (reference main flow)."""
    loc = str(tmp_path_factory.mktemp("warehouse") / "activity")
    t = create_activity_table(spark, loc)
    for day, branch, _expected in DAYS:
        ingest_day(t, day_path(day), branch)
    return t


def test_counts_per_branch(loaded_table):
    """LT:113-123: day1=15, day2=30, day3=45, day4=47, day5=50."""
    for _day, branch, expected in DAYS:
        assert count_at(loaded_table, branch) == expected, branch
    assert count_at(loaded_table) == 50  # latest


def test_txn10_time_travel(loaded_table):
    """README:58-88: txn10 category Jewellery@day1 → Fashion@day5/latest."""
    def cat(branch=None):
        df = loaded_table.read(branch=branch).filter(F.col("txn_id") == "txn10")
        rows = df.collect()
        assert len(rows) == 1
        return rows[0]["category"]

    assert cat("day1") == "Jewellery"
    assert cat("day5") == "Fashion"
    assert cat() == "Fashion"


def test_txn44_time_travel(loaded_table):
    """README:94-114: txn44 Hardware@day3 → Phone@latest (acc5, 1500.0)."""
    at_day3 = (
        loaded_table.read(branch="day3")
        .filter(F.col("txn_id") == "txn44")
        .collect()
    )
    assert len(at_day3) == 1
    assert at_day3[0]["category"] == "Hardware"
    assert at_day3[0]["account"] == "acc5"
    assert at_day3[0]["amount"] == 1500.0

    latest = (
        loaded_table.read().filter(F.col("txn_id") == "txn44").collect()
    )
    assert latest[0]["category"] == "Phone"


def test_flagship_groupby_account(loaded_table):
    """README:43-45 flagship agg at latest: acc1=11, acc2=10, acc3=10,
    acc4=10, acc5=9 (FIXTURES.md §A)."""
    got = {
        r["account"]: r["activity_count"]
        for r in loaded_table.read()
        .groupBy("account")
        .agg(F.count("*").alias("activity_count"))
        .collect()
    }
    assert got == {"acc1": 11, "acc2": 10, "acc3": 10, "acc4": 10, "acc5": 9}


def test_merge_is_partition_granular(loaded_table):
    """The day-4 merge (3 updates + 2 inserts) must not rewrite the
    whole table: files from untouched partitions carry over by
    reference across snapshots."""
    snaps = {s.snapshot_id: s for s in loaded_table._snapshots()}
    day3 = snaps[loaded_table._refs()["day3"]]
    day4 = snaps[loaded_table._refs()["day4"]]
    carried = set(day3.files) & set(day4.files)
    assert carried, "day4 merge rewrote every file — not partition-granular"


def test_partition_pruning_plan(loaded_table):
    """P4 (LT:149): a txn_date predicate must prune to one partition —
    visible as PartitionFilters in the physical scan."""
    df = loaded_table.read().filter(
        F.col("txn_date") == F.lit("2024-03-05").cast("date")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "txn_date" in plan.split("PartitionFilters")[1][:200]


def test_metadata_tables(loaded_table):
    counts = metadata_counts(loaded_table)
    # create + 5 ingests (merge each) = 6 snapshots on main's lineage
    assert counts["snapshots"] >= 6
    assert counts["files"] > 0
    # refs: main + day1..day5
    assert counts["refs"] == 6
    # one manifest (commit dir) per contributing commit, ≥1 after 5 merges
    assert counts["manifests"] >= 1
    # one metadata version per commit: create + 5 merges = ≥6
    assert counts["metadata_log_entries"] >= 6
    mf = loaded_table.manifests().collect()
    assert all(r["added_data_files_count"] > 0 and r["length"] > 0 for r in mf)
    # partitioned table → manifests carry partition summaries
    assert any(r["partition_summaries"] for r in mf)
    ml = loaded_table.metadata_log_entries().collect()
    assert ml[-1]["latest_snapshot_id"] == loaded_table._refs()[MAIN]


def test_wap_publish_and_reject(spark, tmp_path):
    """WI:91-92: 2024-03-02 audits clean → published; 2024-03-10 has 3
    null-bearing rows → rejected, main unchanged, branch dropped."""
    t = create_activity_table(spark, str(tmp_path / "activity2"))

    assert wap_load(t, day_path("2024-03-02")) is True
    assert count_at(t) == 15

    assert wap_load(t, day_path("2024-03-10")) is False
    assert count_at(t) == 15  # main untouched by rejected batch
    assert "feature_branch" not in t.branches()


def test_wap_session_ambient_routing(spark, tmp_path):
    """spark.wap.branch parity (WI:14): inside wap_session, writes with
    NO branch argument land on the WAP branch (auto-created), ambient
    reads resolve to it, main stays untouched; outside, the conf is
    restored and reads go back to main."""
    from iceberg_by_example_spark.tables.versioned import wap_session

    t = VersionedTable.create(
        spark, str(tmp_path / "wapsess"), schema="id bigint, val string"
    )
    t.append(spark.createDataFrame([(1, "a")], "id bigint, val string"))

    with wap_session(spark, "audit_b"):
        t.append(spark.createDataFrame([(2, "b")], "id bigint, val string"))
        assert t.read().count() == 2  # ambient read sees the WAP branch
        assert t.read(branch=MAIN).count() == 1  # explicit arg still wins
    # conf restored: ambient read is main again
    assert t.read().count() == 1
    assert "audit_b" in t.branches()
    t.fast_forward(MAIN, "audit_b")
    assert t.read().count() == 2


def test_maintenance(loaded_table):
    before_files = set(loaded_table._current(MAIN).files)
    report = maintain(loaded_table)
    after = loaded_table._current(MAIN)
    # compaction rewrote main's data into fresh files
    assert set(after.files) != before_files
    # all 50 rows survive compaction + GC
    assert count_at(loaded_table) == 50
    # orphan scan after expiry actually removed unreferenced files
    assert isinstance(report["orphans_removed"], list)
    # a second orphan pass finds nothing left to collect
    assert loaded_table.remove_orphan_files(dry_run=True) == []


def test_time_travel_by_snapshot_id(loaded_table):
    refs = loaded_table._refs()
    df = loaded_table.read(snapshot_id=refs["day2"])
    assert df.count() == 30


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Reference S6 appends with mergeSchema=true (LT:65-66): a batch
    with a new column widens the schema; old rows read NULL for it."""
    t = VersionedTable.create(
        spark, str(tmp_path / "evolving"), schema="id bigint, name string"
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string"))
    t.append(
        spark.createDataFrame(
            [(3, "c", 9.5)], "id bigint, name string, score double"
        ),
        merge_schema=True,
    )
    rows = {r["id"]: (r["name"], r["score"]) for r in t.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}

    # type change is rejected (safe evolution only)
    with pytest.raises(ValueError, match="type change"):
        t.append(
            spark.createDataFrame([(4, "d", "oops")], "id bigint, name string, score string"),
            merge_schema=True,
        )


def test_merge_partition_migration(spark, tmp_path):
    """Reference M1 updates the partition column itself (LT:73 sets
    txn_date): a matched row must migrate to its new partition and
    vanish from the old one."""
    t = create_activity_table(spark, str(tmp_path / "migrate"))
    day1 = spark.createDataFrame(
        [("acc1", "2024-03-02", "t1", "Shop", 10.0, "Misc", "2024-03-02 10:00:00"),
         ("acc2", "2024-03-02", "t2", "Cafe", 5.0, "Food", "2024-03-02 11:00:00")],
        "account string, txn_date string, txn_id string, merchant string, "
        "amount double, category string, last_updated string",
    ).selectExpr(
        "account", "CAST(txn_date AS DATE) AS txn_date", "txn_id", "merchant",
        "amount", "category", "CAST(last_updated AS TIMESTAMP) AS last_updated",
    )
    t.append(day1)
    # t1 re-sent with a corrected txn_date → must move partitions
    fix = spark.createDataFrame(
        [("acc1", "2024-03-09", "t1", "Shop", 10.0, "Misc", "2024-03-09 09:00:00")],
        "account string, txn_date string, txn_id string, merchant string, "
        "amount double, category string, last_updated string",
    ).selectExpr(
        "account", "CAST(txn_date AS DATE) AS txn_date", "txn_id", "merchant",
        "amount", "category", "CAST(last_updated AS TIMESTAMP) AS last_updated",
    )
    t.merge(fix, on="txn_id",
            update_cols=["amount", "category", "last_updated", "txn_date"])

    from pyspark.sql import functions as F2
    rows = {r["txn_id"]: str(r["txn_date"]) for r in t.read().collect()}
    assert rows == {"t1": "2024-03-09", "t2": "2024-03-02"}
    # the physical file for t1 lives under the new partition dir
    t1_files = [f for f in t._current().files if "txn_date=2024-03-09" in f]
    assert t1_files, t._current().files


def test_mutations_are_file_granular(spark, tmp_path):
    """Sharper than partition-granular: on an UNPARTITIONED table (one
    big implicit partition) a mutation touching one commit's key range
    must carry the other commits' files over by reference — the old
    partition-scoped CoW would have rewritten everything."""
    t = VersionedTable.create(
        spark, str(tmp_path / "fg"), schema="id bigint, val string"
    )
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 50)
            .selectExpr("id", "CAST(id AS STRING) AS val")
            .repartition(1)
        )
    before = set(t._current().files)
    assert len(before) == 3

    # update touches only the [200, 250) file
    t.update(F.col("id") == 249, {"val": F.lit("updated")})
    after_update = set(t._current().files)
    assert len(before & after_update) == 2, "update rewrote untouched files"

    # merge matching a key in the [100, 150) file: that file + inserts
    src = spark.createDataFrame([(101, "merged"), (900, "new")], "id bigint, val string")
    pre_merge = set(t._current().files)
    t.merge(src, on="id")
    after_merge = set(t._current().files)
    assert len(pre_merge & after_merge) == 2, "merge rewrote untouched files"

    # delete from the [0, 50) file only
    pre_del = set(t._current().files)
    t.delete(F.col("id") < 10)
    after_del = set(t._current().files)
    assert len(pre_del & after_del) >= 2, "delete rewrote untouched files"

    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows[249] == "updated" and rows[101] == "merged"
    assert rows[900] == "new" and 5 not in rows
    assert len(rows) == 150 - 10 + 1


def test_merge_null_key_inserts_full_row(spark, tmp_path):
    """A NULL merge key matches nothing → the row INSERTs with all its
    non-key columns intact (not an all-NULL row)."""
    t = VersionedTable.create(
        spark, str(tmp_path / "nullkey"), schema="id bigint, val string"
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string"))
    src = spark.createDataFrame(
        [(1, "updated"), (None, "null-key-row")], "id bigint, val string"
    )
    t.merge(src, on="id")
    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows == {1: "updated", 2: "b", None: "null-key-row"}


def test_merge_schema_parameterized_types(spark, tmp_path):
    """Schema evolution must round-trip parameterized DDL types —
    decimal(10,2), map<string,int> — through a mergeSchema append."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "paramtypes"),
        schema="id bigint, price decimal(10,2), tags map<string,int>",
    )
    t.append(
        spark.sql(
            "SELECT 1L AS id, CAST(9.99 AS DECIMAL(10,2)) AS price, "
            "map('a', 1) AS tags"
        )
    )
    t.append(
        spark.sql(
            "SELECT 2L AS id, CAST(1.50 AS DECIMAL(10,2)) AS price, "
            "map('b', 2) AS tags, 'extra' AS note"
        ),
        merge_schema=True,
    )
    assert "decimal(10,2)" in t.table_meta["schema"]
    assert "map<string,int>" in t.table_meta["schema"]
    rows = {r["id"]: (str(r["price"]), r["note"]) for r in t.read().collect()}
    assert rows == {1: ("9.99", None), 2: ("1.50", "extra")}


def test_delete_partition_granular(spark, tmp_path):
    """DELETE rewrites only partitions containing matched rows; others
    carry over by reference, and time travel still sees deleted rows."""
    t = create_activity_table(spark, str(tmp_path / "del"))
    ingest_day(t, day_path("2024-03-02"), "d1")
    ingest_day(t, day_path("2024-03-03"), "d2")
    before = t._current(MAIN)
    t.create_branch("pre_delete")

    t.delete(F.col("txn_date") == F.lit("2024-03-03").cast("date"))
    after = t._current(MAIN)
    assert t.read().count() == 15
    # untouched partition's files carried over
    assert set(before.files) & set(after.files)
    # time travel to the pre-delete branch still sees all 30
    assert t.read(branch="pre_delete").count() == 30


def test_update_where(spark, tmp_path):
    t = create_activity_table(spark, str(tmp_path / "upd"))
    ingest_day(t, day_path("2024-03-02"), "d1")
    t.update(
        F.col("account") == "acc1",
        {"category": F.lit("Audited"), "amount": F.col("amount") * 2},
    )
    rows = t.read().collect()
    acc1 = [r for r in rows if r["account"] == "acc1"]
    rest = [r for r in rows if r["account"] != "acc1"]
    assert acc1 and all(r["category"] == "Audited" for r in acc1)
    assert rest and all(r["category"] != "Audited" for r in rest)


def test_hundred_commits_compact_to_single_scan(spark, tmp_path):
    """Log + plan growth under many commits: after 100 appends the
    snapshot log must stay sharded (manifest lists, no inline file
    lists, shared manifests across snapshots), and compaction must
    collapse the read plan back to ONE parquet scan."""
    t = VersionedTable.create(
        spark, str(tmp_path / "many"), schema="id bigint"
    )
    for i in range(100):
        t.append(spark.range(i, i + 1).repartition(1))

    raw = t._read_json("snapshots.json")
    # sharded: every serialized snapshot is a manifest-list pointer
    assert all("files" not in d for d in raw)
    assert all("manifest_list" in d for d in raw)
    # content-addressing: snapshot N shares N-1 manifests with its
    # parent → ~one NEW manifest per commit, not O(N²) distinct files
    distinct_manifests = {
        m
        for d in raw
        for m in t._read_manifest_file(d["manifest_list"])
    }
    assert len(distinct_manifests) <= 101

    assert t.read().count() == 100
    pre_plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert pre_plan.count("Scan parquet") == 100  # one scan per commit dir

    t.rewrite_data_files()
    t.expire_snapshots(retain_last=1)
    t.remove_orphan_files()
    t.rewrite_manifests()

    assert t.read().count() == 100
    post_plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert post_plan.count("Scan parquet") == 1  # compacted: single scan


def test_delete_no_match_is_noop(spark, tmp_path):
    t = create_activity_table(spark, str(tmp_path / "noop"))
    ingest_day(t, day_path("2024-03-02"), "d1")
    snaps_before = len(t._snapshots())
    t.delete(F.col("account") == "no_such_account")
    assert len(t._snapshots()) == snaps_before  # no empty commit
    assert t.read().count() == 15


# -- merge-on-read (position-delete overlay) --------------------------------


def _bytes_of(t, files):
    import os as _os

    return sum(_os.path.getsize(_os.path.join(t.location, f)) for f in files)


def _mor_table(spark, loc, n_appends=4, rows_per=250):
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark,
        str(loc),
        schema="id bigint, grp string, v string",
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
            "write.merge.mode": "merge-on-read",
        },
    )
    for i in range(n_appends):
        base = i * rows_per
        t.append(
            spark.range(base, base + rows_per).select(
                F.col("id"),
                (F.col("id") % 5).cast("string").alias("grp"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
        )
    return t


def test_mor_hot_key_update_commits_o_batch(spark, tmp_path):
    """The case file-granular CoW cannot bound (VERDICT r2 #2 of
    'What's missing'): a predicate matching a few rows in EVERY data
    file. MoR must commit O(matched) bytes — the old files all carry
    over, and the added delete+data files are a small fraction of the
    table."""
    import os as _os

    t = _mor_table(spark, tmp_path / "hot")
    before = t._current()
    # grp='3' hits every one of the 4 append files
    snap = t.update(F.col("grp") == "3", {"v": F.lit("HOT")})
    assert set(before.files) <= set(snap.files)
    # commit is O(matched): the rows written (updated versions + delete
    # positions) equal the matched count — NOT the table count, which
    # is what a forced rewrite of every touched file would produce.
    # (Bytes are not comparable at this scale: parquet footer overhead
    # dominates 250-row files.)
    added_data = sorted(set(snap.files) - set(before.files))
    written_rows = spark.read.parquet(
        *[_os.path.join(t.location, f) for f in added_data]
    ).count()
    delete_rows = spark.read.parquet(
        *[_os.path.join(t.location, f) for f in snap.delete_files]
    ).count()
    assert written_rows == 200, written_rows
    assert delete_rows == 200, delete_rows
    assert t.read().filter(F.col("v") == "HOT").count() == 200
    assert t.read().count() == 1000


def test_mor_delete_then_update_stack_and_time_travel(spark, tmp_path):
    t = _mor_table(spark, tmp_path / "stack")
    s0 = t._current()
    t.delete(F.col("id") < 100)
    t.update(F.col("id") >= 900, {"v": F.lit("U")})
    r = t.read()
    assert r.count() == 900
    assert r.filter(F.col("id") < 100).count() == 0
    assert r.filter(F.col("v") == "U").count() == 100
    # time travel to the pre-mutation snapshot ignores the overlay
    assert t.read(snapshot_id=s0.snapshot_id).count() == 1000


def test_mor_merge_then_compaction_materializes(spark, tmp_path):
    t = _mor_table(spark, tmp_path / "cmp")
    src = spark.range(990, 1010).select(
        F.col("id"), F.lit("9").alias("grp"), F.lit("M").alias("v")
    )
    snap = t.merge(src, on="id")
    assert snap.delete_files
    assert t.read().count() == 1010
    assert t.read().filter((F.col("id") >= 990) & (F.col("v") != "M")).count() == 0
    compacted = t.rewrite_data_files()
    assert compacted.delete_files == []
    assert t.read().count() == 1010
    assert t.read().filter(F.col("v") == "M").count() == 20
    # orphan GC never removes still-referenced delete files of older snaps
    t.remove_orphan_files()
    assert t.read(snapshot_id=snap.snapshot_id).count() == 1010


def test_expire_snapshots_older_than(spark, tmp_path):
    """C4 parity (LT:161-162): older_than bounds what MAY expire;
    branch ancestors and the retain_last tail survive regardless."""
    import time as _time

    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "exp"), schema="id bigint")
    for i in range(5):
        t.append(spark.range(i, i + 1).select(F.col("id")))
    snaps = sorted(t._snapshots(), key=lambda s: s.timestamp_ms)
    cutoff = snaps[3].timestamp_ms  # strictly-older-than the 4th commit
    expired = t.expire_snapshots(older_than=cutoff, retain_last=1)
    remaining = {s.snapshot_id for s in t._snapshots()}
    # main's ancestors are protected: nothing on the live chain expired
    live = {s.snapshot_id for s in snaps if s.snapshot_id in remaining}
    assert t._current().snapshot_id in live
    assert t.read().count() == 5
    # orphaned-branch snapshots (the expirable kind: not on any ref's
    # ancestor chain after the branch is dropped) expire only when they
    # are older than the cutoff
    t2 = VersionedTable.create(spark, str(tmp_path / "exp2"), schema="id bigint")
    t2.append(spark.range(0, 1))
    t2.create_branch("wap")
    orphan1 = t2.append(spark.range(1, 2), branch="wap")
    orphan2 = t2.append(spark.range(2, 3), branch="wap")
    t2.drop_branch("wap")
    # cutoff in the past: age bound protects even unreferenced snaps
    assert t2.expire_snapshots(older_than=0, retain_last=1) == []
    future = int(_time.time() * 1000) + 10_000
    expired2 = set(t2.expire_snapshots(older_than=future, retain_last=1))
    assert orphan1.snapshot_id in expired2
    # retain_last keeps the newest snapshot regardless of refs
    assert orphan2.snapshot_id not in expired2
    assert t2.read().count() == 1  # main untouched


def test_zorder_compaction_clusters_both_dimensions(spark, tmp_path):
    """Z-order compaction must co-locate rows by BOTH columns: after
    clustering, the rows matching a narrow box predicate (and each
    single-dimension slice) live in a small fraction of the files —
    the property that lets file/row-group stats prune multi-dim
    queries. A lexicographic sort only gives this for the leading key."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "z"), schema="x bigint, y bigint")
    # two independent dimensions; interleaved appends → no natural order
    df = spark.range(0, 20000).select(
        (F.col("id") % 141).alias("x"), ((F.col("id") * 7919) % 131).alias("y")
    )
    t.append(df)
    snap = t.rewrite_data_files(zorder_by=["x", "y"])
    n_files = len(snap.files)
    assert n_files >= 8, "need several files for pruning to mean anything"

    def files_touched(pred):
        return (
            t._read_snapshot(t._current(), with_file_path=True)
            .filter(pred)
            .select("_file")
            .distinct()
            .count()
        )

    box = files_touched((F.col("x").between(10, 20)) & (F.col("y").between(10, 20)))
    x_slice = files_touched(F.col("x").between(10, 20))
    y_slice = files_touched(F.col("y").between(10, 20))
    assert box <= n_files // 4, (box, n_files)
    assert x_slice < n_files, (x_slice, n_files)
    assert y_slice < n_files, (y_slice, n_files)
    # clustering is a rewrite, not a mutation
    assert t.read().count() == 20000


def test_incremental_read_appends_only(spark, tmp_path):
    """read_incremental emits exactly the rows appended in the range,
    skips replace commits, and refuses row-mutating commits."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "incr"), schema="id bigint")
    s1 = t.append(spark.range(0, 100))
    s2 = t.append(spark.range(100, 250))
    t.rewrite_data_files()  # replace: physical only, must be skipped
    t.append(spark.range(250, 300))

    got = {r["id"] for r in t.read_incremental(s1.snapshot_id).collect()}
    assert got == set(range(100, 300))
    # bounded range (from, to]
    got2 = {
        r["id"]
        for r in t.read_incremental(s1.snapshot_id, s2.snapshot_id).collect()
    }
    assert got2 == set(range(100, 250))
    # from=None → everything
    assert t.read_incremental().count() == 300
    # non-ancestor from
    with pytest.raises(ValueError, match="not an ancestor"):
        t.read_incremental("nope")
    # mutating commit in range → changelog() is the right tool
    t.delete(F.col("id") < 10)
    with pytest.raises(ValueError, match="changelog"):
        t.read_incremental(s1.snapshot_id)


def test_changelog_mode_invariant(spark, tmp_path):
    """The changelog of the same logical history is identical whether
    mutations ran copy-on-write or merge-on-read — physical strategy
    must never leak into the change stream."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    def history(loc, props):
        t = VersionedTable.create(
            spark, loc, schema="id bigint, v string", properties=props
        )
        base = spark.range(0, 200).select(
            "id", F.concat(F.lit("v"), F.col("id")).alias("v")
        )
        s1 = t.append(base)
        t.append(
            spark.range(200, 260).select(
                "id", F.concat(F.lit("v"), F.col("id")).alias("v")
            )
        )
        t.delete(F.col("id") % 7 == 1)
        t.update(F.col("id") % 50 == 2, {"v": F.lit("patched")})
        return t, s1

    mor = {
        "write.delete.mode": "merge-on-read",
        "write.update.mode": "merge-on-read",
        "write.merge.mode": "merge-on-read",
    }
    t_cow, s1_cow = history(str(tmp_path / "cow"), {})
    t_mor, s1_mor = history(str(tmp_path / "mor"), mor)

    def events(t, s1):
        return sorted(
            (r["_commit_ordinal"], r["_change_type"], r["id"], r["v"])
            for r in t.changelog(from_snapshot_id=s1.snapshot_id).collect()
        )

    ev_cow, ev_mor = events(t_cow, s1_cow), events(t_mor, s1_mor)
    assert ev_cow == ev_mor
    # spot-check semantics: ordinal 2 deletes ids ≡1 (mod 7) present then
    deleted = {e[2] for e in ev_cow if e[0] == 2 and e[1] == "delete"}
    assert deleted == {i for i in range(260) if i % 7 == 1}
    # ordinal 3: update = delete(old) + insert(new) for surviving ids ≡2 (mod 50)
    upd_ids = {i for i in range(260) if i % 50 == 2 and i % 7 != 1}
    ins = {e[2] for e in ev_cow if e[0] == 3 and e[1] == "insert"}
    dels = {e[2] for e in ev_cow if e[0] == 3 and e[1] == "delete"}
    assert ins == dels == upd_ids
    assert all(e[3] == "patched" for e in ev_cow if e[0] == 3 and e[1] == "insert")


def test_changelog_replays_to_current_state(spark, tmp_path):
    """Folding the full changelog (from table creation) must
    reconstruct exactly the current table state."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "replay"), schema="id bigint")
    t.append(spark.range(0, 500))
    t.delete(F.col("id").between(100, 199))
    t.rewrite_data_files()
    t.append(spark.range(500, 600))
    t.delete(F.col("id") % 3 == 0)

    log = t.changelog().collect()
    state: dict = {}
    for r in sorted(log, key=lambda r: r["_commit_ordinal"]):
        key = r["id"]
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] -= 1
    replayed = {k for k, n in state.items() if n > 0}
    actual = {r["id"] for r in t.read().collect()}
    assert replayed == actual


def test_changelog_many_file_lineage(spark, tmp_path):
    """Changelog over a lineage whose snapshots carry MANY files each:
    every commit appends 8 new files while carrying all earlier ones
    forward, so the added/removed diffs walk file lists that grow to
    ~50 entries (the shape where the pre-round-7 per-element
    ``set(parent.files)`` rebuild went quadratic). Verifies per-commit
    attribution is exactly the 8-file delta, plus a final delete's
    changelog against the widest file list."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "manyfiles"), schema="id bigint")
    n_commits, files_per = 6, 8
    for c in range(n_commits):
        t.append(
            spark.range(c * 100, (c + 1) * 100).repartition(files_per)
        )
    snaps = t._snapshots()
    assert len(snaps[-1].files) >= n_commits * files_per

    log = t.changelog().collect()
    by_ordinal: dict = {}
    for r in log:
        by_ordinal.setdefault(r["_commit_ordinal"], []).append(r)
    # each append's changelog is exactly its own 100 inserts, never
    # re-emitting the carried files' rows (ordinals are positions in
    # the full lineage, so the create commit shifts them by one)
    assert len(by_ordinal) == n_commits
    for c, ordinal in enumerate(sorted(by_ordinal)):
        rows = by_ordinal[ordinal]
        ids = sorted(r["id"] for r in rows)
        assert all(r["_change_type"] == "insert" for r in rows)
        assert ids == list(range(c * 100, (c + 1) * 100))

    t.delete(F.col("id") % 100 == 7)
    last = max(r["_commit_ordinal"] for r in t.changelog().collect())
    tail = [
        r for r in t.changelog().collect() if r["_commit_ordinal"] == last
    ]
    assert {r["id"] for r in tail} == {c * 100 + 7 for c in range(n_commits)}
    assert all(r["_change_type"] == "delete" for r in tail)


def test_tags_are_immutable_named_refs(spark, tmp_path):
    """Tags pin a snapshot forever: reads resolve them like refs,
    writes addressed to them fail, expiry protects them, and the refs
    metadata table types them."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "tags"), schema="id bigint")
    t.append(spark.range(0, 40))
    t.create_tag("release-1")
    t.append(spark.range(40, 100))

    assert t.read(branch="release-1").count() == 40
    assert t.read().count() == 100
    # immutability
    with pytest.raises(ValueError, match="immutable"):
        t.append(spark.range(5), branch="release-1")
    with pytest.raises(ValueError, match="exists"):
        t.create_tag("release-1")
    t.create_tag("release-1", replace=True)  # now pins the 100-row state
    assert t.read(branch="release-1").count() == 100
    # name collision across ref kinds
    t.create_branch("dev")
    with pytest.raises(ValueError, match="is a branch"):
        t.create_tag("dev")
    with pytest.raises(ValueError, match="is a tag"):
        t.create_branch("release-1")
    # refs metadata table carries the type
    kinds = {(r["name"], r["type"]) for r in t.refs().collect()}
    assert ("release-1", "TAG") in kinds and ("main", "BRANCH") in kinds
    # expiry never drops a tagged snapshot
    t.create_tag("pin-old", snapshot_id=t.snapshots().collect()[1]["snapshot_id"])
    for i in range(6):
        t.append(spark.range(100 + i, 101 + i))
    t.expire_snapshots(retain_last=1)
    assert t.read(branch="pin-old").count() == 40
    t.drop_tag("pin-old")
    with pytest.raises(ValueError, match="unknown tag"):
        t.drop_tag("pin-old")


def test_sql_facade_tag_ddl_and_time_travel(spark, tmp_path_factory):
    """ALTER TABLE … CREATE TAG / VERSION AS OF '<tag>' / DROP TAG
    through the SQL facade (Iceberg's tag grammar)."""
    from iceberg_by_example_spark.tables.catalog import Catalog
    from iceberg_by_example_spark.tables.sql import SqlEngine
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    wh = str(tmp_path_factory.mktemp("tag_wh"))
    eng = SqlEngine(spark, Catalog(warehouse=wh))
    t = VersionedTable.create(
        spark, eng.catalog.resolve("iceberg.db.tagged"), schema="id bigint"
    )
    t.append(spark.range(0, 7))
    eng.sql("ALTER TABLE iceberg.db.tagged CREATE TAG `v1`")
    t.append(spark.range(7, 20))
    n = eng.sql(
        "select count(*) as n from iceberg.db.tagged VERSION AS OF 'v1'"
    ).collect()[0]["n"]
    assert n == 7
    eng.sql("ALTER TABLE iceberg.db.tagged DROP TAG `v1`")
    assert t.tags() == {}


def test_scan_prunes_files_on_stats(spark, tmp_path):
    """Manifest-level file skipping: three appends with disjoint key
    ranges → a point/range scan keeps only the commits whose footer
    stats admit the predicate, and results are exactly read().filter."""
    t = VersionedTable.create(
        spark, str(tmp_path / "stats"), schema="k bigint, v string"
    )
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 500).select(
                F.col("id").alias("k"), F.lit(f"c{lo}").alias("v")
            ).coalesce(1)
        )
    files = t._current().files
    assert len(files) == 3
    kept = t._prune_files(files, [("k", "<", 600)])
    assert len(kept) == 1
    kept = t._prune_files(files, [("k", ">=", 1200), ("k", "<", 1400)])
    assert len(kept) == 1
    kept = t._prune_files(files, [("k", "=", 2100)])
    assert len(kept) == 1
    # conjunction proved empty: ranges from different files
    assert t._prune_files(files, [("k", ">", 600), ("k", "<", 300)]) == []
    # unknown column / missing stats stay conservative
    assert t._prune_files(files, [("nope", "=", 1)]) == files
    got = sorted(r["k"] for r in t.scan([("k", "<", 600)]).collect())
    want = sorted(
        r["k"] for r in t.read().filter(F.col("k") < 600).collect()
    )
    assert got == want == list(range(500))


def test_scan_pruning_composes_with_zorder(spark, tmp_path):
    """After Z-order compaction the stats sidecar is regenerated for
    the rewritten files, so scan() prunes on EITHER z-dimension."""
    t = VersionedTable.create(
        spark, str(tmp_path / "zstats"), schema="x bigint, y bigint"
    )
    df = spark.range(0, 20000).select(
        (F.col("id") % 141).alias("x"), ((F.col("id") * 7919) % 131).alias("y")
    )
    t.append(df)
    snap = t.rewrite_data_files(zorder_by=["x", "y"])
    n_files = len(snap.files)
    kept_x = t._prune_files(snap.files, [("x", "<", 10)])
    kept_y = t._prune_files(snap.files, [("y", "<", 10)])
    assert len(kept_x) < n_files
    assert len(kept_y) < n_files
    got = t.scan([("x", "<", 10), ("y", "<", 10)]).count()
    want = t.read().filter((F.col("x") < 10) & (F.col("y") < 10)).count()
    assert got == want


def test_scan_applies_mor_overlay_after_pruning(spark, tmp_path):
    """Pruned scans still honor position-delete files — skipping files
    must never resurrect deleted rows."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "morscan"),
        schema="k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(
        spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("a").alias("v")
        ).coalesce(1)
    )
    t.append(
        spark.range(1000, 2000).select(
            F.col("id").alias("k"), F.lit("b").alias("v")
        ).coalesce(1)
    )
    t.delete(F.col("k") < 100)
    assert len(t._current().delete_files) > 0
    got = sorted(r["k"] for r in t.scan([("k", "<", 300)]).collect())
    assert got == list(range(100, 300))


def test_commit_conflict_detected_for_mutations(spark, tmp_path):
    """Two writers race a mutation: the one whose base snapshot went
    stale gets CommitConflictError, and re-running from the new head
    succeeds (the optimistic-concurrency retry contract)."""
    from iceberg_by_example_spark.tables.versioned import CommitConflictError

    loc = str(tmp_path / "occ")
    w1 = VersionedTable.create(spark, loc, schema="k bigint, v string")
    w1.append(
        spark.range(0, 100).select(F.col("id").alias("k"), F.lit("a").alias("v"))
    )
    w2 = VersionedTable.load(spark, loc)
    stale = w2._current().snapshot_id
    # w1 commits first; w2's staged mutation is now based on a stale head
    w1.delete(F.col("k") >= 90)
    with pytest.raises(CommitConflictError):
        w2._commit(
            MAIN, "delete", [], {"staged": True}, expected_parent_id=stale
        )
    # the retry path: recompute against the current head
    w2.delete(F.col("k") < 10)
    assert w2.read().count() == 80


def test_concurrent_appends_rebase_not_lost(spark, tmp_path):
    """A stale-based APPEND must rebase onto the new head instead of
    failing or clobbering it: both writers' rows land, history is
    linear."""
    loc = str(tmp_path / "occ_append")
    w1 = VersionedTable.create(spark, loc, schema="k bigint")
    w2 = VersionedTable.load(spark, loc)
    base = w1._current()
    # writer 1 appends normally
    w1.append(spark.range(0, 100).select(F.col("id").alias("k")))
    # writer 2 staged its files against the pre-append base
    staged = w2._write_data(
        spark.range(100, 200).select(F.col("id").alias("k"))
    )
    snap = w2._commit(
        MAIN,
        "append",
        base.files + staged,
        {"added-files": len(staged)},
        expected_parent_id=base.snapshot_id,
    )
    assert w1.read().count() == 200
    # linear chain: w2's snapshot parents w1's head, not the stale base
    assert snap.parent_id == w1._snapshots()[-2].snapshot_id


def test_threaded_appends_all_land(spark, tmp_path):
    """Six threads appending concurrently through the commit lock: all
    rows land exactly once and the snapshot chain is linear."""
    import threading

    loc = str(tmp_path / "occ_threads")
    t = VersionedTable.create(spark, loc, schema="k bigint")
    errs = []

    def writer(i):
        try:
            t.append(
                spark.range(i * 1000, i * 1000 + 1000).select(
                    F.col("id").alias("k")
                )
            )
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.read().count() == 6000
    assert t.read().select("k").distinct().count() == 6000
    snaps = t._snapshots()
    # linear history: each append's parent is the previous snapshot
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur.parent_id == prev.snapshot_id


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the merge result is
    exactly the source-driven refresh — matched rows updated, new rows
    inserted, absent rows deleted."""
    t = VersionedTable.create(
        spark, str(tmp_path / "refresh"), schema="k bigint, v string"
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
        )
    )
    src = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k bigint, v string"
    )
    snap = t.merge(src, on="k", when_not_matched_by_source="delete")
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {2: "B", 4: "d"}
    assert snap.summary["not-matched-by-source"] == "delete"
    # the clause is CoW-only: MoR would write O(table) delete entries
    t2 = VersionedTable.create(
        spark,
        str(tmp_path / "refresh_mor"),
        schema="k bigint, v string",
        properties={"write.merge.mode": "merge-on-read"},
    )
    t2.append(src)
    with pytest.raises(ValueError, match="copy-on-write"):
        t2.merge(src, on="k", when_not_matched_by_source="delete")


def test_partition_spec_evolution(spark, tmp_path):
    """alter_partition_by changes only FUTURE commits' layout; old and
    new layouts coexist in one snapshot, reads see every row, and
    per-commit partition discovery prunes the new-layout files."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "pevo"),
        schema="k bigint, status string, day string",
    )
    t.append(
        spark.createDataFrame(
            [(1, "A", "d1"), (2, "B", "d1")], "k bigint, status string, day string"
        )
    )
    t.alter_partition_by("status")
    t.append(
        spark.createDataFrame(
            [(3, "A", "d2"), (4, "B", "d2")], "k bigint, status string, day string"
        )
    )
    t.alter_partition_by("day")
    t.append(
        spark.createDataFrame(
            [(5, "A", "d3")], "k bigint, status string, day string"
        )
    )
    assert t.read().count() == 5
    got = {r["k"]: (r["status"], r["day"]) for r in t.read().collect()}
    assert got[3] == ("A", "d2") and got[5] == ("A", "d3")
    # layouts really differ on disk: hive dirs appear per spec
    files = t._current().files
    assert any("status=" in f for f in files)
    assert any("day=" in f for f in files)
    assert any("status=" not in f and "day=" not in f for f in files)
    assert t.table_meta["partition_spec_history"] == [None, "status"]
    # filters on either spec's column stay correct over mixed layouts
    assert t.read().filter(F.col("status") == "A").count() == 3
    assert t.scan([("k", ">=", 4)]).count() == 2


def test_decimal_column_write_and_stats_survive(spark, tmp_path):
    """ADVICE r3: a DECIMAL column used to crash writes — for parquet
    layouts where pyarrow extracts decimal footer min/max it returns
    decimal.Decimal, which json.dump can't serialize, and the uncaught
    TypeError failed the whole append. Stats are an optimization, never
    a requirement: the append must succeed, and when decimal stats ARE
    extractable they must round-trip the sidecar and prune."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from decimal import Decimal

    t = VersionedTable.create(
        spark,
        str(tmp_path / "dec"),
        schema="k bigint, amount decimal(12,2)",
    )
    # End-to-end: Spark-written decimal files commit fine (this pyarrow
    # raises on their fixed-width decimal stats; collection skips them).
    t.append(
        spark.createDataFrame(
            [(i, Decimal(f"{i}.50")) for i in range(10)],
            "k bigint, amount decimal(12,2)",
        ).coalesce(1)
    )
    assert t.read().count() == 10

    # Direct: a parquet layout whose decimal stats pyarrow DOES extract
    # (int-backed, as pyarrow writes) must encode to JSON-safe tagged
    # values — this was the json.dump TypeError crash.
    import os

    commit_dir = "commit-pyarrowdec"
    os.makedirs(os.path.join(t._data_dir, commit_dir))
    rel = os.path.join("data", commit_dir, "f0.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([100, 101], pa.int64()),
                "amount": pa.array(
                    [Decimal("1000.50"), Decimal("1009.50")],
                    pa.decimal128(12, 2),
                ),
            }
        ),
        os.path.join(t.location, rel),
    )
    t._collect_file_stats(commit_dir, [rel])  # must not raise
    st = t._file_stats([rel])[rel]["amount"]
    assert t._stat_decode(st["min"]) == Decimal("1000.50")
    assert t._stat_decode(st["max"]) == Decimal("1009.50")
    # decimal stats prune: amount < 100 excludes this file
    assert t._prune_files([rel], [("amount", "<", Decimal("100"))]) == []
    assert t._prune_files([rel], [("amount", ">", Decimal("100"))]) == [rel]


def test_nan_rows_never_pruned_away(spark, tmp_path):
    """ADVICE r3: parquet min/max exclude NaN while Spark orders NaN
    above every value, so stats-based pruning on >, >=, != must stay
    conservative for float columns — scan() == read().filter() even
    when the only satisfying rows are NaN."""
    t = VersionedTable.create(
        spark, str(tmp_path / "nan"), schema="k bigint, x double"
    )
    # file A: x in [0, 1] plus a NaN row; file B: x in [5, 6]
    t.append(
        spark.createDataFrame(
            [(1, 0.0), (2, 1.0), (3, float("nan"))], "k bigint, x double"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(10, 5.0), (11, 6.0)], "k bigint, x double"
        ).coalesce(1)
    )
    for op, val in ((">", 100.0), (">=", 100.0), ("!=", 0.0)):
        got = sorted(
            r["k"] for r in t.scan([("x", op, val)]).collect()
        )
        cond = {
            ">": F.col("x") > val,
            ">=": F.col("x") >= val,
            "!=": F.col("x") != val,
        }[op]
        want = sorted(r["k"] for r in t.read().filter(cond).collect())
        assert got == want, f"op {op}: scan {got} != filter {want}"
    # NaN can't satisfy <, <= or = — pruning those is still allowed
    assert len(t._prune_files(t._current().files, [("x", "<", -1.0)])) == 0


def test_drop_tag_is_locked_against_concurrent_create(spark, tmp_path):
    """ADVICE r3: drop_tag now runs under the same commit lock as
    create_tag, so concurrent tag mutations serialize instead of one
    silently losing the other's write."""
    import threading

    t = VersionedTable.create(
        spark, str(tmp_path / "tags"), schema="k bigint"
    )
    t.append(spark.range(3).select(F.col("id").alias("k")))
    for i in range(6):
        t.create_tag(f"keep{i}")
    errs = []

    def dropper(i):
        try:
            t.drop_tag(f"keep{i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def creator(i):
        try:
            t.create_tag(f"new{i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=dropper, args=(i,)) for i in range(6)
    ] + [threading.Thread(target=creator, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # every create landed and every drop landed — nothing lost
    assert set(t.tags()) == {f"new{i}" for i in range(6)}


def test_rewrite_delete_file_threshold_targets_only_deleted_files(
    spark, tmp_path
):
    """LT:159's ``options => map('delete-file-threshold','1')``: the
    rewrite touches ONLY data files referenced by >= threshold delete
    files — cold files keep their exact paths — and delete files whose
    targets were all rewritten leave the snapshot."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "thr"),
        schema="k bigint, v string",
        properties={"write.update.mode": "merge-on-read"},
    )
    t.append(
        spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("a").alias("v")
        ).coalesce(1)
    )
    t.append(
        spark.range(100, 200).select(
            F.col("id").alias("k"), F.lit("b").alias("v")
        ).coalesce(1)
    )
    # MoR update hits only the first file's key range
    t.update(F.col("k") < 50, {"v": F.lit("a2")})
    cur = t._current()
    assert len(cur.delete_files) >= 1
    snaps = t._snapshots()
    cold = sorted(set(snaps[2].files) - set(snaps[1].files))  # 2nd append

    # threshold higher than any file's delete count → no-op commit
    before = cur.snapshot_id
    t.rewrite_data_files(delete_file_threshold=99)
    assert t._current().snapshot_id == before

    t.rewrite_data_files(delete_file_threshold=1)
    after = t._current()
    assert after.delete_files == []  # overlay fully materialized
    # the cold file survived under its original path
    for f in cold:
        if f in after.files:
            break
    else:
        raise AssertionError("cold file was rewritten")
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == "a2" and got[49] == "a2"
    assert got[50] == "a" and got[150] == "b"
    assert len(got) == 200


def test_delete_format_property_seam(spark, tmp_path):
    """LT:34 declares write.delete.format.default=avro. The format is
    honored when spark-avro is on the classpath; in this sandbox (no
    avro jar) it falls back to parquet — either way the MoR lifecycle
    must work end-to-end under the property, and the chosen format
    must match avro availability."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "avrofmt"),
        schema="k bigint, v string",
        properties={
            "write.update.mode": "merge-on-read",
            "write.delete.format.default": "avro",
        },
    )
    assert t._delete_format() == (
        "avro" if t._avro_available() else "parquet"
    )
    t.append(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
    )
    t.update(F.col("k") < 3, {"v": F.lit("y")})
    cur = t._current()
    assert cur.delete_files  # MoR overlay landed in the chosen format
    ext = ".avro" if t._avro_available() else ".parquet"
    assert all(f.endswith(ext) for f in cur.delete_files)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == "y" and got[5] == "x" and len(got) == 10
    # unknown formats are rejected, not silently dropped
    t2 = VersionedTable.create(
        spark,
        str(tmp_path / "orcfmt"),
        schema="k bigint",
        properties={"write.delete.format.default": "orc"},
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t2._delete_format()


def test_metadata_previous_versions_max_trims_log(spark, tmp_path):
    """LT:36-37: with write.metadata.delete-after-commit.enabled=true
    the metadata log keeps at most previous-versions-max prior entries;
    version numbers stay monotonic across trims. Without the enable
    flag the log grows unbounded (Iceberg's default)."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "mgc"),
        schema="k bigint",
        properties={
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "3",
        },
    )
    for i in range(8):
        t.append(spark.range(i, i + 1).select(F.col("id").alias("k")))
    log = t._read_json("metadata_log.json")
    assert len(log) == 4  # 3 previous + latest
    versions = [
        int(e["metadata_file"].split("/v")[1].split(".")[0]) for e in log
    ]
    assert versions == sorted(versions)
    assert versions[-1] == 9  # create + 8 appends, numbering never reused
    # metadata_log_entries reflects the trimmed log
    assert t.metadata_log_entries().count() == 4

    t2 = VersionedTable.create(
        spark, str(tmp_path / "nogc"), schema="k bigint"
    )
    for i in range(6):
        t2.append(spark.range(1).select(F.col("id").alias("k")))
    assert len(t2._read_json("metadata_log.json")) == 7  # unbounded


def test_rewrite_position_delete_files_consolidates(spark, tmp_path):
    """The MoR-overlay compaction procedure: per-mutation delete files
    consolidate into one batch, logical content is byte-identical,
    data files are untouched, and the commit is a replace snapshot
    (invisible to incremental readers like any compaction)."""
    t = _mor_table(spark, tmp_path / "posdel")
    t.delete(F.col("id") < 50)
    t.delete((F.col("id") >= 100) & (F.col("id") < 150))
    t.update(F.col("id") >= 900, {"v": F.lit("U")})
    before = t._current()
    assert len(before.delete_files) >= 3
    content_before = sorted(map(tuple, t.read().collect()))

    snap = t.rewrite_position_delete_files()
    assert snap.operation == "replace"
    assert len(snap.delete_files) == 1
    assert snap.files == before.files  # data files untouched
    assert sorted(map(tuple, t.read().collect())) == content_before
    # consolidated rows are deduplicated (file, pos) pairs
    n_positions = t._read_position_deletes(snap.delete_files).count()
    dedup = (
        t._read_position_deletes(before.delete_files).distinct().count()
    )
    assert n_positions == dedup
    # incremental read across the rewrite sees no new data
    inc = t.read_incremental(
        from_snapshot_id=before.snapshot_id,
        to_snapshot_id=snap.snapshot_id,
    )
    assert inc.count() == 0
    # idempotent: a second run is a no-op-sized commit
    again = t.rewrite_position_delete_files()
    assert len(again.delete_files) == 1
    assert sorted(map(tuple, t.read().collect())) == content_before


def test_rewrite_position_delete_files_call_procedure(spark, tmp_path):
    """The facade accepts Iceberg's CALL spelling and reports the
    rewrite counts."""
    from iceberg_by_example_spark.tables.sql import SqlEngine

    t = _mor_table(spark, tmp_path / "posdel_sql")
    t.delete(F.col("id") < 10)
    t.delete(F.col("id") >= 990)
    eng = SqlEngine(spark)
    out = eng.sql(
        "CALL iceberg.system.rewrite_position_delete_files("
        f"table => '{t.location}')"
    ).collect()
    # two delete() calls, each possibly multi-part → at least 2 inputs
    assert out[0]["rewritten_delete_files_count"] >= 2
    assert out[0]["added_delete_files_count"] == 1


def test_cherrypick_snapshot_publishes_onto_moved_main(spark, tmp_path):
    """WAP publish when main MOVED after the audit branch was cut:
    fast_forward no longer applies (histories diverged), cherry-pick
    replays the audited snapshot's file delta as a new main commit.
    The audit branch keeps its own history; the published commit
    records the picked wap id."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark, str(tmp_path / "cp"), schema="id bigint, v string"
    )

    def batch(lo, hi, v):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit(v).alias("v")
        )

    t.append(batch(0, 10, "base"))
    t.create_branch("audit")
    staged = t.append(batch(100, 110, "staged"), branch="audit")
    # main moves forward independently -> fast_forward would be unsafe
    t.append(batch(10, 20, "hotfix"))

    published = t.cherrypick_snapshot(staged.snapshot_id)
    main_rows = {
        (r.id, r.v) for r in t.read().collect()
    }
    assert main_rows == (
        {(i, "base") for i in range(10)}
        | {(i, "hotfix") for i in range(10, 20)}
        | {(i, "staged") for i in range(100, 110)}
    )
    assert published.summary["published-wap-id"] == staged.snapshot_id
    # audit branch unchanged: no hotfix rows there
    audit_rows = {(r.id, r.v) for r in t.read(branch="audit").collect()}
    assert (10, "hotfix") not in audit_rows
    assert (100, "staged") in audit_rows


def test_cherrypick_conflicting_removal_raises(spark, tmp_path):
    """A snapshot that REMOVED files only commutes if the target head
    still has them: picking a CoW delete whose victims were already
    rewritten away must raise, never silently drop the conflict."""
    from iceberg_by_example_spark.tables.versioned import (
        CommitConflictError,
        VersionedTable,
    )

    t = VersionedTable.create(
        spark, str(tmp_path / "cpc"), schema="id bigint, v string"
    )
    t.append(
        spark.range(0, 100).select(F.col("id"), F.lit("x").alias("v"))
    )
    t.create_branch("mut")
    # CoW delete on the branch rewrites files
    t.delete(F.col("id") < 50, branch="mut")
    picked = t._current("mut")
    # main compacts: the files the branch delete removed are gone
    t.rewrite_data_files()
    with pytest.raises(CommitConflictError):
        t.cherrypick_snapshot(picked.snapshot_id)


def test_cherrypick_call_procedure(spark, tmp_path):
    """CALL spelling returns Iceberg's (source, current) snapshot ids."""
    from iceberg_by_example_spark.tables.sql import SqlEngine
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark, str(tmp_path / "cpcall"), schema="id bigint, v string"
    )
    t.append(spark.range(0, 5).select(F.col("id"), F.lit("a").alias("v")))
    t.create_branch("stage")
    staged = t.append(
        spark.range(5, 9).select(F.col("id"), F.lit("b").alias("v")),
        branch="stage",
    )
    t.append(spark.range(9, 12).select(F.col("id"), F.lit("c").alias("v")))
    out = SqlEngine(spark).sql(
        "CALL iceberg.system.cherrypick_snapshot("
        f"table => '{t.location}', snapshot_id => '{staged.snapshot_id}')"
    ).collect()
    assert out[0]["source_snapshot_id"] == staged.snapshot_id
    assert out[0]["current_snapshot_id"] == t._refs()["main"]
    assert t.read().count() == 12


def test_curate_publish_wap_roundtrip(spark, tmp_path, sf_dir):
    """The curation pipeline landing in a WAP-governed table: the pack
    manifest publishes through the audit branch when clean (main rows
    == manifest packs, audit counters all zero), the WAP branch is
    gone afterwards, and main's content equals the directly-computed
    manifest. A second run into the same table appends through a fresh
    audit cycle (packs accumulate on main only after publish)."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_corpus,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import curate_publish

    loc = str(tmp_path / "curated")
    report = curate_publish(spark, sf_dir, loc, run_label="2024-01-01")
    assert report["published"] is True
    assert report["null_rows"] == 0
    assert report["dup_keys"] == 0
    assert report["bad_packs"] == 0
    want = {
        ("2024-01-01",) + tuple(r)
        for r in pipeline_curate_corpus(spark, sf_dir).collect()
    }
    t = VersionedTable.load(spark, loc)
    got = {
        (
            r["run"],
            r["shard"],
            r["pack_id"],
            r["n_docs"],
            r["pack_tokens"],
            r["first_doc"],
            r["last_doc"],
        )
        for r in t.read().collect()
    }
    assert got == want
    assert report["packs"] == len(want)
    assert report["main_rows"] == len(want)
    # audit branch cleaned up
    assert "curate_audit" not in {
        r["name"] for r in t.refs().collect()
    }
    # a second nightly run under a new label appends through its own
    # audit cycle; re-publishing an EXISTING label fails the key audit
    # and leaves main untouched
    report2 = curate_publish(spark, sf_dir, loc, run_label="2024-01-02")
    assert report2["published"] is True
    assert report2["main_rows"] == 2 * len(want)
    report3 = curate_publish(spark, sf_dir, loc, run_label="2024-01-02")
    assert report3["published"] is False
    assert report3["dup_keys"] > 0
    assert report3["main_rows"] == 2 * len(want)


def test_curate_publish_drops_audit_branch_on_failure(
    spark, tmp_path, sf_dir, monkeypatch
):
    """r13 ADVICE #2: an exception during the publish (or anywhere
    between append and audit) must not leave a stale curate_audit
    branch — the next run would inherit its unaudited rows and
    spuriously fail that run's dup-key audit. The drop now runs in a
    finally, so after a crashed run the branch is gone and a retry
    publishes cleanly."""
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import curate_publish

    loc = str(tmp_path / "curated_crash")

    def boom(self, to_branch, from_branch):
        raise RuntimeError("simulated commit-service outage")

    monkeypatch.setattr(VersionedTable, "fast_forward", boom)
    with pytest.raises(RuntimeError, match="outage"):
        curate_publish(spark, sf_dir, loc, run_label="day1")
    t = VersionedTable.load(spark, loc)
    assert "curate_audit" not in {r["name"] for r in t.refs().collect()}
    assert t.read().count() == 0  # nothing reached main

    # retry after the outage clears: publishes, and the dup-key audit
    # sees only THIS run's rows (no stale-branch inheritance)
    monkeypatch.undo()
    report = curate_publish(spark, sf_dir, loc, run_label="day1")
    assert report["published"] is True
    assert report["dup_keys"] == 0


def test_curate_ingest_day_publishes_through_wap(spark, tmp_path, sf_dir):
    """The steady-state loop end to end: the day's incremental
    manifest lands through the same WAP governance gate as the
    backfill, labeled by day; re-ingesting the same day fails the key
    audit and leaves main untouched."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import curate_ingest_day

    docs = load_table(spark, sf_dir, "documents")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    t = ids[int(len(ids) * 0.9)]
    old = docs.filter(F.col("doc_id") < t)
    day = docs.filter(F.col("doc_id") >= t)
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    state = build_curate_state(spark, old, w2, keep_micro)

    loc = str(tmp_path / "curated_daily")
    report = curate_ingest_day(
        spark, state, day, loc, run_label="2024-02-01"
    )
    assert report["published"] is True
    assert report["packs"] > 0
    want = {
        ("2024-02-01",) + tuple(r)
        for r in pipeline_curate_ingest_day(spark, state, day).collect()
    }
    table = VersionedTable.load(spark, loc)
    got = {tuple(r) for r in table.read().collect()}
    assert got == want
    # same-day re-ingest: key audit rejects, main untouched
    report2 = curate_ingest_day(
        spark, state, day, loc, run_label="2024-02-01"
    )
    assert report2["published"] is False
    assert report2["dup_keys"] > 0
    assert {tuple(r) for r in table.read().collect()} == want


def test_curate_backfill_then_ingest_day_roundtrip(
    spark, tmp_path, sf_dir
):
    """The whole production loop through the workflows layer: nightly
    curate_backfill (train → one shared filter chain → state + WAP
    publish, manifest EQUAL to pipeline_curate_corpus's), then a day
    of genuinely new docs — reversed-token texts (new fingerprints and
    shingles, but identical unigram heuristics/LR features to their
    originals) mixed with verbatim re-ids (pure duplicates) — ingested
    against the standing state: the duplicates all drop at the exact
    probe, reversed docs survive exactly when their original's
    heuristic+LR decisions pass, and the day manifest lands under its
    own run label."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_corpus,
    )
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import (
        curate_backfill,
        curate_ingest_day,
    )

    loc = str(tmp_path / "curated_loop")
    state, report = curate_backfill(
        spark,
        sf_dir,
        loc,
        run_label="night0",
        state_dir=str(tmp_path / "standing_state"),
    )
    assert report["published"] is True
    want_full = {
        ("night0",) + tuple(r)
        for r in pipeline_curate_corpus(spark, sf_dir).collect()
    }
    table = VersionedTable.load(spark, loc)
    assert {tuple(r) for r in table.read().collect()} == want_full

    docs = load_table(spark, sf_dir, "documents")
    base = state.max_doc_id + 1
    reversed_docs = docs.select(
        (F.col("doc_id") + base).alias("doc_id"),
        F.array_join(F.reverse(F.split("text", " ")), " ").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    dup_docs = docs.select(
        (F.col("doc_id") + 2 * base).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).limit(20)
    day = reversed_docs.unionByName(dup_docs)

    report2 = curate_ingest_day(spark, state, day, loc, run_label="day1")
    assert report2["published"] is True
    got_day = {
        tuple(r)
        for r in table.read().filter(F.col("run") == "day1").collect()
    }
    assert got_day, "reversed-text day docs should survive"
    # verbatim re-ids are exact-probe hits: no day pack may contain one
    day_doc_ids = {
        r["first_doc"] for r in table.read()
        .filter(F.col("run") == "day1").collect()
    } | {
        r["last_doc"] for r in table.read()
        .filter(F.col("run") == "day1").collect()
    }
    assert all(i < 2 * base for i in day_doc_ids), (
        "a pure-duplicate day doc leaked past the exact probe"
    )
    # the backfill rows are untouched
    assert {
        tuple(r)
        for r in table.read().filter(F.col("run") == "night0").collect()
    } == want_full


def test_expire_snapshots_retain_zero_drops_dangling_tail(spark, tmp_path):
    """``retain_last=0`` retains NO timestamp tail: a dangling
    snapshot (a dropped audit branch's append) expires even as the
    table's newest — the storage-GC form a torn write-audit-publish
    commit needs. Branch ancestry stays live regardless. (Guards the
    ``[-0:]`` slicing edge, which would have kept EVERYTHING.)"""
    import pytest

    from iceberg_by_example_spark.tables.versioned import VersionedTable

    t = VersionedTable.create(
        spark, str(tmp_path / "rz"), schema="id bigint"
    )
    t.append(spark.range(0, 1))
    keep = t.append(spark.range(1, 2))
    t.create_branch("wap")
    torn = t.append(spark.range(2, 3), branch="wap")
    t.drop_branch("wap")

    with pytest.raises(ValueError, match="retain_last"):
        t.expire_snapshots(retain_last=-1)
    expired = t.expire_snapshots(retain_last=0)
    assert expired == [torn.snapshot_id]
    # main's full ancestry survived — history still reads
    assert t.read().count() == 2
    assert t.read(snapshot_id=keep.snapshot_id).count() == 2
    # the expired append's data files are orphans now, and reclaimable
    orphans = t.remove_orphan_files()
    assert orphans
    assert t.read().count() == 2
