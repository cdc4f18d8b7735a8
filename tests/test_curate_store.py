"""Atomic versioned curation-state store (tables/curate_store.py).

The r15 pins, per the round-14 verdict's top item:

- a day's advance is ONE publish (the pointer append) — a failure
  injected between index writes leaves the previous state readable
  and the torn branches discarded;
- a multi-day chain through the ON-DISK store equals both the full
  recompute over all slices and the in-memory advance chain
  (isolating serialization drift);
- time-travel (``as_of`` / ``log_snapshot_id``) reproduces a past
  day's state exactly, and re-running a day's ingest from it
  reproduces that day's decisions;
- the per-day commit writes O(batch) bytes — the standing index is
  never rewritten.
"""

import os

import pytest
from pyspark.sql import functions as F

import sys

sys.path.insert(0, "/root/repo")


def _dir_bytes(root: str) -> int:
    total = 0
    for r, _d, names in os.walk(root):
        for n in names:
            total += os.path.getsize(os.path.join(r, n))
    return total


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Four monotone doc_id slices of the sf0.001 documents table:
    OLD (70%) + three ingest days, plus the stored model constants."""
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[int(len(ids) * p)] for p in (0.7, 0.8, 0.9)]
    old = docs.filter(F.col("doc_id") < cuts[0])
    d1 = docs.filter(
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
    )
    d2 = docs.filter(
        (F.col("doc_id") >= cuts[1]) & (F.col("doc_id") < cuts[2])
    )
    d3 = docs.filter(F.col("doc_id") >= cuts[2])
    w2, keep_micro = batch_trained_filter(spark, sf_dir)
    return dict(
        docs=docs, old=old, days=[d1, d2, d3], w2=w2,
        keep_micro=keep_micro,
    )


def _state_rows(st):
    """Canonical row-set form of every relation of a CurateState."""

    def rows(df):
        return sorted(map(tuple, df.collect())) if df is not None else None

    return {
        "fp_index": rows(st.fp_index),
        "shingle_index": rows(st.shingle_index),
        "shingle_census": rows(st.shingle_census),
        "bench_vocab": rows(st.bench_vocab),
        "source_stats": rows(st.source_stats),
        "winnow_index": rows(st.winnow_index),
        "winnow_census": rows(st.winnow_census),
        "max_doc_id": st.max_doc_id,
        "w2": list(st.w2),
        "keep_micro": st.keep_micro,
    }


def test_store_multiday_chain_equals_fresh_and_memory(
    spark, sf_dir, corpus, tmp_path
):
    """The inductive soak (r14 VERDICT #3): chain THREE ingest days
    through the on-disk store — read_state → ingest → commit_day →
    read_state — and pin (a) each day's survivor set to the full
    recompute's cross-slice over everything ingested so far, (b) the
    final stored state to a fresh ``build_curate_state`` over all
    four slices, and (c) the final stored state to the in-memory
    ``advance_curate_state`` chain (no disk round-trip), isolating
    serialization drift. Also pins the commit-size shape: each day's
    on-disk delta is O(batch) bytes, never an index rewrite."""
    from iceberg_by_example_spark.operators.pipeline import (
        advance_curate_state,
        build_curate_state,
        curate_survivors_for,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, days = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    bytes_after = [_dir_bytes(store.root)]

    mem_state = st0
    cum = old
    for i, day in enumerate(days, start=1):
        disk_state, meta = store.read_state()
        surv = pipeline_curate_ingest_day(
            spark, disk_state, day, return_survivors=True
        )
        # (a) cross-slice: the day's survivors through the STORED
        # state equal the full-chain survivors over everything
        # ingested so far, restricted to the day's ids
        cum = cum.unionByName(day)
        want = curate_survivors_for(spark, cum, w2, keep_micro)
        day_ids = {r["doc_id"] for r in day.select("doc_id").collect()}
        want_day = {
            r["doc_id"]
            for r in want.collect()
            if r["doc_id"] in day_ids
        }
        got_day = {r["doc_id"] for r in surv.collect()}
        assert got_day == want_day, f"day {i} survivor drift"
        store.commit_day(day, surv, day=f"day{i}")
        bytes_after.append(_dir_bytes(store.root))
        # the in-memory twin chain advances from the SAME survivors
        mem_state = advance_curate_state(spark, mem_state, day, surv)

    final, meta = store.read_state()
    fresh = build_curate_state(
        spark, corpus["docs"], w2, keep_micro
    )
    got, want_fresh, want_mem = (
        _state_rows(final),
        _state_rows(fresh),
        _state_rows(mem_state),
    )
    # (c) store == in-memory chain, relation for relation (pure
    # serialization-drift isolation: same decisions, same deltas)
    assert got == want_mem
    # (b) store == fresh rebuild over all four slices; source_stats
    # rides the same retroactive-decontamination caveat the
    # single-step pin guards (advance_curate_state docstring) —
    # asserted last so a data-contingent flip reads as itself
    for k in (
        "fp_index", "shingle_index", "shingle_census", "bench_vocab",
        "winnow_index", "winnow_census", "max_doc_id", "w2",
        "keep_micro",
    ):
        assert got[k] == want_fresh[k], k
    assert got["source_stats"] == want_fresh["source_stats"]

    # commit-size shape: each day's on-disk delta is a small fraction
    # of the standing state (no O(index) rewrite), and later days do
    # not grow with days elapsed
    backfill_bytes = bytes_after[0]
    deltas = [
        bytes_after[i] - bytes_after[i - 1]
        for i in range(1, len(bytes_after))
    ]
    for i, d in enumerate(deltas, start=1):
        assert d < 0.5 * backfill_bytes, (
            f"day {i} rewrote {d} bytes vs backfill {backfill_bytes}"
        )
    assert max(deltas) < 3 * max(min(deltas), 1), (
        f"per-day bytes grew with days elapsed: {deltas}"
    )


def test_store_workflow_cycle_roundtrip(spark, sf_dir, corpus, tmp_path):
    """The Tier-A × Tier-B bridge on the versioned store: backfill
    lands as the store's day 0 plus a WAP-published manifest, each
    ``curate_cycle_day`` publishes the day's packs AND advances the
    state in one pointer commit, re-running a day double-publishes
    nothing (the manifest's duplicate-key audit fails and the state
    is left unadvanced), and the cycle's survivors equal the plain
    in-memory ingest's — the store changes durability, never
    decisions."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import (
        MAIN,
        VersionedTable,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_backfill,
        curate_cycle_day,
    )

    d1, d2 = corpus["days"][0], corpus["days"][1]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    loc = str(tmp_path / "packs")

    # the backfill runs over OLD only (the split fixture's corpus) —
    # feed a scratch dir holding just the OLD slice
    old_dir = str(tmp_path / "sfold")
    os.makedirs(old_dir)
    corpus["old"].write.parquet(
        os.path.join(old_dir, "documents.parquet")
    )
    state, report = curate_backfill(
        spark, old_dir, loc, state_store=store
    )
    assert report["published"]
    assert store.days() == ["backfill"]

    cyc = curate_cycle_day(spark, store, d1, loc, day="day1")
    assert cyc["manifest"]["published"]
    assert cyc["state"]["day"] == "day1"
    assert store.days() == ["backfill", "day1"]

    # the cycle's decisions equal the plain in-memory ingest's over
    # the same committed state
    s_bf, _ = store.read_state(as_of="backfill")
    surv_plain = pipeline_curate_ingest_day(
        spark, s_bf, d1, return_survivors=True
    )
    table = VersionedTable.load(spark, loc)
    day1_packs = table.read(branch=MAIN).filter(
        F.col("run") == "day1"
    )
    assert day1_packs.count() > 0
    got_tokens = day1_packs.agg(F.sum("pack_tokens")).collect()[0][0]
    assert got_tokens > 0
    assert surv_plain.count() >= day1_packs.agg(
        F.sum("n_docs")
    ).collect()[0][0]

    # re-running a fully committed day fails FAST as the re-publish
    # guard (before any gate work), leaving both tables untouched
    with pytest.raises(ValueError, match="already committed"):
        curate_cycle_day(spark, store, d1, loc, day="day1")
    assert store.days() == ["backfill", "day1"]
    assert table.read(branch=MAIN).filter(
        F.col("run") == "day1"
    ).count() == day1_packs.count()

    # and the next day proceeds normally on the advanced state
    cyc2 = curate_cycle_day(spark, store, d2, loc, day="day2")
    assert cyc2["manifest"]["published"]
    assert store.days() == ["backfill", "day1", "day2"]


def test_store_torn_commit_leaves_previous_state_readable(
    spark, corpus, tmp_path, monkeypatch
):
    """The atomicity pin (r14 VERDICT #1's done-criterion): inject a
    failure BETWEEN index writes — after some relation deltas landed
    on their audit branches but before the pointer append — and
    assert the previous state is exactly readable, the day is not
    committed, the torn branches are discarded, and a retry of the
    same day succeeds cleanly."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    before = _state_rows(store.read_state()[0])

    surv = pipeline_curate_ingest_day(
        spark, store.read_state()[0], day, return_survivors=True
    )

    real_append = VersionedTable.append
    calls = {"n": 0}

    def failing_append(self, df, branch=None, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # mid-commit: after 2 relation deltas
            raise RuntimeError("injected crash between index writes")
        return real_append(self, df, branch=branch, **kw)

    monkeypatch.setattr(VersionedTable, "append", failing_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.commit_day(day, surv, day="day1")
    monkeypatch.setattr(VersionedTable, "append", real_append)

    # previous state exactly readable; the torn day never published
    assert store.days() == ["day0"]
    assert _state_rows(store.read_state()[0]) == before
    # the in-commit abort dropped the day branches
    for name in ("fp_index", "shingle_index"):
        t = VersionedTable.load(spark, os.path.join(store.root, name))
        assert not any(
            b.startswith("ingest_day1") for b in t.branches()
        )
    # retry of the same day succeeds and publishes exactly once
    report = store.commit_day(day, surv, day="day1")
    assert report["day"] == "day1"
    assert store.days() == ["day0", "day1"]
    # duplicate-day re-ingest is rejected (the re-publish guard)
    with pytest.raises(ValueError, match="already committed"):
        store.commit_day(day, surv, day="day1")


def test_store_time_travel_reproduces_past_decisions(
    spark, corpus, tmp_path
):
    """Rollback semantics: reading the state AS OF day N-1 and
    re-running day N's ingest against it reproduces day N's original
    survivor decisions exactly — and resolving the POINTER at a
    historic snapshot (``log_snapshot_id``, the engine's VERSION AS
    OF applied to the state log) gives the same state as
    ``as_of``."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    s0, _ = store.read_state()
    surv1 = pipeline_curate_ingest_day(
        spark, s0, d1, return_survivors=True
    )
    ids1 = {r["doc_id"] for r in surv1.collect()}
    store.commit_day(d1, surv1, day="day1")

    s1, _ = store.read_state()
    surv2 = pipeline_curate_ingest_day(
        spark, s1, d2, return_survivors=True
    )
    ids2 = {r["doc_id"] for r in surv2.collect()}
    store.commit_day(d2, surv2, day="day2")

    # time-travel to day1 and replay day2's ingest: identical decisions
    s1_tt, meta1 = store.read_state(as_of="day1")
    replay = pipeline_curate_ingest_day(
        spark, s1_tt, d2, return_survivors=True
    )
    assert {r["doc_id"] for r in replay.collect()} == ids2
    assert meta1["day"] == "day1"

    # and to day0, replaying day1
    s0_tt, _ = store.read_state(as_of="day0")
    replay1 = pipeline_curate_ingest_day(
        spark, s0_tt, d1, return_survivors=True
    )
    assert {r["doc_id"] for r in replay1.collect()} == ids1

    # VERSION AS OF on the pointer itself: the log snapshot whose
    # summary carries day1 resolves to the same state as as_of="day1"
    log = store.log
    snaps = {}
    for s in log._snapshots():
        d = (s.summary or {}).get("curate-day")
        if d:
            snaps[d] = s.snapshot_id
    s1_vs, meta_vs = store.read_state(
        log_snapshot_id=snaps["day1"]
    )
    assert _state_rows(s1_vs) == _state_rows(s1_tt)
    assert meta_vs["day"] == "day1"


def test_store_commits_ignore_ambient_wap_session(
    spark, corpus, tmp_path
):
    """Governance interplay: the store's appends/reads pass explicit
    branches or pinned snapshot ids everywhere, so an ambient
    ``spark.wap.branch`` session (e.g. the manifest publish the daily
    workflow wraps around the same spark session) must NEVER reroute
    a state commit onto a WAP branch or a state read onto someone
    else's audit branch."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import wap_session

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    with wap_session(spark, "someone_elses_audit"):
        store.commit_backfill(
            build_curate_state(spark, old, w2, keep_micro), day="day0"
        )
        surv = pipeline_curate_ingest_day(
            spark, store.read_state()[0], day, return_survivors=True
        )
        store.commit_day(day, surv, day="day1")
        inside = _state_rows(store.read_state()[0])
    # identical outside the WAP session: nothing landed on (or was
    # read from) the ambient branch
    outside = _state_rows(store.read_state()[0])
    assert outside == inside
    assert store.days() == ["day0", "day1"]


def test_store_compact_preserves_state_and_shrinks_partials(
    spark, corpus, tmp_path
):
    """The LSM maintenance half: censuses/masses accumulate one
    partial partition per day, fingerprints/vocab one duplicate-able
    partition per day; ``compact`` rewrites each as its aggregate in
    one replace snapshot per relation + one pointer publish. Pins:
    the resolved state is IDENTICAL before and after (read-side
    aggregation means compaction is definitionally invisible), the
    stored partial rows shrink to the aggregate's count, pre-
    compaction days still time-travel, and the next day commits on
    the compacted base exactly as it would have."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import MAIN

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    for i, day in enumerate((d1, d2), start=1):
        surv = pipeline_curate_ingest_day(
            spark, store.read_state()[0], day, return_survivors=True
        )
        store.commit_day(day, surv, day=f"day{i}")

    before = _state_rows(store.read_state()[0])
    day1_before = _state_rows(store.read_state(as_of="day1")[0])
    census_tbl = store._table("shingle_census")
    pre_rows = census_tbl.read(branch=MAIN).count()

    rep = store.compact()
    assert {"shingle_census", "source_stats", "fp_index",
            "bench_vocab"} <= set(rep["compacted"])
    assert store.days()[-1] == rep["day"]

    after = _state_rows(store.read_state()[0])
    assert after == before
    post_rows = census_tbl.read(branch=MAIN).count()
    agg_rows = len(before["shingle_census"])
    assert post_rows == agg_rows
    assert post_rows <= pre_rows
    assert pre_rows > agg_rows  # non-vacuous: partials had accumulated

    # pre-compaction history still time-travels
    assert _state_rows(store.read_state(as_of="day1")[0]) == day1_before

    # the next day lands on the compacted base as if nothing happened
    surv3 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d3, return_survivors=True
    )
    store.commit_day(d3, surv3, day="day3")
    assert store.days()[-1] == "day3"
    s3, _ = store.read_state()
    assert s3.max_doc_id == max(
        r["doc_id"] for r in d3.select("doc_id").collect()
    )


def test_store_heal_finishes_published_housekeeping(
    spark, corpus, tmp_path, monkeypatch
):
    """The OTHER torn order: a crash AFTER the pointer append but
    before the relation fast_forwards. Readers are unaffected (they
    pin snapshot ids); ``heal`` — run implicitly by the next commit —
    must finish the fast_forwards so the next day's branches carry
    every published partition."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    surv1 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d1, return_survivors=True
    )

    real_ff = VersionedTable.fast_forward

    def failing_ff(self, to_branch, from_branch):
        raise RuntimeError("injected crash before housekeeping")

    monkeypatch.setattr(VersionedTable, "fast_forward", failing_ff)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.commit_day(d1, surv1, day="day1")
    monkeypatch.setattr(VersionedTable, "fast_forward", real_ff)

    # published (the pointer moved) even though housekeeping died
    assert store.days() == ["day0", "day1"]
    after_crash = _state_rows(store.read_state()[0])

    # the next commit heals first, then lands day2 on a main that
    # carries day1 — nothing lost, nothing doubled
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    store.commit_day(d2, surv2, day="day2")
    assert store.days() == ["day0", "day1", "day2"]
    assert _state_rows(store.read_state(as_of="day1")[0]) == after_crash
    # day2's state contains day1's fp partition (union survived heal)
    s2, _ = store.read_state()
    n_fp_all = s2.fp_index.count()
    s1, _ = store.read_state(as_of="day1")
    assert n_fp_all >= s1.fp_index.count()


def test_store_maintain_reclaims_torn_commit_garbage(
    spark, corpus, tmp_path, monkeypatch
):
    """``heal()`` promises a torn commit's appended files 'become
    unreferenced and remove_orphan_files can reclaim them later';
    ``maintain()`` is the later. Inject the same mid-commit crash the
    atomicity pin uses, then GC: the dangling snapshots expire, their
    data files are deleted (store bytes shrink), every committed
    day's read is untouched, a second maintain is a no-op, and the
    store still commits cleanly on the GC'd base."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    before = _state_rows(store.read_state()[0])

    surv = pipeline_curate_ingest_day(
        spark, store.read_state()[0], day, return_survivors=True
    )

    real_append = VersionedTable.append
    calls = {"n": 0}

    def failing_append(self, df, branch=None, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # after 2 relation deltas landed
            raise RuntimeError("injected crash between index writes")
        return real_append(self, df, branch=branch, **kw)

    monkeypatch.setattr(VersionedTable, "append", failing_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.commit_day(day, surv, day="day1")
    monkeypatch.setattr(VersionedTable, "append", real_append)

    bytes_before = _dir_bytes(store.root)
    report = store.maintain()
    expired = sum(
        r["expired_snapshots"] for r in report["tables"].values()
    )
    orphaned = sum(
        r["orphan_files_removed"] for r in report["tables"].values()
    )
    assert expired >= 2  # the two landed-then-aborted relation deltas
    assert orphaned >= 1
    assert _dir_bytes(store.root) < bytes_before
    # committed history untouched: latest and as_of both still exact
    assert store.days() == ["day0"]
    assert _state_rows(store.read_state()[0]) == before
    assert _state_rows(store.read_state(as_of="day0")[0]) == before
    # idempotent: a second pass finds nothing to GC
    again = store.maintain()
    assert (
        sum(r["expired_snapshots"] for r in again["tables"].values())
        == 0
    )
    assert (
        sum(
            r["orphan_files_removed"]
            for r in again["tables"].values()
        )
        == 0
    )
    # the GC'd base still takes the day's retry
    store.commit_day(day, surv, day="day1")
    assert store.days() == ["day0", "day1"]


def test_store_commit_carries_forward_missing_relation_pins(
    spark, corpus, tmp_path
):
    """A relation with NO delta on a later day must keep resolving at
    that day: ``_commit`` carries the previous pin forward into the
    pointer rows (the ``compact()`` stance) — ``_resolve`` reads only
    the target seq's rows, so omitting the relation would silently
    sever the standing index from every read at or after the day."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old = corpus["old"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    before = _state_rows(store.read_state()[0])

    meta = store._resolve(None, None)[1]
    report = store._commit(
        "day1",
        {"fp_index": spark.createDataFrame(
            [("not-a-real-fp",)], "fp string"
        )},
        meta={
            "w2": meta["w2"],
            "keep_micro": meta["keep_micro"],
            "max_doc_id": meta["max_doc_id"],
        },
    )
    assert report["relations"] == ["fp_index"]
    assert set(report["carried"]) == {
        "bench_vocab",
        "shingle_census",
        "shingle_index",
        "source_stats",
        "winnow_census",
        "winnow_index",
    }
    after = _state_rows(store.read_state()[0])
    # the delta landed on top of the standing fingerprints...
    assert ("not-a-real-fp",) in set(after["fp_index"])
    assert len(after["fp_index"]) == len(before["fp_index"]) + 1
    # ...and every delta-less relation still serves the carried pin
    for rel in (
        "shingle_index",
        "shingle_census",
        "bench_vocab",
        "source_stats",
        "winnow_index",
        "winnow_census",
    ):
        assert after[rel] == before[rel]
    # as_of day1 resolves all seven relations, none severed
    snaps, _ = store._resolve("day1", None)
    assert len(snaps) == 7


def test_store_rejects_reserved_and_empty_day_labels(
    spark, corpus, tmp_path
):
    """``compact()`` stamps its pointer rows ``compact<seq>`` through
    its own append path; a user day reusing that spelling would
    collide with a later compaction's label and make ``as_of``
    ambiguous — the commit path reserves it (and an empty label)."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store.commit_backfill(st0, day="day0")
    surv = pipeline_curate_ingest_day(
        spark, store.read_state()[0], day, return_survivors=True
    )
    with pytest.raises(ValueError, match="reserved for compaction"):
        store.commit_day(day, surv, day="compact1")
    with pytest.raises(ValueError, match="non-empty"):
        store.commit_day(day, surv, day="")
    # nothing landed: the guard fires before any branch is cut
    assert store.days() == ["day0"]
    for rel in ("fp_index", "shingle_index"):
        from iceberg_by_example_spark.tables.versioned import (
            VersionedTable,
        )

        t = VersionedTable.load(spark, os.path.join(store.root, rel))
        assert not [b for b in t.branches() if b.startswith("ingest_c")]


def test_store_probe_mirror_bucketed_exchange_free_and_stale_safe(
    spark, corpus, tmp_path
):
    """The bucketed probe mirror (``refresh_probe_mirror``): same
    rows as the plain pinned reads, exchange-free probe plans while
    the stamp covers the requested seq, SILENT fallback the moment a
    later day commits (the mirror is a physical-layout optimization,
    never a correctness dependency), and re-registration of the
    external bucketed tables when the session catalog lacks them."""
    from iceberg_by_example_spark.functions.text import fingerprint
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    surv1 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d1, return_survivors=True
    )
    store.commit_day(d1, surv1, day="day1")

    refreshed = store.refresh_probe_mirror()
    assert refreshed["mirrored"] == [
        "fp_index",
        "shingle_index",
        "winnow_index",
    ]

    plain = store.read_state(prefer_mirror=False)[0]
    mirrored = store.read_state()[0]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for relname in ("fp_index", "shingle_index", "winnow_index"):
        assert rows(getattr(mirrored, relname)) == rows(
            getattr(plain, relname)
        ), relname

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the fingerprint anti-join: index side reads its buckets,
        # only the O(batch) side exchanges (plan read BEFORE
        # executing — AQE bookkeeping double-counts after)
        probe = d2.select(
            fingerprint("text").alias("fp"), "doc_id"
        ).join(mirrored.fp_index, "fp", "left_anti")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1
        # decisions are layout-independent: full gate chain equal
        s_m = {
            r["doc_id"]
            for r in pipeline_curate_ingest_day(
                spark, mirrored, d2, return_survivors=True
            ).select("doc_id").collect()
        }
        s_p = {
            r["doc_id"]
            for r in pipeline_curate_ingest_day(
                spark, plain, d2, return_survivors=True
            ).select("doc_id").collect()
        }
        assert s_m == s_p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # staleness: a later commit silently falls back to plain reads
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    store.commit_day(d2, surv2, day="day2")
    stale = store.read_state()[0]
    fp_plan = (
        stale.fp_index._jdf.queryExecution().executedPlan().toString()
    )
    assert "_seq" not in fp_plan  # no mirror table scan
    d2_fps = {
        r["fp"]
        for r in d2.select(fingerprint("text").alias("fp"))
        .distinct()
        .collect()
    }
    assert d2_fps <= {r["fp"] for r in stale.fp_index.collect()}
    # as_of the day the stamp covers → the mirror serves again (a
    # BARE scan shows Bucketed: false — DisableUnnecessaryBucketedScan
    # — so bucket exploitation is asserted on join plans only)
    again = store.read_state(as_of="day1")[0]
    ap = again.fp_index._jdf.queryExecution().executedPlan().toString()
    assert "fp_index_seq" in ap
    # fresh-session catalog: drop the entries (files stay — the
    # tables are external); read_state re-registers from the stamp
    import json as _json

    with open(os.path.join(store._mirror_dir(), "_STAMP")) as f:
        stamped = _json.load(f)["tables"]
    for info in stamped.values():
        spark.sql(f"DROP TABLE {info['table']}")
    re_read = store.read_state(as_of="day1")[0]
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        reprobe = d2.select(
            fingerprint("text").alias("fp"), "doc_id"
        ).join(re_read.fp_index, "fp", "left_anti")
        rp = (
            reprobe._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in rp
        assert rp.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rows(re_read.fp_index) == rows(plain.fp_index)


def test_backfill_refresh_mirror_serves_bucketed_state(
    spark, sf_dir, tmp_path
):
    """``curate_backfill(state_store=..., refresh_mirror=True)``
    refreshes the bucketed probe mirror in the same nightly window
    and hands back a state whose join-probed relations read from the
    mirror tables."""
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_backfill,
    )

    store = CurateStateStore(spark, str(tmp_path / "store"))
    state, report = curate_backfill(
        spark,
        sf_dir,
        str(tmp_path / "packs"),
        state_store=store,
        refresh_mirror=True,
    )
    assert report["published"]
    plan = (
        state.fp_index._jdf.queryExecution().executedPlan().toString()
    )
    assert "fp_index_seq0" in plan  # served from the mirror
    # and the mirror rows equal the plain pinned read
    plain = store.read_state(prefer_mirror=False)[0]
    assert sorted(r["fp"] for r in state.fp_index.collect()) == sorted(
        r["fp"] for r in plain.fp_index.collect()
    )


def test_ingest_releases_candidate_pair_cache(spark, corpus):
    """The gates' candidate-pair persist (incremental_jaccard_pairs)
    is a CacheManager entry that never self-reclaims (strong ref —
    ContextCleaner can't collect it). Ownership contract: the
    survivors path releases it in its own finally (detach
    materialized everything first); a caller passing cache_registry
    owns the unpersist."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    state = build_curate_state(spark, old, w2, keep_micro)

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    surv = pipeline_curate_ingest_day(
        spark, state, day, return_survivors=True
    )
    surv.count()
    assert cm.isEmpty(), "candidate-pair persist leaked"
    # pack mode too (r15 review follow-up): the manifest is
    # detach-materialized in-function, so the default call leaks
    # nothing either
    manifest = pipeline_curate_ingest_day(spark, state, day)
    manifest.count()
    assert cm.isEmpty(), "pack-mode candidate-pair persist leaked"
    # explicit registry: the caller owns the lifetime
    reg: list = []
    surv2 = pipeline_curate_ingest_day(
        spark, state, day, return_survivors=True, cache_registry=reg
    )
    surv2.count()
    assert len(reg) == 1 and not cm.isEmpty()
    for df in reg:
        df.unpersist()
    assert cm.isEmpty()
    # a caller-persisted batch survives the call (is_cached guard:
    # persist isn't refcounted, a blind re-persist would drop it)
    day_p = day.persist()
    try:
        day_p.count()
        pipeline_curate_ingest_day(
            spark, state, day_p, return_survivors=True
        ).count()
        assert day_p.is_cached
    finally:
        day_p.unpersist()
    assert cm.isEmpty()


def test_mirror_refresh_crash_leaves_previous_mirror_intact(
    spark, corpus, tmp_path, monkeypatch
):
    """Write-then-swap (r15 review #1): a crash mid-refresh must
    leave the PREVIOUS stamp pointing at intact tables — never a
    current-looking stamp over gutted dirs that would serve an EMPTY
    standing index into the dedup gates. And a stamped dir that goes
    missing anyway degrades to the PLAIN pinned reads, not to an
    empty re-registered table."""
    import json as _json
    import shutil

    from pyspark.sql.readwriter import DataFrameWriter

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old = corpus["old"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    store.refresh_probe_mirror()

    def rows(df):
        return sorted(r["fp"] for r in df.collect())

    want = rows(store.read_state(prefer_mirror=False)[0].fp_index)
    assert rows(store.read_state()[0].fp_index) == want

    real_save = DataFrameWriter.saveAsTable
    calls = {"n": 0}

    def failing_save(self, name, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # after the first relation landed
            raise RuntimeError("injected crash mid-refresh")
        return real_save(self, name, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "saveAsTable", failing_save)
    with pytest.raises(RuntimeError, match="mid-refresh"):
        store.refresh_probe_mirror()
    monkeypatch.setattr(DataFrameWriter, "saveAsTable", real_save)

    # previous stamp + tables intact: the mirror still serves, with
    # the SAME rows — not an empty index
    st = store.read_state()[0]
    plan = st.fp_index._jdf.queryExecution().executedPlan().toString()
    assert "fp_index_seq0" in plan
    assert rows(st.fp_index) == want and len(want) > 0
    # a retry completes and retires the torn leftovers
    store.refresh_probe_mirror()
    assert rows(store.read_state()[0].fp_index) == want

    # a stamped dir that disappears → plain fallback, never empty
    with open(os.path.join(store._mirror_dir(), "_STAMP")) as f:
        stamped = _json.load(f)["tables"]
    info = stamped["fp_index"]
    spark.sql(f"DROP TABLE IF EXISTS {info['table']}")
    shutil.rmtree(info["dir"])
    st2 = store.read_state()[0]
    p2 = st2.fp_index._jdf.queryExecution().executedPlan().toString()
    assert "fp_index_seq" not in p2  # plain path, no mirror scan
    assert rows(st2.fp_index) == want


def test_curate_maintain_composite_nightly_window(
    spark, corpus, tmp_path
):
    """``workflows.curate_maintain``: compact → mirror refresh → GC
    as one nightly window. State identical before/after, the mirror
    serves the compacted seq, the GC is clean, and the next day
    commits on the maintained base."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_maintain,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    surv1 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d1, return_survivors=True
    )
    store.commit_day(d1, surv1, day="day1")
    before = _state_rows(store.read_state(prefer_mirror=False)[0])

    report = curate_maintain(store)
    assert report["compact"]["day"] == "compact2"
    assert report["mirror"]["seq"] == 2
    # state identical through the whole window, and the mirror serves
    # the compacted seq
    st = store.read_state()[0]
    plan = st.fp_index._jdf.queryExecution().executedPlan().toString()
    assert "fp_index_seq2" in plan
    assert _state_rows(st) == before
    assert _state_rows(store.read_state(prefer_mirror=False)[0]) == (
        before
    )
    # the next day commits on the maintained base and falls back to
    # plain reads (mirror now stale) without losing anything
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    store.commit_day(d2, surv2, day="day2")
    after = store.read_state()[0]
    d2_ids = {r["doc_id"] for r in d2.select("doc_id").collect()}
    got = {
        r["doc_id"]
        for r in after.shingle_index.select("doc_id")
        .distinct()
        .collect()
    }
    assert d2_ids <= got


def test_commit_day_preserves_caller_batch_cache(
    spark, corpus, tmp_path
):
    """``commit_day`` must not drop a caller's cache of the batch
    (r15 review #2): persist isn't refcounted, so its internal
    persist is guarded by ``is_cached``."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, day = corpus["old"], corpus["days"][0]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    day_p = day.persist()
    try:
        surv = pipeline_curate_ingest_day(
            spark, store.read_state()[0], day_p, return_survivors=True
        )
        store.commit_day(day_p, surv, day="day1")
        assert day_p.is_cached, "commit_day dropped the caller's cache"
    finally:
        day_p.unpersist()
    assert store.days() == ["day0", "day1"]


def test_store_pointer_cas_double_fire_loses_loudly(
    spark, corpus, tmp_path
):
    """The r15 verdict's CAS item: the pointer append is a
    compare-and-swap on the log head the commit derived its rows
    from. A double-fired scheduler — the second fire working from a
    STALE observation taken before the first fire published — must
    raise ``CommitConflictError`` at the publish, before anything
    becomes visible, instead of landing a duplicate seq. Exactly one
    winner; the loser leaves no branches and no pointer rows; the
    store state equals the winner's; a retry with a fresh
    observation lands cleanly."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import (
        CommitConflictError,
        VersionedTable,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    surv = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d1, return_survivors=True
    )

    # both fires observe the log BEFORE either publishes
    stale = store._log_state()
    store.commit_day(d1, surv, day="day1")  # first fire wins
    winner = _state_rows(store.read_state()[0])

    real_log_state = CurateStateStore._log_state
    CurateStateStore._log_state = lambda self: stale
    try:
        with pytest.raises(CommitConflictError):
            store.commit_day(d1, surv, day="day1")
    finally:
        CurateStateStore._log_state = real_log_state

    # the loser left nothing: one day1, unique seqs, winner's state
    assert store.days() == ["day0", "day1"]
    rows = store._log_rows()
    assert len({r["seq"] for r in rows}) == len(
        {(r["seq"], r["day"]) for r in rows}
    )
    assert _state_rows(store.read_state()[0]) == winner
    for name in ("fp_index", "shingle_index"):
        t = VersionedTable.load(spark, os.path.join(store.root, name))
        assert not [b for b in t.branches() if b.startswith("ingest_")]
    # a fresh observation retries cleanly onto the winner's base
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    report = store.commit_day(d2, surv2, day="day2")
    assert report["seq"] == 2
    assert store.days() == ["day0", "day1", "day2"]


def test_store_threaded_double_fire_exactly_one_winner(
    spark, corpus, tmp_path
):
    """Two genuinely concurrent commits of the SAME day (the
    double-fired scheduler, threads sharing the session): exactly one
    returns a report, the other raises loudly (the pointer CAS or the
    duplicate-day guard, depending on where the race lands), and the
    final store equals a single clean commit — no duplicate seq, no
    leftover branches affecting reads, next day lands cleanly.
    Deterministic because commit-path ``heal`` never discards another
    writer's in-flight branches (finish-only) and branch names are
    nonce'd, so the only contended edge is the CAS'd pointer append."""
    import threading

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import (
        CommitConflictError,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    surv = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d1, return_survivors=True
    )

    barrier = threading.Barrier(2)
    results: dict = {}

    def fire(tag: str) -> None:
        barrier.wait()
        try:
            results[tag] = ("ok", store.commit_day(d1, surv, day="day1"))
        except Exception as e:  # noqa: BLE001 — the loser's error IS the assertion
            results[tag] = ("err", e)

    threads = [
        threading.Thread(target=fire, args=(t,)) for t in ("a", "b")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    oks = [v for v in results.values() if v[0] == "ok"]
    errs = [v for v in results.values() if v[0] == "err"]
    assert len(oks) == 1 and len(errs) == 1, results
    assert isinstance(errs[0][1], (CommitConflictError, ValueError)), errs
    assert store.days() == ["day0", "day1"]
    rows = store._log_rows()
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault(r["seq"], set()).add(r["day"])
    assert all(len(days) == 1 for days in by_seq.values()), by_seq
    # the surviving state is readable and day2 lands on it cleanly
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    report = store.commit_day(d2, surv2, day="day2")
    assert report["seq"] == 2
    assert store.days() == ["day0", "day1", "day2"]


def test_store_retention_bounds_history_and_reclaims_bytes(
    spark, corpus, tmp_path
):
    """``maintain(retain_days=N)`` (r15 verdict #1): expire pointer
    entries older than the newest N, truncate the log's and each
    relation's history to the oldest retained pin, and let the GC
    trio reclaim what only the expired days pinned — the
    pre-compaction partials above all. Pins: bytes SHRINK vs an
    already-GC'd baseline; ``as_of`` inside the horizon is
    bit-identical; outside it raises the clean day-not-committed
    error and historic ``log_snapshot_id`` the clean unknown-snapshot
    error (never a missing-file crash); the next commit lands on the
    retained base with a never-reused seq; idempotent."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    for day, label in ((d1, "day1"), (d2, "day2")):
        surv = pipeline_curate_ingest_day(
            spark, store.read_state()[0], day, return_survivors=True
        )
        store.commit_day(day, surv, day=label)
    old_log_snapshot = store.log.current_snapshot_id()
    store.compact()  # seq 3, label compact3
    inside_day2 = _state_rows(store.read_state(as_of="day2")[0])
    inside_latest = _state_rows(store.read_state()[0])

    # GC'd baseline first, so the shrink isolates RETENTION's effect
    store.maintain()
    bytes_before = _dir_bytes(store.root)

    report = store.maintain(retain_days=2)
    assert report["retention"]["expired_days"] == ["day0", "day1"]
    assert report["retention"]["cutoff_seq"] == 2
    bytes_after = _dir_bytes(store.root)
    assert bytes_after < bytes_before, (bytes_before, bytes_after)

    # inside the horizon: bit-identical
    assert store.days() == ["day2", "compact3"]
    assert _state_rows(store.read_state(as_of="day2")[0]) == inside_day2
    assert _state_rows(store.read_state()[0]) == inside_latest
    # outside: clean errors, not missing-file crashes
    with pytest.raises(ValueError, match="not committed"):
        store.read_state(as_of="day1")
    with pytest.raises(ValueError, match="unknown snapshot"):
        store.read_state(log_snapshot_id=old_log_snapshot)

    # idempotent: nothing further expires
    report2 = store.maintain(retain_days=2)
    assert report2["retention"]["expired_days"] == []
    assert _state_rows(store.read_state()[0]) == inside_latest

    # the next commit lands on the retained base, seq never reused
    surv3 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d3, return_survivors=True
    )
    report3 = store.commit_day(d3, surv3, day="day3")
    assert report3["seq"] == 4
    assert store.days() == ["day2", "compact3", "day3"]
    # and the new day's state still carries every retained partition
    s_new, _ = store.read_state()
    s_old, _ = store.read_state(as_of="compact3")
    assert s_new.fp_index.count() >= s_old.fp_index.count()


def test_store_cycle_resume_completes_crashed_day(
    spark, corpus, tmp_path, monkeypatch
):
    """``curate_cycle_day(resume=True)`` (r15 verdict #4): inject a
    crash BETWEEN the manifest publish and the state commit, then one
    resume call completes the state half FROM THE PUBLISHED MANIFEST
    (the survivor masses ride its snapshot summary — the gates do not
    re-run) and the final state is identical to an uninterrupted
    day's on a twin store. Also pins the no-op idempotency, the
    fail-fast of a plain re-run, and the recomputed-gates fallback
    for a manifest published without the breadcrumb."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        curate_pack_day,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
        curate_publish,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store1 = CurateStateStore(spark, str(tmp_path / "s1"))
    store2 = CurateStateStore(spark, str(tmp_path / "s2"))
    store1.commit_backfill(st0, day="day0")
    store2.commit_backfill(st0, day="day0")
    loc1 = str(tmp_path / "packs1")
    loc2 = str(tmp_path / "packs2")

    real_commit_day = CurateStateStore.commit_day

    def failing_commit_day(self, *a, **kw):
        raise RuntimeError("injected crash between the two commits")

    monkeypatch.setattr(
        CurateStateStore, "commit_day", failing_commit_day
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        curate_cycle_day(spark, store1, d1, loc1, day="day1")
    monkeypatch.setattr(CurateStateStore, "commit_day", real_commit_day)

    # the crash window: manifest published, state unadvanced
    assert store1.days() == ["day0"]
    out = curate_cycle_day(
        spark, store1, d1, loc1, day="day1", resume=True
    )
    assert out["resumed_via"] == "summary_masses"
    assert out["state"]["day"] == "day1"
    assert store1.days() == ["day0", "day1"]

    # identical to an uninterrupted day on the twin store
    out2 = curate_cycle_day(spark, store2, d1, loc2, day="day1")
    assert out2["manifest"]["published"] and out2["state"] is not None
    assert _state_rows(store1.read_state()[0]) == _state_rows(
        store2.read_state()[0]
    )

    # idempotent: a further resume is a no-op; a plain re-run fails
    out3 = curate_cycle_day(
        spark, store1, d1, loc1, day="day1", resume=True
    )
    assert out3["resumed_via"] == "noop"
    with pytest.raises(ValueError, match="already committed"):
        curate_cycle_day(spark, store1, d1, loc1, day="day1")

    # breadcrumb-less manifest (an older writer): resume falls back
    # to re-running the deterministic gates — same final state
    s1_state = store1.read_state()[0]
    surv2 = pipeline_curate_ingest_day(
        spark, s1_state, d2, return_survivors=True
    )
    manifest2 = curate_pack_day(surv2, s1_state)
    curate_publish(
        spark, sf_dir="", location=loc1, run_label="day2",
        manifest=manifest2,
    )
    out4 = curate_cycle_day(
        spark, store1, d2, loc1, day="day2", resume=True
    )
    assert out4["resumed_via"] == "recomputed_gates"
    assert store1.days() == ["day0", "day1", "day2"]
    # resume=True is safe as an ALWAYS-ON flag: on a day where nothing
    # landed yet it runs the normal full path (manifest + state)
    out5 = curate_cycle_day(
        spark, store2, d2, loc2, day="day2", resume=True
    )
    assert out5["manifest"]["published"] and out5["state"] is not None
    assert _state_rows(store1.read_state()[0]) == _state_rows(
        store2.read_state()[0]
    )


def test_mirror_staleness_counter_and_one_generation_retirement(
    spark, corpus, tmp_path
):
    """r15 verdict #7 + ADVICE #1/#2: ``read_state`` reports which
    layout served (``meta["mirror"]``: served / stamp_seq /
    stale_days — 0 while the mirror serves, rising per commit,
    reset by ``refresh_probe_mirror``), the ingest report can carry
    the counter as a column (absent by default), and mirror
    retirement lags one generation so a state handle obtained BEFORE
    a refresh keeps reading its superseded tables until the refresh
    after next."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
        pipeline_curate_ingest_report,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    store.refresh_probe_mirror()  # generation A @ seq 0

    def gens():
        return {
            e
            for e in os.listdir(store._mirror_dir())
            if not e.startswith("_STAMP")
        }

    gen_a = gens()
    st_a, meta_a = store.read_state()
    assert meta_a["mirror"] == {
        "served": True, "stamp_seq": 0, "stale_days": 0,
    }
    fp_a = sorted(r["fp"] for r in st_a.fp_index.collect())

    # a post-refresh commit flips the counter (and the served flag)
    surv1 = pipeline_curate_ingest_day(
        spark, st_a, d1, return_survivors=True
    )
    store.commit_day(d1, surv1, day="day1")
    st_stale, meta_stale = store.read_state()
    assert meta_stale["mirror"] == {
        "served": False, "stamp_seq": 0, "stale_days": 1,
    }
    # the report carries the counter as a column only when asked
    report = pipeline_curate_ingest_report(
        spark,
        st_stale,
        d2,
        mirror_stale_days=meta_stale["mirror"]["stale_days"],
    )
    assert "mirror_stale_days" in report.columns
    assert {r["mirror_stale_days"] for r in report.collect()} == {1}
    plain = pipeline_curate_ingest_report(spark, st_stale, d2)
    assert "mirror_stale_days" not in plain.columns

    # refresh resets the counter — generation B; A survives ONE more
    store.refresh_probe_mirror()
    gen_b = gens() - gen_a
    assert gen_a <= gens() and gen_b
    _, meta_b = store.read_state()
    assert meta_b["mirror"] == {
        "served": True, "stamp_seq": 1, "stale_days": 0,
    }
    # the pre-refresh handle still reads its superseded tables
    assert sorted(r["fp"] for r in st_a.fp_index.collect()) == fp_a

    # the refresh after next retires generation A, keeps B
    surv2 = pipeline_curate_ingest_day(
        spark, store.read_state()[0], d2, return_survivors=True
    )
    store.commit_day(d2, surv2, day="day2")
    store.refresh_probe_mirror()  # generation C
    assert not (gen_a & gens()), "generation A outlived two refreshes"
    assert gen_b <= gens()


def test_state_store_counts_matches_duckdb_twin(spark):
    """``versioned_state_store_counts`` (queued for the next registry
    slot — the `dedup_incremental_winnow` protocol): the store's
    gate-independent standing relations read through PINNED snapshots
    at both committed days must equal DuckDB's recomputation from the
    raw documents table, row-identical, at the grading sf."""
    import duckdb

    from iceberg_by_example_spark.tables.demo import (
        _state_store_counts_oracle,
        versioned_state_store_counts,
    )

    sf = "/root/testdata/sf0.01"
    got = sorted(
        map(tuple, versioned_state_store_counts(spark, sf).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(_state_store_counts_oracle()).fetchall())
    )
    assert got == want and len(got) == 4
    # pinned time travel is the point: day1 strictly grows both
    by = {(d, r): c for d, r, c in got}
    assert by[("day1", "fp_index")] > by[("day0", "fp_index")]
    assert by[("day1", "winnow_index")] > by[("day0", "winnow_index")]


def test_curate_maintain_bounds_manifest_table_history(
    spark, corpus, tmp_path
):
    """``curate_maintain(manifest_table=...)`` (r16): the daily WAP
    publishes grow the pack-manifest table's snapshot history one per
    day forever; the nightly window truncates it to the newest
    ``manifest_retain_last`` main snapshots while the manifest ROWS —
    the training-data ledger — stay complete (appends share files
    forward), and the next day's cycle publishes cleanly on top."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
        curate_maintain,
    )

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    loc = str(tmp_path / "packs")
    curate_cycle_day(spark, store, d1, loc, day="day1")
    curate_cycle_day(spark, store, d2, loc, day="day2")
    table = VersionedTable.load(spark, loc)
    snaps_before = len(table._snapshots())
    rows_before = sorted(
        map(tuple, table.read(branch="main").collect())
    )
    assert {r[0] for r in rows_before} == {"day1", "day2"}

    report = curate_maintain(
        store, manifest_table=table, manifest_retain_last=1
    )
    gc = report["manifest_gc"]
    assert gc["history_truncated"] >= 1
    assert len(table._snapshots()) < snaps_before
    # the ledger is intact — every published day's packs still read
    assert sorted(
        map(tuple, table.read(branch="main").collect())
    ) == rows_before

    # the next day still cycles cleanly on the truncated table
    out = curate_cycle_day(spark, store, d3, loc, day="day3")
    assert out["manifest"]["published"] and out["state"] is not None
    assert {
        r["run"] for r in table.read(branch="main").collect()
    } == {"day1", "day2", "day3"}


def test_curate_maintain_documented_retention_composes_with_resume(
    spark, corpus, tmp_path, monkeypatch
):
    """r16 verdict #4 + #7: the nightly window's report leads with
    ``mirror_stale_days`` (the probe mirror's age in pointer entries
    when the window ran; None before any refresh, an int after), and
    the DOCUMENTED production horizon (``RECOMMENDED_RETAIN_DAYS=7``)
    composes with ``curate_cycle_day(resume=True)``: a crashed day
    whose manifest breadcrumb is still inside the manifest's retained
    tail resumes via the O(1) summary-masses metadata, and once a
    later publish pushes the breadcrumb snapshot OUT of the tail the
    resume falls back to the recomputed-gates path — identical final
    state either way (twin-store comparison)."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        curate_pack_day,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import (
        RECOMMENDED_RETAIN_DAYS,
        _published_day_masses,
        curate_cycle_day,
        curate_maintain,
        curate_publish,
    )

    assert RECOMMENDED_RETAIN_DAYS == 7  # the documented horizon

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store1 = CurateStateStore(spark, str(tmp_path / "s1"))
    store2 = CurateStateStore(spark, str(tmp_path / "s2"))
    store1.commit_backfill(st0, day="day0")
    store2.commit_backfill(st0, day="day0")
    loc1 = str(tmp_path / "packs1")

    # crash day1 between the two commits: manifest published with the
    # breadcrumb, state unadvanced
    real_commit_day = CurateStateStore.commit_day

    def failing_commit_day(self, *a, **kw):
        raise RuntimeError("injected crash between the two commits")

    monkeypatch.setattr(
        CurateStateStore, "commit_day", failing_commit_day
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        curate_cycle_day(spark, store1, d1, loc1, day="day1")
    monkeypatch.setattr(CurateStateStore, "commit_day", real_commit_day)
    table = VersionedTable.load(spark, loc1)
    assert _published_day_masses(table, "day1") is not None

    # nightly window at the DOCUMENTED horizon: first run has no
    # mirror stamp yet (stale None); the breadcrumb stays inside the
    # default manifest_retain_last=3 tail, so the cheap resume path
    # is untouched by maintenance
    rep1 = curate_maintain(
        store1,
        retain_days=RECOMMENDED_RETAIN_DAYS,
        manifest_table=table,
    )
    assert rep1["mirror_stale_days"] is None
    assert _published_day_masses(table, "day1") is not None

    # age the breadcrumb out of the tail: publish day2's manifest on
    # top, then truncate the manifest history to the newest snapshot
    s_cur = store1.read_state()[0]
    surv2 = pipeline_curate_ingest_day(
        spark, s_cur, d2, return_survivors=True
    )
    curate_publish(
        spark, sf_dir="", location=loc1, run_label="day2",
        manifest=curate_pack_day(surv2, s_cur),
    )
    rep2 = curate_maintain(
        store1,
        retain_days=RECOMMENDED_RETAIN_DAYS,
        manifest_table=table,
        manifest_retain_last=1,
    )
    # rep1's refresh stamped the mirror and nothing store-side has
    # committed since — the report key is an int once stamped
    assert rep2["mirror_stale_days"] == 0
    assert _published_day_masses(table, "day1") is None

    # resume now falls back to recomputing the deterministic gates...
    out = curate_cycle_day(
        spark, store1, d1, loc1, day="day1", resume=True
    )
    assert out["resumed_via"] == "recomputed_gates"
    # ...and the final state is identical to an uninterrupted day1
    curate_cycle_day(
        spark, store2, d1, str(tmp_path / "packs2"), day="day1"
    )
    assert _state_rows(store1.read_state()[0]) == _state_rows(
        store2.read_state()[0]
    )
    # the resume's pointer commit is one entry past rep2's stamp —
    # exactly the counter the NEXT window's report would lead with
    assert store1.mirror_staleness()["stale_days"] == 1


def test_atomic_cycle_single_commit_and_crash_windows(
    spark, corpus, tmp_path, monkeypatch
):
    """``curate_cycle_day(atomic=True)`` (r16 verdict #5): the pack
    manifest's publish rides the store's pointer append as an
    attached relation — ONE commit makes state and manifest visible
    together, so the two-commit crash window disappears structurally.
    Pins: mode equivalence with the two-commit cycle (identical state
    and identical manifest rows on a twin), consistent cross-table
    time travel (``read_attached`` at a day == the manifest MAIN rows
    then), crash BEFORE the pointer append → nothing visible anywhere
    and the day re-runs cleanly, crash AFTER the append → the day IS
    committed (pinned reads serve it immediately) and resume/heal
    only finishes branch housekeeping readers never wait on."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
    )

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    st0 = build_curate_state(spark, old, w2, keep_micro)
    store1 = CurateStateStore(spark, str(tmp_path / "s1"))
    store2 = CurateStateStore(spark, str(tmp_path / "s2"))
    store1.commit_backfill(st0, day="day0")
    store2.commit_backfill(st0, day="day0")
    loc1 = str(tmp_path / "packs1")
    loc2 = str(tmp_path / "packs2")

    # one atomic day: manifest + state in ONE pointer commit
    out = curate_cycle_day(
        spark, store1, d1, loc1, day="day1", atomic=True
    )
    assert out["atomic"] and out["state"]["day"] == "day1"
    table1 = VersionedTable.load(spark, loc1)
    main_rows = sorted(map(tuple, table1.read(branch="main").collect()))
    assert {r[0] for r in main_rows} == {"day1"}
    pinned = sorted(
        map(
            tuple,
            store1.read_attached("pack_manifest", as_of="day1").collect(),
        )
    )
    assert pinned == main_rows
    # a day committed before the attach has no pin — loud, not empty
    with pytest.raises(ValueError, match="attached after"):
        store1.read_attached("pack_manifest", as_of="day0")

    # mode equivalence with the two-commit twin
    curate_cycle_day(spark, store2, d1, loc2, day="day1")
    assert _state_rows(store1.read_state()[0]) == _state_rows(
        store2.read_state()[0]
    )
    assert main_rows == sorted(
        map(
            tuple,
            VersionedTable.load(spark, loc2)
            .read(branch="main")
            .collect(),
        )
    )

    # resume degenerates to noop-or-full-path; plain re-run fails fast
    out3 = curate_cycle_day(
        spark, store1, d1, loc1, day="day1", atomic=True, resume=True
    )
    assert out3["resumed_via"] == "noop"
    with pytest.raises(ValueError, match="already committed"):
        curate_cycle_day(
            spark, store1, d1, loc1, day="day1", atomic=True
        )

    # crash BEFORE the pointer append: NOTHING visible anywhere
    real_publish = CurateStateStore._publish

    def failing_publish(self, *a, **kw):
        raise RuntimeError("injected crash before the pointer append")

    monkeypatch.setattr(CurateStateStore, "_publish", failing_publish)
    with pytest.raises(RuntimeError, match="before the pointer"):
        curate_cycle_day(
            spark, store1, d2, loc1, day="day2", atomic=True
        )
    monkeypatch.setattr(CurateStateStore, "_publish", real_publish)
    assert store1.days()[-1] == "day1"
    assert {
        r["run"] for r in table1.read(branch="main").collect()
    } == {"day1"}
    # resume on the untouched day runs the normal full path (the
    # strays are nonce'd branches maintain() discards; the new
    # attempt's dup-key audit is clean because main never moved)
    out4 = curate_cycle_day(
        spark, store1, d2, loc1, day="day2", atomic=True, resume=True
    )
    assert out4["atomic"] and out4["state"]["day"] == "day2"
    rep = store1.maintain()
    assert any(
        x.startswith("pack_manifest:") for x in rep["healed"]["discarded"]
    )

    # crash AFTER the pointer append, before branch housekeeping: the
    # day IS committed — pinned reads serve it before any heal
    real_ff = VersionedTable.fast_forward

    def failing_ff(self, *a, **kw):
        raise RuntimeError("injected crash after the pointer append")

    monkeypatch.setattr(VersionedTable, "fast_forward", failing_ff)
    with pytest.raises(RuntimeError, match="after the pointer"):
        curate_cycle_day(
            spark, store1, d3, loc1, day="day3", atomic=True
        )
    monkeypatch.setattr(VersionedTable, "fast_forward", real_ff)
    assert "day3" in store1.days()
    assert (
        store1.read_attached("pack_manifest", as_of="day3")
        .filter(F.col("run") == "day3")
        .count()
        > 0
    )
    # main lags only until heal (via the resume noop path)
    assert {
        r["run"] for r in table1.read(branch="main").collect()
    } == {"day1", "day2"}
    out5 = curate_cycle_day(
        spark, store1, d3, loc1, day="day3", atomic=True, resume=True
    )
    assert out5["resumed_via"] == "noop"
    assert {
        r["run"] for r in table1.read(branch="main").collect()
    } == {"day1", "day2", "day3"}
    # and the healed state reads identically through both paths
    assert _state_rows(store1.read_state()[0]) == _state_rows(
        store1.read_state(as_of="day3")[0]
    )


def test_atomic_store_retention_covers_attached_manifest(
    spark, corpus, tmp_path
):
    """r17: in atomic mode the pack manifest's history is governed by
    the store's OWN retention — ``maintain(retain_days=N)`` truncates
    the attached table's ancestry to its oldest retained pin (same
    rule as the relations), the GC trio covers it, every retained
    day's ``read_attached`` stays intact, the ledger rows stay
    complete on main, and ``curate_maintain(manifest_table=...)``
    refuses a raw newest-N truncation of an attached table (it would
    sever pointer-pinned history)."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
        curate_maintain,
    )

    old, (d1, d2, d3) = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]
    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    loc = str(tmp_path / "packs")
    for day, batch in (("day1", d1), ("day2", d2), ("day3", d3)):
        curate_cycle_day(spark, store, batch, loc, day=day, atomic=True)
    table = VersionedTable.load(spark, loc)
    snaps_before = len(table._snapshots())
    day3_rows = sorted(
        map(
            tuple,
            store.read_attached("pack_manifest", as_of="day3").collect(),
        )
    )

    # the raw-truncation path refuses an attached manifest
    with pytest.raises(ValueError, match="ATTACHED"):
        curate_maintain(
            store, manifest_table=table, manifest_retain_last=1
        )

    report = store.maintain(retain_days=2)
    assert report["retention"]["expired_days"] == ["day0", "day1"]
    assert report["retention"]["expired_snapshots"].get(
        "pack_manifest", 0
    ) >= 1
    assert "pack_manifest" in report["tables"]
    assert len(table._snapshots()) < snaps_before
    # retained days read bit-identically through the pins
    assert (
        sorted(
            map(
                tuple,
                store.read_attached(
                    "pack_manifest", as_of="day3"
                ).collect(),
            )
        )
        == day3_rows
    )
    assert (
        store.read_attached("pack_manifest", as_of="day2")
        .filter(F.col("run") == "day2")
        .count()
        > 0
    )
    # expired days raise the clean not-committed error
    with pytest.raises(ValueError, match="not committed"):
        store.read_attached("pack_manifest", as_of="day1")
    # the ledger itself stays complete on main
    assert {
        r["run"] for r in table.read(branch="main").collect()
    } == {"day1", "day2", "day3"}


def test_store_retention_counts_matches_duckdb_twin(spark):
    """``versioned_store_retention_counts`` (queued for the next
    registry slot — the ``versioned_state_store_counts`` protocol):
    after ``maintain(retain_days=2)`` expires the backfill day of a
    three-commit store, every RETAINED day's pinned ``as_of`` read
    must equal DuckDB's recomputation from the raw documents table,
    and the expired day must raise the clean not-committed error —
    row-identical at the grading sf."""
    import duckdb

    from iceberg_by_example_spark.tables.demo import (
        _store_retention_counts_oracle,
        versioned_store_retention_counts,
    )

    sf = "/root/testdata/sf0.01"
    got = sorted(
        map(
            tuple, versioned_store_retention_counts(spark, sf).collect()
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(_store_retention_counts_oracle()).fetchall(),
        )
    )
    assert got == want and len(got) == 3
    by = {(d, r): c for d, r, c in got}
    assert by[("day0", "expired")] == 1
    assert by[("day2", "fp_index")] > by[("day1", "fp_index")]


def test_attach_name_and_location_guards(spark, tmp_path):
    """``attach`` refuses names that collide with the store's own
    tables (relations, meta, the pointer log itself) and refuses to
    re-point a registered name — the registry is what ``heal`` trusts
    after a crash, so a silent re-point would orphan the old table's
    unfinished branches."""
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    store = CurateStateStore(spark, str(tmp_path / "s"))
    for bad in ("state_log", "fp_index", "winnow_census", "_meta"):
        with pytest.raises(ValueError, match="collides"):
            store.attach(bad, str(tmp_path / "x"))
    store.attach("pack_manifest", str(tmp_path / "x"))
    store.attach("pack_manifest", str(tmp_path / "x"))  # idempotent
    with pytest.raises(ValueError, match="refusing to re-point"):
        store.attach("pack_manifest", str(tmp_path / "y"))


def test_cross_store_attach_ownership_guard(spark, tmp_path):
    """r18 (r17 verdict "Missing #3"): ONE store per attached table,
    forever. The first attach that can see the table stamps the owning
    store root into its properties (``curate.store.owner``); a second
    store's attach — under any path spelling, symlinks included —
    fails loudly BEFORE registering, so its ``maintain(retain_days=)``
    can never truncate the shared table's ancestry by its own pins
    and sever the first store's pinned ``read_attached`` history."""
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    loc = str(tmp_path / "shared")
    VersionedTable.create(spark, loc, schema="run string, v long")
    s1 = CurateStateStore(spark, str(tmp_path / "s1"))
    s2 = CurateStateStore(spark, str(tmp_path / "s2"))
    s1.attach("pack_manifest", loc)
    stamped = VersionedTable.load(spark, loc).table_meta["properties"]
    assert stamped["curate.store.owner"] == os.path.realpath(
        str(tmp_path / "s1")
    )
    # second store refused; its registry stays empty (nothing for its
    # maintain() to truncate), the first store is unaffected
    with pytest.raises(ValueError, match="owned by store"):
        s2.attach("pack_manifest", loc)
    assert s2._attached() == {}
    assert "pack_manifest" in s1._attached()
    # a symlinked spelling of the same location cannot bypass the
    # guard (ADVICE r17: realpath on both sides)...
    link = str(tmp_path / "link")
    os.symlink(loc, link)
    with pytest.raises(ValueError, match="owned by store"):
        s2.attach("other_name", link)
    # ...and for the OWNING store it resolves to the idempotent path
    s1.attach("pack_manifest", link)
    # attach-before-create defers the stamp to the first attach that
    # can see _meta/table.json (which _commit re-issues every day)
    loc2 = str(tmp_path / "later")
    s1.attach("late_table", loc2)
    VersionedTable.create(spark, loc2, schema="run string, v long")
    s1.attach("late_table", loc2)
    assert VersionedTable.load(spark, loc2).table_meta["properties"][
        "curate.store.owner"
    ] == os.path.realpath(str(tmp_path / "s1"))
    with pytest.raises(ValueError, match="owned by store"):
        s2.attach("late_table", loc2)


def test_cloned_store_cannot_truncate_attached_history(
    spark, corpus, tmp_path
):
    """Defense in depth behind ``attach()``'s ownership refusal: a
    byte-for-byte CLONE of a store's root (pointer log + _attached
    sidecar copied to a new path) carries real pins for the attached
    table, so its ``maintain(retain_days=)`` would walk the attached
    truncation loop — the ownership re-check inside ``_retain`` must
    refuse before ``expire_history_before`` severs the original
    store's pinned ``read_attached`` history."""
    import shutil as _sh

    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    st0 = build_curate_state(
        spark, old, corpus["w2"], corpus["keep_micro"]
    )
    store = CurateStateStore(spark, str(tmp_path / "orig"))
    store.commit_backfill(st0, day="day0")
    loc = str(tmp_path / "packs")
    curate_cycle_day(spark, store, d1, loc, day="day1", atomic=True)
    curate_cycle_day(spark, store, d2, loc, day="day2", atomic=True)
    day1_rows = sorted(
        map(
            tuple,
            store.read_attached("pack_manifest", as_of="day1").collect(),
        )
    )

    _sh.copytree(str(tmp_path / "orig"), str(tmp_path / "clone"))
    clone = CurateStateStore(spark, str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="owned by store"):
        clone.maintain(retain_days=1)
    # the original's pinned history is untouched by the refused run
    assert sorted(
        map(
            tuple,
            store.read_attached("pack_manifest", as_of="day1").collect(),
        )
    ) == day1_rows
    # and the original's own retention still works afterwards
    rep = store.maintain(retain_days=1)
    assert "day1" in rep["retention"]["expired_days"]


def test_atomic_report_parity_and_mixed_mode_warning(
    spark, corpus, tmp_path
):
    """r18 (r17 verdict #6 + ADVICE): (a) ``curate_cycle_day`` reports
    the SAME manifest surface in both modes — the atomic path now
    carries the gate counts its raising audit already computed plus
    ``main_rows``, so operators alert on identical keys; on twin
    inputs the VALUES agree too. (b) Mixed-mode staleness is loud in
    the carry-forward direction: once a table is attached, a
    ``commit_day`` WITHOUT ``attached=`` warns that the registered
    pin carries forward (``read_attached`` at that day serves the
    last atomically-committed manifest)."""
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
        pipeline_curate_ingest_day,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.workflows import (
        curate_cycle_day,
    )

    old, (d1, d2, _d3) = corpus["old"], corpus["days"]
    st0 = build_curate_state(
        spark, old, corpus["w2"], corpus["keep_micro"]
    )
    store_a = CurateStateStore(spark, str(tmp_path / "sa"))
    store_t = CurateStateStore(spark, str(tmp_path / "st"))
    store_a.commit_backfill(st0, day="day0")
    store_t.commit_backfill(st0, day="day0")

    out_a = curate_cycle_day(
        spark, store_a, d1, str(tmp_path / "pa"), day="day1",
        atomic=True,
    )
    out_t = curate_cycle_day(
        spark, store_t, d1, str(tmp_path / "pt"), day="day1"
    )
    assert set(out_a["manifest"]) == set(out_t["manifest"])
    for key in (
        "published", "packs", "null_rows", "dup_keys", "bad_packs",
        "main_rows",
    ):
        assert out_a["manifest"][key] == out_t["manifest"][key], key

    surv2 = pipeline_curate_ingest_day(
        spark, store_a.read_state()[0], d2, return_survivors=True
    )
    with pytest.warns(UserWarning, match="pins carry forward"):
        store_a.commit_day(d2, surv2, day="day2")
    # the carry is otherwise the documented semantics: day2's pin
    # still serves day1's (last atomically-committed) manifest
    assert sorted(
        map(
            tuple,
            store_a.read_attached(
                "pack_manifest", as_of="day2"
            ).collect(),
        )
    ) == sorted(
        map(
            tuple,
            store_a.read_attached(
                "pack_manifest", as_of="day1"
            ).collect(),
        )
    )


def test_store_stream_ingest_counts_matches_duckdb_twin(spark):
    """``versioned_store_stream_ingest_counts`` (the r19 registry
    slot — continuous curation's batch-form grade): driving the
    real ``foreachBatch`` handler over three deterministic slices
    plus one replayed batch id must leave every trigger's pinned
    ``as_of`` read equal to DuckDB's recomputation at that trigger's
    corpus prefix, and the pointer ledger at exactly backfill + 3
    days — row-identical at the grading sf."""
    import duckdb

    from iceberg_by_example_spark.tables.demo import (
        _store_stream_ingest_counts_oracle,
        versioned_store_stream_ingest_counts,
    )

    sf = "/root/testdata/sf0.01"
    got = sorted(
        map(
            tuple,
            versioned_store_stream_ingest_counts(spark, sf).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(_store_stream_ingest_counts_oracle()).fetchall(),
        )
    )
    assert got == want and len(got) == 4
    by = {(d, r): c for d, r, c in got}
    assert by[("replay", "days")] == 4
    assert (
        by[("s-b000000", "fp_index")]
        < by[("s-b000001", "fp_index")]
        < by[("s-b000002", "fp_index")]
    )


def test_concurrent_first_attach_single_winner(
    spark, tmp_path, monkeypatch
):
    """r19 (r18 verdict "Missing #3"): the FIRST ownership claim is
    arbitrated by an O_EXCL sidecar, so two fresh stores racing the
    same never-attached table get exactly one winner. Simulated at
    the exact race point: store A's claim lands the sidecar but
    "crashes" before the property stamp (set_property patched to a
    no-op), so store B — like any concurrent claimer — reads
    owner=None; check-then-write alone would let B stamp over A."""
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    loc = str(tmp_path / "shared")
    VersionedTable.create(spark, loc, schema="run string, v long")
    a = CurateStateStore(spark, str(tmp_path / "a"))
    b = CurateStateStore(spark, str(tmp_path / "b"))

    monkeypatch.setattr(
        VersionedTable, "set_property", lambda self, k, v: None
    )
    a.attach("t", loc)
    monkeypatch.undo()
    props = (
        VersionedTable.load(spark, loc).table_meta.get("properties")
        or {}
    )
    assert "curate.store.owner" not in props  # B will read owner=None

    with pytest.raises(ValueError, match="concurrent first attach"):
        b.attach("t", loc)
    assert b._attached() == {}

    # the winner self-heals: its next attach finds its own identity in
    # the sidecar and finishes the property stamp
    a.attach("t", loc)
    assert VersionedTable.load(spark, loc).table_meta["properties"][
        "curate.store.owner"
    ] == os.path.realpath(str(tmp_path / "a"))
    with pytest.raises(ValueError, match="owned by store"):
        b.attach("t", loc)


def test_relocated_store_pair_adopts_ownership(spark, tmp_path):
    """ADVICE r18: ownership identity is the store root's realpath,
    so a relocated/restored store + attached-table pair fails every
    attached operation with no recovery path. ``adopt_attached`` is
    the sanctioned, explicit re-own: registry-gated (only a store
    that already has the attachment can adopt), re-points the
    registry when the table moved, and restores normal operation."""
    import shutil as _sh

    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )
    from iceberg_by_example_spark.tables.versioned import VersionedTable

    home = tmp_path / "home"
    home.mkdir()
    loc = str(home / "mani")
    VersionedTable.create(spark, loc, schema="run string, v long")
    s = CurateStateStore(spark, str(home / "store"))
    s.attach("pack_manifest", loc)

    moved = tmp_path / "moved"
    _sh.move(str(home), str(moved))
    s2 = CurateStateStore(spark, str(moved / "store"))
    new_loc = str(moved / "mani")
    # both guards fire on the relocated pair: the registry still names
    # the old path (re-point refusal) and the stamp names the old root
    with pytest.raises(ValueError, match="refusing to re-point"):
        s2.attach("pack_manifest", new_loc)
    with pytest.raises(ValueError, match="owned by store"):
        s2._claim_ownership(os.path.realpath(new_loc))

    s2.adopt_attached("pack_manifest", new_loc)
    s2.attach("pack_manifest", new_loc)  # idempotent again
    assert VersionedTable.load(spark, new_loc).table_meta[
        "properties"
    ]["curate.store.owner"] == os.path.realpath(str(moved / "store"))
    assert s2._attached()["pack_manifest"] == os.path.realpath(new_loc)

    # adoption is NOT an ownership bypass: a store that never had the
    # attachment cannot adopt it
    s3 = CurateStateStore(spark, str(tmp_path / "other"))
    with pytest.raises(ValueError, match="not attached"):
        s3.adopt_attached("pack_manifest", new_loc)


def test_compact_bounds_append_index_file_counts(
    spark, corpus, tmp_path
):
    """r19: under per-trigger continuous ingest the append-only
    postings/key indexes accumulate one small file per commit —
    ``compact()`` now rewrites them too (identity rows, relabeled
    history, size-bounded splits), so the HEAD's file count drops to
    O(bytes/split) instead of O(triggers) while the resolved state
    stays bit-identical and pre-compaction days still time-travel."""
    from iceberg_by_example_spark.streaming.store_ingest import (
        make_store_committer,
    )
    from iceberg_by_example_spark.operators.pipeline import (
        build_curate_state,
    )
    from iceberg_by_example_spark.tables.curate_store import (
        CurateStateStore,
    )

    old, days = corpus["old"], corpus["days"]
    w2, keep_micro = corpus["w2"], corpus["keep_micro"]

    store = CurateStateStore(spark, str(tmp_path / "store"))
    store.commit_backfill(
        build_curate_state(spark, old, w2, keep_micro), day="day0"
    )
    commit = make_store_committer(store, "s", gates=False)
    for i, batch in enumerate(days):
        commit(batch, i)
    assert len(store.days()) == 4

    def head_files(name):
        return len(store._table(name)._current().files)

    pre = {n: head_files(n) for n in ("shingle_index", "winnow_index")}
    # one appended file per trigger on top of the backfill
    assert all(c >= 4 for c in pre.values()), pre

    before = _state_rows(store.read_state()[0])
    t1_before = _state_rows(store.read_state(as_of="s-b000000")[0])
    rep = store.compact()
    assert {"shingle_index", "winnow_index"} <= set(rep["compacted"])

    post = {n: head_files(n) for n in ("shingle_index", "winnow_index")}
    assert all(post[n] < pre[n] for n in post), (pre, post)
    # resolved state identical; per-trigger pinned reads intact
    assert _state_rows(store.read_state()[0]) == before
    assert _state_rows(store.read_state(as_of="s-b000000")[0]) == t1_before
