"""Composite workflows over VersionedTable — the reference's "programs".

- ``ingest_day``   ≈ loadDataFile (IcebergLoadActivityTask.scala:43-82)
- ``metadata_counts`` ≈ printTableMetadata (LT:84-97)
- ``count_at``     ≈ countTableData (LT:113-116)
- ``maintain``     ≈ cleanupMetadata (LT:156-165)
- ``wap_load``     ≈ WapIceberg.loadForDate (WapIceberg.scala:20-87)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.sources.activity import (
    ACTIVITY_SCHEMA,
    read_activity_csv,
    rows_with_any_null,
)
from iceberg_by_example_spark.tables.versioned import (
    MAIN,
    VersionedTable,
    wap_session,
)

ACTIVITY_DDL = (
    "account string, txn_date date, txn_id string, merchant string, "
    "amount double, category string, last_updated timestamp"
)

ACTIVITY_UPDATE_COLS = ["amount", "category", "last_updated", "txn_date"]


def create_activity_table(
    spark: SparkSession, location: str, if_not_exists: bool = False
) -> VersionedTable:
    """CREATE TABLE … PARTITIONED BY (txn_date) (reference D2, LT:17-40)."""
    return VersionedTable.create(
        spark,
        location,
        schema=ACTIVITY_DDL,
        partition_by="txn_date",
        properties={
            # carried over for parity; our writer honors the format+codec
            "write.format.default": "parquet",
            "write.parquet.compression-codec": "zstd",
            "write.wap.enabled": "true",
        },
        if_not_exists=if_not_exists,
    )


def ingest_day(
    table: VersionedTable, csv_path: str, branch_label: str
) -> None:
    """One daily load (reference W1, LT:43-82):

    staging CTAS → CSV read → append to staging → MERGE into main →
    CREATE OR REPLACE BRANCH <label> → drop staging.

    The staging table isolates the raw batch exactly like the
    reference's ``activity_tmp`` (LT:44-49) — audits can read it before
    the merge lands, and a failed merge leaves main untouched.
    """
    spark = table.spark
    staging = VersionedTable.create(
        spark,
        os.path.join(table.location + "_staging"),
        schema=ACTIVITY_DDL,
        partition_by=None,
    )
    try:
        batch = read_activity_csv(spark, csv_path)
        staging.append(batch)
        table.merge(
            staging.read(),
            on="txn_id",
            update_cols=ACTIVITY_UPDATE_COLS,
        )
        table.create_branch(branch_label, from_branch=MAIN)
    finally:
        staging.drop()


def count_at(table: VersionedTable, watermark: str | None = None) -> int:
    """Row count at a branch label, or latest (reference W3/T2, LT:113-123)."""
    return table.read(branch=watermark or MAIN).count()


def metadata_counts(table: VersionedTable) -> dict[str, int]:
    """Counts of all the metadata tables the reference queries
    (reference W2, LT:84-97): history, snapshots, files, manifests,
    metadata_log_entries — plus refs."""
    return {
        "history": table.history().count(),
        "snapshots": table.snapshots().count(),
        "files": table.files().count(),
        "refs": table.refs().count(),
        "manifests": table.manifests().count(),
        "metadata_log_entries": table.metadata_log_entries().count(),
    }


def maintain(table: VersionedTable) -> dict:
    """Maintenance pass (reference W4, LT:156-165): orphan dry-run →
    sorted compaction → manifest rewrite → snapshot expiry → orphan GC."""
    report = {}
    report["orphans_dry_run"] = table.remove_orphan_files(dry_run=True)
    # C2, LT:159: sort_order => 'account ASC NULLS LAST, txn_id DESC NULLS FIRST'
    table.rewrite_data_files(
        sort_order=[F.asc_nulls_last("account"), F.desc_nulls_first("txn_id")]
    )
    table.rewrite_manifests()
    report["expired"] = table.expire_snapshots(retain_last=3)
    report["orphans_removed"] = table.remove_orphan_files(dry_run=False)
    # expired snapshots just unreferenced their manifests — collect them
    report["manifests_removed"] = table.rewrite_manifests()
    return report


def wap_load(table: VersionedTable, csv_path: str, wap_branch: str = "feature_branch") -> bool:
    """Write-audit-publish (reference W5, WI:20-87).

    The reference routes the whole batch through the session conf
    ``spark.wap.branch`` (WI:14) — no per-call branch arguments. Same
    here: inside ``wap_session`` the append lands on the WAP branch
    (auto-created from main, as Iceberg does) and the audit read
    resolves to it ambiently. Publish via fast_forward to main if the
    audit is clean (any-column null scan, WI:70-76 — column-native
    here), else drop the branch leaving main untouched (WI:84).
    Returns True if published.
    """
    spark = table.spark
    # drop_branch in finally (r13 ADVICE #2): an exception between the
    # append and the publish must not leave a stale WAP branch holding
    # unaudited rows for the next run to inherit (drop_branch is
    # idempotent, so the finally is safe even if the append failed
    # before the branch was auto-created).
    try:
        with wap_session(spark, wap_branch):
            batch = read_activity_csv(spark, csv_path)
            table.append(batch)  # routed to the WAP branch by session conf
            audited = table.read()  # ambient read of the same branch
            bad = rows_with_any_null(audited).count()
        if bad == 0:
            table.fast_forward(MAIN, wap_branch)
            published = True
        else:
            published = False
    finally:
        table.drop_branch(wap_branch)
    return published


CURATE_MANIFEST_DDL = (
    "run string, shard bigint, pack_id bigint, n_docs bigint, "
    "pack_tokens bigint, first_doc bigint, last_doc bigint"
)


def curate_publish(
    spark: SparkSession,
    sf_dir: str,
    location: str,
    run_label: str = "run0",
    wap_branch: str = "curate_audit",
    manifest: DataFrame | None = None,
    summary_extra: dict | None = None,
) -> dict:
    """The north-star pipeline meeting the reference's governance
    surface: run the composed curation job
    (``pipeline_curate_corpus``) and land its pack manifest in a
    ``VersionedTable`` through write-audit-publish — the shape a
    nightly 100 TB curation actually ships. Compute once, append to
    the WAP branch (session-routed, exactly the reference's
    ``spark.wap.branch`` pattern — WapIceberg.scala:14), gate on
    manifest invariants, and fast-forward main only when clean; a
    failed audit drops the branch and leaves main untouched, so a bad
    run can never reach the training job reading main.

    Audit gates — all manifest-level, O(packs) rows, never re-reading
    the corpus: (a) non-empty; (b) the reference's any-column null
    scan; (c) (run, shard, pack_id) unique across the WHOLE audited
    branch — nightly manifests accumulate, so each run stamps its
    ``run_label`` and the key audit catches both intra-run duplicates
    and an accidental re-publish of an existing label; (d) every pack
    carries positive docs and tokens. Returns the audit/publish
    report.

    Pass ``manifest`` (an unlabeled pack manifest — shard, pack_id,
    n_docs, pack_tokens, first_doc, last_doc) to publish a manifest
    computed elsewhere: the incremental daily ingest
    (``curate_ingest_day``) lands its day manifest through the same
    governance gate instead of recomputing the corpus.
    ``summary_extra`` rides the manifest append's snapshot summary —
    atomic with the publish, which is what makes
    ``curate_cycle_day(resume=True)``'s recovery possible: the day's
    survivor masses become durable in the SAME commit that publishes
    the packs."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_corpus,
    )

    if manifest is None:
        manifest = pipeline_curate_corpus(spark, sf_dir)
    manifest = manifest.select(F.lit(run_label).alias("run"), "*")
    table = VersionedTable.create(
        spark,
        location,
        schema=CURATE_MANIFEST_DDL,
        partition_by=None,
        properties={"write.wap.enabled": "true"},
        if_not_exists=True,
    )
    # drop_branch in finally (r13 ADVICE #2): without it, an exception
    # between the append and the audit (or during fast_forward) leaves
    # a stale curate_audit branch holding unaudited rows — the next
    # run's append would inherit them and spuriously fail ITS dup-key
    # audit. drop_branch is idempotent, so the finally is safe even
    # when the failure happened before the branch was auto-created.
    try:
        with wap_session(spark, wap_branch):
            # routed to the WAP branch by session conf
            table.append(manifest, summary_extra=summary_extra)
            audited = table.read()  # ambient read of the same branch
            n_packs = audited.count()
            null_rows = rows_with_any_null(audited).count()
            dup_keys = (
                audited.groupBy("run", "shard", "pack_id")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
                .count()
            )
            bad_packs = audited.filter(
                (F.col("pack_tokens") <= 0) | (F.col("n_docs") <= 0)
            ).count()
        published = (
            n_packs > 0
            and null_rows == 0
            and dup_keys == 0
            and bad_packs == 0
        )
        if published:
            table.fast_forward(MAIN, wap_branch)
    finally:
        table.drop_branch(wap_branch)
    return {
        "published": published,
        "packs": n_packs,
        "null_rows": null_rows,
        "dup_keys": dup_keys,
        "bad_packs": bad_packs,
        "main_rows": table.read(branch=MAIN).count(),
    }


def curate_ingest_day(
    spark: SparkSession,
    state,
    batch: DataFrame,
    location: str,
    run_label: str,
    wap_branch: str = "curate_audit",
) -> dict:
    """One day of the steady-state curation loop: run the INCREMENTAL
    composed pipeline over today's batch against the standing indexes
    (``pipeline_curate_ingest_day`` — O(batch + index), the corpus is
    never rescanned) and land the day's pack manifest in the
    governance table through the same write-audit-publish gate the
    nightly backfill uses (``curate_publish`` with ``run_label`` = the
    day, so manifests accumulate per day and a re-ingest of the same
    day fails the key audit instead of double-counting). Returns the
    audit/publish report."""
    from iceberg_by_example_spark.operators.pipeline import (
        pipeline_curate_ingest_day,
    )

    # cache ownership stays INSIDE the pipeline call (r15 ADVICE #3):
    # it detach-materializes the manifest in-function, so its own-cache
    # path already releases every gate cache at the right time — a
    # caller-held registry would only extend the lifetime until after
    # the publish, for nothing
    manifest = pipeline_curate_ingest_day(spark, state, batch)
    return curate_publish(
        spark,
        sf_dir="",  # unused: the manifest is supplied
        location=location,
        run_label=run_label,
        wap_branch=wap_branch,
        manifest=manifest,
    )


def _manifest_day_published(
    spark: SparkSession, location: str, day: str
) -> bool:
    """True when the governance table at ``location`` already carries
    ``day``'s packs on MAIN — the resume protocol's first question."""
    if not os.path.exists(os.path.join(location, "_meta", "table.json")):
        return False
    table = VersionedTable.load(spark, location)
    return (
        table.read(branch=MAIN).filter(F.col("run") == day).limit(1).count()
        > 0
    )


def _published_day_masses(table: VersionedTable, day: str) -> dict | None:
    """The ``curate-source-masses`` recorded in the snapshot summary
    of ``day``'s published manifest append, or None when the commit
    predates the summary (then resume falls back to re-running the
    gates). Walks MAIN's ancestry only: an audit-FAILED attempt for
    the same day leaves a dangling snapshot carrying the same summary
    keys, and its masses must never be trusted — it was never
    published."""
    import json

    by_id = {s.snapshot_id: s for s in table._snapshots()}
    cur = table.current_snapshot_id(MAIN)
    while cur in by_id:
        s = by_id[cur]
        if s.summary.get("curate-day") == day:
            raw = s.summary.get("curate-source-masses")
            return None if raw is None else json.loads(raw)
        cur = s.parent_id
    return None


def _manifest_wap_audit(audited: DataFrame) -> dict:
    """``curate_publish``'s four manifest gates as a RAISING audit for
    the atomic cycle: in single-commit mode a failed gate must abort
    the WHOLE day (state included) before anything becomes visible,
    not report ``published=False`` after half the day landed. Returns
    the gate counts on success so the atomic path can report the same
    surface as the two-commit ``curate_publish`` (r17 verdict #6)."""
    n_packs = audited.count()
    null_rows = rows_with_any_null(audited).count()
    dup_keys = (
        audited.groupBy("run", "shard", "pack_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    bad_packs = audited.filter(
        (F.col("pack_tokens") <= 0) | (F.col("n_docs") <= 0)
    ).count()
    if not (
        n_packs > 0
        and null_rows == 0
        and dup_keys == 0
        and bad_packs == 0
    ):
        raise ValueError(
            f"manifest WAP audit failed: packs={n_packs} "
            f"null_rows={null_rows} dup_keys={dup_keys} "
            f"bad_packs={bad_packs}"
        )
    return {
        "packs": n_packs,
        "null_rows": null_rows,
        "dup_keys": dup_keys,
        "bad_packs": bad_packs,
    }


def curate_cycle_day(
    spark: SparkSession,
    store,
    batch: DataFrame,
    location: str,
    day: str,
    wap_branch: str = "curate_audit",
    resume: bool = False,
    atomic: bool = False,
) -> dict:
    """One full day of the steady-state loop against the VERSIONED
    state store (``tables.curate_store.CurateStateStore``): probe
    yesterday's committed state, gate the batch through the
    incremental pipeline, publish the day's pack manifest through the
    WAP gate, then publish the state advance as ONE pointer commit —
    the r15 shape where the state refresh is itself an atomic,
    rollback-able snapshot commit instead of a parquet rewrite.

    The gates run ONCE: survivors come from
    ``pipeline_curate_ingest_day(return_survivors=True)`` and feed
    both the pack tail (``curate_pack_day`` — the same definition the
    non-store ingest uses) and the state advance, so manifest and
    state can never disagree about the day's decisions. The day's
    per-source survivor token masses additionally ride the manifest
    append's snapshot summary (bounded: one entry per source) — the
    durable breadcrumb the resume path below recovers from.

    Two governance tables, two commits (manifest, then state). A
    fully committed day re-run fails FAST (the guard below). A crash
    BETWEEN the two commits leaves the manifest published and the
    state unadvanced; re-running the whole day then fails the
    manifest's duplicate-key audit BY DESIGN (no silent
    double-publish). ``resume=True`` turns that documented manual
    recovery into one idempotent call — safe to invoke at ANY point
    of the day's lifecycle:

    - nothing landed yet → runs the normal full day;
    - manifest published, state unadvanced (the crash window) →
      completes ONLY the state half: the relation deltas come from
      the batch (as every ``commit_day`` does) and the survivor
      source masses from the published manifest commit's summary —
      the gates do NOT re-run (``resumed_via='summary_masses'``); a
      pre-breadcrumb manifest falls back to re-running the
      deterministic gates (``resumed_via='recomputed_gates'``);
    - both committed → a no-op report (``resumed_via='noop'``).

    In the default two-commit mode, cross-table atomicity would need
    a multi-table catalog transaction; each table individually is
    torn-proof and resume closes the gap between them.
    ``atomic=True`` (r16 verdict #5) CLOSES that gap structurally by
    folding the manifest publish INTO the store's pointer append
    (``CurateStateStore.commit_day(attached=...)``): the manifest
    delta appends on the commit's nonce'd branch of the manifest
    table, the WAP gates run on the branch (a failed gate aborts the
    WHOLE day — state included — with nothing visible), and the
    manifest's snapshot id rides the same single ``state_log`` append
    as the state relations. One commit, no crash window: resume
    degenerates to noop-or-full-path, and
    ``store.read_attached('pack_manifest', as_of=day)`` gives
    consistent cross-table time travel the two-commit design cannot.
    The trade: the manifest table binds to this store (one location
    per store, enforced by the attach registry) and its published
    appends become pointer-pinned — retention of the two moves
    together. Mixed-mode leftovers stay loud in BOTH directions: a
    manifest published by a crashed two-commit run fails the atomic
    append's duplicate-key audit rather than double-counting, and a
    two-commit day run AFTER a table was attached warns at
    ``commit_day`` that the attached pin carries forward (so
    ``read_attached(as_of=)`` for that day serves the last
    atomically-committed manifest, not the two-commit publish)."""
    from iceberg_by_example_spark.operators.pipeline import (
        curate_pack_day,
        pipeline_curate_ingest_day,
    )

    if atomic:
        if day in store.days():
            if resume:
                # the single commit landed: at worst the fast_forward
                # housekeeping is lagging, which readers never wait on
                # (they pin snapshot ids) — finish it and report noop
                store.heal()
                return {
                    "manifest": None,
                    "state": None,
                    "resumed_via": "noop",
                }
            raise ValueError(
                f"day {day!r} is already committed to the state store "
                "— a re-run must not double-publish"
            )
        state, _meta = store.read_state()
        surv = pipeline_curate_ingest_day(
            spark, state, batch, return_survivors=True
        )
        manifest = curate_pack_day(surv, state).select(
            F.lit(day).alias("run"), "*"
        )
        table = VersionedTable.create(
            spark,
            location,
            schema=CURATE_MANIFEST_DDL,
            partition_by=None,
            properties={"write.wap.enabled": "true"},
            if_not_exists=True,
        )
        # report parity with the two-commit path (r17 verdict #6):
        # the RAISING audit already computes curate_publish's gate
        # counts on the branch read — capture them so operators can
        # alert on identical keys in both modes
        gate_counts: dict = {}

        def _audit_and_capture(audited: DataFrame) -> None:
            gate_counts.update(_manifest_wap_audit(audited))

        state_report = store.commit_day(
            batch,
            surv,
            day=day,
            attached={
                "pack_manifest": (table, manifest, _audit_and_capture)
            },
        )
        return {
            "manifest": {
                "published": True,
                **gate_counts,
                "main_rows": table.read(branch=MAIN).count(),
            },
            "state": state_report,
            "atomic": True,
        }

    state_done = day in store.days()
    if state_done and not resume:
        # fail as the re-publish guard, not as the monotone-watermark
        # violation the already-advanced state would otherwise raise
        # mid-ingest: the day's packs and state are both committed —
        # read_state(as_of=day) reproduces them
        raise ValueError(
            f"day {day!r} is already committed to the state store — "
            "a re-run must not double-publish"
        )
    manifest_done = resume and _manifest_day_published(
        spark, location, day
    )
    if state_done:
        if not manifest_done:
            raise ValueError(
                f"day {day!r} has committed state but no published "
                "manifest — the cycle commits manifest FIRST, so this "
                "store was advanced outside curate_cycle_day; "
                "reconcile manually"
            )
        return {"manifest": None, "state": None, "resumed_via": "noop"}
    if manifest_done:
        # the crash window: complete the state half only
        table = VersionedTable.load(spark, location)
        masses = _published_day_masses(table, day)
        if masses is not None:
            surv_masses = spark.createDataFrame(
                [(s, int(n)) for s, n in sorted(masses.items())],
                "source string, n_tokens bigint",
            )
            state_report = store.commit_day(batch, surv_masses, day=day)
            via = "summary_masses"
        else:
            state, _meta = store.read_state()
            surv = pipeline_curate_ingest_day(
                spark, state, batch, return_survivors=True
            )
            state_report = store.commit_day(batch, surv, day=day)
            via = "recomputed_gates"
        return {
            "manifest": None,
            "state": state_report,
            "resumed_via": via,
        }
    state, _meta = store.read_state()
    surv = pipeline_curate_ingest_day(
        spark, state, batch, return_survivors=True
    )
    manifest = curate_pack_day(surv, state)
    # the day's survivor masses, made durable WITH the publish: the
    # same aggregate commit_day writes as the source_stats delta, so
    # a summary-masses resume reproduces the state bit-identically.
    # Bounded collect — one row per source, never per doc.
    day_masses = {
        r["source"]: int(r["t"])
        for r in surv.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    import json

    report = curate_publish(
        spark,
        sf_dir="",  # unused: the manifest is supplied
        location=location,
        run_label=day,
        wap_branch=wap_branch,
        manifest=manifest,
        summary_extra={
            "curate-day": day,
            "curate-source-masses": json.dumps(day_masses),
        },
    )
    state_report = None
    if report["published"]:
        state_report = store.commit_day(batch, surv, day=day)
    return {"manifest": report, "state": state_report}


def curate_backfill(
    spark: SparkSession,
    sf_dir: str,
    location: str,
    run_label: str = "backfill",
    wap_branch: str = "curate_audit",
    state_dir: str | None = None,
    state_store=None,
    refresh_mirror: bool = False,
) -> tuple:
    """The nightly backfill as ONE workflow: train the quality filter
    (``batch_trained_filter`` — the stored constants every later
    ingest scores with), run the full filter chain ONCE (shared: its
    survivor manifest feeds both the published packs and the standing
    state's source masses), build the ``CurateState`` the daily
    ingests probe, and land the full pack manifest through
    write-audit-publish. Returns ``(state, report)`` — hand the state
    to ``curate_ingest_day`` for every following day.

    Pass ``state_store`` (a ``CurateStateStore``) to land the state
    in the VERSIONED governance layer instead of bare parquet: the
    backfill becomes the store's day 0 (one atomic pointer publish),
    and each following day runs ``curate_cycle_day`` — the returned
    state is read back from the store, so it is materialized AND
    rollback-able. ``state_dir`` remains the plain-parquet form the
    bench demo owns; ``state_store`` wins when both are given.
    ``refresh_mirror=True`` additionally rewrites the store's
    bucketed probe mirror in the same nightly window
    (``refresh_probe_mirror`` — the O(index) maintenance job), so the
    returned state's join probes run exchange-free until the next
    day commits.

    The returned state is MATERIALIZED, never a lazy plan over the
    corpus (r14 review fix — a lazy state would re-run the full
    filter chain on every subsequent ingest): pass ``state_dir`` to
    write it as parquet tables + a constants json (the durable
    production form, reloadable with ``read_curate_state``); without
    it every state relation is eagerly pinned in-session
    (localCheckpoint), which survives until the session ends but not
    a block-dropping harness — prefer ``state_dir``.

    Equivalence note: the manifest published here equals
    ``pipeline_curate_corpus``'s output — the stored constants are by
    construction the in-job trainer's weights and the quantile gate's
    exact cutoff, so the stored-weight chain decides identically
    (pinned by ``test_curate_backfill_then_ingest_day_roundtrip``)."""
    import dataclasses

    from iceberg_by_example_spark.operators.pipeline import (
        _curate_select_pack,
        build_curate_state,
        curate_survivors_for,
        read_curate_state,
        write_curate_state,
    )
    from iceberg_by_example_spark.util import detach
    from iceberg_by_example_spark.sources.tpch import load_table
    from iceberg_by_example_spark.streaming.quality import (
        batch_trained_filter,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    surv = None
    try:
        w2, keep_micro = batch_trained_filter(spark, sf_dir)
        surv = curate_survivors_for(
            spark, docs, w2, keep_micro
        ).persist()
        state = build_curate_state(
            spark, docs, w2, keep_micro, survivors=surv
        )
        if state_store is not None:
            state_store.commit_backfill(state, day=run_label)
            if refresh_mirror:
                # the backfill window is where a production pipeline
                # refreshes the bucketed probe mirror (an O(index)
                # rewrite, like compaction): the state handed to the
                # following days' ingests then probes exchange-free
                state_store.refresh_probe_mirror()
            state, _ = state_store.read_state()
        elif state_dir is not None:
            write_curate_state(state, state_dir)
            state, _ = read_curate_state(spark, state_dir)
        else:
            state = dataclasses.replace(
                state,
                **{
                    f.name: detach(getattr(state, f.name))
                    for f in dataclasses.fields(state)
                    if isinstance(getattr(state, f.name), DataFrame)
                },
            )
        manifest = _curate_select_pack(surv)
        report = curate_publish(
            spark,
            sf_dir="",  # unused: the manifest is supplied
            location=location,
            run_label=run_label,
            wap_branch=wap_branch,
            manifest=manifest,
        )
        return state, report
    finally:
        if surv is not None:
            surv.unpersist()
        docs.unpersist()


# The PRESCRIBED production retention horizon for the nightly window
# (r16 verdict #4), the way the reference hardcodes retain_last=3
# (LifecycleTest.scala:161-162).  Seven pointer entries ≈ one week of
# daily rollback/debug window: wide enough that any bad ingest day is
# still time-travelable when a human looks at Monday's alerts, narrow
# enough that the store's steady state stays O(index + 7 days)
# (measured: SHUFFLE_BYTES.md retention soak — the unbounded form adds
# ~3× the live-index growth per night in pure history).  The default
# of curate_maintain/maintain stays None (keep everything — every
# committed day reproducible forever) as the safe-by-default contract;
# a production deployment passes this constant explicitly.
RECOMMENDED_RETAIN_DAYS = 7


def curate_maintain(
    store,
    retain_days: int | None = None,
    manifest_table: VersionedTable | None = None,
    manifest_retain_last: int = 3,
) -> dict:
    """The store's nightly maintenance window as ONE workflow — the
    W4 ``maintain`` shape applied to the curation state store
    (``tables.curate_store.CurateStateStore``), in dependency order:

    1. ``compact()`` — rewrite the read-side-merge relations as their
       aggregates (bounds the per-day partial tail; one pointer
       publish, past days still time-travel);
    2. ``refresh_probe_mirror()`` — rewrite the join-probed relations
       bucketed on their probe key AT the compacted seq, so the next
       day's gates probe exchange-free;
    3. ``maintain()`` — snapshot expiry + orphan/manifest GC,
       reclaiming any torn-commit leftovers and the manifests the
       compaction's replace just unreferenced; ``retain_days=N``
       additionally expires pointer history older than the newest N
       entries (``CurateStateStore.maintain``'s retention horizon), so
       the pre-compaction partials the step-1 rewrite superseded are
       actually reclaimed and the store's steady state is bounded.
       Production deployments should pass
       ``retain_days=RECOMMENDED_RETAIN_DAYS`` (7 — a week of
       rollback window; rationale at the constant): the ``None``
       default keeps every day reproducible forever, which is the
       right CONTRACT default but an unbounded steady state.

    Pass ``manifest_table`` (the pack-manifest governance table the
    daily cycle publishes into) to GC it in the same window: each
    day's WAP publish appends a snapshot, so the manifest table's
    snapshot history grows one per day forever without this. Every
    published append is a main ancestor — structurally protected from
    plain ``expire_snapshots`` — so the bound comes from
    ``expire_history_before`` (truncate main ancestry to the newest
    ``manifest_retain_last`` snapshots — the reference's
    ``expire_snapshots(retain_last)`` semantic, which DOES truncate
    ancestry), then ``expire_snapshots(retain_last=0)`` for dangling
    audit-failed appends, then orphan + manifest GC. The manifest
    ROWS (the training-data ledger) are untouched: appends share
    files forward, so the current snapshot still lists every day's
    packs — only time travel beyond the tail and orphaned bytes are
    given up. Note ``curate_cycle_day(resume=True)``'s
    summary-masses breadcrumb lives in snapshot metadata: resume for
    a day whose publish snapshot left the retained tail falls back to
    the recomputed-gates path (equally correct, just not O(1)).

    Each step is individually crash-safe (pointer publish / stamp
    swap / idempotent GC), so the composite needs no transaction: a
    crash between steps leaves a consistent store and the next
    nightly run completes the remainder. O(index) by design — the
    periodic job, never the daily commit path.

    The report leads with ``mirror_stale_days`` — how many pointer
    entries the probe mirror had aged when tonight's window ran
    (``CurateStateStore.mirror_staleness``; None before any refresh) —
    so the nightly output alone tells an operator the refresh stopped
    keeping up, without a separate ``read_state`` probe."""
    # argument validation BEFORE any side effect: compact() below
    # commits a pointer entry, so a call that will be refused must be
    # refused with the store untouched
    if manifest_table is not None:
        if manifest_retain_last < 1:
            raise ValueError("manifest_retain_last must be >= 1")
        # realpath on BOTH sides (ADVICE r17): attach() stores
        # realpath-normalized locations, and a symlinked spelling of
        # the manifest location must not bypass this refusal
        attached_locs = {
            os.path.realpath(loc)
            for loc in getattr(store, "_attached", dict)().values()
        }
        if os.path.realpath(manifest_table.location) in attached_locs:
            raise ValueError(
                "manifest table is ATTACHED to this store (atomic "
                "cycle mode): its history is pointer-pinned and "
                "bounded by maintain(retain_days=) via the "
                "oldest-retained-pin rule — a raw newest-N ancestry "
                "truncation here would sever pinned days' "
                "read_attached() history; drop manifest_table from "
                "this call"
            )
    # observed BEFORE compact bumps the pointer: how many days the
    # mirror had aged when tonight's window ran — the report row an
    # operator alerts on if the nightly refresh stops keeping up
    # (r16 verdict #7; the counter itself is read_state's
    # meta["mirror"]["stale_days"], this surfaces it in the window's
    # own output)
    report = {
        "mirror_stale_days": store.mirror_staleness()["stale_days"]
    }
    report["compact"] = store.compact()
    report["mirror"] = store.refresh_probe_mirror()
    report["gc"] = store.maintain(retain_days=retain_days)
    if manifest_table is not None:
        by_id = {
            s.snapshot_id: s for s in manifest_table._snapshots()
        }
        chain: list[str] = []
        cur = manifest_table.current_snapshot_id(MAIN)
        while cur in by_id:
            chain.append(cur)
            nxt = by_id[cur].parent_id
            cur = nxt if nxt in by_id else None
        truncated = (
            manifest_table.expire_history_before(
                chain[manifest_retain_last - 1]
            )
            if len(chain) > manifest_retain_last
            else []
        )
        report["manifest_gc"] = {
            "history_truncated": len(truncated),
            "expired_snapshots": len(
                manifest_table.expire_snapshots(retain_last=0)
            ),
            "orphan_files_removed": len(
                manifest_table.remove_orphan_files()
            ),
            "manifest_files_removed": (
                manifest_table.rewrite_manifests()
            ),
        }
    return report
