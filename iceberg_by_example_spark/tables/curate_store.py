"""Atomic, versioned storage for the standing curation state.

The r14 loop closed the daily curation cycle but persisted its most
production-critical artifact — the ``CurateState`` indexes every
ingest probes — as bare parquet directories rewritten in full by each
advance (``write_curate_state``): a crash mid-advance left a torn
state with no rollback, and every day's commit rewrote O(index) bytes
to fold in an O(batch) delta. This module puts the state under the
engine's own governance layer (the reference's core semantic — atomic
snapshot commits, IcebergLoadActivityTask.scala:78-80 — applied to
the curation state):

- Each state relation is a ``VersionedTable`` partitioned by ``day``,
  APPEND-ONLY: a day's commit appends that day's O(batch) delta as a
  new partition; the standing index bytes are never rewritten.
- The censuses and source masses are stored as PER-DAY PARTIALS (the
  day's ``groupBy(key).count()`` over its own postings delta); the
  read path re-aggregates ``SUM(df)`` over the partials. This is the
  LSM shape Iceberg itself uses for data: cheap appends, a read-side
  merge, and (optionally) periodic compaction — and it removes the
  census-merge broadcast from the COMMIT path entirely (the r14
  scale-watch item).
- Atomicity comes from a POINTER table (``state_log``), exactly
  Iceberg's own design one level up — data files land first and are
  invisible until the single metadata swap: each relation's delta is
  appended on a per-day audit branch (``ingest_<day>``), audited
  there, and the whole day becomes visible in ONE ``state_log``
  append recording every relation's audited snapshot id. Readers
  resolve relations through those PINNED snapshot ids, so a crash
  anywhere before the pointer append leaves the previous state
  exactly readable and the torn branches discardable
  (``heal``) — and a crash after it costs only housekeeping.
- Rollback is free: ``read_state(as_of=<day>)`` reproduces any
  committed day's state (the pointer rows are themselves snapshots of
  a versioned table, so Iceberg-style ``VERSION AS OF`` on the log —
  ``log_snapshot_id=`` — resolves identically).

Reference parity: WapIceberg.scala:20-87 is the write-audit-publish
gate this reuses (branch → audit → single publish); LT:78-80 is the
atomic-commit semantic the pointer append provides across ALL the
relation tables at once.
"""

from __future__ import annotations

import json
import os
import re
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_by_example_spark.tables.versioned import (
    MAIN,
    VersionedTable,
)

# every relation a CurateState carries, with the key column its
# census/read-side aggregation uses (None = stored verbatim)
_RELATIONS = (
    "fp_index",
    "shingle_index",
    "shingle_census",
    "bench_vocab",
    "source_stats",
    "winnow_index",
    "winnow_census",
)
_META_RELATION = "_meta"
_COMPACT_LABEL = re.compile(r"compact\d+")
# target output file size for compact()'s identity-packed index
# rewrite — the standard binpack target; at 100 TB this is what turns
# O(triggers) head files into O(index bytes / 128 MB)
_COMPACT_TARGET_FILE_BYTES = 128 << 20

# the standing relations the daily gates JOIN against (not just
# aggregate): relation -> (bucket column, distinct-at-write). These
# get a BUCKETED probe mirror so the index side of the fingerprint
# anti-join and the postings/winnow probes carries no Exchange and no
# per-day Sort — the ``winnow_index_table`` trick applied to the
# store (the censuses/masses stay read-side SUMs over the partials;
# they are keys-only aggregates, not join probes).
_MIRROR_SPECS = {
    "fp_index": ("fp", True),
    "shingle_index": ("shingle", False),
    "winnow_index": ("k", False),
}
# test-scale bucket count (matches WINNOW_INDEX_BUCKETS); a production
# deployment sizes this once at backfill: index bytes / target
# partition size, fixed thereafter so every refresh co-locates
MIRROR_BUCKETS = 8

_LOG_DDL = (
    "seq bigint, day string, relation string, snapshot_id string, "
    "w2 string, keep_micro bigint, max_doc_id bigint"
)


def _ddl_of(df: DataFrame) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )


class CurateStateStore:
    """Versioned, append-only store for the standing curation state.

    Lifecycle: ``commit_backfill`` once (the nightly rebuild's state —
    day 0's "delta" is the full index), then ``commit_day`` per ingest
    day; ``read_state`` returns the ``CurateState`` any
    ``pipeline_curate_ingest_day`` call probes, at the latest day or
    any committed ``as_of`` day."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)

    # -- table plumbing ------------------------------------------------------

    def _loc(self, name: str) -> str:
        return os.path.join(self.root, name)

    @property
    def log(self) -> VersionedTable:
        loc = self._loc("state_log")
        if os.path.exists(os.path.join(loc, "_meta", "table.json")):
            return VersionedTable.load(self.spark, loc)
        return VersionedTable.create(
            self.spark, loc, schema=_LOG_DDL, partition_by=None
        )

    def _table(
        self, name: str, template: DataFrame | None = None
    ) -> VersionedTable:
        loc = self._loc(name)
        if os.path.exists(os.path.join(loc, "_meta", "table.json")):
            return VersionedTable.load(self.spark, loc)
        if template is None:
            raise ValueError(f"relation table {name!r} does not exist")
        return VersionedTable.create(
            self.spark,
            loc,
            schema=_ddl_of(template) + ", day string",
            partition_by="day",
        )

    # -- attached governance tables ------------------------------------------

    def _attached(self) -> dict[str, str]:
        """name → absolute location of every governance table attached
        to this store's commit protocol (the pack manifest above all).
        Sidecar JSON, not pointer rows: ``heal`` must find the table
        from the name ALONE after a crash, before any read resolves."""
        path = os.path.join(self.root, "_attached.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def attach(self, name: str, location: str) -> None:
        """Register an external ``VersionedTable`` as an attached
        relation: its per-day appends ride the store's nonce'd audit
        branches and its snapshot id rides the SAME pointer append as
        the state relations — one commit makes state and governance
        rows visible together (the cross-table-atomicity seam
        ``commit_day(attached=...)`` uses). Idempotent for the same
        location; ONE location per name forever — the registry is what
        ``heal`` trusts after a crash, so a silent re-point would
        orphan the old table's unfinished branches.

        ONE store per table, forever (r17 verdict "Missing #3"): the
        registry sidecar is per-store, so without a cross-store guard
        a second store could attach the SAME location and its
        ``maintain(retain_days=)`` would truncate the shared table's
        ancestry by its own pins alone — silently severing the first
        store's pinned ``read_attached`` history. The owning store
        root is stamped into the table's properties at first attach
        (``curate.store.owner``) and any other store's attach fails
        loudly. Locations are ``realpath``-normalized on both sides
        (registry values and the stamp), so a symlinked spelling of
        the same path cannot bypass either guard."""
        if (
            name in _RELATIONS
            or name == _META_RELATION
            or name == "state_log"
        ):
            raise ValueError(
                f"attached name {name!r} collides with a state relation"
            )
        loc = os.path.realpath(location)
        reg = self._attached()
        # realpath the STORED side too (ADVICE r18): a registry written
        # before values were realpath'd may hold an abspath spelling
        # whose components include a symlink — the idempotent re-attach
        # of the same physical location must match it, not refuse
        if name in reg and os.path.realpath(reg[name]) == loc:
            # re-check ownership even on the idempotent path: the
            # table may not have existed on disk when first attached
            # (attach-before-create), so the stamp lands at the first
            # attach that can see _meta/table.json — which _commit
            # re-issues on every attached commit
            self._claim_ownership(loc)
            return
        if name in reg:
            raise ValueError(
                f"attached table {name!r} is registered at "
                f"{reg[name]!r}; refusing to re-point to {loc!r}"
            )
        self._claim_ownership(loc)
        reg[name] = loc
        self._write_attached(reg)

    def _write_attached(self, reg: dict[str, str]) -> None:
        tmp = os.path.join(self.root, "_attached.json.tmp")
        os.makedirs(self.root, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(reg, f)
        os.replace(tmp, os.path.join(self.root, "_attached.json"))

    def _claim_ownership(self, loc: str) -> None:
        """Stamp this store as the attached table's owner, or refuse
        a table another store already owns (see ``attach``). A
        location with no table on disk yet is left unstamped — the
        claim lands at the first attach after creation (every
        attached ``_commit`` re-issues ``attach``).

        The FIRST claim is arbitrated by an O_EXCL sidecar
        (``_meta/owner.claim``), not by the property alone (r18
        verdict "Missing #3"): the property stamp is check-then-write
        over ``table.json``, so two fresh stores racing the same
        never-attached table could both read owner=None and both
        stamp, last write silently winning — exactly the
        cross-store-misconfiguration case the guard exists for. The
        exclusive create is atomic on POSIX: exactly one store's open
        succeeds; the loser reads the winner's identity out of the
        sidecar and fails loudly. A winner that crashes between
        sidecar and property write self-heals — its own re-attach
        finds its identity in the sidecar and finishes the stamp,
        while any other store keeps being refused."""
        if not os.path.exists(os.path.join(loc, "_meta", "table.json")):
            return
        t = VersionedTable.load(self.spark, loc)
        me = os.path.realpath(self.root)
        owner = (t.table_meta.get("properties") or {}).get(
            "curate.store.owner"
        )
        if owner is not None:
            if os.path.realpath(owner) != me:
                raise ValueError(
                    f"table at {loc!r} is owned by store {owner!r}; "
                    "refusing cross-store attach — a second store's "
                    "maintain(retain_days=) would truncate the shared "
                    "table's ancestry by its own pins alone "
                    "(adopt_attached() re-owns after a sanctioned "
                    "migration)"
                )
            return
        sidecar = os.path.join(loc, "_meta", "owner.claim")
        try:
            fd = os.open(sidecar, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(me)
        except FileExistsError:
            with open(sidecar) as f:
                winner = f.read().strip()
            if not winner or os.path.realpath(winner) != me:
                raise ValueError(
                    f"table at {loc!r} was claimed by store "
                    f"{winner or '<unknown>'!r} in a concurrent first "
                    "attach; refusing cross-store attach "
                    "(adopt_attached() re-owns after a sanctioned "
                    "migration)"
                )
        t.set_property("curate.store.owner", me)

    def adopt_attached(
        self, name: str, location: str | None = None
    ) -> None:
        """Sanctioned-migration escape hatch (ADVICE r18): ownership
        identity is the store root's REALPATH, so relocating or
        restoring a store + attached-table pair makes every attached
        commit fail with the owned-by error and no recovery short of
        hand-editing metadata. This re-stamps THIS store as the
        owner — explicit, loud, never called from any commit or
        maintenance path, and still registry-gated: the name must
        already be attached here (a relocated store keeps its
        ``_attached.json``), so a foreign store cannot use adoption
        as an ownership bypass without also forging the registry
        sidecar, which the cloned-store test covers. ``location``
        re-points the registry when the table directory itself moved
        — the one sanctioned exception to ``attach``'s
        never-re-point rule, taken only under this explicit call."""
        reg = self._attached()
        if name not in reg:
            raise ValueError(
                f"{name!r} is not attached to this store; adoption "
                "re-owns an existing attachment, it does not create one"
            )
        loc = os.path.realpath(
            location if location is not None else reg[name]
        )
        if not os.path.exists(os.path.join(loc, "_meta", "table.json")):
            raise ValueError(f"no table at {loc!r} to adopt")
        t = VersionedTable.load(self.spark, loc)
        me = os.path.realpath(self.root)
        sidecar = os.path.join(loc, "_meta", "owner.claim")
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(me)
        os.replace(tmp, sidecar)
        t.set_property("curate.store.owner", me)
        if reg[name] != loc:
            reg[name] = loc
            self._write_attached(reg)

    def _table_for(self, name: str) -> "VersionedTable | None":
        """Resolve a relation (under the root) or an attached
        governance table (via the registry) to its ``VersionedTable``;
        None when it does not exist on disk yet."""
        if name in _RELATIONS or name == "state_log":
            loc = self._loc(name)
        else:
            loc = self._attached().get(name)
        if loc is None or not os.path.exists(
            os.path.join(loc, "_meta", "table.json")
        ):
            return None
        return VersionedTable.load(self.spark, loc)

    def read_attached(
        self, name: str, as_of: str | None = None
    ) -> DataFrame:
        """The attached table's rows AS PINNED by the pointer at
        ``as_of`` (default latest) — consistent cross-table time
        travel: the pack manifest exactly as of the same commit the
        state was read at, something the two-commit design cannot
        offer. Raises for a day committed before the table was
        attached (no pin rode that append)."""
        snaps, meta = self._resolve(as_of, None)
        if name not in snaps:
            raise ValueError(
                f"no {name!r} pin at day {meta['day']!r} — the table "
                "was attached after that commit"
            )
        reg = self._attached()
        if name not in reg:
            raise ValueError(f"{name!r} is not attached to this store")
        t = VersionedTable.load(self.spark, reg[name])
        return t.read(snapshot_id=snaps[name])

    # -- pointer log ---------------------------------------------------------

    def _log_rows(self, log_snapshot_id: str | None = None) -> list:
        log = self.log
        df = (
            log.read(snapshot_id=log_snapshot_id)
            if log_snapshot_id is not None
            else log.read(branch=MAIN)
        )
        return df.collect()  # O(days × relations) — metadata-sized

    def _log_state(self) -> tuple[str, list]:
        """One ATOMIC observation of the pointer log: (head snapshot
        id, the rows as of exactly that head). The commit paths derive
        everything — duplicate-day check, carried pins, next seq —
        from these rows and then publish with
        ``expected_parent_id=head``, so a concurrent writer landing in
        between fails this writer's publish loudly
        (``CommitConflictError``) instead of interleaving a duplicate
        seq. Reading ``branch=MAIN`` separately from the head would
        leave a window where the rows belong to a newer head than the
        CAS checks."""
        log = self.log
        head = log.current_snapshot_id()
        return head, log.read(snapshot_id=head).collect()

    def days(self, rows: list | None = None) -> list[str]:
        """Committed day labels, in commit order. ``rows`` lets the
        single-writer commit path reuse one ``_log_rows()`` collect
        (each collect is a separate driver job)."""
        rows = self._log_rows() if rows is None else rows
        out: list[str] = []
        for r in sorted(rows, key=lambda r: r["seq"]):
            if r["day"] not in out:
                out.append(r["day"])
        return out

    # -- recovery ------------------------------------------------------------

    @staticmethod
    def _branch_day(branch: str) -> str | None:
        """Day label an audit branch belongs to, or None for foreign
        branches. Commit attempts nonce their branch names
        (``ingest_<day>__<8hex>``) so two writers racing the same day
        never collide on a branch; pre-nonce names (``ingest_<day>``)
        still parse for stores written by earlier rounds."""
        if not branch.startswith("ingest_"):
            return None
        rest = branch[len("ingest_") :]
        m = re.fullmatch(r"(.+)__[0-9a-f]{8}", rest)
        return m.group(1) if m else rest

    @staticmethod
    def _is_ancestor(t: "VersionedTable", anc_id: str, head_id: str) -> bool:
        """True when ``anc_id`` is reachable walking parents from
        ``head_id`` (inclusive) — metadata-only, O(snapshots)."""
        by_id = {s.snapshot_id: s for s in t._snapshots()}
        cur = head_id
        while cur is not None:
            if cur == anc_id:
                return True
            nxt = by_id[cur].parent_id if cur in by_id else None
            cur = nxt if nxt in by_id else None
        return False

    def heal(
        self, rows: list | None = None, discard_unpublished: bool = True
    ) -> dict:
        """Make the store consistent after any crash, in either order
        the torn commit left it:

        - a branch whose head is exactly a published day's pin was
          published but not housekept → finish the fast_forward (only
          when main doesn't already carry the pin) and drop the branch
          (readers were never affected — they pin snapshot ids). The
          pin check matters twice over: ``fast_forward`` is a blind
          ref move, so forwarding main to a STALE same-day attempt
          would silently drop the published rows from every branch cut
          later — and a head that IS the pin can only be the published
          writer's own completed branch (snapshot ids are unique), so
          dropping it can never hit an in-flight attempt.
        - any other ``ingest_*`` branch is garbage — a torn,
          unpublished commit or a CAS-losing duplicate attempt — and
          is dropped ONLY when ``discard_unpublished`` (the
          ``maintain()`` hygiene pass); the appended files become
          unreferenced and ``remove_orphan_files`` reclaims them. The
          COMMIT paths pass ``discard_unpublished=False``: a torn
          branch is indistinguishable from a concurrent writer's
          in-flight one, and discarding the latter would corrupt that
          writer mid-append — leaving it alone costs nothing (branches
          never affect main or the pins) and makes the double-fire
          race resolve deterministically at the pointer CAS.

        Called automatically at the start of every commit — a new
        day's branch MUST be cut from a main that already carries
        every published day, or the new snapshot would silently lose
        the lagging day's rows."""
        rows = self._log_rows() if rows is None else rows
        published = set(self.days(rows))
        pins = {
            (r["relation"], r["day"]): r["snapshot_id"]
            for r in rows
            if r["relation"] != _META_RELATION
        }
        report = {"finished": [], "discarded": []}
        # attached governance tables heal by the SAME rule: their
        # pins ride the same pointer rows, their appends the same
        # nonce'd branches — the registry sidecar is how a post-crash
        # heal finds them from the name alone
        named_locs = [(n, self._loc(n)) for n in _RELATIONS] + sorted(
            self._attached().items()
        )
        for name, loc in named_locs:
            if not os.path.exists(os.path.join(loc, "_meta", "table.json")):
                continue
            t = VersionedTable.load(self.spark, loc)
            for branch in list(t.branches()):
                day = self._branch_day(branch)
                if day is None:
                    continue
                pin = pins.get((name, day))
                if (
                    day in published
                    and pin is not None
                    and t.current_snapshot_id(branch) == pin
                ):
                    if not self._is_ancestor(
                        t, pin, t.current_snapshot_id(MAIN)
                    ):
                        t.fast_forward(MAIN, branch)
                        report["finished"].append(f"{name}:{day}")
                    else:
                        report["discarded"].append(f"{name}:{day}")
                    t.drop_branch(branch)
                elif discard_unpublished:
                    report["discarded"].append(f"{name}:{day}")
                    t.drop_branch(branch)
        return report

    # -- commits -------------------------------------------------------------

    def _publish(
        self,
        seq: int,
        day: str,
        snap_ids: dict[str, str],
        meta: dict,
        touched: list["VersionedTable"],
        branch: str,
        expected_log_parent: str | None = None,
    ) -> None:
        """The atomic-publish tail every commit path shares (daily
        ``_commit`` and ``compact``): build the pointer rows, make the
        whole day visible in ONE ``state_log`` append, then housekeep
        the audit branches (crash-safe: ``heal()`` finishes it).

        ``expected_log_parent`` CASes the pointer append on the log
        head the commit derived its rows from: the store's contract is
        single-writer, but a double-fired scheduler violating it now
        raises ``CommitConflictError`` here — before anything becomes
        visible — instead of landing a duplicate seq that would make
        ``_resolve``'s day lookup ambiguous forever."""
        rows = [
            (seq, day, name, sid, None, None, None)
            for name, sid in sorted(snap_ids.items())
        ] + [
            (
                seq,
                day,
                _META_RELATION,
                None,
                json.dumps(meta["w2"]),
                int(meta["keep_micro"]),
                int(meta["max_doc_id"]),
            )
        ]
        try:
            self.log.append(
                self.spark.createDataFrame(rows, _LOG_DDL),
                branch=MAIN,
                summary_extra={"curate-day": day},
                expected_parent_id=expected_log_parent,
            )
        except Exception:
            # the pointer never moved (CAS lost to a concurrent writer,
            # or the append itself failed): nothing became visible —
            # drop this attempt's branches so the winner's state is the
            # only one; the data files are orphan-GC fodder. A failure
            # AFTER the append must NOT take this path: the day is
            # published, and ``heal`` needs the branches to finish the
            # fast_forwards.
            for t in touched:
                t.drop_branch(branch)
            raise
        for t in touched:
            t.fast_forward(MAIN, branch)
            t.drop_branch(branch)

    def _commit(
        self,
        day: str,
        deltas: dict[str, DataFrame | None],
        meta: dict,
        log_state: tuple[str, list] | None = None,
        attached: dict | None = None,
    ) -> dict:
        """The shared write-audit-publish protocol: per-relation delta
        appends on the nonce'd ``ingest_<day>__<hex>`` branches,
        O(delta) audits on the branches, then ONE ``state_log`` append
        that makes the whole day visible atomically (CAS'd on the
        observed log head), then housekeeping. ``log_state`` lets a
        caller that already observed the log pass its
        ``_log_state()`` through — the store is single-writer, so one
        observation per commit serves every derived check AND the CAS.

        ``attached`` folds external governance tables into the SAME
        atomic publish: name → ``(VersionedTable, delta_df,
        audit_fn | None)``. Each delta appends on this commit's
        nonce'd branch of ITS table, the audit (if any) gates on the
        branch-scoped read, and the snapshot id rides the pointer
        rows beside the state relations — so a crash at ANY point
        leaves either nothing visible (pointer never moved; stray
        branches are maintain() fodder) or the whole day visible
        (``heal`` finishes the fast_forwards, readers pin snapshot
        ids and never wait for them)."""
        if not day:
            raise ValueError("day label must be non-empty")
        if _COMPACT_LABEL.fullmatch(day):
            # ``compact()`` stamps its pointer rows ``compact<seq>``
            # (its own append, not this path); a user day reusing that
            # spelling would collide with a later compaction's label
            # and make ``as_of`` ambiguous
            raise ValueError(
                f"day label {day!r} is reserved for compaction commits"
            )
        log_head, log_rows = (
            self._log_state() if log_state is None else log_state
        )
        committed_days = self.days(log_rows)
        if day in committed_days:
            raise ValueError(
                f"day {day!r} is already committed — a re-ingest must "
                "not double-count; read_state(as_of=...) reproduces it"
            )
        self.heal(log_rows, discard_unpublished=False)
        # nonce'd branch names: two writers racing the same day never
        # collide on a branch, so the loser is caught by the pointer
        # CAS below (loud, isolated) instead of corrupting the
        # winner's in-flight appends
        branch = f"ingest_{day}__{os.urandom(4).hex()}"
        # a relation with no delta this day CARRIES its previous pin
        # forward into the pointer rows (the compact() stance):
        # _resolve reads only the target seq's rows, so omitting the
        # relation would silently sever the standing index from every
        # read at or after this day
        snap_ids: dict[str, str] = (
            {
                k: v
                for k, v in self._resolve(
                    None, None, rows=log_rows
                )[0].items()
                if deltas.get(k) is None
            }
            if committed_days
            else {}
        )
        appended: list[VersionedTable] = []
        try:
            for name in _RELATIONS:
                delta = deltas.get(name)
                if delta is None:
                    continue
                t = self._table(name, template=delta)
                t.create_branch(branch, from_branch=MAIN)
                appended.append(t)
                snap = t.append(
                    delta.select("*", F.lit(day).alias("day")),
                    branch=branch,
                )
                snap_ids[name] = snap.snapshot_id
            self._audit(day, branch, deltas)
            for name, (t, delta, audit_fn) in sorted(
                (attached or {}).items()
            ):
                # registry FIRST: a crash after the branch append must
                # leave heal able to find this table from the name
                self.attach(name, t.location)
                t.create_branch(branch, from_branch=MAIN)
                appended.append(t)
                snap = t.append(
                    delta,
                    branch=branch,
                    summary_extra={"curate-day": day},
                )
                snap_ids[name] = snap.snapshot_id
                if audit_fn is not None:
                    audit_fn(t.read(branch=branch))
        except Exception:
            # torn commit: nothing was published (the pointer never
            # moved); drop the day branches so the previous state is
            # the ONLY visible one
            for t in appended:
                t.drop_branch(branch)
            raise
        # max+1, not len(days): retention (``maintain(retain_days=)``)
        # expires old pointer rows, and a reused seq would tie or
        # shadow a retained day in ``_resolve``'s max-seq lookup
        seq = (
            max(int(r["seq"]) for r in log_rows) + 1 if log_rows else 0
        )
        self._publish(
            seq,
            day,
            snap_ids,
            meta,
            appended,
            branch,
            expected_log_parent=log_head,
        )
        return {
            "day": day,
            "seq": seq,
            "relations": sorted(
                n for n in snap_ids if deltas.get(n) is not None
            ),
            "carried": sorted(
                n for n in snap_ids if deltas.get(n) is None
            ),
        }

    def _audit(
        self, day: str, branch: str, deltas: dict[str, DataFrame | None]
    ) -> None:
        """O(delta) invariants over what was WRITTEN on the audit
        branches (write-audit-publish — the same stance as
        ``workflows.curate_publish``): no null keys in any appended
        slice, and each census partial must sum to its own day's
        postings rows (they are derived from the same delta, so a
        mismatch means a torn or re-ordered write)."""
        from iceberg_by_example_spark.sources.activity import (
            rows_with_any_null,
        )

        def day_slice(name: str) -> DataFrame:
            return (
                self._table(name)
                .read(branch=branch)
                .filter(F.col("day") == day)
            )

        for name in _RELATIONS:
            if deltas.get(name) is None:
                continue
            bad = rows_with_any_null(day_slice(name)).count()
            if bad:
                raise ValueError(
                    f"audit failed: {bad} null-key rows in {name} "
                    f"delta for day {day!r}"
                )
        for census, index, key in (
            ("shingle_census", "shingle_index", "shingle"),
            ("winnow_census", "winnow_index", "k"),
        ):
            if deltas.get(census) is None:
                continue
            got = day_slice(census).agg(
                F.coalesce(F.sum("df"), F.lit(0)).alias("s")
            ).collect()[0]["s"]
            want = day_slice(index).count()
            if int(got) != int(want):
                raise ValueError(
                    f"audit failed: {census} partial sums to {got} but "
                    f"{index} delta has {want} rows for day {day!r}"
                )

    def commit_backfill(self, state, day: str = "backfill") -> dict:
        """Land a freshly built ``CurateState`` (the nightly rebuild)
        as day 0 of the store: the full indexes ARE the first
        partition, the full censuses the first partials."""
        if self.days():
            raise ValueError(
                "store already has a backfill; commit_day folds days "
                "in, or use a fresh root for a new backfill"
            )
        deltas = {
            name: getattr(state, name) for name in _RELATIONS
        }
        return self._commit(
            day,
            deltas,
            meta={
                "w2": state.w2,
                "keep_micro": state.keep_micro,
                "max_doc_id": state.max_doc_id,
            },
        )

    def commit_day(
        self,
        batch: DataFrame,
        day_survivors: DataFrame,
        day: str,
        attached: dict | None = None,
    ) -> dict:
        """Fold one ingest day into the store: O(batch) deltas only —
        the batch's fingerprints/postings/winnow keys/bench shingles
        (``curate_day_deltas``, the SAME derivation
        ``advance_curate_state`` folds in memory), the day's census
        partials derived from its own postings delta, and the day's
        survivor source masses. The standing index bytes are never
        rewritten; the whole day publishes in one pointer append.

        The batch is persisted for the commit's duration: the deltas
        are 4+ independent plans over it (fingerprints, postings,
        winnow keys, bench shingles — the latter three re-shingling
        the text), plus the bounds agg and the audits; unpersisted,
        each would re-scan and re-tokenize the full batch (the same
        discipline ``pipeline_curate_ingest_day`` applies)."""
        from iceberg_by_example_spark.operators.pipeline import (
            curate_day_deltas,
        )

        # mixed-mode staleness stays LOUD in both directions (ADVICE
        # r17): the dup-key audit already catches an atomic re-publish
        # of a two-commit day's packs; this warns the other way — a
        # commit WITHOUT attached= carries every registered table's
        # pin forward, so read_attached(as_of=this day) serves the
        # last atomically-committed manifest, not anything published
        # outside the store this day
        stale_pins = sorted(
            n for n in self._attached() if n not in (attached or {})
        )
        if stale_pins:
            warnings.warn(
                f"commit_day({day!r}) omits attached= for registered "
                f"table(s) {stale_pins}: their pins carry forward, so "
                f"read_attached(as_of={day!r}) serves the last "
                "atomically-committed pin (pass attached= to pin this "
                "day's append, or detach expectations accordingly)",
                stacklevel=2,
            )
        log_head, log_rows = self._log_state()
        if day in self.days(log_rows):
            # checked here as well as in _commit: a re-ingest of a
            # committed day must read as the re-publish guard, not as
            # a monotone-watermark violation (the watermark already
            # advanced past this batch when the day first landed)
            raise ValueError(
                f"day {day!r} is already committed — a re-ingest must "
                "not double-count; read_state(as_of=...) reproduces it"
            )
        _, prev_meta = self._resolve(None, None, rows=log_rows)
        # is_cached guard (r15 review): persist isn't refcounted — a
        # caller that persisted the batch for its own pre-checks must
        # not have its cache dropped by this commit's finally
        own_b = not batch.is_cached
        b = batch.persist() if own_b else batch
        try:
            bounds = b.agg(
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            ).collect()[0]
            if bounds["lo"] is None:
                raise ValueError("empty ingest batch")
            if bounds["lo"] <= prev_meta["max_doc_id"]:
                raise ValueError(
                    f"monotone-id contract violated: batch doc_id "
                    f"{bounds['lo']} <= committed max_doc_id "
                    f"{prev_meta['max_doc_id']}"
                )
            deltas = curate_day_deltas(b)
            has_winnow = "winnow_index" in self._committed_relations(
                log_rows
            )
            if not has_winnow:
                deltas["winnow_index"] = None
            deltas["shingle_census"] = (
                deltas["shingle_index"]
                .groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
            )
            deltas["winnow_census"] = (
                deltas["winnow_index"]
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("df"))
                if has_winnow
                else None
            )
            deltas["source_stats"] = day_survivors.groupBy(
                "source"
            ).agg(F.sum("n_tokens").alias("source_tokens"))
            return self._commit(
                day,
                deltas,
                meta={
                    "w2": prev_meta["w2"],
                    "keep_micro": prev_meta["keep_micro"],
                    "max_doc_id": max(
                        prev_meta["max_doc_id"], int(bounds["hi"])
                    ),
                },
                log_state=(log_head, log_rows),
                attached=attached,
            )
        finally:
            if own_b:
                b.unpersist()

    def compact(self) -> dict:
        """The maintenance half of the LSM trade the store makes: the
        read-side-merge relations accumulate one partial partition per
        day (censuses, source masses) and one duplicate-able partition
        per day (fingerprints, bench vocabulary re-ingested on later
        days), so their row counts grow O(days × day-distinct keys).
        ``compact`` rewrites each as its already-aggregated /
        deduplicated form in ONE ``replace`` snapshot per relation,
        published — like a day — through a single pointer append
        (relation ids carried forward for the untouched postings/key
        indexes, meta unchanged, day label ``compact<seq>``).

        The append-only postings/key indexes (``shingle_index``,
        ``winnow_index``) join the pass with IDENTITY aggregation
        (r19): their rows never duplicate, but per-trigger continuous
        ingest appends one small file per commit, so the physical
        rewrite — history relabeled under this compaction's day label,
        written back through size-bounded input splits — is what
        bounds the head's file count at O(index bytes / split size)
        instead of O(triggers).

        Correctness is definitional: ``read_state`` aggregates partials
        lazily and drops ``day``, so replacing relations with their
        aggregate (or identity) changes no relation's row set — pinned
        by pytest (state equal before and after, history still
        time-travels to pre-compaction days). Cost is O(index) READ
        once, by choice, exactly like ``rewrite_data_files`` — a
        periodic maintenance job, never on the daily commit path."""
        log_head, log_rows = self._log_state()
        self.heal(log_rows, discard_unpublished=False)
        snaps, meta = self._resolve(None, None, rows=log_rows)
        day = f"compact{meta['seq'] + 1}"
        branch = f"ingest_{day}__{os.urandom(4).hex()}"
        specs = {
            "shingle_census": lambda df: df.groupBy("shingle").agg(
                F.sum("df").alias("df")
            ),
            "winnow_census": lambda df: df.groupBy("k").agg(
                F.sum("df").alias("df")
            ),
            "source_stats": lambda df: df.groupBy("source").agg(
                F.sum("source_tokens").alias("source_tokens")
            ),
            "fp_index": lambda df: df.distinct(),
            "bench_vocab": lambda df: df.distinct(),
            # append-only postings/key indexes (r19): rows are already
            # unique — a (key, doc) posting lands exactly once, on its
            # ingest day — so their compacted form is the IDENTITY and
            # the rewrite's value is purely PHYSICAL. Under per-trigger
            # continuous ingest (streaming/store_ingest.py) every
            # commit appends one small file per index under its own
            # day-partition label, so the head accumulates O(triggers)
            # files — the classic streaming-lakehouse small-files
            # failure. Relabeling history to this compaction's single
            # day label lets the replace publish a few bin-packed
            # files instead. Safe because the day column is only ever
            # consumed for the IN-FLIGHT day's commit audits
            # (``day_slice``); every standing read drops it, and
            # pinned pre-compaction days still time-travel to their
            # original partitions until retention truncates them.
            "shingle_index": lambda df: df,
            "winnow_index": lambda df: df,
        }
        identity_pack = {"shingle_index", "winnow_index"}
        new_snaps = dict(snaps)
        compacted: list[str] = []
        touched: list[VersionedTable] = []
        try:
            for name, agg in specs.items():
                if name not in snaps:
                    continue
                t = self._table(name)
                cur = t.read(snapshot_id=snaps[name]).drop("day")
                out = agg(cur)
                if name in identity_pack:
                    # the aggregate relations bin-pack through their
                    # groupBy shuffle; the identity ones must pack
                    # explicitly or the replace reproduces the input's
                    # one-file-per-trigger layout. coalesce (narrow,
                    # no shuffle — the compaction read itself runs at
                    # the packed width, the binpack stance) sized from
                    # the pinned snapshot's actual bytes.
                    pinned = {
                        s.snapshot_id: s for s in t._snapshots()
                    }[snaps[name]]
                    total = sum(
                        os.path.getsize(os.path.join(t.location, f))
                        for f in pinned.files
                        if os.path.exists(os.path.join(t.location, f))
                    )
                    n_out = max(
                        1, -(-total // _COMPACT_TARGET_FILE_BYTES)
                    )
                    out = out.coalesce(n_out)
                t.create_branch(branch, from_branch=MAIN)
                touched.append(t)
                snap = t.replace(
                    out.select("*", F.lit(day).alias("day")),
                    branch=branch,
                )
                new_snaps[name] = snap.snapshot_id
                compacted.append(name)
        except Exception:
            for t in touched:
                t.drop_branch(branch)
            raise
        self._publish(
            meta["seq"] + 1,
            day,
            new_snaps,
            meta,
            touched,
            branch,
            expected_log_parent=log_head,
        )
        return {"day": day, "compacted": compacted}

    def maintain(self, retain_days: int | None = None) -> dict:
        """Storage GC for the store — the maintenance trio
        (``expire_snapshots`` → ``remove_orphan_files`` →
        ``rewrite_manifests``, the reference's C4/C1/C3 sequence,
        LT:158-163) applied to every relation table and the pointer
        log. ``heal()`` promises that a torn commit's appended files
        'become unreferenced and ``remove_orphan_files`` can reclaim
        them later' — this is the later: heal drops the torn
        branches, expiry (``retain_last=0`` — every committed day's
        pin is a main ancestor, so the live set protects ALL history
        the pointer can reach; the timestamp tail would only shield
        dangling garbage) removes the now-unreachable snapshots, and
        orphan GC deletes their data files.

        ``retain_days=N`` adds the retention horizon (the reference's
        ``expire_snapshots(retain_last => …)`` semantic, LT:161-162,
        applied to the pointer log): keep the newest N pointer entries
        (ingest days and compactions alike), expire everything older —
        the rows leave the log, the log's own history truncates to the
        post-delete snapshot, and each relation's history truncates to
        its oldest RETAINED pin (``expire_history_before``) so the
        files only expired days pinned — pre-compaction partials above
        all — become orphans the GC trio below reclaims. Without it
        the store grows monotonically forever (every day stays
        reproducible); with it the steady state is bounded: O(index)
        live bytes + N days of deltas. ``read_state(as_of=)`` inside
        the horizon is bit-identical; outside it raises the clean
        day-not-committed error (and historic ``log_snapshot_id``
        reads the clean unknown-snapshot error), never a missing-file
        crash. Idempotent, and the next ``commit_day`` lands on the
        retained base (seq numbering is max+1, never reused)."""
        report = {"healed": self.heal(), "tables": {}}
        if retain_days is not None:
            report["retention"] = self._retain(retain_days)
        # attached governance tables are first-class here: their
        # published appends are main ancestors (fast_forwarded by the
        # same publish tail), so the retain_last=0 expiry is exactly
        # as safe for them, and their audit-failed dangling attempts
        # are exactly as much GC fodder
        names = (
            list(_RELATIONS)
            + sorted(self._attached())
            + ["state_log"]
        )
        for name in names:
            t = self._table_for(name)
            if t is None:
                continue
            expired = t.expire_snapshots(retain_last=0)
            orphans = t.remove_orphan_files()
            manifests = t.rewrite_manifests()
            report["tables"][name] = {
                "expired_snapshots": len(expired),
                "orphan_files_removed": len(orphans),
                "manifest_files_removed": manifests,
            }
        return report

    def _retain(self, retain_days: int) -> dict:
        """The pointer-history half of ``maintain(retain_days=)``:
        delete the expired rows from the log (one CoW snapshot),
        truncate the log's own history to it, then truncate each
        relation's history to its oldest retained pin. File
        reclamation itself is left to the GC trio that runs right
        after — this method only makes the right snapshots expire.

        Carried pins are why the truncation point is per-relation and
        computed from the RETAINED rows, not the cutoff day: a
        relation with no delta for many days carries an old snapshot
        id forward, and truncating before the cutoff day's seq would
        sever that still-pinned history."""
        if retain_days < 1:
            raise ValueError("retain_days must be >= 1")
        _head, rows = self._log_state()
        seqs = sorted({int(r["seq"]) for r in rows})
        if len(seqs) <= retain_days:
            return {"expired_days": [], "cutoff_seq": None}
        cutoff = seqs[-retain_days]
        expired_days = self.days(
            [r for r in rows if int(r["seq"]) < cutoff]
        )
        retained = [r for r in rows if int(r["seq"]) >= cutoff]
        self.log.delete(F.col("seq") < cutoff, branch=MAIN)
        self.log.expire_history_before(self.log.current_snapshot_id())
        expired_snaps: dict[str, int] = {}
        # attached tables truncate by the SAME oldest-retained-pin
        # rule: in atomic mode the pack manifest's history term is
        # otherwise unbounded (one published append per day forever),
        # and ancestry truncation honoring the pins — not a raw
        # newest-N count — is what keeps every retained day's
        # read_attached() intact while the ledger rows stay complete
        attached_names = sorted(self._attached())
        for name in list(_RELATIONS) + attached_names:
            pins = [
                r
                for r in retained
                if r["relation"] == name and r["snapshot_id"] is not None
            ]
            if not pins:
                continue
            oldest = min(pins, key=lambda r: int(r["seq"]))
            t = self._table_for(name)
            if t is None:
                continue
            if name in attached_names:
                # defense in depth behind attach()'s refusal: ancestry
                # truncation is the irreversible operation the
                # ownership stamp exists for, so verify it HERE too —
                # a hand-copied _attached.json sidecar must not let
                # this store sever another store's pinned history
                self._claim_ownership(
                    os.path.realpath(self._attached()[name])
                )
            expired_snaps[name] = len(
                t.expire_history_before(oldest["snapshot_id"])
            )
        return {
            "expired_days": expired_days,
            "cutoff_seq": cutoff,
            "expired_snapshots": expired_snaps,
        }

    # -- bucketed probe mirror ------------------------------------------------

    def _mirror_dir(self) -> str:
        return os.path.join(self.root, "_mirror")

    def _mirror_db(self) -> str:
        import hashlib

        return (
            "curate_mirror_"
            + hashlib.md5(self.root.encode()).hexdigest()[:10]
        )

    def _ensure_mirror_db(self) -> str:
        db = self._mirror_db()
        if not self.spark.catalog.databaseExists(db):
            os.makedirs(self._mirror_dir(), exist_ok=True)
            self.spark.sql(
                f"CREATE DATABASE {db} "
                f"LOCATION '{self._mirror_dir()}'"
            )
        return db

    def refresh_probe_mirror(self) -> dict:
        """Rewrite the join-probed standing relations (fingerprints,
        shingle postings, winnow keys) as tables BUCKETED on their
        probe key — the pay-once-shuffle-never form: with the mirror
        fresh, the daily gates' fingerprint anti-join and postings/
        winnow probe joins carry NO index-side Exchange and no
        per-day Sort (the buckets are written pre-sorted); only the
        O(batch) side shuffles. O(index) read+write ONCE, by choice —
        a periodic maintenance job exactly like ``compact()``, never
        on the daily commit path.

        The mirror is stamped with the pointer seq it covers;
        ``read_state`` serves it ONLY while it is current (a later
        ``commit_day`` silently falls back to the plain pinned reads,
        which stay correct — the mirror is a physical-layout
        optimization, never a correctness dependency). Tables are
        EXTERNAL (files under ``<root>/_mirror``) and re-registered
        from the stamp when a fresh session's catalog lacks them.

        Write-then-swap, never in place: each refresh writes to
        NONCE'd table dirs, the stamp swaps atomically (os.replace)
        only after every table landed, and superseded dirs retire
        LAST — a crash anywhere mid-refresh leaves the previous stamp
        pointing at intact tables (or, before any refresh completed,
        no stamp at all), never a current-looking stamp over gutted
        dirs that would serve an EMPTY standing index into the dedup
        gates. Retirement lags ONE generation (r15 ADVICE #1): the
        generation a refresh supersedes survives until the NEXT
        refresh, so a CurateState handle obtained from read_state
        BEFORE this refresh keeps resolving its (now-superseded)
        mirror tables for the rest of its natural lifetime instead of
        failing mid-query on missing files; only generations two or
        more refreshes old are reclaimed."""
        import shutil

        snaps, meta = self._resolve(None, None)
        seq = meta["seq"]
        nonce = os.urandom(4).hex()
        db = self._ensure_mirror_db()
        loc = self._mirror_dir()
        # unconditional (r15 ADVICE #2): the catalog db can survive a
        # deleted/recreated store root, in which case the
        # databaseExists branch in _ensure_mirror_db never re-creates
        # the directory and the stamp write below would FileNotFoundError
        # in the no-mirrored-relations edge
        os.makedirs(loc, exist_ok=True)
        # the generation being superseded (kept through this refresh)
        prev_keep: set[str] = set()
        prev_path = os.path.join(loc, "_STAMP")
        if os.path.exists(prev_path):
            with open(prev_path) as f:
                prev_keep = {
                    os.path.basename(i["dir"])
                    for i in json.load(f)["tables"].values()
                }
        stamp_tables: dict[str, dict] = {}
        for name, (col, dedup) in _MIRROR_SPECS.items():
            if name not in snaps:
                continue
            df = (
                self._table(name)
                .read(snapshot_id=snaps[name])
                .drop("day")
            )
            if dedup:
                df = df.distinct()
            tbl = f"{name}_seq{seq}_{nonce}"
            full = f"{db}.{tbl}"
            tdir = os.path.join(loc, tbl)
            (
                df.write.bucketBy(MIRROR_BUCKETS, col)
                .sortBy(col)
                .option("path", tdir)
                .saveAsTable(full)
            )
            stamp_tables[name] = {
                "table": full,
                "dir": tdir,
                "bucket_col": col,
                "n_buckets": MIRROR_BUCKETS,
                "ddl": _ddl_of(df),
            }
        # the swap: the new mirror becomes visible in ONE rename
        tmp = os.path.join(loc, "_STAMP.tmp")
        with open(tmp, "w") as f:
            json.dump({"seq": seq, "tables": stamp_tables}, f)
        os.replace(tmp, os.path.join(loc, "_STAMP"))
        # retire mirrors two+ generations old LAST (external tables:
        # drop the catalog entry AND the files); the JUST-superseded
        # generation survives until the next refresh so live state
        # handles keep reading it; a crash here leaves only
        # unreferenced leftovers, reclaimed by the next refresh
        keep = {
            os.path.basename(i["dir"]) for i in stamp_tables.values()
        } | prev_keep
        for entry in sorted(os.listdir(loc)):
            if entry.startswith("_STAMP") or entry in keep:
                continue
            if self.spark.catalog.tableExists(f"{db}.{entry}"):
                self.spark.sql(f"DROP TABLE {db}.{entry}")
            shutil.rmtree(os.path.join(loc, entry), ignore_errors=True)
        return {"seq": seq, "mirrored": sorted(stamp_tables)}

    def mirror_staleness(self) -> dict:
        """Cheap (driver-JSON only, no DataFrames) probe of how far
        the bucketed probe mirror lags the pointer: ``stamp_seq`` (the
        seq the stamp covers, None before any refresh), ``seq`` (the
        current pointer seq) and ``stale_days`` (pointer entries
        committed since the stamp — the counter a production
        scheduler alerts on; None before any refresh). Same semantics
        as ``read_state()``'s ``meta["mirror"]["stale_days"]`` without
        constructing the state (no census materialization), so the
        nightly maintenance window can report it for free."""
        _, meta = self._resolve(None, None)
        stamp = self._mirror_stamp()
        return {
            "stamp_seq": None if stamp is None else int(stamp["seq"]),
            "seq": meta["seq"],
            "stale_days": (
                None
                if stamp is None
                else max(0, meta["seq"] - int(stamp["seq"]))
            ),
        }

    def _mirror_stamp(self) -> dict | None:
        """The current mirror stamp, or None before any refresh."""
        path = os.path.join(self._mirror_dir(), "_STAMP")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _mirror_tables(self, meta: dict, stamp: dict | None) -> dict:
        """relation → bucketed DataFrame, ONLY when the stamped
        mirror covers exactly the requested seq AND every stamped
        table dir is present on disk; {} otherwise (the caller falls
        back to the plain pinned reads — a manually deleted or
        torn-retired dir must degrade to the plain path, never to an
        empty re-registered table silently serving an empty index)."""
        if stamp is None:
            return {}
        if stamp["seq"] != meta["seq"]:
            return {}
        if any(
            not os.path.isdir(info["dir"])
            for info in stamp["tables"].values()
        ):
            return {}
        out: dict[str, DataFrame] = {}
        for name, info in stamp["tables"].items():
            full = info["table"]
            if not self.spark.catalog.tableExists(full):
                # fresh session: re-register the external bucketed
                # table over the stamped files (bucket ids live in
                # the file names; the spec lives in this DDL)
                self._ensure_mirror_db()
                self.spark.sql(
                    f"CREATE TABLE {full} ({info['ddl']}) "
                    f"USING PARQUET "
                    f"CLUSTERED BY ({info['bucket_col']}) "
                    f"SORTED BY ({info['bucket_col']}) "
                    f"INTO {info['n_buckets']} BUCKETS "
                    f"LOCATION '{info['dir']}'"
                )
            out[name] = self.spark.table(full)
        return out

    # -- reads ---------------------------------------------------------------

    def _committed_relations(self, rows: list | None = None) -> set:
        return {
            r["relation"]
            for r in (self._log_rows() if rows is None else rows)
            if r["relation"] != _META_RELATION
        }

    def _resolve(
        self,
        as_of: str | None,
        log_snapshot_id: str | None,
        rows: list | None = None,
    ) -> tuple[dict, dict]:
        """(relation → pinned snapshot_id ACROSS all days ≤ target,
        meta of the target day). Each relation table accumulates day
        partitions, so the state at day D is the relation's snapshot
        AS COMMITTED FOR day D — which already contains every earlier
        day's partitions (appends carry files forward). ``rows``
        reuses a caller's ``_log_rows()`` collect (only valid without
        ``log_snapshot_id``)."""
        if rows is None or log_snapshot_id is not None:
            rows = self._log_rows(log_snapshot_id)
        if not rows:
            raise ValueError(f"no committed state under {self.root}")
        by_seq: dict[int, list] = {}
        for r in rows:
            by_seq.setdefault(r["seq"], []).append(r)
        if as_of is None:
            target = max(by_seq)
        else:
            hits = [
                s for s, rs in by_seq.items() if rs[0]["day"] == as_of
            ]
            if not hits:
                raise ValueError(
                    f"day {as_of!r} not committed; have {self.days()}"
                )
            target = hits[0]
        snaps: dict[str, str] = {}
        meta: dict = {}
        for r in by_seq[target]:
            if r["relation"] == _META_RELATION:
                meta = {
                    "w2": [int(v) for v in json.loads(r["w2"])],
                    "keep_micro": int(r["keep_micro"]),
                    "max_doc_id": int(r["max_doc_id"]),
                    "day": r["day"],
                    "seq": int(r["seq"]),
                }
            else:
                snaps[r["relation"]] = r["snapshot_id"]
        return snaps, meta

    def read_state(
        self,
        as_of: str | None = None,
        log_snapshot_id: str | None = None,
        prefer_mirror: bool = True,
    ):
        """The ``CurateState`` as of a committed day (default: the
        latest). Relations resolve through the pointer's PINNED
        snapshot ids, so concurrent/torn appends are invisible; the
        read-side merges are exactly the write-side's inverses —
        ``distinct`` over the keyed sets (a fingerprint re-ingested on
        a later day appears in two partitions), ``SUM(df)`` over the
        census partials, ``SUM(source_tokens)`` over the mass
        partials. ``log_snapshot_id`` resolves the POINTER itself at a
        historic snapshot (``VERSION AS OF`` on the log table) — the
        same answer as ``as_of`` for any day committed then.

        When a ``refresh_probe_mirror`` stamp covers exactly the
        requested seq (and ``prefer_mirror``), the join-probed
        relations are served from their BUCKETED mirror tables — same
        rows, exchange-free probe plans; any staleness (a day
        committed after the refresh) silently falls back to the plain
        pinned reads. Which layout served is OBSERVABLE (r15 verdict
        #7): ``meta["mirror"]`` reports ``served`` (this read used the
        bucketed mirror), ``stamp_seq`` (the seq the stamp covers, or
        None before any refresh) and ``stale_days`` (pointer entries
        committed since the stamp — 0 while the mirror serves, rising
        until the next ``refresh_probe_mirror`` resets it) — the
        counter a production scheduler alerts on when the nightly
        mirror refresh silently stops keeping up with the days."""
        from iceberg_by_example_spark.operators.pipeline import (
            CurateState,
        )

        snaps, meta = self._resolve(as_of, log_snapshot_id)
        stamp = self._mirror_stamp()
        mirror = (
            self._mirror_tables(meta, stamp) if prefer_mirror else {}
        )
        meta["mirror"] = {
            "served": bool(mirror),
            "stamp_seq": None if stamp is None else int(stamp["seq"]),
            "stale_days": (
                None
                if stamp is None
                else max(0, meta["seq"] - int(stamp["seq"]))
            ),
        }

        def rel(name: str) -> DataFrame | None:
            if name not in snaps:
                return None
            return (
                self._table(name)
                .read(snapshot_id=snaps[name])
                .drop("day")
            )

        from iceberg_by_example_spark.util import detach

        fp = (
            mirror["fp_index"]
            if "fp_index" in mirror
            else rel("fp_index").distinct()
        )
        vocab = rel("bench_vocab").distinct()
        # the census SUM over the day partials is materialized ONCE
        # per read_state (detach): the ingest consumes the census
        # several times (hot filter, extra_hot, probe), and each lazy
        # consumption would repay the keys-only aggregation shuffle.
        # The aggregation is O(census keys) keys-only rows; compact()
        # bounds the partial tail, and at production scale the census
        # table lives bucketed on its key (the winnow_index_table
        # pattern) so even this exchange disappears.
        sc = detach(
            rel("shingle_census")
            .groupBy("shingle")
            .agg(F.sum("df").alias("df"))
        )
        wi = (
            mirror["winnow_index"]
            if "winnow_index" in mirror
            else rel("winnow_index")
        )
        wc = rel("winnow_census")
        if wc is not None:
            wc = detach(
                wc.groupBy("k").agg(F.sum("df").alias("df"))
            )
        stats = (
            rel("source_stats")
            .groupBy("source")
            .agg(F.sum("source_tokens").alias("source_tokens"))
        )
        return (
            CurateState(
                fp_index=fp,
                shingle_index=(
                    mirror["shingle_index"]
                    if "shingle_index" in mirror
                    else rel("shingle_index")
                ),
                shingle_census=sc,
                bench_vocab=vocab,
                w2=meta["w2"],
                keep_micro=meta["keep_micro"],
                source_stats=stats,
                max_doc_id=meta["max_doc_id"],
                winnow_index=wi,
                winnow_census=wc,
            ),
            meta,
        )
