"""Streaming ingest into the versioned lakehouse.

``foreachBatch`` bridges Structured Streaming and VersionedTable: each
microbatch lands as one snapshot commit (append or merge), so the
streaming pipeline inherits the table's time travel, branches, and WAP
audit — the reference's batch lifecycle, continuously fed.

Exactly-once: ``foreachBatch`` is at-least-once — after a failure the
restarted query REPLAYS the last unacknowledged batch id. Each commit
therefore stamps ``(stream-id, batch-id)`` into its snapshot summary
(atomically — the marker rides the same metadata swap as the data),
and a batch whose id is already on the branch's lineage is skipped.
This is Iceberg's streaming-sink dedup contract (its Spark sink skips
batches whose id is recorded in the table's snapshot history for the
same query id).

At scale this is the standard lakehouse CDC shape: microbatch commits
are atomic metadata swaps; readers at a branch never see a partial
batch; a bad batch is one snapshot rollback away; the dedup scan walks
driver-side snapshot metadata, never data files.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iceberg_by_example_spark.tables.versioned import MAIN, VersionedTable

STREAM_ID_KEY = "streaming-stream-id"
BATCH_ID_KEY = "streaming-batch-id"


def last_committed_batch_id(
    table: VersionedTable, stream_id: str, branch: str = MAIN
) -> int | None:
    """Highest batch id this stream has committed on ``branch``'s
    lineage — a walk up the branch ref's ANCESTOR CHAIN (follow
    parent_id from ``_refs()[branch]``), O(snapshots) driver-side
    metadata rows, no data I/O.

    Only ancestors count, not the global snapshot list: after a
    rollback (the advertised recovery path — a bad batch is one
    snapshot rollback away) the abandoned snapshot still carries its
    (stream-id, batch-id) marker until ``expire_snapshots``, and a
    marker on another branch (e.g. a dropped WAP/staging branch) was
    never published here. Either would acknowledge a replayed batch
    without writing it — silent data loss. A marker suppresses a
    replay only while its snapshot is reachable from the branch head,
    which is exactly the exactly-once contract."""
    by_id = {s.snapshot_id: s for s in table._snapshots()}
    cur = table._refs().get(branch)
    best: int | None = None
    while cur is not None and cur in by_id:
        s = by_id[cur]
        if s.summary.get(STREAM_ID_KEY) == stream_id:
            bid = int(s.summary[BATCH_ID_KEY])
            best = bid if best is None or bid > best else best
        cur = s.parent_id
    return best


def make_batch_committer(
    table: VersionedTable,
    branch: str = MAIN,
    merge_on: str | None = None,
    stream_id: str | None = None,
):
    """The ``foreachBatch`` handler, exposed for direct testing: commits
    a microbatch idempotently. Replayed batch ids (<= the stream's last
    committed id) are acknowledged without writing."""
    sid = stream_id or uuid.uuid4().hex

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch_id(table, sid, branch)
        if last is not None and batch_id <= last:
            return  # replay after restart — already committed
        if batch_df.isEmpty():
            return
        marker = {STREAM_ID_KEY: sid, BATCH_ID_KEY: int(batch_id)}
        if merge_on:
            table.merge(
                batch_df, on=merge_on, branch=branch, summary_extra=marker
            )
        else:
            table.append(batch_df, branch=branch, summary_extra=marker)

    return commit_batch


def stream_append(
    stream_df: DataFrame,
    table: VersionedTable,
    branch: str = MAIN,
    checkpoint_dir: str | None = None,
    merge_on: str | None = None,
    stream_id: str | None = None,
) -> StreamingQuery:
    """Start a streaming query committing each microbatch to ``table``.

    ``merge_on``: when set, each batch is upserted by that key (MERGE
    semantics — last write wins within the stream); otherwise appended.
    ``stream_id`` names the stream for exactly-once batch dedup across
    restarts; pass the same id with the same checkpoint dir (defaults
    to the checkpoint dir itself when one is given, so the pairing is
    automatic).
    """
    sid = stream_id or checkpoint_dir
    writer = stream_df.writeStream.foreachBatch(
        make_batch_committer(table, branch, merge_on, sid)
    ).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
